"""End-to-end training tests: every engine runs; logistic overfits; the
data-parallel path trains on the virtual 8-device mesh; the CLI wires up."""

import os

import h5py
import numpy as np
import pytest

from summarizer_tpu.data.splits import write_splits
from summarizer_tpu.utils.config import HParameters


def _mk_hps(tmp_path, synth_h5, model, extra, **over):
    with h5py.File(synth_h5) as f:
        keys = list(f.keys())
    sp = str(tmp_path / "synthetic_splits_overfit.json")
    write_splits([{"train_keys": keys, "test_keys": keys}], sp)
    args = dict(
        model=model,
        datasets=str(synth_h5),
        splits_files=sp,
        epochs=3,
        test_every_epochs=2,
        log_dir=str(tmp_path / f"logs_{model}"),
        tensorboard=False,
        log_level="warning",
        extra_params=extra,
    )
    args.update(over)
    return HParameters().load_from_args(args), sp


def test_logistic_overfits(tmp_path, synth_h5):
    from summarizer_tpu.train.loop import train

    hps, sp = _mk_hps(
        tmp_path, synth_h5, "logistic", {"input_size": 64}, epochs=25, lr=1e-3
    )
    results = train(hps)
    _, corr, avg_f1, max_f1 = results[0]
    assert corr > 0.3, f"logistic failed to overfit: corr={corr}"
    assert 0.0 <= avg_f1 <= max_f1 <= 1.0
    # predictions h5 layout parity (models/__init__.py:149-177)
    with h5py.File(hps.pred_path[sp]) as f:
        grp = f[os.path.basename(str(synth_h5))]
        k = list(grp.keys())[0]
        assert set(grp[k].keys()) == {
            "scores",
            "user_summary",
            "machine_summary",
            "machine_scores",
        }


def test_vasnet_trains(tmp_path, synth_h5):
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path, synth_h5, "vasnet", {"input_size": 64, "local": 16}, epochs=2
    )
    results = train(hps)
    assert np.isfinite(results[0][1])


def test_dsn_trains(tmp_path, synth_h5):
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path, synth_h5, "dsn", {"input_size": 64, "num_episodes": 2}, epochs=2
    )
    results = train(hps)
    assert np.isfinite(results[0][1])


def test_sumgan_trains(tmp_path, synth_h5):
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path,
        synth_h5,
        "sumgan",
        {
            "input_size": 64,
            "sLSTM_hidden_size": 16,
            "edLSTM_hidden_size": 24,
            "cLSTM_hidden_size": 16,
            "pretrain_vae": 1,
        },
        epochs=2,
    )
    results = train(hps)
    assert np.isfinite(results[0][1])


def test_sumgan_att_trains(tmp_path, synth_h5):
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path,
        synth_h5,
        "sumgan_att",
        {"input_size": 64, "cLSTM_hidden_size": 16, "pretrain_ae": 1},
        epochs=2,
    )
    results = train(hps)
    assert np.isfinite(results[0][1])


def test_data_parallel_supervised(tmp_path, synth_h5):
    """batch_size=4 sharded over dp=4 on the virtual mesh."""
    import jax

    assert len(jax.devices()) >= 4
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path,
        synth_h5,
        "logistic",
        {"input_size": 64},
        epochs=4,
        batch_size=4,
        data_parallel=4,
        lr=1e-3,
    )
    results = train(hps)
    assert np.isfinite(results[0][1])


def test_train_cli(tmp_path, synth_h5):
    from summarizer_tpu.cli.train import main

    with h5py.File(synth_h5) as f:
        keys = list(f.keys())
    sp = str(tmp_path / "synthetic_splits_cli.json")
    write_splits([{"train_keys": keys[:4], "test_keys": keys[4:]}], sp)
    results = main(
        [
            "-m", "logistic", "-e", "2", "-s", sp,
            "--datasets", str(synth_h5),
            "--log-dir", str(tmp_path / "logs_cli"),
            "--no-tensorboard", "-l", "warning",
            "--input_size", "64",  # unknown flag -> extra_params
        ]
    )
    assert len(results) == 1


def test_train_cli_parses_parallel_flags():
    """The parallelism flags reach HParameters with their dashed spellings."""
    from summarizer_tpu.cli.train import build_parser

    args, _ = build_parser().parse_known_args(
        ["--data-parallel", "2", "--seq-parallel", "4",
         "--pipeline-parallel", "8", "--expert-parallel", "8"]
    )
    assert args.data_parallel == 2 and args.seq_parallel == 4
    assert args.pipeline_parallel == 8 and args.expert_parallel == 8


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from summarizer_tpu.models import logistic
    from summarizer_tpu.train.checkpoint import load_params, save_params

    params = logistic.init(jax.random.PRNGKey(0), {"input_size": 32})
    path = str(tmp_path / "w.ckpt")
    save_params(path, params)
    template = logistic.init(jax.random.PRNGKey(1), {"input_size": 32})
    restored = load_params(path, template)
    np.testing.assert_array_equal(
        np.asarray(params["head"]["w"]), np.asarray(restored["head"]["w"])
    )


def test_train_state_resume(tmp_path):
    import jax
    import optax

    from summarizer_tpu.models import logistic
    from summarizer_tpu.train.optim import torch_adam
    from summarizer_tpu.train.resume import TrainState, load_state, save_state

    params = logistic.init(jax.random.PRNGKey(0), {"input_size": 32})
    opt = torch_adam(1e-3, 1e-5)
    state = TrainState(
        params=params,
        opt_state=opt.init(params),
        epoch=7,
        rng=jax.random.PRNGKey(3),
        extras={"baselines": np.arange(4.0)},
    )
    path = str(tmp_path / "state.ckpt")
    save_state(path, state)
    template = TrainState(
        params=logistic.init(jax.random.PRNGKey(9), {"input_size": 32}),
        opt_state=opt.init(params),
        rng=jax.random.PRNGKey(0),
        extras={"baselines": np.zeros(4)},
    )
    restored = load_state(path, template)
    assert restored.epoch == 7
    np.testing.assert_array_equal(restored.extras["baselines"], np.arange(4.0))
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["w"]), np.asarray(params["head"]["w"])
    )


def test_resume_retry_past_end_still_evaluates(tmp_path, synth_h5):
    """A --resume retry that lands at/past the final epoch (e.g. the
    benchmark sweep re-running a config after a device crash) must still
    produce a real FoldResult by evaluating the restored params, not the
    (-1, 0, 0) sentinel."""
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path, synth_h5, "logistic", {"input_size": 64},
        epochs=4, test_every_epochs=2, lr=1e-3, resume=True,
        log_dir=str(tmp_path / "stable_logs"),
    )
    first = train(hps)
    hps2, _ = _mk_hps(
        tmp_path, synth_h5, "logistic", {"input_size": 64},
        epochs=4, test_every_epochs=2, lr=1e-3, resume=True,
        log_dir=str(tmp_path / "stable_logs"),
    )
    second = train(hps2)
    assert second[0][1] > -1.0 and second[0][3] > 0.0
    assert abs(second[0][1] - first[0][1]) < 0.2


def test_vasnet_trains_seq_parallel(tmp_path, synth_h5):
    """--seq_parallel 8: full engine run with training activations
    time-sharded over the virtual mesh; finite metrics, t_max divisible."""
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path, synth_h5, "vasnet",
        {"input_size": 64, "local": 8, "pos_embed": None},
        epochs=2, seq_parallel=8,
    )
    results = train(hps)
    _, corr, avg_f1, max_f1 = results[0]
    assert np.isfinite(corr) and 0.0 <= avg_f1 <= max_f1 <= 1.0


def test_vasnet_trains_dp_x_sp(tmp_path, synth_h5):
    """--data_parallel 2 --seq_parallel 4: videos shard over the dp axis and
    each video's time axis over sp, on one (2, 4) mesh; finite metrics and
    the same learning machinery as the 1-D paths."""
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path, synth_h5, "vasnet",
        {"input_size": 64, "local": 8, "pos_embed": None},
        epochs=2, seq_parallel=4, data_parallel=2, batch_size=2,
    )
    results = train(hps)
    _, corr, avg_f1, max_f1 = results[0]
    assert np.isfinite(corr) and 0.0 <= avg_f1 <= max_f1 <= 1.0


def test_seq_parallel_rejects_recurrent_models(tmp_path, synth_h5):
    with pytest.raises(ValueError, match="seq_parallel"):
        _mk_hps(
            tmp_path, synth_h5, "dsn", {"input_size": 64},
            epochs=1, seq_parallel=8,
        )


def test_transformer_trains_pipeline_parallel(tmp_path, synth_h5):
    """--pipeline_parallel 8: full engine run with the encoder stack
    GPipe-staged over the virtual mesh; finite metrics."""
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path, synth_h5, "transformer",
        {"input_size": 64, "encoder_layers": 8, "attention_heads": 4},
        epochs=2, pipeline_parallel=8, batch_size=4,
    )
    results = train(hps)
    _, corr, avg_f1, max_f1 = results[0]
    assert np.isfinite(corr) and 0.0 <= avg_f1 <= max_f1 <= 1.0


def test_pipeline_parallel_rejects_non_transformer(tmp_path, synth_h5):
    with pytest.raises(ValueError, match="pipeline_parallel"):
        _mk_hps(
            tmp_path, synth_h5, "vasnet", {"input_size": 64},
            epochs=1, pipeline_parallel=8,
        )


def _mk_kfold_hps(tmp_path, synth_h5, model, extra, k=3, n_test=2, **over):
    """Equal-size k-fold splits over the 6-video fixture."""
    with h5py.File(synth_h5) as f:
        keys = sorted(f.keys())
    folds = []
    for i in range(k):
        test = [keys[(2 * i) % len(keys)], keys[(2 * i + 1) % len(keys)]][:n_test]
        folds.append(
            {"train_keys": [x for x in keys if x not in test], "test_keys": test}
        )
    sp = str(tmp_path / "synthetic_splits_kfold.json")
    write_splits(folds, sp)
    args = dict(
        model=model, datasets=str(synth_h5), splits_files=sp,
        epochs=6, test_every_epochs=2, log_dir=str(tmp_path / f"logs_{model}_k"),
        tensorboard=False, log_level="warning", extra_params=extra,
    )
    args.update(over)
    return HParameters().load_from_args(args), sp


def test_fold_parallel_matches_sequential(tmp_path, synth_h5):
    """--fold_parallel trains all folds in one vmapped program with the
    sequential path's per-fold seeds; CV metrics must agree up to float
    reassociation of the batched matmuls."""
    from summarizer_tpu.train.loop import train

    hps_seq, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "logistic", {"input_size": 64}, lr=1e-3,
        log_dir=str(tmp_path / "seq_logs"),
    )
    seq = train(hps_seq)
    hps_par, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "logistic", {"input_size": 64}, lr=1e-3,
        fold_parallel=1, log_dir=str(tmp_path / "par_logs"),
    )
    par = train(hps_par)
    assert abs(par[0][1] - seq[0][1]) < 0.02, (par, seq)  # CV corr
    assert abs(par[0][2] - seq[0][2]) < 0.02, (par, seq)  # CV avg F1
    assert abs(par[0][3] - seq[0][3]) < 0.02, (par, seq)  # CV max F1


def test_fused_cv_matches_per_epoch_stacked(tmp_path, synth_h5):
    """--fused 1 (whole CV as ONE XLA dispatch, train/supervised.py::
    make_cv_fused) must reproduce the per-epoch stacked loop exactly: the
    scan body draws the identical key streams and evals on the identical
    epoch % test_every cadence, so metrics agree to float tolerance."""
    from summarizer_tpu.train.loop import train

    hps_loop, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "vasnet", {"input_size": 64}, lr=1e-3,
        fold_parallel=1, fused=0, log_dir=str(tmp_path / "fp_loop_logs"),
    )
    loop = train(hps_loop)
    hps_fused, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "vasnet", {"input_size": 64}, lr=1e-3,
        fold_parallel=1, fused=1, log_dir=str(tmp_path / "fp_fused_logs"),
    )
    fused = train(hps_fused)
    for i in (1, 2, 3):  # CV corr / avg F1 / max F1
        assert abs(fused[0][i] - loop[0][i]) < 5e-4, (fused, loop)


def test_fused_single_fold_matches_per_epoch(tmp_path, synth_h5):
    """Without --fold_parallel, each sequential fold still fuses into one
    dispatch (train/supervised.py::_train_fold_fused) using the sequential
    seed (seed + fold); metrics must match the per-epoch loop."""
    from summarizer_tpu.train.loop import train

    hps_loop, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "vasnet", {"input_size": 64}, lr=1e-3,
        fused=0, log_dir=str(tmp_path / "sf_loop_logs"),
    )
    loop = train(hps_loop)
    hps_fused, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "vasnet", {"input_size": 64}, lr=1e-3,
        fused=1, log_dir=str(tmp_path / "sf_fused_logs"),
    )
    fused = train(hps_fused)
    for i in (1, 2, 3):  # CV corr / avg F1 / max F1
        assert abs(fused[0][i] - loop[0][i]) < 5e-4, (fused, loop)


def test_fused_single_fold_rl_matches_per_epoch(tmp_path, synth_h5):
    """Sequential DSN folds also fuse into one dispatch each
    (train/reinforce.py::_train_fold_fused); metrics must match the
    per-epoch loop (identical keys at one chunk per epoch)."""
    from summarizer_tpu.train.loop import train

    extra = {"input_size": 64, "hidden_size": 16, "num_episodes": 2}
    hps_loop, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "dsn", extra, fused=0,
        log_dir=str(tmp_path / "rlsf_loop_logs"),
    )
    loop = train(hps_loop)
    hps_fused, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "dsn", extra, fused=1,
        log_dir=str(tmp_path / "rlsf_fused_logs"),
    )
    fused = train(hps_fused)
    for i in (1, 2, 3):  # CV corr / avg F1 / max F1
        assert abs(fused[0][i] - loop[0][i]) < 5e-4, (fused, loop)


def test_fused_cv_rl_matches_per_epoch_stacked(tmp_path, synth_h5):
    """The REINFORCE twin (train/reinforce.py::make_cv_fused_rl) must
    reproduce the per-epoch stacked loop: identical key streams (incl. the
    extra chunk-key split) and EMA-baseline threading."""
    from summarizer_tpu.train.loop import train

    extra = {"input_size": 64, "hidden_size": 16, "num_episodes": 2}
    hps_loop, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "dsn", extra, fold_parallel=1, fused=0,
        log_dir=str(tmp_path / "rl_loop_logs"),
    )
    loop = train(hps_loop)
    hps_fused, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "dsn", extra, fold_parallel=1, fused=1,
        log_dir=str(tmp_path / "rl_fused_logs"),
    )
    fused = train(hps_fused)
    for i in (1, 2, 3):  # CV corr / avg F1 / max F1
        assert abs(fused[0][i] - loop[0][i]) < 5e-4, (fused, loop)


def test_fold_parallel_vasnet_runs(tmp_path, synth_h5):
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "vasnet", {"input_size": 64, "local": 16},
        fold_parallel=1,
    )
    results = train(hps)
    _, corr, avg_f1, max_f1 = results[0]
    assert np.isfinite(corr) and 0.0 <= avg_f1 <= max_f1 <= 1.0


def test_fold_parallel_dsn_matches_sequential(tmp_path, synth_h5):
    """The REINFORCE engine's train_folds (stacked params/Adam/EMA-baselines,
    one vmapped program) must reproduce the sequential path's CV metrics:
    the per-fold key streams are identical at one chunk per epoch, so the
    trajectories agree up to float reassociation of the batched matmuls."""
    from summarizer_tpu.train.loop import train

    extra = {"input_size": 64, "hidden_size": 16, "num_episodes": 3}
    hps_seq, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "dsn", dict(extra, scan_chunk=64),
        log_dir=str(tmp_path / "dsn_seq_logs"),
    )
    seq = train(hps_seq)
    hps_par, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "dsn", extra,
        fold_parallel=1, log_dir=str(tmp_path / "dsn_par_logs"),
    )
    par = train(hps_par)
    assert abs(par[0][1] - seq[0][1]) < 0.02, (par, seq)  # CV corr
    assert abs(par[0][2] - seq[0][2]) < 0.02, (par, seq)  # CV avg F1
    assert abs(par[0][3] - seq[0][3]) < 0.02, (par, seq)  # CV max F1


@pytest.mark.parametrize("model,extra", [
    ("logistic", {"input_size": 64}),
    # dsn exercises the extras channel (per-fold EMA baselines).
    ("dsn", {"input_size": 64, "hidden_size": 16, "num_episodes": 2}),
])
def test_fold_parallel_resume_roundtrip(tmp_path, synth_h5, model, extra):
    """--fold_parallel --resume: the stacked train state (params/Adam/rngs
    for all folds in ONE file) checkpoints at test epochs and a retry
    continues instead of restarting — the benchmark sweep's retry-as-resume
    path for fold-parallel families."""
    import glob

    from summarizer_tpu.train.loop import train

    log_dir = str(tmp_path / f"fp_resume_logs_{model}")
    hps1, _ = _mk_kfold_hps(
        tmp_path, synth_h5, model, extra, lr=1e-3,
        fold_parallel=1, resume=True, epochs=2, log_dir=log_dir,
    )
    train(hps1)
    states = glob.glob(os.path.join(log_dir, "*stacked.ckpt"))
    assert states, f"no stacked state written in {log_dir}"

    # Retry at a larger budget: must resume from epoch 2, not restart.
    hps2, _ = _mk_kfold_hps(
        tmp_path, synth_h5, model, extra, lr=1e-3,
        fold_parallel=1, resume=True, epochs=4, log_dir=log_dir,
        log_level="info",
    )
    res = train(hps2)
    assert np.isfinite(res[0][1])
    log_text = open(os.path.join(log_dir, "train.log")).read()
    assert "Resumed stacked folds at epoch 2" in log_text


_GAN_TINY = {
    "input_size": 64,
    "sLSTM_hidden_size": 16,
    "edLSTM_hidden_size": 24,
    "cLSTM_hidden_size": 16,
    "pretrain_vae": 1,
    "batch_size": 2,
}


def test_fold_parallel_sumgan_matches_sequential(tmp_path, synth_h5):
    """--fold_parallel for the ADVERSARIAL engine (train/adversarial.py::
    train_folds): all folds' 3-phase updates (+ the VAE pretrain) run as one
    vmapped program drawing the sequential path's exact per-fold key
    streams; CV metrics must agree up to float reassociation of the
    fold-stacked matmuls."""
    from summarizer_tpu.train.loop import train

    hps_seq, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", dict(_GAN_TINY), epochs=3,
        log_dir=str(tmp_path / "gan_seq_logs"),
    )
    seq = train(hps_seq)
    hps_par, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", dict(_GAN_TINY), epochs=3,
        fold_parallel=1, log_dir=str(tmp_path / "gan_par_logs"),
    )
    par = train(hps_par)
    for i in (1, 2, 3):  # CV corr / avg F1 / max F1
        assert abs(par[0][i] - seq[0][i]) < 0.02, (par, seq)


def test_fold_parallel_sumgan_att_runs(tmp_path, synth_h5):
    from summarizer_tpu.train.loop import train

    extra = {
        "input_size": 64, "cLSTM_hidden_size": 16, "pretrain_ae": 1,
        "batch_size": 2, "s_encoder_layers": 1, "ae_encoder_layers": 1,
        "ae_decoder_layers": 1,
    }
    hps, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan_att", extra, epochs=2, fold_parallel=1,
        log_dir=str(tmp_path / "ganatt_par_logs"), log_level="info",
    )
    res = train(hps)
    assert np.isfinite(res[0][1])
    log_text = open(os.path.join(str(tmp_path / "ganatt_par_logs"), "train.log")).read()
    assert "trained fold-parallel" in log_text


def test_fold_parallel_sumgan_resume_roundtrip(tmp_path, synth_h5):
    """Stacked GAN state (params + 3 masked-Adam chains + rngs, one file)
    checkpoints and resumes — the sweep's retry-as-resume path for
    fold-parallel GANs."""
    import glob

    from summarizer_tpu.train.loop import train

    log_dir = str(tmp_path / "gan_fp_resume_logs")
    hps1, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", dict(_GAN_TINY),
        fold_parallel=1, resume=True, epochs=2, test_every_epochs=1,
        log_dir=log_dir,
    )
    train(hps1)
    states = glob.glob(os.path.join(log_dir, "*stacked.ckpt"))
    assert states, f"no stacked state written in {log_dir}"
    hps2, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", dict(_GAN_TINY),
        fold_parallel=1, resume=True, epochs=4, test_every_epochs=1,
        log_dir=log_dir, log_level="info",
    )
    res = train(hps2)
    assert np.isfinite(res[0][1])
    log_text = open(os.path.join(log_dir, "train.log")).read()
    assert "Resumed stacked folds at epoch 2" in log_text


def test_fold_parallel_sumgan_chunked_matches_sequential(tmp_path, synth_h5):
    """A stacked GAN state over the HBM budget but fitting at a smaller
    fold count runs as padded CHUNKED stacks (train/adversarial.py::
    _fold_parallel_chunk — round 4, lifting round 3's outright refusal for
    the 190M-param SumGAN), not sequential; per-fold CV metrics must still
    match the sequential path.  The tiny GAN is ~0.2 MB params (~0.6 MB
    state/fold); a 1.5e-3 GB budget admits exactly 2 of the 3 folds."""
    from summarizer_tpu.train.loop import train

    hps_seq, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", dict(_GAN_TINY), epochs=3,
        log_dir=str(tmp_path / "gan_chunk_seq_logs"),
    )
    seq = train(hps_seq)
    extra = dict(_GAN_TINY, fold_parallel_hbm_gb=1.5e-3)
    hps_par, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra, epochs=3,
        fold_parallel=1, log_dir=str(tmp_path / "gan_chunk_par_logs"),
        log_level="info",
    )
    par = train(hps_par)
    log_text = open(
        os.path.join(str(tmp_path / "gan_chunk_par_logs"), "train.log")
    ).read()
    assert "chunked stacks of 2" in log_text
    assert "trained fold-parallel" in log_text
    for i in (1, 2, 3):  # CV corr / avg F1 / max F1
        assert abs(par[0][i] - seq[0][i]) < 0.02, (par, seq)


def test_fold_parallel_sumgan_chunked_resume_roundtrip(tmp_path, synth_h5):
    """Chunked stacks checkpoint under per-chunk tagged paths
    (state_*_stacked_f<base>.ckpt) and resume without pytree mismatch."""
    import glob

    from summarizer_tpu.train.loop import train

    log_dir = str(tmp_path / "gan_chunk_resume_logs")
    extra = dict(_GAN_TINY, fold_parallel_hbm_gb=1.5e-3)
    hps1, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra,
        fold_parallel=1, resume=True, epochs=2, test_every_epochs=1,
        log_dir=log_dir,
    )
    train(hps1)
    states = glob.glob(os.path.join(log_dir, "*stacked_f*.ckpt"))
    assert len(states) >= 2, f"expected per-chunk tagged states, got {states}"
    hps2, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra,
        fold_parallel=1, resume=True, epochs=4, test_every_epochs=1,
        log_dir=log_dir, log_level="info",
    )
    res = train(hps2)
    assert np.isfinite(res[0][1])
    log_text = open(os.path.join(log_dir, "train.log")).read()
    assert "Resumed stacked folds at epoch 2" in log_text


def test_fold_parallel_sumgan_int8_chunked_matches_sequential(tmp_path, synth_h5):
    """The sweep's GAN configs stream int8 weights (cli/benchmark.py
    MODEL_CONFIGS); the chunked fold-parallel path must reproduce the
    sequential path's metrics under int8 too (quantization happens at trace
    time inside the vmapped fold axis — both sides quantize identically)."""
    from summarizer_tpu.train.loop import train

    extra = dict(_GAN_TINY, int8=1, remat=0)
    hps_seq, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra, epochs=3,
        log_dir=str(tmp_path / "gan_int8_seq_logs"),
    )
    seq = train(hps_seq)
    extra_p = dict(extra, fold_parallel_hbm_gb=1.5e-3)
    hps_par, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra_p, epochs=3,
        fold_parallel=1, log_dir=str(tmp_path / "gan_int8_par_logs"),
        log_level="info",
    )
    par = train(hps_par)
    log_text = open(
        os.path.join(str(tmp_path / "gan_int8_par_logs"), "train.log")
    ).read()
    assert "chunked stacks of 2" in log_text
    for i in (1, 2, 3):
        assert abs(par[0][i] - seq[0][i]) < 0.02, (par, seq)


def test_gan_bf16_resident_pack(tmp_path, synth_h5):
    """--pack_dtype bfloat16 (the GAN x LOL HBM-headroom knob) stores the
    dataset-resident train pack in bf16 and trains end to end with finite
    metrics; the bf16 cells cast features at the matmuls regardless
    (nn/policy.py), so the pack dtype only changes residency."""
    import jax.numpy as jnp

    from summarizer_tpu.train.loop import train

    extra = dict(_GAN_TINY, pack_dtype="bfloat16", split_phases=1)
    hps, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra, k=1, epochs=2,
        log_dir=str(tmp_path / "gan_bf16_pack_logs"),
    )
    res = train(hps)
    assert np.isfinite(res[0][1]) and res[0][2] > 0
    # The engine's cached pack really is bf16-resident (fresh engine —
    # train() owns and tears down its own).
    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.train.loop import make_engine

    eng = make_engine(hps, SummarizerDataset(str(synth_h5)), "synthetic")
    feats, _, _ = eng._full_train_pack()
    assert feats.dtype == jnp.bfloat16


def test_fold_parallel_gan_hbm_guard_falls_back(tmp_path, synth_h5):
    """A stacked GAN state bigger than the HBM budget must fall back to the
    sequential path (not OOM mid-run)."""
    from summarizer_tpu.train.loop import train

    extra = dict(_GAN_TINY, fold_parallel_hbm_gb=1e-6)
    hps, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra, epochs=2, fold_parallel=1,
        log_dir=str(tmp_path / "gan_guard_logs"), log_level="info",
    )
    res = train(hps)
    assert np.isfinite(res[0][1])
    log_text = open(os.path.join(str(tmp_path / "gan_guard_logs"), "train.log")).read()
    assert "exceeds the" in log_text  # guard fired
    assert "trained fold-parallel" not in log_text


def test_fold_parallel_falls_back_on_unequal_folds(tmp_path, synth_h5):
    """Unequal fold sizes can't stack; train() must silently use the
    sequential path and still return real results."""
    from summarizer_tpu.train.loop import train

    with h5py.File(synth_h5) as f:
        keys = sorted(f.keys())
    sp = str(tmp_path / "synthetic_splits_uneven.json")
    write_splits(
        [
            {"train_keys": keys[:4], "test_keys": keys[4:]},
            {"train_keys": keys[:3], "test_keys": keys[3:]},
        ],
        sp,
    )
    hps = HParameters().load_from_args(
        dict(
            model="logistic", datasets=str(synth_h5), splits_files=sp,
            epochs=2, test_every_epochs=2, fold_parallel=1,
            log_dir=str(tmp_path / "logs_uneven"), tensorboard=False,
            log_level="warning", extra_params={"input_size": 64},
        )
    )
    results = train(hps)
    assert np.isfinite(results[0][1])


def test_dsn_trains_data_parallel(tmp_path, synth_h5):
    """--data_parallel 8 --batch-size 8 on the REINFORCE engine: video
    groups shard over the dp mesh (episodes/rewards compute per device,
    grads psum); finite metrics, per-video EMA baselines still update."""
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path, synth_h5, "dsn", {"input_size": 64, "hidden_size": 8},
        epochs=2, data_parallel=2, batch_size=2,
    )
    results = train(hps)
    _, corr, avg_f1, max_f1 = results[0]
    assert np.isfinite(corr) and 0.0 <= avg_f1 <= max_f1 <= 1.0


def test_transformer_moe_trains_expert_parallel(tmp_path, synth_h5):
    """--expert_parallel 8: full engine run with the MoE expert banks
    sharded over the virtual mesh and the router aux in the loss."""
    from summarizer_tpu.train.loop import train

    hps, _ = _mk_hps(
        tmp_path, synth_h5, "transformer_moe",
        {"input_size": 64, "encoder_layers": 2, "attention_heads": 4,
         "n_experts": 8, "top_k": 2},
        epochs=2, expert_parallel=8,
    )
    results = train(hps)
    _, corr, avg_f1, max_f1 = results[0]
    assert np.isfinite(corr) and 0.0 <= avg_f1 <= max_f1 <= 1.0


def test_expert_parallel_rejects_dense_models(tmp_path, synth_h5):
    with pytest.raises(ValueError, match="expert_parallel"):
        _mk_hps(
            tmp_path, synth_h5, "transformer", {"input_size": 64},
            epochs=1, expert_parallel=8,
        )


def test_shared_train_view_uploads_once(tmp_path, synth_h5):
    """The sequential fold paths gather from ONE dataset-wide device pack
    (engine._full_train_pack) instead of re-packing per fold: a k-fold run
    must call pack_train exactly once, and the fold's global slots must map
    back to its train keys in order."""
    from unittest import mock

    from summarizer_tpu.data import batching
    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.train.loop import make_engine

    hps, sp = _mk_kfold_hps(
        tmp_path, synth_h5, "logistic", {"input_size": 64}, fused=0,
        log_dir=str(tmp_path / "shared_view_logs"),
    )
    dataset = SummarizerDataset(hps.dataset_of_file[sp])
    engine = make_engine(hps, dataset, hps.dataset_name_of_file[sp])
    all_keys = list(dataset.videos.keys())

    with mock.patch.object(
        batching, "pack_train", wraps=batching.pack_train
    ) as spy:
        for split in hps.splits_of_file[sp]:
            feats, targets, mask, slots = engine._shared_train_view(
                list(split["train_keys"])
            )
            assert feats.shape[0] == len(all_keys)
            assert [all_keys[i] for i in slots] == list(split["train_keys"])
        assert spy.call_count == 1  # one upload for ALL folds


def test_bucketed_perm_properties():
    """GAN epoch ordering over the shared pack: the permutation must cover
    the fold's global slots exactly once, and with bucketing enabled the
    128-step length-bucket ids must be non-decreasing along the order
    (groups cut from it are length-homogeneous)."""
    import jax
    import numpy as np

    from summarizer_tpu.train.adversarial import bucketed_perm

    rng = np.random.RandomState(0)
    n_all, n = 20, 12
    slots = np.sort(rng.choice(n_all, n, replace=False)).astype(np.int32)
    lengths = rng.randint(64, 1024, size=n_all)
    key = jax.random.PRNGKey(3)

    plain = bucketed_perm(slots, lengths, key, n, bucketed=False)
    assert sorted(plain.tolist()) == sorted(slots.tolist())

    bucketed = bucketed_perm(slots, lengths, key, n, bucketed=True)
    assert sorted(bucketed.tolist()) == sorted(slots.tolist())
    ids = (lengths[bucketed] + 127) // 128
    assert (np.diff(ids) >= 0).all(), ids
    # Stable sort: within a bucket, the shuffled relative order is kept.
    for b in np.unique(ids):
        sub = bucketed[ids == b]
        pos = {int(v): i for i, v in enumerate(plain)}
        assert [pos[int(v)] for v in sub] == sorted(pos[int(v)] for v in sub)


def test_gan_resume_bit_matches_uninterrupted(tmp_path, synth_h5):
    """Strict-parity resume (VERDICT r2 item 8): a SumGAN fold-parallel run
    interrupted at epoch 2 and resumed to epoch 3 must leave a final train
    state — params AND all 3 masked-Adam chains AND the rng chain —
    bit-identical to an uninterrupted 3-epoch run.  Saves go through the
    sharded full-state writer (resume_shard_mb=0 forces it at tiny sizes)."""
    import glob

    import flax.serialization

    import jax

    from summarizer_tpu.train.loop import train

    extra = dict(_GAN_TINY, resume_shard_mb=0)

    def final_state_leaves(log_dir):
        paths = glob.glob(os.path.join(log_dir, "*stacked.ckpt"))
        assert len(paths) == 1, paths
        import json

        manifest = json.loads(open(paths[0], "rb").read())
        assert manifest["magic"] == "summarizer_tpu.sharded_state"
        assert manifest["n_opt"] == 3  # the 3 masked-Adam chains
        leaves = []
        for name in sorted(manifest["parts"]):
            with open(paths[0] + ".d/" + manifest["parts"][name], "rb") as f:
                raw = flax.serialization.msgpack_restore(f.read())
            leaves.extend(jax.tree_util.tree_flatten_with_path(raw)[0])
        return manifest["epoch"], leaves

    dir_a = str(tmp_path / "gan_bitmatch_uninterrupted")
    hps_a, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra, fold_parallel=1, resume=True,
        epochs=3, test_every_epochs=1, log_dir=dir_a,
    )
    train(hps_a)

    dir_b = str(tmp_path / "gan_bitmatch_resumed")
    hps_b1, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra, fold_parallel=1, resume=True,
        epochs=2, test_every_epochs=1, log_dir=dir_b,
    )
    train(hps_b1)
    hps_b2, _ = _mk_kfold_hps(
        tmp_path, synth_h5, "sumgan", extra, fold_parallel=1, resume=True,
        epochs=3, test_every_epochs=1, log_dir=dir_b, log_level="info",
    )
    train(hps_b2)
    log_text = open(os.path.join(dir_b, "train.log")).read()
    assert "Resumed stacked folds at epoch 2" in log_text

    ep_a, leaves_a = final_state_leaves(dir_a)
    ep_b, leaves_b = final_state_leaves(dir_b)
    assert ep_a == ep_b == 3
    assert len(leaves_a) == len(leaves_b)
    for (ka, va), (kb, vb) in zip(leaves_a, leaves_b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(ka))
