"""Every engine must LEARN, not merely run (VERDICT round-1 item 5).

Mirrors the reference's overfit-split sanity protocol
(summarizer/utils/config.py:106-113: train_keys == test_keys): each family
trains on a tiny overfit split and the test asserts a direction-of-learning
signal that a sign-flipped loss/reward would break:

- vasnet / transformer: held-out==train correlation rises well above chance;
- dsn: the diversity+representativeness REINFORCE reward improves over epochs
  (reference reward: summarizer/models/dsn.py:208-231);
- sumgan: the selector/encoder and discriminator losses fall AND the
  discriminator separates real from generated (D(x) > D(x_hat)) under the
  label-smoothed BCE phases (sumgan.py:308-318);
- sumgan_att: the selector's Wasserstein+supervised loss falls and the
  supervised BCE (sup defaults True, sumgan_att.py:155) lifts correlation
  well above chance.
"""

import h5py
import numpy as np

from summarizer_tpu.data.hdf5 import SummarizerDataset
from summarizer_tpu.data.splits import write_splits
from summarizer_tpu.train.loop import make_engine
from summarizer_tpu.utils.config import HParameters


def _run_overfit(tmp_path, synth_h5, model, extra, **over):
    """Train fold 0 of an overfit split; return (engine, FoldResult)."""
    with h5py.File(synth_h5) as f:
        keys = list(f.keys())
    sp = str(tmp_path / "synthetic_splits_overfit.json")
    write_splits([{"train_keys": keys, "test_keys": keys}], sp)
    args = dict(
        model=model,
        datasets=str(synth_h5),
        splits_files=sp,
        test_every_epochs=2,
        log_dir=str(tmp_path / f"logs_{model}"),
        tensorboard=False,
        log_level="warning",
        extra_params=extra,
    )
    args.update(over)
    hps = HParameters().load_from_args(args)
    sf = hps.splits_files[0]
    dataset = SummarizerDataset(hps.dataset_of_file[sf])
    engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
    with engine.compute_policy():
        res = engine.train_fold(0, hps.splits_of_file[sf][0])
    return engine, res


def test_vasnet_overfits(tmp_path, synth_h5):
    _, res = _run_overfit(
        tmp_path, synth_h5, "vasnet", {"input_size": 64}, epochs=20, lr=1e-3
    )
    assert res.best_corr > 0.3, f"vasnet failed to overfit: corr={res.best_corr}"


def test_dsn_reward_improves(tmp_path, synth_h5):
    engine, res = _run_overfit(
        tmp_path,
        synth_h5,
        "dsn",
        {"input_size": 64, "hidden_size": 32, "num_episodes": 4},
        epochs=12,
        lr=1e-3,
    )
    hist = engine.reward_history
    assert len(hist) == 12
    early, late = hist[0], float(np.mean(hist[-3:]))
    assert late > early, f"reward did not improve: {early:.4f} -> {late:.4f}"
    assert np.isfinite(res.best_corr)


def test_sumgan_learns(tmp_path, synth_h5):
    engine, _ = _run_overfit(
        tmp_path,
        synth_h5,
        "sumgan",
        {
            "input_size": 64,
            "sLSTM_hidden_size": 16,
            "edLSTM_hidden_size": 24,
            "cLSTM_hidden_size": 16,
            "pretrain_vae": 2,
        },
        epochs=8,
    )
    # Selector+encoder loss (recon-in-hidden + KL prior + sparsity + G term,
    # sumgan.py:292-318) and the discriminator's BCE must both fall, and the
    # discriminator must score real above generated — each breaks under a
    # sign flip in the corresponding loss.
    lse = engine.history[("Train", "Lse")]
    assert lse[-1] < lse[0], f"selector/encoder loss did not fall: {lse[0]} -> {lse[-1]}"
    lc = engine.history[("Train", "Lc")]
    assert lc[-1] < lc[0], f"discriminator loss did not fall: {lc[0]} -> {lc[-1]}"
    d_real = engine.history[("Train", "D_x")][-1]
    d_fake = engine.history[("Train", "D_x_hat")][-1]
    assert d_real > d_fake, (
        f"discriminator failed to separate real/fake: D(x)={d_real:.4f} "
        f"<= D(x_hat)={d_fake:.4f}"
    )


def test_sumgan_att_learns(tmp_path, synth_h5):
    engine, res = _run_overfit(
        tmp_path,
        synth_h5,
        "sumgan_att",
        {"input_size": 64, "cLSTM_hidden_size": 16, "pretrain_ae": 3},
        epochs=10,
        lr=2e-4,
    )
    # Selector loss (Wasserstein G term + supervised BCE — sup defaults True,
    # sumgan_att.py:155) must fall, and the BCE must pull train==test
    # correlation well above chance.
    lse = engine.history[("Train", "Lse")]
    assert lse[-1] < lse[0], f"selector loss did not fall: {lse[0]} -> {lse[-1]}"
    assert res.best_corr > 0.1, f"sumgan_att failed to learn: corr={res.best_corr}"


def test_sumgan_split_phases_matches_fused(tmp_path, synth_h5):
    """The large-group split-phase epoch must reproduce the fused scan's
    numbers: identical key derivation and update order."""
    import jax

    extra = {
        "input_size": 64,
        "sLSTM_hidden_size": 16,
        "edLSTM_hidden_size": 24,
        "cLSTM_hidden_size": 16,
        "pretrain_vae": 0,
        "batch_size": 2,
    }

    def run(split_phases):
        return _run_overfit(
            tmp_path,
            synth_h5,
            "sumgan",
            {**extra, "split_phases": split_phases},
            epochs=1,
            test_every_epochs=1,
            log_dir=str(tmp_path / f"logs_split{split_phases}"),
        )[1]

    r_fused = run(0)
    r_split = run(1)
    leaves_f = jax.tree.leaves(r_fused.best_params)
    leaves_s = jax.tree.leaves(r_split.best_params)
    for a, b in zip(leaves_f, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert abs(r_fused.best_corr - r_split.best_corr) < 1e-6
