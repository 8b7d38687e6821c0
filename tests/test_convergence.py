"""Convergence assertions for every engine (VERDICT r1 item 5).

The reference's own sanity protocol is the overfit split — train==test, and
a working model must drive test metrics up (summarizer/utils/config.py:106-113).
Round 1 asserted only finiteness for 4 of 5 families; these tests make a
sign-flipped loss/reward fail the suite:

  - VASNet / SumGAN(sup) / SumGAN-att(sup): test correlation must exceed a
    threshold after a small fixed budget (the synthetic data plants a linear
    signal, so attention/selector scorers learn it quickly at raised lr).
  - DSN: the REINFORCE diversity+representativeness reward must increase
    over training (late-epoch mean > early-epoch mean).

Also: the split-phase adversarial path (large video groups) must produce
bit-compatible results with the fused-scan path — same key derivation, same
group gather, three jitted programs instead of one.
"""

import os

import h5py
import numpy as np
import pytest

from summarizer_tpu.data.hdf5 import SummarizerDataset
from summarizer_tpu.data.splits import write_splits
from summarizer_tpu.train.loop import make_engine, train
from summarizer_tpu.utils.config import HParameters


@pytest.fixture()
def overfit_env(tmp_path, synth_h5):
    with h5py.File(synth_h5) as f:
        keys = list(f.keys())
    sp = str(tmp_path / "synthetic_splits_overfit.json")
    write_splits([{"train_keys": keys, "test_keys": keys}], sp)
    return synth_h5, sp


def _hps(tmp_path, h5, sp, model, extra, **over):
    args = dict(
        model=model,
        datasets=str(h5),
        splits_files=sp,
        epochs=10,
        test_every_epochs=2,
        log_dir=str(tmp_path / f"logs_{model}_{np.random.randint(1 << 30)}"),
        tensorboard=False,
        log_level="error",
        extra_params=extra,
    )
    args.update(over)
    return HParameters().load_from_args(args)


def test_vasnet_overfits(tmp_path, overfit_env):
    h5, sp = overfit_env
    hps = _hps(tmp_path, h5, sp, "vasnet", {"input_size": 64}, epochs=15, lr=1e-3)
    results = train(hps)
    corr = results[0][1]
    assert corr > 0.25, f"vasnet failed to learn on overfit split: corr={corr}"


def test_dsn_reward_increases(tmp_path, overfit_env):
    h5, sp = overfit_env
    hps = _hps(
        tmp_path, h5, sp, "dsn",
        {"input_size": 64, "num_episodes": 4}, epochs=8, lr=1e-4,
    )
    sf = hps.splits_files[0]
    dataset = SummarizerDataset(hps.dataset_of_file[sf])
    engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
    with engine.compute_policy():
        engine.train_fold(0, hps.splits_of_file[sf][0])
    rh = engine.reward_history
    assert len(rh) == 8
    early, late = np.mean(rh[:3]), np.mean(rh[-3:])
    assert late > early, f"REINFORCE reward did not increase: {rh}"


def test_sumgan_sup_learns(tmp_path, overfit_env):
    h5, sp = overfit_env
    hps = _hps(
        tmp_path, h5, sp, "sumgan",
        {
            "input_size": 64, "sLSTM_hidden_size": 16,
            "edLSTM_hidden_size": 24, "cLSTM_hidden_size": 16,
            "pretrain_vae": 1, "sup": 1,
        },
        epochs=10, lr=1e-3,
    )
    results = train(hps)
    corr = results[0][1]
    assert corr > 0.15, f"sumgan(sup) failed to learn: corr={corr}"


def test_sumgan_att_learns(tmp_path, overfit_env):
    h5, sp = overfit_env
    hps = _hps(
        tmp_path, h5, sp, "sumgan_att",
        {
            "input_size": 64, "cLSTM_hidden_size": 16, "pretrain_ae": 2,
            "s_encoder_layers": 1, "ae_encoder_layers": 1,
        },
        epochs=8, lr=5e-4,
    )
    results = train(hps)
    corr = results[0][1]
    assert corr > 0.12, f"sumgan_att failed to learn: corr={corr}"


def test_sumgan_split_phases_matches_fused(tmp_path, overfit_env):
    """The large-group split-phase epoch must reproduce the fused scan's
    numbers: identical key derivation and update order."""
    import jax

    h5, sp = overfit_env
    extra = {
        "input_size": 64, "sLSTM_hidden_size": 16,
        "edLSTM_hidden_size": 24, "cLSTM_hidden_size": 16,
        "pretrain_vae": 0, "batch_size": 2,
    }

    def run(split_phases):
        hps = _hps(
            tmp_path, h5, sp, "sumgan",
            {**extra, "split_phases": split_phases},
            epochs=1, test_every_epochs=1,
        )
        sf = hps.splits_files[0]
        dataset = SummarizerDataset(hps.dataset_of_file[sf])
        engine = make_engine(hps, dataset, hps.dataset_name_of_file[sf])
        res = engine.train_fold(0, hps.splits_of_file[sf][0])
        return res

    r_fused = run(0)
    r_split = run(1)
    leaves_f = jax.tree.leaves(r_fused.best_params)
    leaves_s = jax.tree.leaves(r_split.best_params)
    for a, b in zip(leaves_f, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert abs(r_fused.best_corr - r_split.best_corr) < 1e-6
