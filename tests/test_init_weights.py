"""--init-weights: warm-start training from a checkpoint (the fine-tuning
half of checkpoint migration — an imported reference .pth trains on here
instead of from scratch)."""

import h5py
import numpy as np

import jax

from summarizer_tpu.data.splits import write_splits
from summarizer_tpu.models import get_model
from summarizer_tpu.train.checkpoint import save_params
from summarizer_tpu.utils.config import HParameters
from summarizer_tpu.utils.torch_import import export_state_dict, import_state_dict


def _hps(tmp_path, synth_h5, **over):
    with h5py.File(synth_h5) as f:
        keys = list(f.keys())
    sp = str(tmp_path / "synthetic_splits.json")
    write_splits([{"train_keys": keys, "test_keys": keys}], sp)
    args = dict(
        model="vasnet",
        datasets=str(synth_h5),
        splits_files=sp,
        epochs=1,
        test_every_epochs=1,
        log_dir=str(tmp_path / "logs"),
        tensorboard=False,
        log_level="warning",
        extra_params={"input_size": 64},
    )
    args.update(over)
    return HParameters().load_from_args(args)


def test_init_params_loads_checkpoint(tmp_path, synth_h5):
    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.train.loop import make_engine

    # Source checkpoint via the migration path: params -> reference-keyed
    # state_dict -> import (what a real .pth lands as).
    src = get_model("vasnet").module.init(jax.random.PRNGKey(11), {"input_size": 64})
    imported = import_state_dict("vasnet", export_state_dict("vasnet", src))
    ckpt = str(tmp_path / "warm.ckpt")
    save_params(ckpt, imported)

    hps = _hps(tmp_path, synth_h5, init_weights=ckpt)
    engine = make_engine(hps, SummarizerDataset(str(synth_h5)), "synth")
    # Two different fold seeds must both start from the checkpoint.
    for seed in (0, 7):
        params = engine.init_params(jax.random.PRNGKey(seed))
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(src)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_warm_started(tmp_path, synth_h5):
    from summarizer_tpu.train.loop import train

    src = get_model("vasnet").module.init(jax.random.PRNGKey(1), {"input_size": 64})
    ckpt = str(tmp_path / "warm.ckpt")
    save_params(ckpt, src)
    hps = _hps(tmp_path, synth_h5, init_weights=ckpt)
    results = train(hps)
    _, corr, avg_f1, max_f1 = results[0]
    assert np.isfinite(corr) and 0.0 <= avg_f1 <= max_f1 <= 1.0
