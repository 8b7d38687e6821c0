"""Data layer: packing, schema round-trip, split generation."""

import numpy as np
import pytest

from summarizer_tpu.data.batching import eval_static_dims, pack_eval, pack_train, round_up
from summarizer_tpu.data.hdf5 import SummarizerDataset
from summarizer_tpu.data.splits import make_random_splits


def test_round_up():
    assert round_up(1, 8) == 8
    assert round_up(8, 8) == 8
    assert round_up(9, 8) == 16


def test_pack_train_masks_and_targets(synth_records):
    pack = pack_train(synth_records)
    n = len(synth_records)
    assert pack.features.shape[0] == n
    for i, r in enumerate(synth_records):
        t = r.n_steps
        assert pack.lengths[i] == t
        np.testing.assert_array_equal(pack.mask[i, :t], 1.0)
        np.testing.assert_array_equal(pack.mask[i, t:], 0.0)
        np.testing.assert_array_equal(pack.features[i, t:], 0.0)
        # per-video min-max normalized targets (logistic.py:74-76 semantics)
        tgt = pack.targets[i, :t]
        assert abs(tgt.min()) < 1e-6 and abs(tgt.max() - 1.0) < 1e-6


def test_pack_train_rejects_oversized():
    import dataclasses

    from summarizer_tpu.data.hdf5 import VideoRecord

    r = VideoRecord(
        key="v", features=np.zeros((10, 4), np.float32), gtscore=np.arange(10.0),
        n_frames=100, n_steps=10, picks=np.arange(10, dtype=np.int32),
        change_points=np.zeros((1, 2), np.int32), n_frame_per_seg=np.array([100]),
    )
    with pytest.raises(ValueError):
        pack_train([r], t_max=8)


def test_pack_eval_contents(synth_records):
    s, g, u, f, cap = eval_static_dims(synth_records, 0.15)
    batch, feats = pack_eval(synth_records, s, g, u, f)
    for i, r in enumerate(synth_records):
        assert batch.n_steps[i] == r.n_steps
        assert batch.n_frames[i] == r.n_frames
        assert batch.n_segs[i] == len(r.n_frame_per_seg)
        assert batch.n_users[i] == r.user_scores.shape[0]
        np.testing.assert_array_equal(
            batch.positions[i, : r.n_steps], r.picks
        )
        np.testing.assert_array_equal(
            batch.nfps[i, : len(r.n_frame_per_seg)], r.n_frame_per_seg
        )
    assert cap >= int(0.15 * max(r.n_frames for r in synth_records)) - 1


def test_dataset_roundtrip(synth_h5):
    ds = SummarizerDataset(str(synth_h5))
    assert len(ds) == 6
    keys = ds.keys()
    r = ds[keys[0]]
    assert r.features.shape[0] == r.n_steps
    assert r.user_scores.shape[1] == r.n_frames
    # subset preserves order and errors on unknown keys
    sub = ds.subset(keys[:3])
    assert [v.key for v in sub] == keys[:3]
    with pytest.raises(KeyError):
        ds.subset(["nope"])


def test_make_random_splits_disjoint():
    keys = [f"video_{i}" for i in range(10)]
    splits = make_random_splits(keys, num_splits=4, train_percent=0.8, seed=1)
    assert len(splits) == 4
    for s in splits:
        assert len(s["train_keys"]) == 8
        assert len(s["test_keys"]) == 2
        assert not set(s["train_keys"]) & set(s["test_keys"])
