"""Serving API: checkpoint round-trip, bucketed scoring, summary assembly."""

import jax
import numpy as np

from summarizer_tpu.serve import Scorer, _bucket
from summarizer_tpu.train.checkpoint import save_params
from summarizer_tpu.models import logistic


def test_bucketing():
    assert _bucket(1) == 128
    assert _bucket(128) == 128
    assert _bucket(129) == 256
    assert _bucket(1000) == 1024


def test_scorer_end_to_end(tmp_path, synth_records):
    hp = {"input_size": 64}
    params = logistic.init(jax.random.PRNGKey(0), hp)
    path = str(tmp_path / "w.ckpt")
    save_params(path, params)

    scorer = Scorer.from_checkpoint("logistic", path, hp)
    feats = [r.features for r in synth_records]
    scores = scorer.score(feats)
    assert len(scores) == len(feats)
    for s, f in zip(scores, feats):
        assert s.shape == (f.shape[0],)
        assert np.all((s >= 0) & (s <= 1))

    # bucketed program reuse: same bucket -> one compiled fn
    n_fns = len(scorer._fns)
    scorer.score(feats)
    assert len(scorer._fns) == n_fns

    r = synth_records[0]
    result = scorer.summarize(
        r.features, r.n_frames, r.picks, r.change_points, r.n_frame_per_seg
    )
    assert result.machine_summary.shape[0] == int(np.sum(r.n_frame_per_seg))
    assert result.machine_scores.shape[0] == r.n_frames
    kept = result.machine_summary.sum()
    assert 0 < kept <= int(r.n_frames * 0.15) + max(r.n_frame_per_seg)


def test_scorer_sequence_parallel_matches_single_device():
    """sp=8 serving equals single-device serving; short-aperture buckets
    shard, an aperture larger than the slab falls back gracefully."""
    from summarizer_tpu.models import vasnet

    hp = {"input_size": 64, "local": 16, "pos_embed": None, "flash": 1}
    params = vasnet.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(0)
    feats = [rng.randn(t, 64).astype(np.float32) for t in (200, 130)]

    ref = Scorer("vasnet", params, hp).score(feats)
    sp = Scorer("vasnet", params, hp, sp=8)
    got = sp.score(feats)
    assert sp._sp_apply(256) is not None
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, atol=2e-5)

    # aperture 40 > 256/8: this bucket must refuse to shard
    wide = Scorer("vasnet", params, {**hp, "local": 40}, sp=8)
    assert wide._sp_apply(256) is None
