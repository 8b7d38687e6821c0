"""KTS change-point detection: device DP vs numpy oracle vs ground truth."""

import numpy as np

from summarizer_tpu.ops.kts import kts_oracle, kts_segment


def _three_cluster_video(t1=20, t2=30, t3=25, d=16, seed=0):
    rng = np.random.RandomState(seed)
    cs = rng.randn(3, d) * 4
    x = np.concatenate(
        [cs[i] + rng.randn(t, d) * 0.3 for i, t in enumerate((t1, t2, t3))]
    ).astype(np.float32)
    return x, [t1, t1 + t2, t1 + t2 + t3]


def test_device_matches_oracle_fixed_m():
    x, _ = _three_cluster_video()
    got = kts_segment(x, max_segments=4, penalty=0)
    want = kts_oracle(x, 4)
    np.testing.assert_array_equal(got, want)


def test_recovers_true_boundaries():
    x, bounds = _three_cluster_video()
    cps = kts_segment(x, max_segments=3, penalty=0)
    # segments are [start, end] inclusive; ends+1 are the boundaries
    ends = (cps[:, 1] + 1).tolist()
    assert ends[-1] == len(x)
    for true_b in bounds[:-1]:
        assert min(abs(e - true_b) for e in ends) <= 1, (ends, bounds)


def test_penalized_model_selection_reasonable():
    x, bounds = _three_cluster_video()
    cps = kts_segment(x, max_segments=10, penalty=1.0)
    # should find roughly 3 segments, not the max
    assert 2 <= len(cps) <= 5
    assert cps[0, 0] == 0 and cps[-1, 1] == len(x) - 1
    # contiguity
    for a, b in zip(cps[:-1, 1], cps[1:, 0]):
        assert b == a + 1
