"""Device rank stats vs the scipy oracles the reference uses."""

import jax.numpy as jnp
import numpy as np
from scipy import stats

from summarizer_tpu.native import load_native
from summarizer_tpu.ops.ranking import rankdata_masked, spearman_masked


def test_rankdata_masked_vs_scipy():
    rng = np.random.RandomState(0)
    for _ in range(30):
        n = rng.randint(2, 50)
        x = np.round(rng.rand(n) * 5) / 5  # ties guaranteed
        pad = n + rng.randint(0, 10)
        xp = np.zeros(pad, np.float32)
        xp[:n] = x
        mask = np.arange(pad) < n
        got = np.asarray(rankdata_masked(jnp.array(xp), jnp.array(mask)))[:n]
        np.testing.assert_allclose(got, stats.rankdata(x), rtol=1e-6)


def test_native_rankdata_vs_scipy():
    nat = load_native()
    rng = np.random.RandomState(1)
    for _ in range(20):
        x = np.round(rng.rand(rng.randint(2, 200)) * 8) / 8
        np.testing.assert_allclose(nat.rankdata(x), stats.rankdata(x))


def test_spearman_matches_reference_composition():
    """The reference computes spearmanr(rankdata(-x), rankdata(-y))
    (summarizer/utils/eval.py:62-63); verify our direct rho equals that."""
    rng = np.random.RandomState(2)
    for _ in range(30):
        n = rng.randint(3, 80)
        x = np.round(rng.rand(n) * 6) / 6
        y = np.round(rng.rand(n) * 6) / 6
        want = stats.spearmanr(stats.rankdata(-x), stats.rankdata(-y))[0]
        pad = n + 5
        xp, yp = np.zeros(pad, np.float32), np.zeros(pad, np.float32)
        xp[:n], yp[:n] = x, y
        mask = np.arange(pad) < n
        got = float(spearman_masked(jnp.array(xp), jnp.array(yp), jnp.array(mask)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_spearman_nan_on_constant_input():
    x = jnp.ones(10)
    y = jnp.arange(10.0)
    mask = jnp.ones(10, bool)
    assert np.isnan(float(spearman_masked(x, y, mask)))


def test_kendall_matches_reference_composition():
    """Reference host path: kendalltau(rankdata(-x), rankdata(-y))
    (summarizer/utils/eval.py:60-63); our direct tau-b must equal it,
    including under ties, masking, and block-boundary padding."""
    from summarizer_tpu.ops.ranking import kendall_masked

    rng = np.random.RandomState(3)
    for trial in range(20):
        n = rng.randint(3, 700)  # spans multiple 512-blocks
        x = np.round(rng.rand(n) * 6) / 6
        y = np.round(rng.rand(n) * 6) / 6
        want = stats.kendalltau(stats.rankdata(-x), stats.rankdata(-y))[0]
        pad = n + rng.randint(0, 7)
        xp, yp = np.zeros(pad, np.float32), np.zeros(pad, np.float32)
        xp[:n], yp[:n] = x, y
        mask = np.arange(pad) < n
        got = float(kendall_masked(jnp.array(xp), jnp.array(yp), jnp.array(mask)))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_kendall_nan_on_constant_input():
    from summarizer_tpu.ops.ranking import kendall_masked

    x = jnp.ones(10)
    y = jnp.asarray(np.random.RandomState(0).rand(10).astype(np.float32))
    mask = jnp.ones(10, bool)
    assert np.isnan(float(kendall_masked(x, y, mask)))
