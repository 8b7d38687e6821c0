"""Device eval pipeline == host numpy oracle on schema-complete videos."""

import jax
import numpy as np

from summarizer_tpu.data.batching import eval_static_dims, pack_eval
from summarizer_tpu.ops import eval_np
from summarizer_tpu.ops.eval_jax import evaluate_batch, upsample_step
import jax.numpy as jnp


def host_eval(records, scores, proportion, method):
    corrs, af1s, mf1s = [], [], []
    for r, probs in zip(records, scores):
        ms = eval_np.generate_scores(probs, r.n_frames, r.picks)
        corrs.append(eval_np.evaluate_scores(ms, r.user_scores))
        summ = eval_np.generate_summary(
            probs, r.change_points, r.n_frames, r.n_frame_per_seg, r.picks, proportion, method
        )
        a, m = eval_np.evaluate_summary(summ, r.user_summary)
        af1s.append(a)
        mf1s.append(m)
    return np.array(corrs), np.array(af1s), np.array(mf1s)


def _run(records, method):
    rng = np.random.RandomState(11)
    scores = [rng.rand(r.n_steps).astype(np.float32) for r in records]
    prop = 0.15
    s, g, u, f, cap = eval_static_dims(records, prop)
    batch, _ = pack_eval(records, s, g, u, f)
    padded = np.zeros((len(records), s), np.float32)
    for i, sc in enumerate(scores):
        padded[i, : len(sc)] = sc
    corr_d, af1_d, mf1_d = jax.device_get(
        evaluate_batch(
            jnp.array(padded),
            jax.tree.map(jnp.asarray, batch),
            proportion=prop,
            method=method,
            max_capacity=cap,
            out_frames=f,
        )
    )
    corr_h, af1_h, mf1_h = host_eval(records, scores, prop, method)
    np.testing.assert_allclose(corr_d, corr_h, atol=2e-4)
    np.testing.assert_allclose(af1_d, af1_h, atol=2e-4)
    np.testing.assert_allclose(mf1_d, mf1_h, atol=2e-4)


def test_device_eval_matches_oracle_knapsack(synth_records):
    _run(synth_records, "knapsack")


def test_device_eval_asymmetric_user_counts(synth_records):
    """Real SumMe pairs MANY /user_summary annotators with ONE /user_scores
    pseudo-user (datasets/README.md:54-74); F1 must average over the summary
    annotators, not the score users.  Regression for the egress-rehearsal
    finding: the device eval used n_users (score users) to mask both."""
    records = []
    for r in synth_records:
        records.append(
            r._replace(user_scores=r.user_scores[:1])
            if hasattr(r, "_replace")
            else r
        )
    if not hasattr(synth_records[0], "_replace"):
        import dataclasses

        records = [
            dataclasses.replace(r, user_scores=r.user_scores[:1])
            for r in synth_records
        ]
    assert records[0].user_scores.shape[0] == 1
    assert records[0].user_summary.shape[0] > 1
    _run(records, "knapsack")


def test_device_eval_matches_oracle_rank(synth_records):
    _run(synth_records, "rank")


def test_upsample_step_matches_oracle(synth_records):
    rng = np.random.RandomState(5)
    for r in synth_records:
        sc = rng.rand(r.n_steps).astype(np.float32)
        want = eval_np.upsample(sc, r.n_frames, r.picks)
        pad_s = r.n_steps + 7
        sp = np.zeros(pad_s, np.float32)
        sp[: r.n_steps] = sc
        pp = np.zeros(pad_s, np.int32)
        pp[: r.n_steps] = r.picks
        got = np.asarray(
            upsample_step(
                jnp.array(sp), jnp.array(pp), jnp.int32(r.n_steps), jnp.int32(r.n_frames), r.n_frames + 13
            )
        )
        np.testing.assert_allclose(got[: r.n_frames], want, rtol=1e-6)
        assert not got[r.n_frames :].any()


def test_upsample_oracle_edge_cases():
    # terminal boundary appended when positions[-1] != n_frames
    out = eval_np.upsample(np.array([1.0, 2.0]), 7, np.array([0, 3]))
    np.testing.assert_array_equal(out, [1, 1, 1, 2, 2, 2, 2])
    # positions already ending at n_frames: last score unused
    out = eval_np.upsample(np.array([1.0, 2.0]), 4, np.array([0, 2, 4]))
    np.testing.assert_array_equal(out, [1, 1, 2, 2])
    # frames before positions[0] stay zero
    out = eval_np.upsample(np.array([5.0]), 4, np.array([2]))
    np.testing.assert_array_equal(out, [0, 0, 5, 5])


def test_evaluate_summary_oracle_basics():
    machine = np.array([1, 1, 0, 0, 1])
    users = np.array([[1, 0, 0, 0, 1], [0, 0, 1, 1, 0]])
    avg, mx = eval_np.evaluate_summary(machine, users)
    # user0: overlap 2, prec 2/3, rec 1 -> f 0.8 ; user1: overlap 0 -> f 0
    np.testing.assert_allclose([avg, mx], [0.4, 0.8], atol=1e-6)


def test_device_eval_kendall_matches_oracle(synth_records):
    """Device kendalltau path == host scipy oracle at the full-pipeline level
    (VERDICT r1 item 9: no silent host fallback for kendalltau)."""
    rng = np.random.RandomState(12)
    records = synth_records
    scores = [rng.rand(r.n_steps).astype(np.float32) for r in records]
    prop = 0.15
    s, g, u, f, cap = eval_static_dims(records, prop)
    batch, _ = pack_eval(records, s, g, u, f)
    padded = np.zeros((len(records), s), np.float32)
    for i, sc in enumerate(scores):
        padded[i, : len(sc)] = sc
    corr_d, _, _ = jax.device_get(
        evaluate_batch(
            jnp.array(padded),
            jax.tree.map(jnp.asarray, batch),
            proportion=prop,
            method="knapsack",
            max_capacity=cap,
            out_frames=f,
            metric="kendalltau",
        )
    )
    corr_h = np.array(
        [
            eval_np.evaluate_scores(
                eval_np.generate_scores(probs, r.n_frames, r.picks),
                r.user_scores,
                "kendalltau",
            )
            for r, probs in zip(records, scores)
        ]
    )
    np.testing.assert_allclose(corr_d, corr_h, atol=2e-4)


def test_human_leave_one_out(synth_records):
    """Table 1's upper-bound row: hand-check against a direct per-annotator
    loop over evaluate_summary / evaluate_scores, plus the single-annotator
    (LOL) NaN contract."""
    import dataclasses

    corr, avg_f, max_f = eval_np.human_leave_one_out(synth_records)
    assert np.isfinite([corr, avg_f, max_f]).all()
    assert 0.0 <= avg_f <= max_f <= 1.0

    # Hand-computed on the first record.
    r = synth_records[0]
    a_ref, m_ref, c_ref = [], [], []
    for u in range(r.user_summary.shape[0]):
        rest = np.delete(r.user_summary, u, axis=0)
        a, m = eval_np.evaluate_summary(r.user_summary[u], rest)
        a_ref.append(a)
        m_ref.append(m)
        c_ref.append(
            eval_np.evaluate_scores(
                r.user_scores[u], np.delete(r.user_scores, u, axis=0)
            )
        )
    c1, a1, m1 = eval_np.human_leave_one_out([r])
    np.testing.assert_allclose(
        [c1, a1, m1], [np.mean(c_ref), np.mean(a_ref), np.mean(m_ref)],
        atol=1e-12,
    )

    # Single annotator: both sides undefined -> NaN (the paper's LOL dash).
    solo = dataclasses.replace(
        r, user_summary=r.user_summary[:1], user_scores=r.user_scores[:1]
    )
    c, a, m = eval_np.human_leave_one_out([solo])
    assert np.isnan(c) and np.isnan(a) and np.isnan(m)
