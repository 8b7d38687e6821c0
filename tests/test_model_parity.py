"""Full-model golden parity vs torch replicas of the reference networks.

test_torch_parity.py pins the building blocks (LSTM/GRU/MHA/encoder layers);
these tests pin the ASSEMBLED flagship models: a torch replica of the
reference architecture (summarizer/models/vasnet.py:17-148, dsn.py:17-47) is
built in-test, weights are copied torch -> pytree, and forward outputs AND
parameter gradients of an MSE step are compared in eval mode.  This is the
piece layer-level tests can't certify: wiring (shared LayerNorm instance at
both norm sites, residual placement, scale/sigmoid head, bidirectional
concat ordering) and the gradient flow through it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from summarizer_tpu.models import dsn, vasnet  # noqa: E402
from tests.test_torch_parity import copy_rnn_params, t2j  # noqa: E402

D = 64
T = 48
EPS = 1e-6


class TorchVASNet(nn.Module):
    """Reference VASNet forward (vasnet.py:17-148), eval mode: bias-free
    K/Q/V/out, logits * scale, softmax, ctx, out proj, residual + the SAME
    LayerNorm instance at both normalization points, k1(relu) -> k2 sigmoid
    head with 0.1 biases."""

    def __init__(self, d, scale):
        super().__init__()
        self.K = nn.Linear(d, d, bias=False)
        self.Q = nn.Linear(d, d, bias=False)
        self.V = nn.Linear(d, d, bias=False)
        self.out = nn.Linear(d, d, bias=False)
        self.k1 = nn.Linear(d, d)
        self.k2 = nn.Linear(d, 1)
        self.norm = nn.LayerNorm(d, eps=EPS)  # one shared instance
        self.scale = scale
        with torch.no_grad():
            self.k1.bias.fill_(0.1)
            self.k2.bias.fill_(0.1)

    def forward(self, x):  # x: (T, d), unpadded batch-1 like the reference
        q, k, v = self.Q(x), self.K(x), self.V(x)
        logits = (q @ k.T) * self.scale
        alpha = torch.softmax(logits, dim=-1)
        c = self.out(alpha @ v)
        y = self.norm(c + x)
        y = self.norm(torch.relu(self.k1(y)))
        return torch.sigmoid(self.k2(y))[:, 0]


def vasnet_params_from_torch(m):
    p = {
        "K": {"w": t2j(m.K.weight.T)},
        "Q": {"w": t2j(m.Q.weight.T)},
        "V": {"w": t2j(m.V.weight.T)},
        "out": {"w": t2j(m.out.weight.T)},
        "k1": {"w": t2j(m.k1.weight.T), "b": t2j(m.k1.bias)},
        "k2": {"w": t2j(m.k2.weight.T), "b": t2j(m.k2.bias)},
        "norm": {"g": t2j(m.norm.weight), "b": t2j(m.norm.bias)},
    }
    return p


def torch_grads_vasnet(m):
    g = lambda t: np.asarray(t.grad.detach().numpy())  # noqa: E731
    return {
        "K": {"w": g(m.K.weight).T},
        "Q": {"w": g(m.Q.weight).T},
        "V": {"w": g(m.V.weight).T},
        "out": {"w": g(m.out.weight).T},
        "k1": {"w": g(m.k1.weight).T, "b": g(m.k1.bias)},
        "k2": {"w": g(m.k2.weight).T, "b": g(m.k2.bias)},
        "norm": {"g": g(m.norm.weight), "b": g(m.norm.bias)},
    }


def assert_trees_close(ours, ref, atol, rtol):
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    ref_map = {jax.tree_util.keystr(kp): v
               for kp, v in jax.tree_util.tree_leaves_with_path(ref)}
    assert len(flat_o) == len(ref_map)
    for kp, v in flat_o:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(v), ref_map[name], atol=atol, rtol=rtol, err_msg=name
        )


def test_vasnet_full_model_matches_torch():
    torch.manual_seed(0)
    scale = 1.0 / np.sqrt(D)
    m = TorchVASNet(D, scale).eval()
    hp = {"input_size": D, "dropout": 0.0, "flash": 0}
    params = vasnet_params_from_torch(m)

    rng = np.random.RandomState(1)
    x = rng.randn(T, D).astype(np.float32)
    target = rng.rand(T).astype(np.float32)

    # forward
    with torch.no_grad():
        ref_y = m(torch.from_numpy(x)).numpy()
    ours_y = np.asarray(
        vasnet.apply(params, jnp.asarray(x)[None], jnp.ones((1, T), jnp.float32),
                     train=False, hp=hp)[0]
    )
    np.testing.assert_allclose(ours_y, ref_y, atol=2e-5, rtol=2e-4)

    # gradients of the reference's training loss (MSE, vasnet.py:205)
    xt = torch.from_numpy(x)
    loss = torch.nn.functional.mse_loss(m(xt), torch.from_numpy(target))
    loss.backward()
    ref_g = torch_grads_vasnet(m)

    def loss_fn(p):
        y = vasnet.apply(p, jnp.asarray(x)[None], jnp.ones((1, T), jnp.float32),
                         train=False, hp=hp)[0]
        return jnp.mean((y - jnp.asarray(target)) ** 2)

    ours_g = jax.grad(loss_fn)(params)
    assert_trees_close(ours_g, ref_g, atol=5e-6, rtol=5e-3)


def test_vasnet_ignore_self_and_aperture_match_torch():
    """The reference's two attention variants: self-exclusion (vasnet.py:118)
    and the local aperture band — replicated with explicit -inf masking."""
    torch.manual_seed(3)
    scale = 0.06  # the paper's fixed logit scale
    m = TorchVASNet(D, scale).eval()
    hp = {"input_size": D, "dropout": 0.0, "flash": 0,
          "ignore_self": True, "local": 8, "scale": 0.06}
    params = vasnet_params_from_torch(m)

    rng = np.random.RandomState(4)
    x = rng.randn(T, D).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        q, k, v = m.Q(xt), m.K(xt), m.V(xt)
        logits = (q @ k.T) * m.scale
        ij = torch.arange(T)
        band = (ij[:, None] - ij[None, :]).abs() <= 8
        keep = band & ~torch.eye(T, dtype=torch.bool)
        logits = logits.masked_fill(~keep, float("-inf"))
        alpha = torch.softmax(logits, dim=-1)
        y = m.norm(m.out(alpha @ v) + xt)
        y = m.norm(torch.relu(m.k1(y)))
        ref_y = torch.sigmoid(m.k2(y))[:, 0].numpy()

    ours_y = np.asarray(
        vasnet.apply(params, jnp.asarray(x)[None], jnp.ones((1, T), jnp.float32),
                     train=False, hp=hp)[0]
    )
    np.testing.assert_allclose(ours_y, ref_y, atol=2e-5, rtol=2e-4)


def ref_dsn_reward(x, actions, far_sim, thre):
    """Numpy replica of the reference diversity-representativeness reward
    (summarizer/models/dsn.py:185-236): mean pairwise cosine dissimilarity
    over picked pairs (far pairs forced to 1 unless far_sim), and
    exp(-mean min sq-dist of every frame to its nearest pick)."""
    picks = np.where(actions > 0)[0]
    if len(picks) == 0:
        return 0.0
    normed = x / np.linalg.norm(x, axis=1, keepdims=True)
    dissim = 1.0 - normed @ normed.T
    if not far_sim:
        ij = np.arange(len(x))
        dissim[np.abs(ij[:, None] - ij[None, :]) > thre] = 1.0
    if len(picks) == 1:
        r_div = 0.0
    else:
        sub = dissim[np.ix_(picks, picks)]
        r_div = (sub.sum() - np.trace(sub)) / (len(picks) * (len(picks) - 1))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    r_rep = np.exp(-d2[:, picks].min(axis=1).mean())
    return 0.5 * (r_div + r_rep)


@pytest.mark.parametrize("far_sim", [False, True])
@pytest.mark.parametrize("n_picks", [0, 1, 7])
def test_dsn_reward_matches_reference_formula(far_sim, n_picks):
    from summarizer_tpu.train.reinforce import compute_reward

    t, d = 40, 16
    rng = np.random.RandomState(n_picks + 10 * far_sim)
    x = rng.randn(t, d).astype(np.float32)
    actions = np.zeros(t, np.float32)
    if n_picks:
        actions[rng.choice(t, n_picks, replace=False)] = 1.0

    want = ref_dsn_reward(x, actions, far_sim, 20)
    got = float(compute_reward(jnp.asarray(x), jnp.asarray(actions),
                               jnp.ones(t, jnp.float32), far_sim, 20))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    # padded form: zero-padded tail + mask must reproduce the unpadded value
    pad = 17
    xp = np.concatenate([x, np.zeros((pad, d), np.float32)])
    ap = np.concatenate([actions, np.zeros(pad, np.float32)])
    mp = np.concatenate([np.ones(t, np.float32), np.zeros(pad, np.float32)])
    got_p = float(compute_reward(jnp.asarray(xp), jnp.asarray(ap),
                                 jnp.asarray(mp), far_sim, 20))
    np.testing.assert_allclose(got_p, want, atol=1e-5, rtol=1e-4)


def test_transformer_full_model_matches_torch():
    """Assembled Transformer scorer (summarizer/models/transformer.py:18-103):
    N post-norm encoder layers, a final LayerNorm whose parameters are SHARED
    with the head norm, k1 -> relu -> shared norm -> k2 -> sigmoid."""
    from tests.test_torch_parity import copy_encoder_layer

    from summarizer_tpu.models import transformer

    torch.manual_seed(11)
    n_layers, heads = 3, 4
    t_layers = [
        torch.nn.TransformerEncoderLayer(D, heads, dim_feedforward=D, dropout=0.0).eval()
        for _ in range(n_layers)
    ]
    norm = nn.LayerNorm(D, eps=1e-5)
    k1, k2 = nn.Linear(D, D), nn.Linear(D, 1)

    params = {
        "layers": [copy_encoder_layer(la) for la in t_layers],
        "norm": {"g": t2j(norm.weight), "b": t2j(norm.bias)},
        "k1": {"w": t2j(k1.weight.T), "b": t2j(k1.bias)},
        "k2": {"w": t2j(k2.weight.T), "b": t2j(k2.bias)},
    }
    hp = {"input_size": D, "encoder_layers": n_layers, "attention_heads": heads,
          "dropout": 0.0, "head_dropout": 0.0}

    rng = np.random.RandomState(12)
    x = rng.randn(T, D).astype(np.float32)

    with torch.no_grad():
        h = torch.from_numpy(x)[:, None]  # (T, 1, D), torch seq-first
        for la in t_layers:
            h = la(h)
        h = norm(h)
        y = norm(torch.relu(k1(h)))
        ref_y = torch.sigmoid(k2(y))[:, 0, 0].numpy()

    ours_y = np.asarray(
        transformer.apply(params, jnp.asarray(x)[None],
                          jnp.ones((1, T), jnp.float32), train=False, hp=hp)[0]
    )
    np.testing.assert_allclose(ours_y, ref_y, atol=3e-5, rtol=2e-4)


def test_sumgan_att_selector_and_ae_match_torch():
    """SumGAN-att assembly (summarizer/models/sumgan_att.py:20-146):
    post-norm transformer selector with shared final norm + sigmoid head,
    and the encoder-decoder AE whose decoder target is the RAW input
    sequence attending to encoder memory (no causal mask)."""
    from tests.test_torch_parity import copy_encoder_layer, copy_mha

    from summarizer_tpu.models.sumgan_att import ae_apply, selector_apply

    d, heads, t = 32, 4, 10
    torch.manual_seed(31)
    s_layers = [torch.nn.TransformerEncoderLayer(d, heads, d, dropout=0.0).eval()
                for _ in range(2)]
    s_norm = nn.LayerNorm(d, eps=1e-5)
    s_out = nn.Linear(d, 1)
    e_layers = [torch.nn.TransformerEncoderLayer(d, heads, d, dropout=0.0).eval()
                for _ in range(2)]
    d_layers = [torch.nn.TransformerDecoderLayer(d, heads, d, dropout=0.0).eval()
                for _ in range(2)]

    def copy_decoder_layer(la):
        return {
            "self_attn": copy_mha(la.self_attn),
            "cross_attn": copy_mha(la.multihead_attn),
            "lin1": {"w": t2j(la.linear1.weight.T), "b": t2j(la.linear1.bias)},
            "lin2": {"w": t2j(la.linear2.weight.T), "b": t2j(la.linear2.bias)},
            "norm1": {"g": t2j(la.norm1.weight), "b": t2j(la.norm1.bias)},
            "norm2": {"g": t2j(la.norm2.weight), "b": t2j(la.norm2.bias)},
            "norm3": {"g": t2j(la.norm3.weight), "b": t2j(la.norm3.bias)},
        }

    p_sel = {
        "layers": [copy_encoder_layer(la) for la in s_layers],
        "norm": {"g": t2j(s_norm.weight), "b": t2j(s_norm.bias)},
        "out": {"w": t2j(s_out.weight.T), "b": t2j(s_out.bias)},
    }
    p_ae = {
        "enc": [copy_encoder_layer(la) for la in e_layers],
        "dec": [copy_decoder_layer(la) for la in d_layers],
    }

    rng = np.random.RandomState(32)
    x = rng.randn(t, d).astype(np.float32)
    mask = jnp.ones((1, t), jnp.float32)

    with torch.no_grad():
        h = torch.from_numpy(x)[:, None]  # (T, 1, D)
        for la in s_layers:
            h = la(h)
        ref_scores = torch.sigmoid(s_out(s_norm(h)))[:, 0, 0].numpy()
        mem = torch.from_numpy(x)[:, None]
        for la in e_layers:
            mem = la(mem)
        hd = torch.from_numpy(x)[:, None]  # decoder target = raw input
        for la in d_layers:
            hd = la(hd, mem)
        ref_xhat = hd[:, 0].numpy()

    key = jax.random.PRNGKey(0)
    got_scores = np.asarray(
        selector_apply(p_sel, jnp.asarray(x)[None], mask, heads, key,
                       train=False)[0]
    )
    np.testing.assert_allclose(got_scores, ref_scores, atol=3e-5, rtol=2e-4)
    got_xhat = np.asarray(
        ae_apply(p_ae, jnp.asarray(x)[None], mask, heads, key, train=False)[0]
    )
    np.testing.assert_allclose(got_xhat, ref_xhat, atol=5e-5, rtol=5e-4)


class TorchDSN(nn.Module):
    """Reference DSN (dsn.py:17-47): 1-layer bidirectional LSTM, hidden H,
    linear(2H -> 1) + sigmoid."""

    def __init__(self, d, h):
        super().__init__()
        self.rnn = nn.LSTM(d, h, num_layers=1, bidirectional=True,
                           batch_first=True)
        self.fc = nn.Linear(2 * h, 1)

    def forward(self, x):  # (1, T, d)
        h, _ = self.rnn(x)
        return torch.sigmoid(self.fc(h))[0, :, 0]


def test_sumgan_chain_matches_torch():
    """The four SumGAN sub-nets (summarizer/models/sumgan.py:23-258) driven
    deterministically (VAE noise = 0): sLSTM selector scores, eLSTM mu/logvar
    heads on final hidden states, the self-feeding dLSTM decode (zero initial
    input, previous top output as next input, reversed reconstruction), and
    the cLSTM last-output discriminator."""
    from summarizer_tpu.models.sumgan import (
        clstm_apply,
        dlstm_apply,
        elstm_apply,
        slstm_apply,
    )

    d, H, Hc, t = 24, 32, 28, 12
    torch.manual_seed(21)
    s_rnn = nn.LSTM(d, H, 2, bidirectional=True, batch_first=True)
    s_fc = nn.Linear(2 * H, 1)
    e_rnn = nn.LSTM(d, H, 2, batch_first=True)
    e_mu, e_logvar = nn.Linear(H, H), nn.Linear(H, H)
    d_rnn = nn.LSTM(H, H, 2, batch_first=True)
    d_fc = nn.Linear(H, d)
    c_rnn = nn.LSTM(d, Hc, 2, batch_first=True)
    c_fc = nn.Linear(Hc, 1)

    lin = lambda m: {"w": t2j(m.weight.T), "b": t2j(m.bias)}  # noqa: E731
    p_s = {"lstm": copy_rnn_params(s_rnn, 4, 2, True), "out": lin(s_fc)}
    p_e = {"lstm": copy_rnn_params(e_rnn, 4, 2, False), "mu": lin(e_mu),
           "logvar": lin(e_logvar)}
    p_d = {"lstm": copy_rnn_params(d_rnn, 4, 2, False), "recons": lin(d_fc)}
    p_c = {"lstm": copy_rnn_params(c_rnn, 4, 2, False), "out": lin(c_fc)}

    rng = np.random.RandomState(22)
    x = rng.randn(1, t, d).astype(np.float32)
    xt = torch.from_numpy(x)
    lengths = jnp.full((1,), t, jnp.int32)

    with torch.no_grad():
        # selector
        ref_scores = torch.sigmoid(s_fc(s_rnn(xt)[0]))[0, :, 0].numpy()
        # encoder heads on final hidden states (L, B, H)
        _, (he, ce) = e_rnn(xt)
        ref_mu, ref_logvar = e_mu(he).numpy(), e_logvar(he).numpy()
        # self-feeding decode from (mu, ce), zero initial input
        h, c = torch.from_numpy(ref_mu), ce
        inp = torch.zeros(1, 1, H)
        tops = []
        for _ in range(t):
            out, (h, c) = d_rnn(inp, (h, c))
            tops.append(out)
            inp = out
        x_hat = d_fc(torch.cat(tops, dim=1))
        ref_xhat = torch.flip(x_hat, dims=[1]).numpy()  # reversed reconstruction
        # discriminator: prob + feature from last output
        couts, _ = c_rnn(xt)
        ref_hlast = couts[:, -1].numpy()
        ref_prob = torch.sigmoid(c_fc(couts[:, -1]))[:, 0].numpy()

    xj = jnp.asarray(x)
    np.testing.assert_allclose(
        np.asarray(slstm_apply(p_s, xj, lengths)[0]), ref_scores,
        atol=2e-5, rtol=2e-4)
    (mu, logvar), c_last = elstm_apply(p_e, xj, lengths)
    np.testing.assert_allclose(np.asarray(mu), ref_mu, atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar, atol=2e-5,
                               rtol=2e-4)
    got_xhat = dlstm_apply(p_d, t, mu, c_last, lengths)
    np.testing.assert_allclose(np.asarray(got_xhat), ref_xhat, atol=3e-5,
                               rtol=5e-4)
    probs, h_last = clstm_apply(p_c, xj, lengths)
    np.testing.assert_allclose(np.asarray(h_last), ref_hlast, atol=2e-5,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(probs), ref_prob, atol=2e-5,
                               rtol=2e-4)


def test_dsn_full_model_matches_torch():
    H = 32
    torch.manual_seed(7)
    m = TorchDSN(D, H).eval()
    params = {
        "rnn": copy_rnn_params(m.rnn, 4, 1, True),
        "out": {"w": t2j(m.fc.weight.T), "b": t2j(m.fc.bias)},
    }
    hp = {"input_size": D, "hidden_size": H, "num_layers": 1, "cell": "lstm"}

    rng = np.random.RandomState(8)
    x = rng.randn(T, D).astype(np.float32)
    target = rng.rand(T).astype(np.float32)

    with torch.no_grad():
        ref_y = m(torch.from_numpy(x)[None]).numpy()
    mask = jnp.ones((1, T), jnp.float32)
    ours_y = np.asarray(dsn.apply(params, jnp.asarray(x)[None], mask, hp=hp)[0])
    np.testing.assert_allclose(ours_y, ref_y, atol=2e-5, rtol=2e-4)

    xt = torch.from_numpy(x)[None]
    loss = torch.nn.functional.mse_loss(m(xt), torch.from_numpy(target))
    loss.backward()
    g = lambda t: np.asarray(t.grad.detach().numpy())  # noqa: E731
    ref_g = {
        "rnn": {"layers": [{
            "fwd": {"w_ih": g(m.rnn.weight_ih_l0).T, "w_hh": g(m.rnn.weight_hh_l0).T,
                    "b_ih": g(m.rnn.bias_ih_l0), "b_hh": g(m.rnn.bias_hh_l0)},
            "bwd": {"w_ih": g(m.rnn.weight_ih_l0_reverse).T,
                    "w_hh": g(m.rnn.weight_hh_l0_reverse).T,
                    "b_ih": g(m.rnn.bias_ih_l0_reverse),
                    "b_hh": g(m.rnn.bias_hh_l0_reverse)},
        }]},
        "out": {"w": g(m.fc.weight).T, "b": g(m.fc.bias)},
    }

    def loss_fn(p):
        y = dsn.apply(p, jnp.asarray(x)[None], mask, hp=hp)[0]
        return jnp.mean((y - jnp.asarray(target)) ** 2)

    ours_g = jax.grad(loss_fn)(params)
    assert_trees_close(ours_g, ref_g, atol=1e-5, rtol=5e-3)
