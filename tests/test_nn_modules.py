"""Unit tests for nn modules: grouped MLP, MRConv interleave, pooling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nextou_tpu.nn.layers import GroupedDense, InstanceNorm
from nextou_tpu.nn.graph_conv import (
    avg_pool,
    max_pool_with_argmax,
    max_unpool_scatter,
    MRConv,
)


def test_grouped_dense_is_block_diagonal():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 8)).astype(np.float32)
    mod = GroupedDense(features=8, groups=4)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(mod.apply(v, jnp.asarray(x)))
    w = np.asarray(v["params"]["kernel"])  # (4, 2, 2)
    b = np.asarray(v["params"]["bias"])
    want = np.zeros_like(y)
    for g in range(4):
        want[..., 2 * g : 2 * g + 2] = x[..., 2 * g : 2 * g + 2] @ w[g]
    want += b
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 5, 4)).astype(np.float32)  # (B, H, W, C)
    mod = InstanceNorm()
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(v, jnp.asarray(x)))
    inorm = torch.nn.InstanceNorm2d(4, affine=True)
    want = inorm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-5)


def test_avg_pool_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 14, 12, 3)).astype(np.float32)
    got = np.asarray(avg_pool(jnp.asarray(x), 4))
    want = (
        torch.nn.functional.avg_pool3d(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), 4, 4
        )
        .numpy()
        .transpose(0, 2, 3, 4, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_max_pool_unpool_roundtrip_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 6, 8, 3)).astype(np.float32)
    pool = (2, 2, 2)
    pooled, arg = max_pool_with_argmax(jnp.asarray(x), pool)

    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    mp = torch.nn.MaxPool3d(pool, stride=pool, return_indices=True)
    want_pooled, want_idx = mp(xt)
    np.testing.assert_allclose(
        np.asarray(pooled), want_pooled.numpy().transpose(0, 2, 3, 4, 1), atol=1e-6
    )

    # unpool with channel doubling (the PoolDyGraphConv scatter-back)
    vals = rng.standard_normal((2, 2, 3, 4, 6)).astype(np.float32)
    got_up = np.asarray(max_unpool_scatter(jnp.asarray(vals), arg, pool))
    mu = torch.nn.MaxUnpool3d(pool, stride=pool)
    idx_cat = torch.cat([want_idx, want_idx], dim=1)
    want_up = mu(
        torch.from_numpy(vals.transpose(0, 4, 1, 2, 3)), idx_cat
    ).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got_up, want_up, atol=1e-6)


def test_max_pool_partial_axes():
    # pool only even axes (reference pools 2 per even axis)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4, 7, 6, 2)).astype(np.float32)
    pooled, arg = max_pool_with_argmax(jnp.asarray(x), (2, 1, 2))
    assert pooled.shape == (1, 2, 7, 3, 2)
    # max over the correct window
    want = x.reshape(1, 2, 2, 7, 3, 2, 2).max(axis=(2, 5))
    np.testing.assert_allclose(np.asarray(pooled), want, atol=1e-6)


def test_mrconv_interleave_semantics():
    """The grouped conv input must be channel-interleaved [x0, m0, x1, m1...]
    (reference NexToU_Encoder_Decoder.py:409)."""
    rng = np.random.default_rng(5)
    B, N, C, k = 1, 6, 4, 3
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, (B, N, k))
    mod = MRConv(out_features=2 * C, act_name="none", norm=None, groups=2 * C)
    v = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(idx), train=False
    )
    # with groups == channels, each output channel sees exactly one input
    # channel: out[2c] <- x[c], out[2c+1] <- maxrel[c]
    w = np.asarray(v["params"]["nn"]["dense_0"]["kernel"])  # (2C, 1, 1)
    b = np.asarray(v["params"]["nn"]["dense_0"]["bias"])
    got = np.asarray(
        mod.apply(v, jnp.asarray(x), jnp.asarray(idx), train=False)
    )
    xj = x[0][idx[0]]  # (N, k, C)
    maxrel = (xj - x[0][:, None, :]).max(1)
    for c in range(C):
        np.testing.assert_allclose(
            got[0, :, 2 * c], x[0, :, c] * w[2 * c, 0, 0] + b[2 * c], atol=1e-5
        )
        np.testing.assert_allclose(
            got[0, :, 2 * c + 1],
            maxrel[:, c] * w[2 * c + 1, 0, 0] + b[2 * c + 1],
            atol=1e-5,
        )


def test_prelu_matches_torch():
    import torch

    from nextou_tpu.nn.layers import ActLayer, PReLU

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 6)).astype(np.float32)
    mod = PReLU(n_prelu=1, init_value=0.25)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert np.asarray(v["params"]["alpha"]).shape == (1,)
    y = np.asarray(mod.apply(v, jnp.asarray(x)))
    t = torch.nn.PReLU(num_parameters=1, init=0.25)
    want = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(y, want, atol=1e-6)

    # per-channel alpha broadcast over the (last) channel axis
    mod = PReLU(n_prelu=6, init_value=0.1)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    alpha = np.linspace(-0.3, 0.4, 6).astype(np.float32)
    v = {"params": {"alpha": jnp.asarray(alpha)}}
    y = np.asarray(mod.apply(v, jnp.asarray(x)))
    t = torch.nn.PReLU(num_parameters=6)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(alpha))
    # torch PReLU broadcasts over dim 1; move channels there
    want = (
        t(torch.from_numpy(x.transpose(0, 2, 1)))
        .detach().numpy().transpose(0, 2, 1)
    )
    np.testing.assert_allclose(y, want, atol=1e-6)

    # ActLayer('prelu') routes to the parametric module
    mod = ActLayer("prelu")
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert jax.tree_util.tree_leaves_with_path(v)[0][0][-1].key == "alpha"


def test_mlp_matches_torch():
    import torch

    from nextou_tpu.nn.layers import MLP

    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    mod = MLP(channels=(8, 16, 4), act_name="relu")
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # copy params into the torch equivalent (Lin->act per width,
    # torch_nn.py:54-64)
    lin0 = torch.nn.Linear(8, 16)
    lin1 = torch.nn.Linear(16, 4)
    with torch.no_grad():
        lin0.weight.copy_(torch.from_numpy(
            np.asarray(v["params"]["lin_0"]["kernel"])[0].T))
        lin0.bias.copy_(torch.from_numpy(np.asarray(v["params"]["lin_0"]["bias"])))
        lin1.weight.copy_(torch.from_numpy(
            np.asarray(v["params"]["lin_1"]["kernel"])[0].T))
        lin1.bias.copy_(torch.from_numpy(np.asarray(v["params"]["lin_1"]["bias"])))
    t = torch.nn.Sequential(lin0, torch.nn.ReLU(), lin1, torch.nn.ReLU())
    y = np.asarray(mod.apply(v, jnp.asarray(x), train=False))
    want = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_mlp_fast_init_and_prelu():
    from nextou_tpu.nn.layers import MLP
    from nextou_tpu.utils import fast_init

    x = jnp.ones((2, 6))
    mod = MLP(channels=(6, 6), act_name="prelu", norm="instance")
    v = fast_init(mod, jax.random.PRNGKey(0), x, train=False)
    assert float(v["params"]["act_0"]["PReLU_0"]["alpha"][0]) == pytest.approx(1e-2)
    y = mod.apply(v, x, train=False)
    assert y.shape == (2, 6)


def test_shuffle_conv_transpose_matches_flax():
    """ShuffleConvTranspose (matmul + pixel shuffle) must match
    nn.ConvTranspose(padding='VALID') to fp summation-order rounding —
    same param names/shapes, so checkpoints and the torch importer are
    interchangeable."""
    import flax.linen as nn
    from nextou_tpu.nn.layers import ShuffleConvTranspose

    rng = np.random.default_rng(3)
    for sp, cin, cout, k in [
        ((4, 6, 8), 5, 7, (2, 2, 2)),
        ((4, 6, 8), 5, 7, (1, 2, 2)),
        ((6, 8), 4, 3, (2, 2)),
    ]:
        x = jnp.asarray(rng.standard_normal((2, *sp, cin)), jnp.float32)
        mod = ShuffleConvTranspose(features=cout, kernel_size=k, strides=k)
        v = mod.init(jax.random.PRNGKey(0), x)
        kernel = jnp.asarray(rng.standard_normal(v["params"]["kernel"].shape),
                             jnp.float32)
        bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        v = {"params": {"kernel": kernel, "bias": bias}}
        ref = nn.ConvTranspose(
            features=cout, kernel_size=k, strides=k, padding="VALID"
        )
        want = ref.apply(v, x)
        got = mod.apply(v, x)
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-6
        )


def test_phase_conv_matches_default(monkeypatch):
    """FoldedConv under NEXTOU_PHASE_CONV=1 (polyphase strided form) must
    match the default strided lowering; odd strided lengths must fall back
    (the even/odd phase split assumes even extents)."""
    from nextou_tpu.nn.layers import FoldedConv

    rng = np.random.default_rng(7)
    cases = [
        ((8, 12, 16), (3, 3, 3), (2, 2, 2)),
        ((8, 12, 16), (1, 3, 3), (1, 2, 2)),   # leading axis folds away
        ((8, 12, 16), (3, 3, 3), (1, 2, 2)),   # mixed stride, k=3 s=1 axis
        ((7, 12, 16), (3, 3, 3), (2, 2, 2)),   # odd extent -> fallback
        ((12, 16), (3, 3), (2, 2)),            # 2D
    ]
    for sp, k, s in cases:
        x = jnp.asarray(rng.standard_normal((2, *sp, 5)), jnp.float32)
        mod = FoldedConv(
            features=6,
            kernel_size=k,
            strides=s,
            padding=tuple(((kk - 1) // 2, (kk - 1) // 2) for kk in k),
        )
        v = mod.init(jax.random.PRNGKey(0), x)
        v = {"params": {
            "kernel": jnp.asarray(
                rng.standard_normal(v["params"]["kernel"].shape), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal((6,)), jnp.float32),
        }}
        monkeypatch.delenv("NEXTOU_PHASE_CONV", raising=False)
        want = mod.apply(v, x)
        monkeypatch.setenv("NEXTOU_PHASE_CONV", "1")
        got = mod.apply(v, x)
        assert got.shape == want.shape, (sp, k, s, got.shape, want.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
            err_msg=f"{sp} {k} {s}",
        )


def test_phase_conv_targeted_pairs(monkeypatch):
    """NEXTOU_PHASE_CONV='cin-cout[,...]' phases ONLY the named channel
    pairs (values must still match the default lowering); other channel
    pairs keep the default strided path. Verified numerically and via the
    jaxpr (the polyphase form contains multiple convs per FoldedConv)."""
    from nextou_tpu.nn.layers import FoldedConv

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 16, 5)), jnp.float32)
    mod = FoldedConv(
        features=6, kernel_size=(3, 3, 3), strides=(2, 2, 2),
        padding=((1, 1),) * 3,
    )
    # init ONCE: FoldedConv params draw from the host-side NumPy RNG
    # (nn/layers.py), which advances between init calls
    v = mod.init(jax.random.PRNGKey(0), x)

    def run(env):
        if env is None:
            monkeypatch.delenv("NEXTOU_PHASE_CONV", raising=False)
        else:
            monkeypatch.setenv("NEXTOU_PHASE_CONV", env)
        jaxpr = str(jax.make_jaxpr(lambda x: mod.apply(v, x))(x))
        return jaxpr.count("conv_general_dilated"), mod.apply(v, x)

    n_default, want = run(None)
    assert n_default == 1
    # named pair -> phased (8 stride-1 convs for s=(2,2,2))
    n_phased, got = run("5-6")
    assert n_phased > 1
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )
    # non-matching pair -> default lowering
    n_other, _ = run("33-66,66-132")
    assert n_other == 1


def test_shuffle_conv_transpose_env_fallback(monkeypatch):
    """NEXTOU_SHUFFLE_TRANSPCONV=0 routes through lax.conv_transpose and
    must produce the same values as the pixel-shuffle path."""
    from nextou_tpu.nn.layers import ShuffleConvTranspose

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 5)), jnp.float32)
    mod = ShuffleConvTranspose(features=7, kernel_size=(1, 2, 2),
                               strides=(1, 2, 2))
    v = mod.init(jax.random.PRNGKey(0), x)
    v = {"params": {
        "kernel": jnp.asarray(
            rng.standard_normal(v["params"]["kernel"].shape), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((7,)), jnp.float32),
    }}
    monkeypatch.setenv("NEXTOU_SHUFFLE_TRANSPCONV", "1")  # pixel-shuffle
    want = mod.apply(v, x)
    monkeypatch.setenv("NEXTOU_SHUFFLE_TRANSPCONV", "0")  # lax.conv_transpose
    got = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-6)


def test_lowering_gradients_match_default(monkeypatch):
    """Gradients through the opt-in conv lowerings (polyphase strided conv,
    pixel-shuffle transp-conv) must match the native lowerings' — these can
    become TRAINING defaults after the in-model A/B, so backward parity is
    load-bearing, not just forward."""
    from nextou_tpu.nn.layers import FoldedConv, ShuffleConvTranspose

    rng = np.random.default_rng(3)

    def grads(mod, v, x):
        def loss(v, x):
            y = mod.apply(v, x)
            # non-uniform weighting so grads aren't constant fields
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
            return jnp.sum(y * w) / y.size
        gv, gx = jax.grad(loss, argnums=(0, 1))(v, x)
        return gv["params"]["kernel"], gv["params"]["bias"], gx

    # strided conv: default vs polyphase
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16, 5)), jnp.float32)
    mod = FoldedConv(features=6, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                     padding=((1, 1), (1, 1), (1, 1)))
    v = mod.init(jax.random.PRNGKey(0), x)
    v = {"params": {
        "kernel": jnp.asarray(
            rng.standard_normal(v["params"]["kernel"].shape), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((6,)), jnp.float32),
    }}
    monkeypatch.delenv("NEXTOU_PHASE_CONV", raising=False)
    want = grads(mod, v, x)
    monkeypatch.setenv("NEXTOU_PHASE_CONV", "1")
    got = grads(mod, v, x)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   atol=3e-5, rtol=1e-5)

    # transp-conv: pixel shuffle vs lax.conv_transpose
    xt = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 5)), jnp.float32)
    modt = ShuffleConvTranspose(features=7, kernel_size=(2, 2, 2),
                                strides=(2, 2, 2))
    vt = modt.init(jax.random.PRNGKey(1), xt)
    vt = {"params": {
        "kernel": jnp.asarray(
            rng.standard_normal(vt["params"]["kernel"].shape), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((7,)), jnp.float32),
    }}
    monkeypatch.setenv("NEXTOU_SHUFFLE_TRANSPCONV", "1")
    want = grads(modt, vt, xt)
    monkeypatch.setenv("NEXTOU_SHUFFLE_TRANSPCONV", "0")
    got = grads(modt, vt, xt)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   atol=3e-5, rtol=1e-5)


def test_instance_norm_onepass_matches(monkeypatch):
    """NEXTOU_ONEPASS_IN=1 (fused sum/sumsq statistics) must match the
    default two-pass instance norm within fp32 cancellation error, including
    a large-mean case that stresses E[x^2]-mean^2."""
    from nextou_tpu.nn.layers import InstanceNorm

    rng = np.random.default_rng(5)
    base = rng.standard_normal((2, 6, 7, 8, 12)).astype(np.float32)
    # mean/std ~ 30 loses ~10 mantissa bits to E[x^2]-mean^2 cancellation:
    # measured max-abs error 2e-3 on normalized outputs — why the knob is
    # opt-in and must additionally pass the full-model torch-parity test
    # before ever becoming a default
    for shift, atol in ((0.0, 5e-5), (30.0, 5e-3)):
        x = jnp.asarray(base + shift)
        mod = InstanceNorm()
        v = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.delenv("NEXTOU_ONEPASS_IN", raising=False)
        want = mod.apply(v, x)
        monkeypatch.setenv("NEXTOU_ONEPASS_IN", "1")
        got = mod.apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=atol, rtol=1e-4)


def test_transp_conv_init_matches_torch_fan_in():
    """ShuffleConvTranspose init std must use torch's ConvTranspose fan_in
    (Cout * prod(k), dim 1 of the (Cin, Cout, *k) weight), and fast_init
    must agree with the flax init path."""
    import torch
    import flax.linen as nn

    from nextou_tpu.nn.layers import ShuffleConvTranspose
    from nextou_tpu.utils import fast_init

    cin, cout, k = 64, 32, (2, 2, 2)
    x = jnp.zeros((1, 4, 4, 4, cin), jnp.float32)

    class _Wrap(nn.Module):  # the model always nests it under 'transpconv'
        @nn.compact
        def __call__(self, x):
            return ShuffleConvTranspose(
                features=cout, kernel_size=k, strides=k, name="transpconv"
            )(x)

    mod = _Wrap()
    flax_std = float(np.std(np.asarray(
        mod.init(jax.random.PRNGKey(0), x)["params"]["transpconv"]["kernel"])))
    fast_std = float(np.std(np.asarray(
        fast_init(mod, 0, x)["params"]["transpconv"]["kernel"])))

    w = torch.empty(cin, cout, *k)
    torch.nn.init.kaiming_normal_(w, a=1e-2)
    want = float(w.std())
    assert abs(flax_std - want) / want < 0.10, (flax_std, want)
    assert abs(fast_std - want) / want < 0.10, (fast_std, want)


def test_lowering_env_knobs_actually_switch_paths(monkeypatch):
    """Guard against knob-name drift making the A/B parity tests vacuous:
    each env var must CHANGE the traced computation, not just re-run the
    default lowering twice."""
    from nextou_tpu.nn.layers import FoldedConv, InstanceNorm, ShuffleConvTranspose

    x3 = jnp.zeros((1, 4, 6, 8, 5), jnp.float32)

    def jaxpr_of(mod, x, **env):
        for k in ("NEXTOU_PHASE_CONV", "NEXTOU_SHUFFLE_TRANSPCONV",
                  "NEXTOU_ONEPASS_IN"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        vars_ = mod.init(jax.random.PRNGKey(0), x)
        return str(jax.make_jaxpr(lambda a: mod.apply(vars_, a))(x))

    conv = FoldedConv(features=6, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                      padding=((1, 1),) * 3)
    assert jaxpr_of(conv, x3) != jaxpr_of(conv, x3, NEXTOU_PHASE_CONV="1")

    tc = ShuffleConvTranspose(features=6, kernel_size=(2, 2, 2),
                              strides=(2, 2, 2))
    # default flipped to OFF after the round-3 in-model A/B (PERF.md):
    # plain lax.conv_transpose is the default, "1" opts INTO pixel-shuffle
    assert jaxpr_of(tc, x3) != jaxpr_of(tc, x3, NEXTOU_SHUFFLE_TRANSPCONV="1")

    inorm = InstanceNorm()
    assert jaxpr_of(inorm, x3) != jaxpr_of(inorm, x3, NEXTOU_ONEPASS_IN="1")


# ---- round-3 default-flipped numerics (VERDICT r3 #2) ----------------------

_BF16_EPS = 2.0 ** -8  # bf16 relative rounding step (7 fraction bits + 1)


def test_instance_norm_scalar_ab_two_ulp(monkeypatch):
    """The bf16 scalar-AB InstanceNorm (default, NEXTOU_IN_SCALAR_AB=1:
    y = x*a + b with f32 per-(sample,channel) coefficients rounded to bf16)
    must stay within 2 bf16-ulp-scale of the f32-elementwise-then-round form
    it replaced — including channels with large means (where the b term
    dominates) and near-zero outputs (where x*a and b cancel)."""
    from nextou_tpu.nn.layers import InstanceNorm

    rng = np.random.default_rng(0)
    B, sp, C = 2, (6, 8, 10), 5
    base = rng.standard_normal((B, *sp, C))
    # per-channel scale/offset spread over decades incl. a large-mean channel
    base = base * np.array([1.0, 10.0, 0.1, 3.0, 1.0]) + np.array(
        [0.0, 100.0, -5.0, 0.5, 0.0]
    )
    x = jnp.asarray(base, jnp.bfloat16)
    mod = InstanceNorm(dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)
    v = {"params": {
        "scale": jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((C,)), jnp.float32),
    }}
    monkeypatch.setenv("NEXTOU_IN_SCALAR_AB", "0")
    want = mod.apply(v, x)
    monkeypatch.setenv("NEXTOU_IN_SCALAR_AB", "1")
    got = mod.apply(v, x)
    assert want.dtype == jnp.bfloat16 and got.dtype == jnp.bfloat16

    # reconstruct the exact a, b the scalar-AB form uses, in f64, to express
    # the "2 ulp of the TERMS" bound (cancellation at y~0 makes a bound on
    # ulp(y) alone unachievable for ANY rounded-term evaluation)
    xf = np.asarray(x, np.float64)
    mean = xf.mean(axis=(1, 2, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    a = np.asarray(v["params"]["scale"], np.float64) / np.sqrt(var + 1e-5)
    b = np.asarray(v["params"]["bias"], np.float64) - mean * a
    term_scale = np.abs(xf * a) + np.abs(b)
    err = np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64))
    bound = 2.0 * _BF16_EPS * np.maximum(term_scale, 2.0 ** -126)
    assert (err <= bound).all(), (
        f"max err {err.max()}, worst ratio {(err / bound).max()}"
    )


def test_batchnorm_bf16_two_ulp(monkeypatch):
    """bf16 BatchNorm apply (round-3 default; NEXTOU_F32_NORM=1 reverts)
    must stay within 2 bf16-ulp-scale of the f32 elementwise form, in both
    train (batch stats) and eval (running stats) modes."""
    from nextou_tpu.nn.layers import make_norm

    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((2, 6, 8, 5)) * 4.0 + 1.5, jnp.bfloat16
    )
    for train in (True, False):
        monkeypatch.setenv("NEXTOU_F32_NORM", "1")
        mod32 = make_norm("batch", train=train, dtype=jnp.bfloat16)
        v = mod32.init(jax.random.PRNGKey(0), x)
        # nonzero running stats so eval mode is nontrivial
        v = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                rng.uniform(0.5, 1.5, a.shape), a.dtype
            ),
            v,
        )
        mutable = ["batch_stats"] if train else False
        want = mod32.apply(v, x, mutable=mutable)
        monkeypatch.delenv("NEXTOU_F32_NORM", raising=False)
        mod16 = make_norm("batch", train=train, dtype=jnp.bfloat16)
        got = mod16.apply(v, x, mutable=mutable)
        if train:
            want, got = want[0], got[0]
        assert got.dtype == jnp.bfloat16, train
        wf = np.asarray(want, np.float64)
        gf = np.asarray(got, np.float64)
        # normalize-then-affine: term scale ~ |normalized|*scale + |bias|
        bound = 2.0 * _BF16_EPS * np.maximum(np.abs(wf), 1.0)
        assert (np.abs(gf - wf) <= bound).all(), (
            train, np.abs(gf - wf).max()
        )


def _tiny_plain_spec():
    """Conv-only tiny spec for model-level numerics-flag tests.

    NexToU's kNN neighbor selection is discontinuous: a ulp-level norm
    difference can flip a near-tie neighbor and cascade, so model-level
    tolerance comparisons across numerics flags are only meaningful on the
    conv path (same InstanceNorm/FoldedConv machinery, same interpreter)."""
    from nextou_tpu.models.plain_unet import build_plain_unet_spec

    return build_plain_unet_spec(
        in_channels=2,
        patch_size=(16, 16),
        n_stages=3,
        features_per_stage=(8, 16, 24),
        kernel_sizes=((3, 3),) * 3,
        strides=((1, 1), (2, 2), (2, 2)),
        n_conv_per_stage=(2, 2, 2),
        n_conv_per_stage_decoder=(2, 2),
        num_classes=3,
        deep_supervision=False,
    )


def test_model_scalar_ab_env_states_agree(monkeypatch):
    """Both NEXTOU_IN_SCALAR_AB env states through a full bf16 conv model:
    logits agree at bf16 accumulation scale (the InstanceNorm unit test above
    pins the 2-ulp bound; this checks nothing pathological accumulates)."""
    from nextou_tpu.models.plain_unet import PlainConvUNet
    from nextou_tpu.utils import fast_init

    spec = _tiny_plain_spec()
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((2, *spec.patch_size, spec.in_channels)),
        jnp.bfloat16,
    )
    model = PlainConvUNet(spec=spec, dtype=jnp.bfloat16)
    v = fast_init(model, 0, x, train=False)
    monkeypatch.setenv("NEXTOU_IN_SCALAR_AB", "0")
    want = model.apply(v, x, train=False)
    monkeypatch.setenv("NEXTOU_IN_SCALAR_AB", "1")
    got = model.apply(v, x, train=False)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    scale = np.maximum(np.abs(w), 1.0)
    assert (np.abs(g - w) <= 0.05 * scale).all(), np.abs(
        (g - w) / scale
    ).max()
    # and the default state must be the scalar-AB one (regression-pin)
    monkeypatch.delenv("NEXTOU_IN_SCALAR_AB", raising=False)
    dflt = model.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(dflt, np.float32), g)


def test_folded_conv_tuple_matches_concat():
    """Tuple-input FoldedConv (the NEXTOU_SPLIT_CONCAT building block):
    conv((a, b)) must equal conv(concat(a, b)) in forward AND gradients —
    it slices the SAME shared kernel parameter."""
    from nextou_tpu.nn.layers import FoldedConv

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((2, 6, 8, 10, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 6, 8, 10, 3)), jnp.float32)
    for k, s in [((3, 3, 3), (1, 1, 1)), ((1, 3, 3), (1, 1, 1))]:
        mod = FoldedConv(
            features=5, kernel_size=k, strides=s,
            padding=tuple(((kk - 1) // 2, (kk - 1) // 2) for kk in k),
        )
        v = mod.init(jax.random.PRNGKey(0), (a, b))
        v = {"params": {
            "kernel": jnp.asarray(
                rng.standard_normal(v["params"]["kernel"].shape), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal((5,)), jnp.float32),
        }}
        assert v["params"]["kernel"].shape[-2] == 7  # concat width
        want = mod.apply(v, jnp.concatenate([a, b], axis=-1))
        got = mod.apply(v, (a, b))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
            err_msg=f"{k} {s}",
        )

        def loss_tuple(v, a, b):
            y = mod.apply(v, (a, b))
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
            return jnp.sum(y * w) / y.size

        def loss_concat(v, a, b):
            y = mod.apply(v, jnp.concatenate([a, b], axis=-1))
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
            return jnp.sum(y * w) / y.size

        gt = jax.grad(loss_tuple, argnums=(0, 1, 2))(v, a, b)
        gc = jax.grad(loss_concat, argnums=(0, 1, 2))(v, a, b)
        for g, w_ in zip(jax.tree_util.tree_leaves(gt),
                         jax.tree_util.tree_leaves(gc)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w_), atol=3e-5, rtol=1e-5,
                err_msg=f"{k} {s}",
            )


def test_model_split_concat_env_agrees(monkeypatch):
    """NEXTOU_SPLIT_CONCAT=1 (decoder feeds (upsampled, skip) tuples into
    FoldedConv) must match the default concat model: forward and parameter
    gradients. Conv-only model — the FoldedConv unit test above pins the
    exact identity; InstanceNorm divisions then amplify f32 rounding, so
    the model-level bound is accumulation-scale."""
    from nextou_tpu.models.plain_unet import PlainConvUNet
    from nextou_tpu.utils import fast_init

    spec = _tiny_plain_spec()
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.standard_normal((2, *spec.patch_size, spec.in_channels)),
        jnp.float32,
    )
    model = PlainConvUNet(spec=spec, dtype=jnp.float32)
    v = fast_init(model, 0, x, train=False)

    # both states set explicitly: the default flipped to "1" (split) after
    # the round-4 in-model A/B, so "unset" no longer means concat
    monkeypatch.setenv("NEXTOU_SPLIT_CONCAT", "0")
    want = model.apply(v, x, train=False)
    monkeypatch.setenv("NEXTOU_SPLIT_CONCAT", "1")
    got = model.apply(v, x, train=False)
    w = np.asarray(want)
    g = np.asarray(got)
    scale = np.maximum(np.abs(w), 1.0)
    assert (np.abs(g - w) <= 1e-3 * scale).all(), np.abs(
        (g - w) / scale
    ).max()

    def loss(v, on):
        monkeypatch.setenv("NEXTOU_SPLIT_CONCAT", "1" if on else "0")
        outs = model.apply(v, x, train=False)
        return jnp.mean(jnp.square(outs))

    g1 = jax.grad(lambda v: loss(v, True))(v)
    g0 = jax.grad(lambda v: loss(v, False))(v)
    for a_, b_ in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g0)):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        s = np.maximum(np.abs(b_), 1e-3)
        assert (np.abs(a_ - b_) <= 1e-3 * s).all(), np.abs(
            (a_ - b_) / s
        ).max()


def test_stage_fold_matches_unfolded(monkeypatch):
    """NEXTOU_STAGE_FOLD=1 (stage-persistent fold of pointwise leading axes,
    conv_blocks.py) must match the default per-conv fold path: same params,
    same outputs (convs are the identical 2D lowering; BatchNorm statistics
    are fold-invariant), for plain and tuple (split-concat) inputs, train
    and eval, including a strided first conv on the non-leading axes."""
    from nextou_tpu.nn.conv_blocks import StackedConvBlocks

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 12, 10, 6)), jnp.float32)
    xt = (
        jnp.asarray(rng.standard_normal((2, 4, 12, 10, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 4, 12, 10, 4)), jnp.float32),
    )

    for inp, stride, tag in [
        (x, (1, 1, 1), "plain"),
        (x, (1, 2, 2), "strided"),
        (xt, (1, 1, 1), "tuple"),
    ]:
        mod = StackedConvBlocks(
            num_convs=2, features=8, kernel_size=(1, 3, 3),
            first_stride=stride, norm="batch",
        )
        shape_src = inp[0] if isinstance(inp, tuple) else inp
        monkeypatch.setenv("NEXTOU_STAGE_FOLD", "0")
        v = mod.init(jax.random.PRNGKey(0), inp, train=False)
        base_eval = mod.apply(v, inp, train=False)
        base_train, st0 = mod.apply(
            v, inp, train=True, mutable=["batch_stats"]
        )
        monkeypatch.setenv("NEXTOU_STAGE_FOLD", "1")
        v2 = mod.init(jax.random.PRNGKey(0), inp, train=False)
        # identical param tree STRUCTURE + shapes (full-rank kernels) in
        # both modes (values differ: init draws from a stateful host RNG)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a).shape, np.asarray(b).shape
            ),
            v["params"], v2["params"],
        )
        fold_eval = mod.apply(v, inp, train=False)
        fold_train, st1 = mod.apply(
            v, inp, train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(fold_eval), np.asarray(base_eval),
            rtol=1e-6, atol=1e-6, err_msg=f"{tag}: eval",
        )
        np.testing.assert_allclose(
            np.asarray(fold_train), np.asarray(base_train),
            rtol=1e-5, atol=1e-5, err_msg=f"{tag}: train",
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"{tag}: batch_stats",
            ),
            st0["batch_stats"], st1["batch_stats"],
        )


def test_dec2d_strided_matches_lax_conv(monkeypatch):
    """NEXTOU_DEC2D_STRIDED routes strided (3,3,3) convs through
    depth-batched 2D convs — must match lax.conv_general_dilated exactly
    (same taps, f32 accumulation), for both flagship strided geometries."""
    from nextou_tpu.nn.layers import _dec2d_conv

    rng = np.random.default_rng(5)
    for stride in [(1, 2, 2), (2, 2, 2)]:
        x = jnp.asarray(rng.standard_normal((2, 4, 12, 10, 5)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, 5, 7)) * 0.1, jnp.float32
        )
        pad = ((1, 1), (1, 1), (1, 1))
        want = jax.lax.conv_general_dilated(
            x, w, stride, pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
        )
        got = _dec2d_conv(x, w, pad, stride)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5,
            err_msg=f"stride {stride}",
        )
