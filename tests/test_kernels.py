"""Pallas kNN+max kernel parity vs the XLA reference path (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import os

os.environ["NEXTOU_PALLAS_INTERPRET"] = "1"  # run the kernel, not the fallback

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nextou_tpu.kernels import knn_max_neighbors, knn_max_neighbors_reference


@pytest.mark.parametrize("n,m,c,k", [(40, 40, 8, 5), (64, 16, 12, 4)])
def test_kernel_matches_reference_self_and_cross(n, m, c, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, n, c)), jnp.float32)
    if m == n:
        got = knn_max_neighbors(x, k)
        want = knn_max_neighbors_reference(x, k)
    else:
        y = jnp.asarray(rng.standard_normal((2, m, c)), jnp.float32)
        got = knn_max_neighbors(x, k, y=y)
        want = knn_max_neighbors_reference(x, k, y=y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_kernel_with_relative_pos():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 8)), jnp.float32)
    rel = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    got = knn_max_neighbors(x, 6, relative_pos=rel)
    want = knn_max_neighbors_reference(x, 6, relative_pos=rel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_kernel_unaligned_n():
    # N not a multiple of the tile: padded rows must not corrupt output
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 37, 8)), jnp.float32)
    got = knn_max_neighbors(x, 3, tile_n=16)
    want = knn_max_neighbors_reference(x, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_kernel_gradients_match_reference():
    """VJP of the fused kernel == VJP of the XLA path (selection non-diff,
    gradient routed to the per-channel argmax neighbor)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 30, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)

    g_self = jax.grad(lambda v: jnp.sum(jnp.tanh(knn_max_neighbors(v, 5))))(x)
    w_self = jax.grad(
        lambda v: jnp.sum(jnp.tanh(knn_max_neighbors_reference(v, 5)))
    )(x)
    np.testing.assert_allclose(np.asarray(g_self), np.asarray(w_self), atol=1e-5)

    g_x, g_y = jax.grad(
        lambda a, b: jnp.sum(jnp.tanh(knn_max_neighbors(a, 4, y=b))),
        argnums=(0, 1),
    )(x, y)
    w_x, w_y = jax.grad(
        lambda a, b: jnp.sum(jnp.tanh(knn_max_neighbors_reference(a, 4, y=b))),
        argnums=(0, 1),
    )(x, y)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(w_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_y), np.asarray(w_y), atol=1e-5)


def test_kernel_equals_mrconv_semantics():
    """maxrel = kernel(x) - x must equal gather-then-max-of-differences."""
    from nextou_tpu.core.graph import dilated_knn_graph, batched_index_select

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 24, 6)), jnp.float32)
    k = 4
    idx = dilated_knn_graph(x, k)
    xj = batched_index_select(x, idx)
    want = jnp.max(xj - x[:, :, None, :], axis=2)
    got = knn_max_neighbors(x, k) - x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_kernel_bf16_values_exact():
    # bf16 inputs route the *values* through the selection matmul in bf16
    # (kernels/knn.py::_kernel): gathering exactly-representable values with
    # a one-hot matmul + f32 accumulate must be BIT-identical to the XLA
    # reference path on the same bf16 values.
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 48, 16)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((2, 32, 16)), jnp.bfloat16)
    got = knn_max_neighbors(x, 5, y=y)
    want = knn_max_neighbors_reference(x, 5, y=y)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_kernel_batched_relative_pos_routes_to_reference():
    """A per-batch (B, N, M) bias is accepted (the XLA path supports it;
    the fused kernel shares one (N, M) bias) and matches the reference."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 24, 8)), jnp.float32)
    rel = jnp.asarray(rng.standard_normal((2, 24, 24)), jnp.float32)
    got = knn_max_neighbors(x, 5, relative_pos=rel)
    want = knn_max_neighbors_reference(x, 5, relative_pos=rel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_indices_path_matches_reference(monkeypatch):
    """Large-M dispatch: the indices-only kernel + XLA gather must equal the
    reference (and the fused path). Threshold lowered so interpret-mode
    shapes stay cheap."""
    monkeypatch.setenv("NEXTOU_KNN_IDX_M", "64")
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 48, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 96, 8)), jnp.float32)
    got = knn_max_neighbors(x, 5, y=y)
    want = knn_max_neighbors_reference(x, 5, y=y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # self-graph + relative-pos bias through the same branch
    rel = jnp.asarray(rng.standard_normal((96, 96)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 96, 8)), jnp.float32)
    got = knn_max_neighbors(x2, 6, relative_pos=rel)
    want = knn_max_neighbors_reference(x2, 6, relative_pos=rel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_indices_path_gradients(monkeypatch):
    """The indices path differentiates through gather+max with the SAME
    selection in fwd and bwd -- must match the reference VJP exactly."""
    monkeypatch.setenv("NEXTOU_KNN_IDX_M", "64")
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 72, 8)), jnp.float32)

    def loss_k(x):
        return jnp.sum(knn_max_neighbors(x, 4) ** 2)

    def loss_r(x):
        return jnp.sum(knn_max_neighbors_reference(x, 4) ** 2)

    gk = jax.grad(loss_k)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-4)


def test_auto_tile_growth_gated_to_bf16_coords(monkeypatch):
    """Round-3 incident regression (c90a264): the f32-coordinate kernel
    faulted the TPU worker at auto-grown query tiles, so auto tile growth
    (and the wider VMEM budget) must apply ONLY on the bf16-coordinate
    path; f32 keeps the bench-proven tile-256 setting. Verifies the
    dispatch decision via a spy AND runs both grown/ungrown kernels to
    parity against the XLA reference (interpret mode)."""
    import nextou_tpu.kernels.knn as knn_mod

    calls = []
    orig = knn_mod._knn_max_fused

    def spy(k, tile_n, block_b, interpret, train, x, y, rel):
        calls.append({"tile": tile_n, "bb": block_b, "train": train})
        return orig(k, tile_n, block_b, interpret, train, x, y, rel)

    monkeypatch.setattr(knn_mod, "_knn_max_fused", spy)
    rng = np.random.default_rng(11)
    base = rng.standard_normal((1, 1024, 16))

    # f32 coordinates: auto growth must be OFF -> tile stays at 256
    x32 = jnp.asarray(base, jnp.float32)
    got = knn_mod.knn_max_neighbors(x32, 5)
    want = knn_mod.knn_max_neighbors_reference(x32, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert calls[-1]["tile"] == 256, calls[-1]

    # bf16 coordinates (default NEXTOU_KNN_BF16=1): the query tile grows to
    # cover all 1024 rows in one latency-bound grid step
    monkeypatch.delenv("NEXTOU_KNN_BF16", raising=False)
    xbf = jnp.asarray(base, jnp.bfloat16)
    got = knn_mod.knn_max_neighbors(xbf, 5)
    want = knn_mod.knn_max_neighbors_reference(xbf, 5)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
    assert calls[-1]["tile"] == 1024, calls[-1]

    # NEXTOU_KNN_BF16=0 forces f32 coordinates for bf16 inputs too ->
    # growth gate closes again
    monkeypatch.setenv("NEXTOU_KNN_BF16", "0")
    got = knn_mod.knn_max_neighbors(xbf, 5)
    want = knn_mod.knn_max_neighbors_reference(xbf, 5)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
    assert calls[-1]["tile"] == 256, calls[-1]

    # train=True default (round-4): the INDICES kernel carries training
    # (one selection shared by fwd/bwd) — the fused kernel must NOT be hit
    monkeypatch.delenv("NEXTOU_KNN_BF16", raising=False)
    n_fused = len(calls)
    got = knn_mod.knn_max_neighbors(xbf, 5, train=True)
    want = knn_mod.knn_max_neighbors_reference(xbf, 5, train=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
    assert len(calls) == n_fused, "train=True should use the indices path"

    # NEXTOU_KNN_TRAIN_IDX=0 reverts training to the fused kernel: f32
    # selection + tile pinned at 256 — bf16 auto-grown tiles crashed the
    # TPU worker inside the remat-replayed backward at flagship scale
    # (tools/bench_train_step.py bisect)
    monkeypatch.setenv("NEXTOU_KNN_TRAIN_IDX", "0")
    got = knn_mod.knn_max_neighbors(xbf, 5, train=True)
    want = knn_mod.knn_max_neighbors_reference(xbf, 5, train=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
    assert calls[-1]["tile"] == 256 and calls[-1]["train"], calls[-1]
    # ... and NEXTOU_KNN_TRAIN_BF16=1 opts training back into bf16
    # selection but still NOT into tile growth
    monkeypatch.setenv("NEXTOU_KNN_TRAIN_BF16", "1")
    got = knn_mod.knn_max_neighbors(xbf, 5, train=True)
    want = knn_mod.knn_max_neighbors_reference(xbf, 5, train=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
    assert calls[-1]["tile"] == 256, calls[-1]


def test_knn_train_idx_path_bitwise_jitted(monkeypatch):
    """The training default (NEXTOU_KNN_TRAIN_IDX=1) must be BIT-identical
    to the XLA fallback — value AND jitted gradient — on CPU at HIGHEST
    precision, across every call pattern the graphers use (self/cross-set,
    with/without relative_pos). This is the primitive-level contract the
    round-5 adjudication of test_fused_trajectory rests on: any residual
    trajectory drift at defaults is fusion-level reassociation OUTSIDE this
    op, not a selection/value/cotangent defect (kernels/knn.py)."""
    monkeypatch.setenv("NEXTOU_KNN_TRAIN_IDX", "1")
    rng = np.random.default_rng(1)
    cases = [
        ("self+rel", 4, 168, 168, 12, 7, True, True),
        ("self", 2, 336, 336, 12, 14, False, True),
        ("cross", 2, 336, 84, 12, 14, False, False),
        ("cross+rel", 2, 336, 84, 12, 14, True, False),
    ]
    for name, B, N, M, C, k, use_rel, self_graph in cases:
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        y = (
            None
            if self_graph
            else jnp.asarray(rng.standard_normal((B, M, C)), jnp.float32)
        )
        rel = (
            jnp.asarray(rng.standard_normal((N, M)) * 0.1, jnp.float32)
            if use_rel
            else None
        )
        g = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

        def loss(fn, x_):
            out = fn(x_, k, y=y, relative_pos=rel, train=True)
            return jnp.sum(out * g), out

        (vk, ok), gk = jax.jit(
            jax.value_and_grad(
                lambda x_: loss(knn_max_neighbors, x_), has_aux=True
            )
        )(x)
        (vr, orf), gr = jax.jit(
            jax.value_and_grad(
                lambda x_: loss(knn_max_neighbors_reference, x_), has_aux=True
            )
        )(x)
        np.testing.assert_array_equal(
            np.asarray(ok), np.asarray(orf), err_msg=f"{name}: out"
        )
        np.testing.assert_array_equal(
            np.asarray(gk), np.asarray(gr), err_msg=f"{name}: grad"
        )
        assert float(vk) == float(vr), (name, float(vk), float(vr))


def test_knn_train_mode2_pallas_backward(monkeypatch):
    """NEXTOU_KNN_TRAIN_IDX=2 (fused fwd emitting indices + Pallas one-hot
    matmul backward): forward must be BIT-identical to the fallback;
    gradients must match the XLA VJP to f32 add-order (allclose), and
    BIT-exactly on a construction where every candidate receives at most
    one cotangent contribution (scatter order then cannot matter)."""
    monkeypatch.setenv("NEXTOU_KNN_TRAIN_IDX", "2")
    rng = np.random.default_rng(7)
    for name, B, N, M, C, k, use_rel, self_graph in [
        ("self+rel", 4, 168, 168, 12, 7, True, True),
        ("cross", 2, 336, 84, 12, 14, False, False),
    ]:
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        y = (
            None
            if self_graph
            else jnp.asarray(rng.standard_normal((B, M, C)), jnp.float32)
        )
        rel = (
            jnp.asarray(rng.standard_normal((N, M)) * 0.1, jnp.float32)
            if use_rel
            else None
        )
        g = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

        def loss(fn, x_):
            out = fn(x_, k, y=y, relative_pos=rel, train=True)
            return jnp.sum(out * g), out

        (vk, ok), gk = jax.value_and_grad(
            lambda x_: loss(knn_max_neighbors, x_), has_aux=True
        )(x)
        (vr, orf), gr = jax.value_and_grad(
            lambda x_: loss(knn_max_neighbors_reference, x_), has_aux=True
        )(x)
        np.testing.assert_array_equal(
            np.asarray(ok), np.asarray(orf), err_msg=f"{name}: fwd"
        )
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=1e-5, atol=1e-6,
            err_msg=f"{name}: grad",
        )

    # order-unambiguous construction: N queries, each with k unique nearest
    # candidates DISJOINT from every other query's (M = N*k clusters) —
    # each candidate gets exactly one (n, j) contribution, so the scatter
    # is a permutation and must be bit-exact vs the XLA VJP.
    N2, k2, C2 = 16, 3, 8
    M2 = N2 * k2
    qs = rng.standard_normal((1, N2, C2)).astype(np.float32) * 10
    cands = np.repeat(qs[0], k2, axis=0) + 0.01 * rng.standard_normal(
        (M2, C2)
    ).astype(np.float32)
    xq = jnp.asarray(qs)
    yc = jnp.asarray(cands[None])
    g2 = jnp.asarray(rng.standard_normal((1, N2, C2)), jnp.float32)

    def loss2(fn, y_):
        out = fn(xq, k2, y=y_, relative_pos=None, train=True)
        return jnp.sum(out * g2)

    gk2 = jax.grad(lambda y_: loss2(knn_max_neighbors, y_))(yc)
    gr2 = jax.grad(lambda y_: loss2(knn_max_neighbors_reference, y_))(yc)
    np.testing.assert_array_equal(np.asarray(gk2), np.asarray(gr2))
