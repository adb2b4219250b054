"""Fused kNN + neighbor-max Pallas TPU kernel.

The hot op of every grapher is: L2-normalize features, squared-distance
matrix (+ relative-pos bias), top-k selection, gather the k neighbor rows,
max-reduce them (reference ``torch_edge.py:58-90`` + ``torch_nn.py:94-115``
+ the max in ``NexToU_Encoder_Decoder.py:407``). Because MRConv's
aggregation is ``max_j(x_j - x_i) = (max_j x_j) - x_i``, the kernel never
needs per-edge tensors or even the indices — it returns, per query node, the
per-channel max over its k selected neighbors.

Why a kernel: XLA's ``lax.top_k`` at NexToU's shapes costs ~14 ms (full sort
machinery) and the (B, N, k, C) gather materializes hundreds of MB in HBM.
This kernel keeps the distance tile in VMEM, does k rounds of
min-extraction (VPU) and selects each winner row with a one-hot MXU matmul —
the distance matrix, indices, and gathered neighbors never touch HBM.

Semantics notes:
- ties break to the lowest index (same as ``torch.topk``/``lax.top_k``),
- query-row/batch padding added by Pallas is harmless (out-of-range output
  writes are dropped); the candidate axis is never gridded (each block sees
  all M columns), and the in-kernel +inf mask over ``col >= m_valid`` is
  defense-in-depth against physical lane padding only,
- only dilation == 1 is fused (always true for <= 8-stage NexToU configs,
  SURVEY.md §2.3); callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextou_tpu.core.graph import _l2_normalize, dense_knn, batched_index_select


def _kernel(x_ref, yn_ref, yv_ref, *refs, k: int, m_valid: int):
    """A (BB, TILE_N, C) block of query tiles against their M candidates.

    x_ref:  (BB, TILE_N, C) normalized queries (f32)
    yn_ref: (BB, M, C) normalized candidates (f32)
    yv_ref: (BB, M, C) raw candidate values (f32)
    refs: (rel_ref, out_ref) or just (out_ref,) — rel_ref is the (TILE_N, M)
        additive distance bias (f32), present only when the caller has one
        (shared across the BB graphs: it encodes node positions, identical
        per window/batch element); omitting it for no-bias calls saves an
        N*M f32 HBM buffer + its per-grid-step VMEM streaming
    out_ref: (BB, TILE_N, C) per-channel max over the k nearest candidates

    BB > 1 batches several small graphs (Swin windows) through one grid
    step: the distance and selection matmuls become batched dot_generals,
    which keeps the MXU busy where a single 168-node window cannot.
    """
    if len(refs) == 2:
        rel_ref, out_ref = refs
    else:
        (out_ref,) = refs
        rel_ref = None
    x = x_ref[...]
    yn = yn_ref[...]
    yv = yv_ref[...]  # value dtype (bf16 on the prod path — see caller)
    bb, tile_n, _ = x.shape
    m = yn.shape[1]

    # Square-sums accumulate in f32 regardless of the coordinate dtype
    # (bf16 accumulation over C terms injects per-CANDIDATE noise into
    # y_sq, which unlike x_sq shifts the argmin ordering). The inner
    # product runs in the coordinate dtype: bf16 coordinates make it a
    # 1-pass MXU dot (the AMP reference's fp16 matmul analog); f32
    # coordinates keep the exact multi-pass form.
    xf = x.astype(jnp.float32)
    ynf = yn.astype(jnp.float32)
    x_sq = jnp.sum(xf * xf, axis=-1, keepdims=True)  # (BB, TILE_N, 1)
    y_sq = jnp.sum(ynf * ynf, axis=-1, keepdims=True)  # (BB, M, 1)
    inner = jax.lax.dot_general(
        x, yn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BB, TILE_N, M)
    dist = x_sq - 2.0 * inner + jnp.swapaxes(y_sq, 1, 2)
    if rel_ref is not None:
        dist = dist + rel_ref[:][None]

    col = jax.lax.broadcasted_iota(jnp.int32, (bb, tile_n, m), 2)
    # mask out candidate padding (Pallas pads the block to tile multiples)
    dist = jnp.where(col < m_valid, dist, jnp.inf)

    big = jnp.float32(jnp.inf)
    maxy = jnp.full((bb, tile_n, x.shape[-1]), -big, jnp.float32)

    def search(dist):
        # VPU: extract the current winner (first-occurrence argmin) and
        # knock it out of the distance tile
        mins = jnp.min(dist, axis=-1, keepdims=True)  # (BB, TILE_N, 1)
        amin = jnp.min(
            jnp.where(dist == mins, col, m), axis=-1, keepdims=True
        )  # (BB, TILE_N, 1)
        return amin, jnp.where(col == amin, big, dist)

    def gather(maxy, amin):
        # MXU: winner rows via one-hot matmul (BB, TILE_N, M) @ (BB, M, C).
        # The one-hot is exact in the value dtype and f32 accumulation of a
        # single selected value is exact — so in bf16 (the prod value dtype)
        # this is bit-identical to the f32 form at bf16 MXU rates. These k
        # selection matmuls are ~k/(k+1) of the kernel's MXU work.
        onehot = (col == amin).astype(yv.dtype)
        # bf16 values: 1.0 * value is exact in bf16 at bf16 MXU rates.
        # f32 values: pin HIGHEST, or the default TPU matmul precision
        # rounds the f32 values to bf16 mid-gather — breaking the kernel's
        # exactness contract on exactly the path that exists for exactness.
        sel = jax.lax.dot_general(
            onehot, yv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(
                None
                if yv.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            ),
        )
        return jnp.maximum(maxy, sel)

    # Serial search -> gather per round. A software-pipelined variant
    # (gather round j-1's winner while searching round j's) was measured
    # 2x *slower* at the Swin-window shapes (7.4-8.1 ms vs 4.1 ms for
    # enc2-swin): the extra live buffers in the loop carry cost more in
    # VMEM pressure/spills than the VPU/MXU overlap buys.
    def body(j, carry):
        dist, maxy = carry
        amin, dist = search(dist)
        return dist, gather(maxy, amin)

    _, maxy = jax.lax.fori_loop(0, k, body, (dist, maxy))
    out_ref[...] = maxy


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "block_b", "interpret")
)
def _knn_max_pallas(xn, yn, yv, rel, *, k, tile_n, block_b, interpret):
    B, N, C = xn.shape
    M = yn.shape[1]
    grid = (pl.cdiv(B, block_b), pl.cdiv(N, tile_n))

    kernel = functools.partial(_kernel, k=k, m_valid=M)
    in_specs = [
        pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (xn, yn, yv)
    if rel is not None:
        in_specs.append(
            pl.BlockSpec((tile_n, M), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        operands = operands + (rel,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        # the compiler's default scoped-vmem budget is 16 MiB and its
        # accounting of the kernel body's stack (dist/onehot temporaries)
        # runs above our block-spec estimate; raise the per-kernel limit so
        # block sizes are governed by est_vmem below, not the 16 MiB default
        # (v5e has 128 MiB VMEM; 64 MiB leaves double-buffer headroom)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(*operands)
    return out


def _idx_kernel(x_ref, yn_ref, *refs, k: int, m_valid: int):
    """Indices-only variant: same distance+serial-min search as `_kernel`,
    but the winners' INDICES are the output — no per-round one-hot gather.

    Why it exists: the gather matmuls are k*N*M*C FLOPs — at the pool
    graphers' M (5-10k candidates) they are ~k/(k+1) of the fused kernel's
    MXU work (854 GFLOP at the stage-3 shape), while the actual data needed
    out is only (N, k) indices. For large M the cheap way is: kernel emits
    indices, XLA gathers (B, N, k, C) and max-reduces — N*k*C memory work
    with no M factor. Bonus: forward and backward then share one selection
    (stop_gradient on the indices), eliminating the backward-selection
    near-tie caveat of the fused path on exactly the shapes where it was
    hardest to argue.
    """
    if len(refs) == 2:
        rel_ref, out_ref = refs
    else:
        (out_ref,) = refs
        rel_ref = None
    x = x_ref[...]
    yn = yn_ref[...]
    bb, tile_n, _ = x.shape
    m = yn.shape[1]

    # f32-accumulated square-sums + coordinate-dtype inner product,
    # mirroring `_kernel` (see comment there).
    xf = x.astype(jnp.float32)
    ynf = yn.astype(jnp.float32)
    x_sq = jnp.sum(xf * xf, axis=-1, keepdims=True)
    y_sq = jnp.sum(ynf * ynf, axis=-1, keepdims=True)
    inner = jax.lax.dot_general(
        x, yn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dist = x_sq - 2.0 * inner + jnp.swapaxes(y_sq, 1, 2)
    if rel_ref is not None:
        dist = dist + rel_ref[:][None]
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, tile_n, m), 2)
    dist = jnp.where(col < m_valid, dist, jnp.inf)

    big = jnp.float32(jnp.inf)
    colk = jax.lax.broadcasted_iota(jnp.int32, (bb, tile_n, out_ref.shape[2]), 2)

    def body(j, carry):
        dist, idxs = carry
        mins = jnp.min(dist, axis=-1, keepdims=True)
        amin = jnp.min(
            jnp.where(dist == mins, col, m), axis=-1, keepdims=True
        )
        dist = jnp.where(col == amin, big, dist)
        idxs = jnp.where(colk == j, amin, idxs)
        return dist, idxs

    _, idxs = jax.lax.fori_loop(
        0, k, body,
        (dist, jnp.zeros((bb, tile_n, out_ref.shape[2]), jnp.int32)),
    )
    out_ref[...] = idxs


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "block_b", "interpret")
)
def _knn_indices_pallas(xn, yn, rel, *, k, tile_n, block_b, interpret):
    """Top-k neighbor indices, (B, N, k) int32 (first-occurrence ties)."""
    B, N, C = xn.shape
    M = yn.shape[1]
    grid = (pl.cdiv(B, block_b), pl.cdiv(N, tile_n))
    kernel = functools.partial(_idx_kernel, k=k, m_valid=M)
    in_specs = [
        pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (xn, yn)
    if rel is not None:
        in_specs.append(
            pl.BlockSpec((tile_n, M), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        operands = operands + (rel,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, tile_n, k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(*operands)


def _maxidx_kernel(x_ref, yn_ref, yv_ref, *refs, k: int, m_valid: int):
    """`_kernel` that ALSO emits the selected indices (BB, TILE_N, k).

    The training forward (NEXTOU_KNN_TRAIN_IDX=2): one kernel produces the
    per-channel neighbor max (same exact semantics as `_kernel`) plus the
    selection, so the custom VJP can save only (values, idx, out) and run
    the backward as one-hot MXU matmuls (`_bwd_kernel`) instead of XLA's
    materialized (B*N*k, C) gathers + irregular scatters (~128 ms/step in
    the round-5 train trace)."""
    if len(refs) == 3:
        rel_ref, out_ref, idx_ref = refs
    else:
        (out_ref, idx_ref) = refs
        rel_ref = None
    x = x_ref[...]
    yn = yn_ref[...]
    yv = yv_ref[...]
    bb, tile_n, _ = x.shape
    m = yn.shape[1]

    xf = x.astype(jnp.float32)
    ynf = yn.astype(jnp.float32)
    x_sq = jnp.sum(xf * xf, axis=-1, keepdims=True)
    y_sq = jnp.sum(ynf * ynf, axis=-1, keepdims=True)
    inner = jax.lax.dot_general(
        x, yn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dist = x_sq - 2.0 * inner + jnp.swapaxes(y_sq, 1, 2)
    if rel_ref is not None:
        dist = dist + rel_ref[:][None]
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, tile_n, m), 2)
    dist = jnp.where(col < m_valid, dist, jnp.inf)

    big = jnp.float32(jnp.inf)
    maxy = jnp.full((bb, tile_n, x.shape[-1]), -big, jnp.float32)
    colk = jax.lax.broadcasted_iota(jnp.int32, (bb, tile_n, k), 2)
    idxs0 = jnp.zeros((bb, tile_n, k), jnp.int32)

    def body(j, carry):
        dist, maxy, idxs = carry
        mins = jnp.min(dist, axis=-1, keepdims=True)
        amin = jnp.min(
            jnp.where(dist == mins, col, m), axis=-1, keepdims=True
        )
        dist = jnp.where(col == amin, big, dist)
        idxs = jnp.where(colk == j, amin, idxs)
        onehot = (col == amin).astype(yv.dtype)
        sel = jax.lax.dot_general(
            onehot, yv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(
                None
                if yv.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            ),
        )
        return dist, jnp.maximum(maxy, sel), idxs

    _, maxy, idxs = jax.lax.fori_loop(0, k, body, (dist, maxy, idxs0))
    out_ref[...] = maxy
    idx_ref[...] = idxs


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "block_b", "interpret")
)
def _knn_max_idx_pallas(xn, yn, yv, rel, *, k, tile_n, block_b, interpret):
    B, N, C = xn.shape
    M = yn.shape[1]
    grid = (pl.cdiv(B, block_b), pl.cdiv(N, tile_n))
    kernel = functools.partial(_maxidx_kernel, k=k, m_valid=M)
    in_specs = [
        pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = (xn, yn, yv)
    if rel is not None:
        in_specs.append(
            pl.BlockSpec((tile_n, M), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        operands = operands + (rel,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, tile_n, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(*operands)


def _bwd_kernel(yv_ref, idx_ref, maxy_ref, g_ref, gy_ref, eq_ref, *, k: int,
                n_valid: int, tile_n: int):
    """Cotangent scatter for max-over-selected-neighbors, all on the MXU.

    For query block rows n and their k selected candidates idx[n, j]:
        gy[m, c] += sum_{n, j: idx[n,j]=m} eq[n,j,c] * g[n,c] / cnt[n,c]
    where eq[n,j,c] = (yv[idx[n,j], c] == maxy[n,c]) and cnt = sum_j eq —
    exactly `jnp.max`'s VJP (ties split evenly). Pass 1: k one-hot gather
    matmuls (onehot_j @ yv, exact like the forward) compute the tie masks,
    cached in a VMEM scratch, and their sum cnt. Pass 2: k TRANSPOSED
    one-hot matmuls scatter eq*g/cnt into the (M, C) gradient. 2k matmuls
    per tile; no (N, k, C) tensor ever reaches HBM.

    gy_ref is revisited across the query-tile grid axis (accumulated in
    VMEM, written once per batch block).
    """
    i = pl.program_id(1)
    yv = yv_ref[...]
    idx = idx_ref[...]  # (BB, TILE, k)
    maxy = maxy_ref[...]  # (BB, TILE, C) value dtype
    g = g_ref[...].astype(jnp.float32)
    bb, m, c = yv.shape
    tile = idx.shape[1]

    # zero padded query rows (the last tile may run past N)
    row = jax.lax.broadcasted_iota(jnp.int32, (bb, tile, 1), 1)
    g = jnp.where(row + i * tile_n < n_valid, g, 0.0)

    colm = jax.lax.broadcasted_iota(jnp.int32, (bb, tile, m), 2)
    colk = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 2)

    def onehot_at(j):
        # column j of idx via an iota-masked min (Mosaic has no
        # dynamic_slice on a traced loop index); idx values are < m so the
        # m fill never wins
        a = jnp.min(
            jnp.where(colk == j, idx, m), axis=2, keepdims=True
        )  # (BB, TILE, 1)
        return colm == a

    def gather_eq(j):
        oh = onehot_at(j).astype(yv.dtype)
        sel = jax.lax.dot_general(
            oh, yv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=(
                None
                if yv.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            ),
        )  # (BB, TILE, C) f32 — exact values
        return (sel == maxy.astype(jnp.float32)).astype(jnp.float32)

    def count(j, acc):
        eq = gather_eq(j)
        # scratch layout (BB, k, TILE, C): j indexes a MAJOR axis, so the
        # dynamic store is a contiguous (TILE, C) block — no sublane-offset
        # stores (the Mosaic failure mode of the im2col kernel, PERF.md)
        eq_ref[:, pl.ds(j, 1), :, :] = eq[:, None, :, :]
        return acc + eq

    cnt = jax.lax.fori_loop(
        0, k, count, jnp.zeros((bb, tile, c), jnp.float32)
    )
    # every row has >= 1 tie with its own max; padded rows divide garbage
    # but their g is already zeroed
    gv = g / jnp.maximum(cnt, 1.0)

    def scatter(j, acc):
        eq = eq_ref[:, pl.ds(j, 1), :, :][:, 0, :, :]
        contrib = eq * gv  # (BB, TILE, C)
        oh = onehot_at(j).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            oh, contrib, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BB, M, C)

    part = jax.lax.fori_loop(
        0, k, scatter, jnp.zeros((bb, m, c), jnp.float32)
    )

    @pl.when(i == 0)
    def _():
        gy_ref[...] = jnp.zeros(gy_ref.shape, gy_ref.dtype)

    gy_ref[...] += part


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "block_b", "interpret")
)
def _knn_max_bwd_pallas(yv, idx, maxy, g, *, k, tile_n, block_b, interpret):
    B, M, C = yv.shape
    N = idx.shape[1]
    grid = (pl.cdiv(B, block_b), pl.cdiv(N, tile_n))
    kernel = functools.partial(
        _bwd_kernel, k=k, n_valid=N, tile_n=tile_n
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, tile_n, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_b, k, tile_n, C), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 << 20,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(yv, idx, maxy, g)


def _coord_dtype(raw_dtype, train: bool = False) -> jnp.dtype:
    """Dtype the *normalized coordinates* are held in for selection.

    bf16 models select on bf16-rounded normalized features (the inner
    product becomes a 1-pass MXU dot — the analog of the AMP reference's
    fp16 distance matmul, torch_edge.py under autocast; square-sums still
    accumulate in f32, see `_kernel`). Any other model dtype keeps exact
    f32 coordinates. NEXTOU_KNN_BF16=0 reverts to f32 everywhere. Applied
    IDENTICALLY to the fused kernel and the XLA fallback so the two paths
    stay mutually consistent.

    TRAIN steps select in f32 (round-4 measurement, tools/bench_train_step:
    f32 selection is *faster* in the train step — 1.60 vs 1.44 patches/s —
    and matches the reference's fp32 no-grad graph build during training,
    torch_edge.py:154-163; bf16 selection's 4.6 ms win is an inference
    property). NEXTOU_KNN_TRAIN_BF16=1 opts training back in.
    """
    if train and os.environ.get("NEXTOU_KNN_TRAIN_BF16", "0") != "1":
        return jnp.float32
    if (
        raw_dtype == jnp.bfloat16
        and os.environ.get("NEXTOU_KNN_BF16", "1") == "1"
    ):
        return jnp.bfloat16
    return jnp.float32


def knn_max_neighbors_reference(
    x: jax.Array,
    k: int,
    y: jax.Array | None = None,
    relative_pos: jax.Array | None = None,
    train: bool = False,
) -> jax.Array:
    """Pure-XLA fallback: normalize, kNN, gather, max over neighbors."""
    cdt = _coord_dtype(x.dtype, train)
    xn = _l2_normalize(x.astype(jnp.float32), axis=-1).astype(cdt)
    yn = (
        xn
        if y is None
        else _l2_normalize(y.astype(jnp.float32), axis=-1).astype(cdt)
    )
    idx = dense_knn(xn, k, y=None if y is None else yn, relative_pos=relative_pos)
    vals = x if y is None else y
    return jnp.max(batched_index_select(vals, idx), axis=2)


# --- autodiff for the fused kernel ----------------------------------------
#
# The kNN *selection* carries no gradient (the reference builds the graph
# under ``torch.no_grad()``, ``torch_edge.py:59``); gradients flow only
# through the gathered neighbor values and the max. The backward pass
# recomputes the selection with the XLA path (one extra distance matrix —
# no residuals from the kernel are needed) and routes the cotangent to each
# per-channel argmax neighbor, exactly the VJP of the reference expression.
#
# Caveat (documented, accepted): the forward selects on the Mosaic dot's
# rounding and the backward on XLA's — at NEAR-TIED distances the two can
# pick different (equally-near) neighbors, so the cotangent may route to a
# neighbor whose value differs by O(tie gap). That is a valid subgradient
# of an epsilon-perturbed objective (the same class of noise bf16 compute
# already injects); pinning both sides to exact-f32 selection would cost a
# 6-pass distance matmul in the kernel AND per-step backward for an effect
# below bf16 rounding. Exact-selection parity of the two paths at HIGHEST
# precision is covered by tests/test_kernels.py (interpret mode).


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _knn_max_fused(
    k: int, tile_n: int, block_b: int, interpret: bool, train: bool, x, y, rel
):
    cdt = _coord_dtype(x.dtype, train)
    xn = _l2_normalize(x.astype(jnp.float32), axis=-1).astype(cdt)
    yn = _l2_normalize(y.astype(jnp.float32), axis=-1).astype(cdt)
    # keep the *values* in bf16 when that's the model dtype: the selection
    # matmul gathers them exactly (see _kernel), at bf16 MXU rates and half
    # the VMEM; any other dtype goes through f32 as before.
    yv = y if y.dtype == jnp.bfloat16 else y.astype(jnp.float32)
    out = _knn_max_pallas(
        xn, yn, yv, rel, k=k, tile_n=tile_n,
        block_b=block_b, interpret=interpret,
    )
    return out.astype(x.dtype)


def _knn_max_fused_fwd(k, tile_n, block_b, interpret, train, x, y, rel):
    return (
        _knn_max_fused(k, tile_n, block_b, interpret, train, x, y, rel),
        (x, y, rel),
    )


def _knn_max_fused_bwd(k, tile_n, block_b, interpret, train, res, g):
    x, y, rel = res

    def ref(xv, yv):
        cdt = _coord_dtype(xv.dtype, train)
        xn = _l2_normalize(xv.astype(jnp.float32), axis=-1).astype(cdt)
        yn = _l2_normalize(yv.astype(jnp.float32), axis=-1).astype(cdt)
        idx = dense_knn(xn, k, y=yn, relative_pos=rel)
        return jnp.max(batched_index_select(yv, idx), axis=2).astype(xv.dtype)

    _, vjp = jax.vjp(ref, x, y)
    gx, gy = vjp(g)
    return gx, gy, None if rel is None else jnp.zeros_like(rel)


_knn_max_fused.defvjp(_knn_max_fused_fwd, _knn_max_fused_bwd)


# --- training mode 2: fused forward + Pallas one-hot-matmul backward ------
#
# NEXTOU_KNN_TRAIN_IDX=2. The forward is the fused kernel extended to emit
# the selected indices (`_maxidx_kernel`); the VJP saves only (values, idx,
# out) and computes the value cotangent with `_bwd_kernel` — gather +
# scatter both as one-hot MXU matmuls, so the (B, N, k, C) gathered tensor
# and XLA's irregular scatter (~128 ms/step at flagship scale, round-5
# train trace) never exist. Tie handling matches `jnp.max`'s VJP exactly
# (cotangent split evenly over tied maxima); the residual numerical
# difference vs the XLA path is pure f32 ADD ORDER in the scatter
# accumulation (ours: per-tile sequential; XLA's: scatter order) — ulp
# level, covered by the mode-2 kernel tests, NOT bit-identical (which is
# why interpret/CPU keeps mode 1 as the default and the strict trajectory
# test pins mode 1 semantics).


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _knn_max_train2(
    k: int, tile_n: int, block_b: int, interpret: bool, train: bool, x, y, rel
):
    out, _ = _knn_max_train2_fwd(k, tile_n, block_b, interpret, train, x, y, rel)
    return out


def _knn_max_train2_fwd(k, tile_n, block_b, interpret, train, x, y, rel):
    cdt = _coord_dtype(x.dtype, train)
    xn = _l2_normalize(x.astype(jnp.float32), axis=-1).astype(cdt)
    yn = _l2_normalize(y.astype(jnp.float32), axis=-1).astype(cdt)
    yv = y if y.dtype == jnp.bfloat16 else y.astype(jnp.float32)
    maxy, idx = _knn_max_idx_pallas(
        xn, yn, yv, rel, k=k, tile_n=tile_n,
        block_b=block_b, interpret=interpret,
    )
    out = maxy.astype(x.dtype)
    return out, (yv, idx, out, rel)


def _knn_max_train2_bwd(k, tile_n, block_b, interpret, train, res, g):
    yv, idx, out, rel = res
    gy = _knn_max_bwd_pallas(
        yv, idx, out.astype(yv.dtype), g,
        k=k, tile_n=tile_n, block_b=block_b, interpret=interpret,
    )
    gx = jnp.zeros_like(g)  # selection carries no gradient
    return (
        gx,
        gy.astype(yv.dtype),
        None if rel is None else jnp.zeros_like(rel),
    )


_knn_max_train2.defvjp(_knn_max_train2_fwd, _knn_max_train2_bwd)


def knn_max_neighbors(
    x: jax.Array,
    k: int,
    y: jax.Array | None = None,
    relative_pos: jax.Array | None = None,
    *,
    tile_n: int | None = None,
    train: bool = False,
) -> jax.Array:
    """Per-channel max over the k nearest neighbors of each node.

    Args:
        x: (B, N, C) query/node features (raw; normalization is internal).
        y: optional (B, M, C) candidate set (raw); defaults to ``x``.
        relative_pos: optional (N, M) additive distance bias; a per-batch
            (B, N, M) bias is accepted and routed to the XLA path.
        tile_n: query-tile rows per grid step. ``None`` (production) sizes
            it automatically: the kernel's serial k-round loop is LATENCY
            bound per grid step (round-3 trace), so fewer/bigger grid steps
            win — grow the tile while the VMEM estimate stays inside
            ``NEXTOU_KNN_VMEM_MB`` (default 28, v5e-swept). An explicit
            value pins it (the sweep tool uses this).
        train: True inside a training step. Selects in f32 (see
            `_coord_dtype`) and PINS the query tile at the round-2-proven
            256: auto-GROWN tiles crashed the TPU worker inside the
            remat-replayed backward at flagship scale (round-4 bisect,
            tools/bench_train_step.py — conv-only and growth-suppressed
            configs pass, grown-tile config faults deterministically),
            while the same grown kernels are bench-proven in inference.
    Returns:
        (B, N, C) in x.dtype.
    """
    B, N, C = x.shape
    vals = x if y is None else y
    M = vals.shape[1]
    # Resolve where the computation will actually run: a `with
    # jax.default_device(cpu)` scope (e.g. tools/verify_flagship_import.py's
    # fp32-CPU oracle in a TPU process) must route to the XLA fallback even
    # when the process default backend is TPU.
    default_dev = jax.config.jax_default_device
    if default_dev is None:
        platform = jax.devices()[0].platform
    elif isinstance(default_dev, str):  # jax also accepts platform names
        platform = default_dev
    else:
        platform = default_dev.platform
    interpret = platform != "tpu"

    def fallback():
        # honor the 'returns x.dtype' contract on every path (the reference
        # helper returns the VALUE dtype, which differs on mixed-dtype calls)
        return knn_max_neighbors_reference(
            x, k, y, relative_pos, train=train
        ).astype(x.dtype)

    if interpret and os.environ.get("NEXTOU_PALLAS_INTERPRET", "0") != "1":
        # the Pallas interpreter is an order of magnitude slower than the
        # XLA path — off-TPU it exists for kernel parity tests only
        # (tests set NEXTOU_PALLAS_INTERPRET=1)
        return fallback()
    if relative_pos is not None and relative_pos.ndim == 3:
        # per-batch (B, N, M) bias: the fused kernel shares one (N, M) bias
        # across the batch block; the XLA path supports rank 3 directly
        return fallback()

    # keyed on the VALUE set's dtype: _knn_max_fused keeps yv bf16 only when
    # y itself is bf16 (knn.py:175) — estimating from x.dtype would
    # undercount VMEM for a mixed-dtype (bf16 x, f32 y) call
    val_bytes = 2 if vals.dtype == jnp.bfloat16 else 4
    # coordinate blocks (xn/yn) are held at the selection dtype
    coord_bytes = 2 if _coord_dtype(x.dtype, train) == jnp.bfloat16 else 4

    def est_vmem(bb: int, t: int) -> int:
        # double-buffered operand/output blocks + rel (when present) +
        # dist/iota/onehot/argmin scratch (~4x the distance tile);
        # calibrated against the v5e compiler's scoped-vmem accounting for
        # the serial kernel body. yn at coord dtype, yv the value dtype,
        # out f32.
        rel_bytes = 2 * t * M * 4 if relative_pos is not None else 0
        return (
            2 * bb * M * C * (coord_bytes + val_bytes)
            + 2 * bb * t * C * (coord_bytes + 4)
            + rel_bytes
            + 4 * bb * t * M * 4
        )

    # Dispatch order (all v5e-measured, tools/bench_knn_shapes.py +
    # /tmp/tpu_knn_sweep round 3): (1) the fully fused kernel whenever its
    # VMEM estimate fits — at every real flagship grapher shape (M <= 1344)
    # it beats the indices path 2-4x because its "gather" is a dense one-hot
    # MXU matmul while XLA's take on a (B, N, k) gather is irregular-slow;
    # (2) the indices-only kernel + XLA gather when the fused candidate
    # block can no longer fit (large M): its VMEM scales with tile*M, not
    # M*C, and at N=M=10752 it measures 9.3 ms vs 221 ms for the XLA
    # fallback (24x); (3) plain XLA. NEXTOU_KNN_IDX_M optionally FORCES the
    # indices path at M >= threshold (tests use it; default off).
    # On the indices path, selection carries no gradient (the reference
    # builds the graph under no_grad); fwd and bwd share ONE selection, so
    # the fused path's backward near-tie caveat does not exist there.
    idx_threshold = int(os.environ.get("NEXTOU_KNN_IDX_M", "0") or 0)

    auto_tile = tile_n is None
    tile_req = 256 if auto_tile else tile_n
    # Auto tile GROWTH (and the wider VMEM budget that enables it) is
    # restricted to the bf16-coordinate INFERENCE path: the f32-coordinate
    # kernel faulted the TPU worker twice at auto-grown tiles (round-3 A/B,
    # NEXTOU_KNN_BF16=0 runs), and the bf16 grown-tile kernels fault it
    # inside the remat-replayed backward at flagship scale (round-4 bisect)
    # — while the round-2 tile-256/15MB settings are bench-proven in both
    # contexts, so f32 and training keep exactly those.
    bf16_coords = _coord_dtype(x.dtype, train) == jnp.bfloat16
    if bf16_coords and not train:
        vmem_budget = (
            int(os.environ.get("NEXTOU_KNN_VMEM_MB", "28") or 28) << 20
        )
    else:
        auto_tile = False
        vmem_budget = 15 << 20
        if train:
            # experiment knob: the round-4 crash bisect pinned TRAIN tiles
            # at 256 for the OLD fused-bwd path; the mode-2 kernels differ,
            # so NEXTOU_KNN_TRAIN_TILE allows re-probing larger tiles
            # (with a proportionally wider budget) without touching the
            # proven default
            t_env = os.environ.get("NEXTOU_KNN_TRAIN_TILE", "")
            if t_env and auto_tile is False and tile_n is None:
                tile_req = int(t_env)
                vmem_budget = max(vmem_budget, (tile_req // 256) * (15 << 20))
    bb_budget = int(os.environ.get("NEXTOU_KNN_BB_MB", "11") or 11) << 20

    def try_idx_path():
        if k > M or (interpret and N * M > 1 << 22):
            return None
        tile = min(tile_req, _round_up(N, 8))

        def est_idx_vmem(t: int) -> int:
            rel_bytes = 2 * t * M * 4 if relative_pos is not None else 0
            # x/yn blocks (double-buffered) + dist & temporaries (~3x t*M)
            cb = 2 if _coord_dtype(x.dtype, train) == jnp.bfloat16 else 4
            return 2 * (t + M) * C * cb + rel_bytes + 3 * t * M * 4

        while est_idx_vmem(tile) > (48 << 20) and tile > 8:
            tile = _round_up(tile // 2, 8)
        if est_idx_vmem(tile) > (48 << 20):
            return None
        cdt = _coord_dtype(x.dtype, train)
        xn = _l2_normalize(x.astype(jnp.float32), axis=-1).astype(cdt)
        yn = (
            xn
            if y is None
            else _l2_normalize(y.astype(jnp.float32), axis=-1).astype(cdt)
        )
        rel = (
            None
            if relative_pos is None
            else jnp.broadcast_to(relative_pos.astype(jnp.float32), (N, M))
        )
        # stop_gradient on the INPUTS (not just the output): selection
        # carries no gradient, and this keeps the pallas_call out of
        # the autodiff path entirely (no JVP rule needed)
        idx = _knn_indices_pallas(
            jax.lax.stop_gradient(xn),
            jax.lax.stop_gradient(yn),
            None if rel is None else jax.lax.stop_gradient(rel),
            k=k, tile_n=tile, block_b=1,
            interpret=interpret,
        )

        # Checkpoint the gather+max ON TPU ONLY: the (B, N, k, C)
        # gathered-neighbor tensor would otherwise be SAVED for the max's
        # VJP (~100 MB per pool grapher at flagship scale — OOMed the B=2
        # 'big'-remat train step, round-4); recomputing one gather in the
        # backward keeps only the (B, N, k) int32 indices (<1 MB) live.
        # Off-TPU (interpret mode) the barrier is SKIPPED: gather/max
        # contain no float arithmetic, but the remat boundary perturbs
        # XLA:CPU's global fusion (FMA formation in SURROUNDING ops),
        # breaking bit-parity with the fallback — round-5 adjudication of
        # the red test_fused_trajectory: selection/values/cotangents are
        # bit-exact vs the fallback at HIGHEST precision; the 50-step
        # trajectory split was entirely the checkpoint's ulp-level fusion
        # perturbation (loss bit-matches with the barrier removed). CPU
        # RAM needs no remat, so the barrier only exists where it pays.
        def _gather_max(vals):
            return jnp.max(batched_index_select(vals, idx), axis=2)

        if not interpret:
            _gather_max = jax.checkpoint(_gather_max)

        return _gather_max(vals).astype(x.dtype)

    if idx_threshold and M >= idx_threshold:
        forced = try_idx_path()
        if forced is not None:
            return forced

    # TRAIN dispatch (NEXTOU_KNN_TRAIN_IDX):
    #   "1" — indices kernel + XLA gather/max: fwd and bwd share ONE Pallas
    #         selection (stop_gradient on idx), backward is the gather/max
    #         VJP. Bit-identical to the fallback on CPU (the round-5
    #         adjudication's strict contract); 798 vs 809 ms/step fused.
    #   "2" — fused forward emitting indices + Pallas one-hot-matmul
    #         backward (`_knn_max_train2`): no (B, N, k, C) gather tensor,
    #         no XLA scatter (~128 ms/step of both at flagship scale,
    #         round-5 train trace). Same shared-selection property; the
    #         value cotangent differs from the XLA path only in f32 add
    #         order (ulp). Dispatched at the bottom where the fused-kernel
    #         tile/VMEM sizing lives; falls back to "1" at large M.
    #   "0" — legacy fused kernel whose bwd re-selects via XLA dense_knn.
    # Default: "2" on TPU (measured round 5), "1" in interpret/CPU mode —
    # keeps the off-TPU path bit-exact vs the fallback for the strict
    # trajectory test. Inference always keeps the fused kernel (one-hot
    # MXU gather beats XLA's take 2-4x; no backward to pay for).
    train_mode = (
        os.environ.get("NEXTOU_KNN_TRAIN_IDX", "1" if interpret else "2")
        if train
        else None
    )
    if train_mode == "1":
        out = try_idx_path()
        if out is not None:
            return out

    # Per-graph VMEM footprint: candidate tiles (2x), query/out tiles,
    # plus dist/iota/onehot scratch (~4x tile*M).
    tile = min(tile_req, _round_up(N, 8))

    # Small graphs (Swin windows: N = M = prod(window)) underfill the MXU
    # one-at-a-time; batch several per grid step within the VMEM budget.
    block_b = 1
    if N <= 512:
        while block_b * 2 <= B and est_vmem(block_b * 2, tile) <= bb_budget:
            block_b *= 2
    elif auto_tile:
        # large graphs: the k-round serial loop is latency-bound per grid
        # step — grow the query tile (fewer, fatter grid steps) while the
        # footprint fits the budget
        while (
            tile < _round_up(N, 8)
            and tile < 2048
            and est_vmem(block_b, tile * 2) <= vmem_budget
        ):
            tile *= 2
    if interpret and (N * M > 1 << 22):
        # interpreter mode is slow; don't run huge shapes off-TPU
        return fallback()
    # shrink the query tile until the footprint fits before giving up on
    # the kernel (the candidate block is the irreducible part)
    while est_vmem(block_b, tile) > vmem_budget and tile > 8:
        tile = _round_up(tile // 2, 8)
    if est_vmem(block_b, tile) > vmem_budget or k > M:
        # fused kernel can't fit this M — the indices kernel (tile*M VMEM,
        # no M*C candidate block) usually still can, and beats plain XLA 24x
        # at N=M~10k (see dispatch note above)
        out = try_idx_path()
        return fallback() if out is None else out

    rel = (
        None
        if relative_pos is None
        else jnp.broadcast_to(relative_pos.astype(jnp.float32), (N, M))
    )
    if train_mode == "2":
        return _knn_max_train2(k, tile, block_b, interpret, train, x, vals, rel)
    if train_mode == "1":
        # idx path declined (interpret size guard) — "1" semantics continue
        # on the fused kernel, as before the mode split
        pass
    # self-graph: pass x as the candidate set too; JAX accumulates the two
    # cotangent paths back onto x automatically.
    return _knn_max_fused(k, tile, block_b, interpret, train, x, vals, rel)
