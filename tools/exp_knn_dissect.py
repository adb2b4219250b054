"""Dissect the fused kNN+max kernel's time at the two hot shapes.

Variants ablate one mechanism each (outputs are garbage except 'full'):
  full     — the production kernel body
  nosel    — no selection matmul (maxy from broadcast mins): VPU min loop only
  nominext — no min extraction (amin := round index): k selection matmuls only
  distonly — distance matmul + min reduce, no k loop
  half_k   — full body, k/2 rounds (loop-cost linearity check)

Run on TPU: python tools/exp_knn_dissect.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextou_tpu.utils.timing import device_loop_time


def _kernel(x_ref, yn_ref, yv_ref, rel_ref, out_ref, *, k, m_valid, mode):
    x = x_ref[...]
    yn = yn_ref[...]
    yv = yv_ref[...]
    bb, tile_n, _ = x.shape
    m = yn.shape[1]

    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)
    y_sq = jnp.sum(yn * yn, axis=-1, keepdims=True)
    inner = jax.lax.dot_general(
        x, yn, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dist = x_sq - 2.0 * inner + jnp.swapaxes(y_sq, 1, 2) + rel_ref[:][None]
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, tile_n, m), 2)
    dist = jnp.where(col < m_valid, dist, jnp.inf)

    if mode == "distonly":
        out_ref[...] = jnp.broadcast_to(
            jnp.min(dist, axis=-1, keepdims=True), out_ref.shape
        )
        return

    big = jnp.float32(jnp.inf)
    maxy = jnp.full((bb, tile_n, x.shape[-1]), -big, jnp.float32)

    def body(j, carry):
        dist, maxy = carry
        if mode == "nominext":
            amin = jnp.full((bb, tile_n, 1), j, jnp.int32)
        else:
            mins = jnp.min(dist, axis=-1, keepdims=True)
            amin = jnp.min(jnp.where(dist == mins, col, m), axis=-1, keepdims=True)
        if mode == "nosel":
            maxy = jnp.maximum(maxy, jnp.broadcast_to(mins, maxy.shape))
        else:
            onehot = (col == amin).astype(yv.dtype)
            sel = jax.lax.dot_general(
                onehot, yv, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            maxy = jnp.maximum(maxy, sel)
        if mode != "nominext":
            dist = jnp.where(col == amin, big, dist)
        return dist, maxy

    _, maxy = jax.lax.fori_loop(0, k, body, (dist, maxy))
    out_ref[...] = maxy


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "block_b", "mode"))
def run(xn, yn, yv, rel, *, k, tile_n, block_b, mode):
    B, N, C = xn.shape
    M = yn.shape[1]
    grid = (pl.cdiv(B, block_b), pl.cdiv(N, tile_n))
    kernel = functools.partial(_kernel, k=k, m_valid=M, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, M, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, M), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, tile_n, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
    )(xn, yn, yv, rel)


def bench_shape(tag, B, N, M, C, k, tile_n, block_b):
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    yn = jnp.asarray(rng.standard_normal((B, M, C)), jnp.float32)
    yv = jnp.asarray(rng.standard_normal((B, M, C)), jnp.bfloat16)
    rel = jnp.zeros((N, M), jnp.float32)
    print(f"-- {tag}: B={B} N={N} M={M} C={C} k={k} tile={tile_n} bb={block_b}",
          flush=True)
    for mode, kk in [
        ("full", k), ("half_k", max(1, k // 2)), ("nosel", k),
        ("nominext", k), ("distonly", k),
    ]:
        f = lambda xn: run(xn, yn, yv, rel, k=kk, tile_n=tile_n,
                           block_b=block_b, mode=mode)
        dt = device_loop_time(f, xn, n_small=2, n_large=20, repeats=2)
        print(f"  {mode:9s} k={kk:3d}: {dt*1e3:6.2f} ms", flush=True)


def main():
    # stage-3 pool grapher shape (cross-graph, big M)
    bench_shape("s3 pool", 2, 10752, 1344, 264, 28, 256, 1)
    # stage-2 swin windows (many small graphs)
    bench_shape("s2 swin", 1024, 168, 168, 132, 7, 176, 16)


if __name__ == "__main__":
    main()