"""Micro-profile the pieces inside the two hottest grapher blocks."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from nextou_tpu.core.graph import (
        _l2_normalize,
        batched_index_select,
        pairwise_sq_dist,
        xy_pairwise_sq_dist,
    )
    from nextou_tpu.core.window import window_partition, window_reverse
    from nextou_tpu.nn.graph_conv import avg_pool, max_pool_with_argmax, max_unpool_scatter

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # ---- stage3 PoolGrapher shapes: x (2, 16,28,24, 264), r=2, k=28
    B, S, H, W, C = 2, 16, 28, 24, 264
    N = S * H * W
    k = 28
    x = jnp.asarray(rng.standard_normal((B, N, C)), dt)
    y = jnp.asarray(rng.standard_normal((B, N // 8, C)), dt)
    rel = jnp.asarray(rng.standard_normal((N, N // 8)), jnp.float32)

    dist_f = jax.jit(lambda x, y: xy_pairwise_sq_dist(_l2_normalize(x), _l2_normalize(y)))
    print(f"s3 dist (B,{N},{N//8}): {timeit(dist_f, x, y)*1e3:.2f} ms", flush=True)

    topk_f = jax.jit(lambda d: jax.lax.top_k(-d, k)[1])
    d = dist_f(x, y)
    print(f"s3 top_k(k={k}): {timeit(topk_f, d)*1e3:.2f} ms", flush=True)

    approx_f = jax.jit(lambda d: jax.lax.approx_max_k(-d, k)[1])
    print(f"s3 approx_max_k(k={k}): {timeit(approx_f, d)*1e3:.2f} ms", flush=True)

    idx = topk_f(d)
    gather_f = jax.jit(
        lambda y, idx, x: jnp.max(batched_index_select(y, idx) - x[:, :, None, :], 2)
    )
    print(f"s3 gather+maxrel: {timeit(gather_f, y, idx, x)*1e3:.2f} ms", flush=True)

    # gather via one-hot matmul of the max... only gather+max split:
    gmax_f = jax.jit(lambda y, idx: jnp.max(batched_index_select(y, idx), 2))
    print(f"s3 gather+max only: {timeit(gmax_f, y, idx)*1e3:.2f} ms", flush=True)

    # ---- stage2 SwinGrapher shapes: x (2, 32,56,48, 132), window (4,7,6), k=7
    B2, S2, H2, W2, C2 = 2, 32, 56, 48, 132
    win = (4, 7, 6)
    xs = jnp.asarray(rng.standard_normal((B2, S2, H2, W2, C2)), dt)

    part_f = jax.jit(
        lambda x: window_reverse(
            window_partition(jnp.roll(x, (-2, -3, -3), (1, 2, 3)), win), win,
            (S2, H2, W2),
        )
    )
    print(f"s2 roll+partition+reverse: {timeit(part_f, xs)*1e3:.2f} ms", flush=True)

    nw = (S2 // 4) * (H2 // 7) * (W2 // 6) * B2
    xw = jnp.asarray(rng.standard_normal((nw, 168, C2)), dt)
    wdist_f = jax.jit(lambda x: pairwise_sq_dist(_l2_normalize(x)))
    print(f"s2 window dist ({nw},168,168): {timeit(wdist_f, xw)*1e3:.2f} ms", flush=True)
    dw = wdist_f(xw)
    wtopk_f = jax.jit(lambda d: jax.lax.top_k(-d, 7)[1])
    print(f"s2 window top_k(7): {timeit(wtopk_f, dw)*1e3:.2f} ms", flush=True)
    idxw = wtopk_f(dw)
    wg_f = jax.jit(
        lambda y, idx, x: jnp.max(batched_index_select(y, idx) - x[:, :, None, :], 2)
    )
    print(f"s2 window gather+maxrel: {timeit(wg_f, xw, idxw, xw)*1e3:.2f} ms", flush=True)

    # batchnorm over node tensor (the hardcoded 'batch' norm in swin graphconv)
    import flax.linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.float32)
    xbn = jnp.asarray(rng.standard_normal((nw, 168, 2 * C2)), dt)
    vb = bn.init(jax.random.PRNGKey(0), xbn)
    bn_f = jax.jit(lambda v, x: bn.apply(v, x, mutable=["batch_stats"]))
    print(f"s2 batchnorm (train) on ({nw},168,{2*C2}): {timeit(bn_f, vb, xbn)*1e3:.2f} ms", flush=True)

    # pool/unpool at stage2 pool path: (2,32,56,48,132) pool (2,2,2)
    pool_f = jax.jit(lambda x: max_pool_with_argmax(x, (2, 2, 2)))
    print(f"s2 maxpool+argmax: {timeit(pool_f, xs)*1e3:.2f} ms", flush=True)
    pooled, arg = pool_f(xs)
    up = jnp.concatenate([pooled, pooled], -1)
    unpool_f = jax.jit(lambda v, a: max_unpool_scatter(v, a, (2, 2, 2)))
    print(f"s2 unpool scatter: {timeit(unpool_f, up, arg)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
