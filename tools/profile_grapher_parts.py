"""Micro-profile the pieces inside the two hottest grapher blocks.

Uses in-device loop timing (utils/timing.py) — through the tunneled TPU,
block_until_ready does not block, so naive wall-clocking measures dispatch
only.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nextou_tpu.utils.timing import device_loop_time


def t(name, f, x, n_large=34):
    dt = device_loop_time(f, x, n_small=2, n_large=n_large, repeats=2)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


def main():
    from nextou_tpu.core.graph import (
        _l2_normalize,
        batched_index_select,
        pairwise_sq_dist,
        xy_pairwise_sq_dist,
    )
    from nextou_tpu.core.window import window_partition, window_reverse
    from nextou_tpu.kernels.knn import knn_max_neighbors
    from nextou_tpu.nn.graph_conv import avg_pool, max_pool_with_argmax, max_unpool_scatter

    rng = np.random.default_rng(0)
    dt_ = jnp.bfloat16

    # ---- stage3 PoolGrapher shapes: x (2, 16,28,24, 264), r=2, k=28
    B, S, H, W, C = 2, 16, 28, 24, 264
    N = S * H * W
    k = 28
    x = jnp.asarray(rng.standard_normal((B, N, C)), dt_)
    y = jnp.asarray(rng.standard_normal((B, N // 8, C)), dt_)
    rel = jnp.asarray(rng.standard_normal((N, N // 8)), jnp.float32)

    t("s3 dist+topk+gather+maxrel (XLA ref path)",
      lambda x: jnp.max(
          batched_index_select(
              y, jax.lax.top_k(
                  -(xy_pairwise_sq_dist(_l2_normalize(x), _l2_normalize(y))
                    + rel), k)[1]
          ) - x[:, :, None, :], 2), x)
    t("s3 fused pallas knn_max", lambda x: knn_max_neighbors(x, k, y=y, relative_pos=rel) - x, x)

    # ---- stage2 SwinGrapher: windows (1024,168,C2), k=7
    C2 = 132
    nw = 1024
    xw = jnp.asarray(rng.standard_normal((nw, 168, C2)), dt_)
    t("s2 win dist+topk+gather+maxrel (XLA)",
      lambda xw: jnp.max(
          batched_index_select(
              xw, jax.lax.top_k(-pairwise_sq_dist(_l2_normalize(xw)), 7)[1]
          ) - xw[:, :, None, :], 2), xw)
    t("s2 fused pallas knn_max", lambda xw: knn_max_neighbors(xw, 7) - xw, xw)

    # partition/reverse + pool/unpool on the full stage-2 map
    xs = jnp.asarray(rng.standard_normal((2, 32, 56, 48, C2)), dt_)
    win = (4, 7, 6)
    t("s2 roll+partition+reverse",
      lambda x: window_reverse(
          window_partition(jnp.roll(x, (-2, -3, -3), (1, 2, 3)), win), win,
          (32, 56, 48)), xs)
    t("s2 maxpool+argmax+unpool",
      lambda x: max_unpool_scatter(
          jnp.concatenate([max_pool_with_argmax(x, (2, 2, 2))[0]] * 2, -1),
          max_pool_with_argmax(x, (2, 2, 2))[1], (2, 2, 2)), xs)


def main2():
    """fc/norm/FFN micro-costs at stage-2 swin shapes (the big non-kernel
    chunk of the GNN time)."""
    import flax.linen as nn
    from nextou_tpu.nn.layers import GroupedMLP, InstanceNorm
    from nextou_tpu.nn.graphers import FFN

    rng = np.random.default_rng(0)
    B, S, H, W, C = 2, 64, 112, 96, 132
    x = jnp.asarray(rng.standard_normal((B, S, H, W, C)), jnp.bfloat16)

    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
    vbn = bn.init(jax.random.PRNGKey(0), x)
    t("s2 batchnorm(eval)", lambda x: bn.apply(vbn, x), x, n_large=10)

    inorm = InstanceNorm(dtype=jnp.bfloat16)
    vin = inorm.init(jax.random.PRNGKey(0), x)
    t("s2 instancenorm", lambda x: inorm.apply(vin, x), x, n_large=10)

    dense = nn.Dense(C, dtype=jnp.bfloat16)
    vd = dense.init(jax.random.PRNGKey(0), x)
    t("s2 dense CxC (fc1/fc2 core)", lambda x: dense.apply(vd, x), x, n_large=10)

    gm = GroupedMLP(channels=(2 * C, 2 * C), act_name="leakyrelu", norm="instance", groups=6, dtype=jnp.bfloat16)
    x2 = jnp.concatenate([x, x], axis=-1)
    vg = gm.init({"params": jax.random.PRNGKey(0)}, x2, train=False)
    t("s2 grouped MLP 2Cx2C g6 (+IN)", lambda x2: gm.apply(vg, x2, train=False), x2, n_large=6)

    ffn = FFN(hidden_features=4 * C, act_name="leakyrelu", norm="batch", dtype=jnp.bfloat16)
    vf = ffn.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x, train=False)
    t("s2 FFN (4x expand, bn)", lambda x: ffn.apply(vf, x, train=False), x, n_large=6)


import sys as _sys
if __name__ == "__main__":
    (main2 if len(_sys.argv) > 1 and _sys.argv[1] == "parts2" else main)()
