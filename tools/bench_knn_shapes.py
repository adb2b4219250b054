"""Bench the production fused kNN kernel at every flagship grapher shape.

Shapes from models/spec.py flagship_3d_spec (batch 2); swin shapes fold the
window count into the graph batch. Sweeps tile_n to find per-shape blocking.

Run on TPU: python tools/bench_knn_shapes.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from nextou_tpu.kernels.knn import knn_max_neighbors
from nextou_tpu.utils.timing import device_loop_time

# (tag, B, N, M, C, k) — M == N means self-graph
SHAPES = [
    ("enc2 pool", 2, 10752, 168, 132, 14),
    ("enc3 pool", 2, 10752, 1344, 264, 28),
    ("enc4 pool", 2, 1344, 1344, 324, 32),
    ("enc5 pool", 2, 168, 168, 324, 32),
    ("enc2 swin", 1024, 168, 168, 132, 7),
    ("enc3 swin", 128, 168, 168, 264, 14),
    ("enc4 swin", 16, 168, 168, 324, 14),
    ("enc5 swin", 2, 168, 168, 324, 28),
    # decoder mirrors (same shapes as enc3/enc4/enc2-swin etc.)
]


def main():
    rng = np.random.default_rng(0)
    # "auto" = tile_n=None (production auto-sizing; pair with
    # NEXTOU_KNN_VMEM_MB / NEXTOU_KNN_BB_MB sweeps)
    tiles = [None if t == "auto" else int(t) for t in sys.argv[1:]] or [256]
    total = {t: 0.0 for t in tiles}
    for tag, B, N, M, C, k in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
        y = None
        if M != N:
            y = jnp.asarray(rng.standard_normal((B, M, C)), jnp.bfloat16)
        row = f"{tag:10s} B={B:5d} N={N:6d} M={M:5d} C={C} k={k:3d}:"
        for t in tiles:
            f = lambda x: knn_max_neighbors(x, k, y=y, tile_n=t)
            dt = device_loop_time(f, x, n_small=2, n_large=20, repeats=2)
            row += f"  t{t or chr(97)}={dt*1e3:6.2f}ms"
            total[t] += dt
        print(row, flush=True)
    for t in tiles:
        print(f"total t{t}: {total[t]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()