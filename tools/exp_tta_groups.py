"""A/B of TTA mirror grouping in the fused sliding window (real TPU).

TTA on 16 GB HBM backs off to tile_batch 2, so each of the 8 mirror
forwards runs at batch 2 while the flagship forward is fastest near
batch 4. NEXTOU_TTA_BATCH_MIRRORS=g stacks g mirror variants per forward
(batch g*T). This measures volume latency for g in {off, 2, 4} at
tile_batch 2, catching OOM per config.

Run on TPU: python tools/exp_tta_groups.py [g1:g2:...]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from nextou_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from nextou_tpu.models import NexToU
from nextou_tpu.models.presets import flagship_3d_spec
from nextou_tpu.utils import fast_init
from nextou_tpu.utils.transfer import device_put_variables
from nextou_tpu.infer import make_device_sliding_predictor


def main():
    groups = ["0", "2", "4"]
    if len(sys.argv) > 1:
        groups = sys.argv[1].split(":")
    spec = flagship_3d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    v = device_put_variables(fast_init(model, 0, x0, train=False), jnp.bfloat16)
    jax.block_until_ready(v)
    vol = (
        np.random.default_rng(0)
        .standard_normal((64, 280, 240, spec.in_channels))
        .astype(np.float32)
    )
    n_tiles = 4
    print("init done", flush=True)

    results = {}
    for g in groups:
        os.environ["NEXTOU_TTA_BATCH_MIRRORS"] = g
        label = f"g={g}"
        try:
            pred = make_device_sliding_predictor(
                lambda t: model.apply(v, t, train=False),
                (0, 1, 2),
                spec.patch_size,
                spec.num_classes,
                tile_batch=2,
                fused=True,
                output="seg",
            )
            t0 = time.perf_counter()
            np.asarray(pred(vol))
            print(f"[{label}] compile+first {time.perf_counter()-t0:.0f}s",
                  flush=True)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(pred(vol))
                times.append(time.perf_counter() - t0)
            t = min(times)
            results[label] = t
            print(
                f"[{label}] {t:.3f} s/volume -> {n_tiles/t:.2f} tiles/s",
                flush=True,
            )
            del pred
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            print(f"[{label}] FAILED: {msg.splitlines()[0][:140]}", flush=True)
    print("\n==== summary ====")
    for k, t in results.items():
        print(f"{k}: {t:.3f} s/volume -> {n_tiles/t:.2f} tiles/s")


if __name__ == "__main__":
    main()
