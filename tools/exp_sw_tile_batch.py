"""Fused sliding-window tile-batch A/B (real TPU, headline workload).

The headline runs tile_batch 4 (one chunk for the 4-tile volume), but the
bare flagship forward is ~10% faster per patch at batch 2 than at batch 4
(PERF.md r3 table). This measures the fused device sliding window
(Gaussian, device argmax) at tile_batch {2, 4} in one process — per-volume
latency and a 4-volume pipelined stream, both including host fetch.

Run on TPU: python tools/exp_sw_tile_batch.py [tb1:tb2:...]
"""

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
    # configs: "tb" or "tb/split" (split in {0,1} -> model split_concat)
    cfgs = ["4/1", "4/0", "2/1"]
    if len(sys.argv) > 1:
        cfgs = sys.argv[1].split(":")
    spec = flagship_3d_spec(deep_supervision=False)
    x0 = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    model0 = NexToU(spec=spec, dtype=jnp.bfloat16)
    v = device_put_variables(
        fast_init(model0, 0, x0, train=False), jnp.bfloat16
    )
    jax.block_until_ready(v)
    vol = (
        np.random.default_rng(0)
        .standard_normal((64, 280, 240, spec.in_channels))
        .astype(np.float32)
    )
    # DEVICE-RESIDENT volumes: the tunneled upload (measured as low as
    # 10 MB/s on a bad day) otherwise floors the pipelined stream and
    # masks any compute difference. predict() skips jnp.asarray/astype
    # for an already-bf16 device array.
    vol_dev = jax.device_put(jnp.asarray(vol, jnp.bfloat16))
    vols_dev = [vol_dev + jnp.bfloat16(i) for i in range(4)]
    jax.block_until_ready(vols_dev)
    n_tiles = 4
    print("init done", flush=True)

    for cfg in cfgs:
        tb, _, split = cfg.partition("/")
        tb = int(tb)
        split_b = None if split == "" else split == "1"
        model = NexToU(spec=spec, dtype=jnp.bfloat16, split_concat=split_b)
        label = f"tb={tb} split={split or 'env'}"
        try:
            pred = make_device_sliding_predictor(
                lambda t: model.apply(v, t, train=False),
                None,
                spec.patch_size,
                spec.num_classes,
                tile_batch=tb,
                fused=True,
                output="seg",
            )
            t0 = time.perf_counter()
            np.asarray(pred(vol_dev))
            print(f"[{label}] compile+first {time.perf_counter()-t0:.0f}s",
                  flush=True)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(pred(vol_dev))
                times.append(time.perf_counter() - t0)
            t_vol = min(times)
            t0 = time.perf_counter()
            outs = [np.asarray(s) for s in [pred(w) for w in vols_dev]]
            t_stream = (time.perf_counter() - t0) / len(vols_dev)
            del outs
            print(
                f"[{label}] {t_vol:.3f} s/volume device-resident, "
                f"{t_stream:.3f} streamed -> "
                f"{n_tiles/min(t_vol, t_stream):.2f} tiles/s",
                flush=True,
            )
            del pred
        except Exception as e:  # noqa: BLE001
            print(f"[{label}] FAILED: {str(e).splitlines()[0][:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
