"""Bisect the round-3 default bundle against the fused sliding-window OOM.

BENCH_r03 crashed: jit(run_fused) (the whole-volume fused sliding window,
tile_batch 4) exhausted HBM during compile, with the dump pointing at
nn/layers.py conv/leaky_relu temps in transposed layouts that round 2's
green run (f32 norms/logits) did not produce. This tool compiles the fused
predictor once per env configuration and prints PASS/OOM, so the flag that
shifts XLA's layout assignment can be identified on the real chip without
running the full bench.

Usage:
    python tools/exp_oom_bisect.py "CONFIG[:CONFIG...]"

where CONFIG is a comma-separated env assignment list plus an optional
``tb=N`` tile-batch override, e.g.:

    python tools/exp_oom_bisect.py \
      "defaults:NEXTOU_IN_SCALAR_AB=0:NEXTOU_F32_NORM=1:defaults,tb=2"

Each config compiles fresh (the flags are read at trace time); compiled
executables are dropped between configs.
"""

import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")

FLAG_KEYS = (
    "NEXTOU_IN_SCALAR_AB",
    "NEXTOU_F32_NORM",
    "NEXTOU_F32_LOGITS",
    "NEXTOU_KNN_BF16",
    "NEXTOU_SPLIT_CONCAT",
    "NEXTOU_NO_FOLD",
)


def main():
    from nextou_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"backend: {jax.default_backend()}", flush=True)

    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.utils import fast_init
    from nextou_tpu.utils.transfer import device_put_variables

    spec = flagship_3d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    x = jnp.zeros((2, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    variables = fast_init(model, 0, x, train=False)
    variables = device_put_variables(variables, jnp.bfloat16)
    jax.block_until_ready(variables)
    print("init done", flush=True)

    from nextou_tpu.infer import make_device_sliding_predictor

    vol_shape = (64, 280, 240)  # 4 flagship tiles, the bench volume
    vol = np.zeros((*vol_shape, spec.in_channels), np.float32)

    configs = sys.argv[1].split(":") if len(sys.argv) > 1 else ["defaults"]
    results = {}
    for cfg in configs:
        tb = 4
        env = {}
        for kv in cfg.split(","):
            if kv in ("defaults", ""):
                continue
            k, v = kv.split("=", 1)
            if k == "tb":
                tb = int(v)
            else:
                env[k] = v
        for k in FLAG_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        label = f"tb={tb} " + (",".join(f"{k}={v}" for k, v in env.items()) or "defaults")
        predictor = make_device_sliding_predictor(
            lambda t: model.apply(variables, t, train=False),
            None,
            spec.patch_size,
            spec.num_classes,
            tile_batch=tb,
            fused=True,
            output="seg",
        )
        t0 = time.perf_counter()
        try:
            seg = np.asarray(predictor(vol))
            dt = time.perf_counter() - t0
            results[label] = f"PASS ({dt:.0f}s compile+run, seg {seg.shape})"
            del seg
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            msg = str(e)
            kind = "OOM" if ("RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()) else "FAIL"
            first = msg.splitlines()[0][:160] if msg else type(e).__name__
            results[label] = f"{kind} ({dt:.0f}s) {first}"
        print(f"[bisect] {label}: {results[label]}", flush=True)
        del predictor
        gc.collect()

    print("\n==== summary ====")
    for k, v in results.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
