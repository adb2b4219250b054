"""North-star workload: Gaussian-blended sliding-window inference of one
volume through the flagship model — host-accumulate vs device-resident."""
import sys, time
sys.path.insert(0, "/root/repo")
from nextou_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp

def main(which):
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.utils import fast_init
    from nextou_tpu.infer import (
        make_device_sliding_predictor, make_tile_predictor,
        sliding_window_predict,
    )
    spec = flagship_3d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    t0 = time.perf_counter()
    v = jax.device_put(fast_init(model, jax.random.PRNGKey(0), x0, train=False))
    jax.block_until_ready(v)
    print(f"init+put {time.perf_counter()-t0:.0f}s", flush=True)
    def apply_fn(x):
        return model.apply(v, x, train=False)
    vol = np.random.default_rng(0).standard_normal((64, 280, 240, 1)).astype(np.float32)
    if which == "fused":
        pred = make_device_sliding_predictor(apply_fn, None, spec.patch_size, spec.num_classes, tile_batch=2, fused=True)
        t0 = time.perf_counter()
        out = pred(vol); jax.block_until_ready(out)
        print(f"compile+first-run {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            out = pred(vol); jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
    elif which == "device":
        pred = make_device_sliding_predictor(apply_fn, None, spec.patch_size, spec.num_classes, tile_batch=2)
        t0 = time.perf_counter()
        out = pred(vol); jax.block_until_ready(out)  # compile + warm
        print(f"compile+first-run {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            out = pred(vol); jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
    else:
        tp = make_tile_predictor(apply_fn, None)
        _ = sliding_window_predict(tp, vol, spec.patch_size, spec.num_classes, tile_batch=2)
        t0 = time.perf_counter()
        for _ in range(3):
            out = sliding_window_predict(tp, vol, spec.patch_size, spec.num_classes, tile_batch=2)
        dt = (time.perf_counter() - t0) / 3
    print(f"{which}: {dt*1e3:.0f} ms/volume (4 tiles, no TTA)", flush=True)

main(sys.argv[1])
