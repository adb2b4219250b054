"""North-star workload: Gaussian-blended sliding-window inference of one
volume through the flagship model.

Variants: host (host-side accumulate), device (HBM-resident accumulate,
split programs), fused (one dispatch per volume). Flags: --tta (8-way mirror
averaging), --seg (device argmax, int16 out). Timing includes the host fetch
(np.asarray) — through a tunneled transport block_until_ready may not block,
and serving needs the result on host anyway.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
from nextou_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["host", "device", "fused"])
    ap.add_argument("--tta", action="store_true", help="8-way mirror TTA")
    ap.add_argument("--seg", action="store_true", help="device argmax output")
    ap.add_argument("--tile-batch", type=int, default=2)
    args = ap.parse_args()

    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.utils import fast_init
    from nextou_tpu.infer import (
        make_device_sliding_predictor, make_tile_predictor,
        sliding_window_predict,
    )

    spec = flagship_3d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    x0 = jnp.zeros((args.tile_batch, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    t0 = time.perf_counter()
    from nextou_tpu.utils.transfer import device_put_variables
    v = device_put_variables(fast_init(model, 0, x0, train=False), jnp.bfloat16)
    jax.block_until_ready(v)
    print(f"init+put {time.perf_counter()-t0:.0f}s", flush=True)

    def apply_fn(x):
        return model.apply(v, x, train=False)

    mirror = (0, 1, 2) if args.tta else None
    vol = np.random.default_rng(0).standard_normal((64, 280, 240, 1)).astype(np.float32)

    if args.which == "host":
        tp = make_tile_predictor(apply_fn, mirror)
        pred = lambda d: sliding_window_predict(  # noqa: E731
            tp, d, spec.patch_size, spec.num_classes, tile_batch=args.tile_batch
        )
    else:
        pred = make_device_sliding_predictor(
            apply_fn, mirror, spec.patch_size, spec.num_classes,
            tile_batch=args.tile_batch, fused=args.which == "fused",
            output="seg" if args.seg else "probs",
        )

    t0 = time.perf_counter()
    out = np.asarray(pred(vol))
    print(f"compile+first-run {time.perf_counter()-t0:.0f}s", flush=True)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = np.asarray(pred(vol))
    dt = (time.perf_counter() - t0) / n
    tag = f"{args.which}{'+tta' if args.tta else ''}{'+seg' if args.seg else ''}"
    print(f"{tag}: {dt*1e3:.0f} ms/volume (4 tiles, out {out.shape} {out.dtype})",
          flush=True)


if __name__ == "__main__":
    main()