"""Per-component TPU timing for the flagship config.

Times (jitted, steady-state): the full NexToU forward, a conv-only U-Net of
the same dims, and each grapher block at its real stage shape — to rank
optimization targets. Run on the real chip: ``python tools/profile_tpu.py``.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.models.plain_unet import build_plain_unet_spec
    from nextou_tpu.nn.graphers import PoolGrapher, SwinGrapher
    from nextou_tpu.utils import fast_init

    B = 2
    dt = jnp.bfloat16
    spec = flagship_3d_spec(deep_supervision=False)

    # full model
    model = NexToU(spec=spec, dtype=dt)
    x = jnp.zeros((B, *spec.patch_size, 1), dt)
    v = jax.device_put(fast_init(model, 0, x, train=False))
    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t = timeit(f, v, x)
    print(f"NexToU fwd: {t*1e3:.1f} ms/step ({B/t:.2f} patches/s)", flush=True)

    # conv-only U-Net, same dims
    pspec = build_plain_unet_spec(
        in_channels=1, patch_size=spec.patch_size, n_stages=6,
        features_per_stage=[33, 66, 132, 264, 324, 324],
        kernel_sizes=[(1, 3, 3)] + [(3, 3, 3)] * 5,
        strides=[(1, 1, 1), (1, 2, 2)] + [(2, 2, 2)] * 4,
        n_conv_per_stage=[2] * 6, n_conv_per_stage_decoder=[2] * 5,
        num_classes=14, deep_supervision=False,
    )
    pm = NexToU(spec=pspec, dtype=dt)
    pv = jax.device_put(fast_init(pm, 0, x, train=False))
    pf = jax.jit(lambda v, x: pm.apply(v, x, train=False))
    t = timeit(pf, pv, x)
    print(f"PlainConvUNet fwd (same dims): {t*1e3:.1f} ms/step", flush=True)

    # graphers at real stage shapes (encoder stages 2..5)
    stage_cfgs = []
    for si in (2, 3, 4, 5):
        st = spec.encoder[si]
        stage_cfgs.append((si, st))
    for si, st in stage_cfgs:
        shape = (B, *st.img_shape, st.features)
        xg = jnp.zeros(shape, dt)
        pool_b, swin_b = st.gnn
        pg = PoolGrapher(
            img_shape=st.img_shape, pool_size=pool_b.pool_size, k=pool_b.k,
            dilation=pool_b.dilation, reduce_ratio=pool_b.reduce_ratio,
            norm="instance", norm_op="batch", stochastic=True, epsilon=0.2,
            groups=6, dtype=dt,
        )
        pv2 = jax.device_put(fast_init(pg, 0, xg, train=False))
        t = timeit(jax.jit(lambda v, x: pg.apply(v, x, train=False)), pv2, xg)
        print(f"stage{si} PoolGrapher {shape}: {t*1e3:.1f} ms", flush=True)

        sg = SwinGrapher(
            window_size=swin_b.window_size, shift_size=swin_b.shift_size,
            k=swin_b.k, dilation=swin_b.dilation, norm_op="batch",
            stochastic=True, epsilon=0.2, groups=6, dtype=dt,
        )
        sv = jax.device_put(fast_init(sg, 0, xg, train=False))
        t = timeit(jax.jit(lambda v, x: sg.apply(v, x, train=False)), sv, xg)
        print(f"stage{si} SwinGrapher {shape}: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
