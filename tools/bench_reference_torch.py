"""Same-host comparison: upstream PyTorch NexToU vs this framework, CPU.

The reference publishes no throughput numbers (SURVEY.md §6) and no GPU is
available here, so this tool provides the one apples-to-apples comparison
this host allows: the torch reference (instantiated from /root/reference via
compat.torch_stubs) and our jax model, same architecture (small_3d preset —
the flagship's bottleneck schedule at reduced width), same fp32, same CPU,
single thread pool. It measures eval-mode forward latency.

This is evidence of *software* efficiency (graph construction, kNN, gathers,
fusion) — accelerator hardware ratios will differ; the headline TPU numbers
live in bench.py.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main(flagship: bool = False, iters: int | None = None):
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nextou_tpu.compat.torch_stubs import load_reference_nextou
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec, small_3d_spec
    from nextou_tpu.utils import fast_init

    if flagship:
        # the real 3d_fullres_nextou shape — ~1.53 TFLOP/forward; on a
        # single-core host one iteration is minutes, so default to 2
        spec = flagship_3d_spec(num_classes=14, deep_supervision=False)
        n = iters or 2
        label = "flagship 3d_fullres_nextou (64x224x192, 14cls)"
    else:
        spec = small_3d_spec(num_classes=3, deep_supervision=False)
        n = iters or 3
        label = "small_3d (16x112x96)"

    # --- torch reference
    cls = load_reference_nextou()
    from torch import nn as tnn

    ref = cls(
        input_channels=spec.in_channels,
        patch_size=list(spec.patch_size),
        n_stages=6,
        features_per_stage=[st.features for st in spec.encoder],
        conv_op=tnn.Conv3d,
        kernel_sizes=[list(st.kernel_size) for st in spec.encoder],
        strides=[list(st.stride) for st in spec.encoder],
        n_conv_per_stage=[2] * 6,
        num_classes=spec.num_classes,
        n_conv_per_stage_decoder=[2] * 5,
        conv_bias=True,
        norm_op=tnn.BatchNorm3d,
        norm_op_kwargs={"eps": 1e-5, "affine": True},
        dropout_op=None,
        dropout_op_kwargs=None,
        nonlin=tnn.LeakyReLU,
        nonlin_kwargs={"inplace": True},
        deep_supervision=False,
    ).eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 1, *spec.patch_size)).astype(np.float32)

    with torch.no_grad():
        t0 = time.perf_counter()
        ref(torch.from_numpy(x))  # warm
        print(f"torch warm fwd: {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            ref(torch.from_numpy(x))
        t_torch = (time.perf_counter() - t0) / n
        print(f"torch: {t_torch:.2f} s/fwd", flush=True)

    # --- ours (jit, CPU)
    model = NexToU(spec=spec, dtype=jnp.float32)
    xl = jnp.asarray(np.moveaxis(x, 1, -1))
    v = fast_init(model, 0, xl, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t0 = time.perf_counter()
    fwd(v, xl)[0].block_until_ready()  # compile
    print(f"jax compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(v, xl)
    jax.block_until_ready(out)
    t_jax = (time.perf_counter() - t0) / n

    print(
        f"{label} fwd (CPU, fp32, same host/threads): torch reference "
        f"{t_torch*1e3:.0f} ms, nextou_tpu {t_jax*1e3:.0f} ms "
        f"({t_torch/t_jax:.2f}x)"
    )


main(flagship="--flagship" in sys.argv)
