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


def main():
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nextou_tpu.compat.torch_stubs import load_reference_nextou
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import small_3d_spec
    from nextou_tpu.utils import fast_init

    spec = small_3d_spec(num_classes=3, deep_supervision=False)

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
        ref(torch.from_numpy(x))  # warm
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            ref(torch.from_numpy(x))
        t_torch = (time.perf_counter() - t0) / n

    # --- ours (jit, CPU)
    model = NexToU(spec=spec, dtype=jnp.float32)
    xl = jnp.asarray(np.moveaxis(x, 1, -1))
    v = fast_init(model, jax.random.PRNGKey(0), xl, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    fwd(v, xl)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(v, xl)
    jax.block_until_ready(out)
    t_jax = (time.perf_counter() - t0) / n

    print(
        f"small_3d fwd (CPU, fp32, 16x112x96): torch reference "
        f"{t_torch*1e3:.0f} ms, nextou_tpu {t_jax*1e3:.0f} ms "
        f"({t_torch/t_jax:.2f}x)"
    )


main()
