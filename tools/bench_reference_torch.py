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

``--train`` measures one full optimization step instead (fwd + bwd + SGD
momentum 0.99 nesterov + grad clip, DC+CE loss — the nnU-Net protocol,
SURVEY.md §3.1) in both stacks, giving the train-side software-efficiency
reference point on the one shared hardware.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_train(flagship: bool = False, iters: int | None = None):
    """One optimization step, both stacks, same CPU. nnU-Net protocol:
    SGD lr 1e-2 / momentum 0.99 / nesterov / wd 3e-5 / clip 12, DC+CE
    (batch_dice, no bg), fp32, no DA, full-res head only."""
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nextou_tpu.compat.torch_stubs import load_reference_nextou
    from nextou_tpu.losses import CompoundLossSpec
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec, small_3d_spec
    from nextou_tpu.train import create_train_state, make_optimizer, make_train_step

    if flagship:
        spec = flagship_3d_spec(num_classes=14, deep_supervision=False)
        n = iters or 1
        label = "flagship 3d_fullres_nextou (64x224x192, 14cls)"
    else:
        spec = small_3d_spec(num_classes=3, deep_supervision=False)
        n = iters or 3
        label = "small_3d (16x112x96)"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 1, *spec.patch_size)).astype(np.float32)
    t = (rng.random((1, *spec.patch_size)) * spec.num_classes).astype(np.int64)

    # --- torch reference: model from /root/reference + protocol optimizer
    import torch.nn.functional as F
    from torch import nn as tnn

    cls = load_reference_nextou()
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
    ).train()
    opt = torch.optim.SGD(
        ref.parameters(), lr=1e-2, momentum=0.99, nesterov=True, weight_decay=3e-5
    )

    def torch_dc_ce(logits, target):
        ce = F.cross_entropy(logits, target)
        probs = torch.softmax(logits.float(), dim=1)
        oh = F.one_hot(target, probs.shape[1]).movedim(-1, 1).float()
        dims = (0,) + tuple(range(2, logits.ndim))
        intersect = (probs * oh).sum(dims)
        dc = (2.0 * intersect + 1e-5) / torch.clamp(
            oh.sum(dims) + probs.sum(dims) + 1e-5, min=1e-8
        )
        return ce - dc[1:].mean()

    def torch_step():
        opt.zero_grad()
        out = ref(torch.from_numpy(x))
        if isinstance(out, (list, tuple)):
            out = out[0]
        loss = torch_dc_ce(out, torch.from_numpy(t))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 12.0)
        opt.step()

    t0 = time.perf_counter()
    torch_step()  # warm
    print(f"torch warm step: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        torch_step()
    t_torch = (time.perf_counter() - t0) / n
    print(f"torch: {t_torch:.2f} s/step", flush=True)

    # --- ours: the production train step (fp32 to match)
    model = NexToU(spec=spec, dtype=jnp.float32)
    optimizer = make_optimizer(
        1e-2, momentum=0.99, nesterov=True, weight_decay=3e-5, clip_norm=12.0
    )
    example = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.float32)
    state = create_train_state(model, optimizer, example, jax.random.PRNGKey(0))
    step = make_train_step(
        model, optimizer, CompoundLossSpec(weight_ti=0.0, batch_dice=True),
        ds_weights=[1.0],
    )
    batch = {
        "data": jnp.asarray(np.moveaxis(x, 1, -1)),
        "seg": jnp.asarray(t.astype(np.int32)),
    }
    t0 = time.perf_counter()
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    print(f"jax compile+warm step: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t_jax = (time.perf_counter() - t0) / n

    print(
        f"{label} TRAIN step (CPU, fp32, same host/threads, batch 1): "
        f"torch reference {t_torch*1e3:.0f} ms, nextou_tpu {t_jax*1e3:.0f} ms "
        f"({t_torch/t_jax:.2f}x)"
    )


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


if "--train" in sys.argv:
    bench_train(flagship="--flagship" in sys.argv)
else:
    main(flagship="--flagship" in sys.argv)
