"""bf16 kNN-selection trajectory evidence (VERDICT r3 #6).

The round-3 default (``NEXTOU_KNN_BF16=1``) selects neighbors on
bf16-rounded normalized coordinates — at near-tied distances this can pick
a different (equally-near) neighbor than the reference's fp32 selection
(``torch_edge.py:154-163`` normalizes then selects in fp32; under AMP its
distance matmul runs fp16, the analog we mirror). This test turns the
"below seed-level noise" claim into a measured bar: train the small hybrid
3D config for 50 steps under bf16 vs f32 selection (same seed, same bf16
model) and require the trajectory delta to stay within the delta produced
by changing the init seed alone (the noise floor every nnU-Net training
already accepts).

Selection dtype is exercised through the XLA fallback path
(kernels/knn.py::_coord_dtype applies identically to the fused kernel and
the fallback, by design), so the test isolates *selection* changes: the
gathered VALUES are the same bf16 tensors either way.
"""

import numpy as np
import pytest

from tests.test_fused_trajectory import _run_trajectory  # noqa: F401 (protocol ref)


def _run_bf16_trajectory(seed: int, n_steps: int) -> list[float]:
    import jax.numpy as jnp

    from nextou_tpu.losses import CompoundLossSpec
    from nextou_tpu.losses.deep_supervision import deep_supervision_weights
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.spec import build_model_spec
    from nextou_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from nextou_tpu.train.optimizer import poly_lr

    # same shrunken hybrid config as test_fused_trajectory (flagship
    # bottleneck window/k schedule, 4 hybrid stages), but a bf16 model so
    # the bf16-coordinate selection path is the one that actually ships
    spec = build_model_spec(
        in_channels=1,
        patch_size=(8, 56, 48),
        n_stages=5,
        features_per_stage=[6, 12, 12, 12, 12],
        kernel_sizes=[(1, 3, 3)] + [(3, 3, 3)] * 4,
        strides=[(1, 1, 1), (1, 2, 2), (2, 2, 2), (1, 2, 2), (1, 1, 1)],
        n_conv_per_stage=[2] * 5,
        n_conv_per_stage_decoder=[2] * 4,
        num_classes=3,
        deep_supervision=True,
    )
    model = NexToU(spec=spec, dtype=jnp.bfloat16, remat=False)
    opt = make_optimizer(
        poly_lr(1e-2, 10, 0.9, steps_per_epoch=n_steps),
        weight_decay=3e-5,
        clip_norm=12.0,
    )
    rng = np.random.default_rng(0)  # DATA fixed; only init seed varies
    batches = []
    for _ in range(4):
        seg = np.zeros((1, *spec.patch_size), np.int32)
        z, y, x0 = (int(rng.integers(0, max(1, s - 6))) for s in spec.patch_size)
        seg[0, z : z + 4, y : y + 5, x0 : x0 + 5] = rng.integers(
            1, spec.num_classes
        )
        data = seg.astype(np.float32) + 0.1 * rng.standard_normal(
            (1, *spec.patch_size)
        ).astype(np.float32)
        batches.append(
            {"data": jnp.asarray(data[..., None]), "seg": jnp.asarray(seg)}
        )
    state = create_train_state(model, opt, batches[0]["data"], seed)
    step = make_train_step(
        model,
        opt,
        CompoundLossSpec(
            weight_ce=1.0, weight_dice=1.0, weight_ti=0.0,
            batch_dice=True, smooth=1e-5, do_bg=False,
        ),
        deep_supervision_weights(len(spec.decoder)),
    )
    losses = []
    for i in range(n_steps):
        state, m = step(state, batches[i % len(batches)])
        losses.append(float(m["loss"]))
    return losses


@pytest.mark.slow
def test_bf16_selection_within_seed_noise(monkeypatch):
    n_steps = 50
    monkeypatch.setenv("NEXTOU_KNN_BF16", "0")
    f32_sel = np.asarray(_run_bf16_trajectory(seed=0, n_steps=n_steps))
    f32_sel_seed1 = np.asarray(_run_bf16_trajectory(seed=1, n_steps=n_steps))
    monkeypatch.setenv("NEXTOU_KNN_BF16", "1")
    bf16_sel = np.asarray(_run_bf16_trajectory(seed=0, n_steps=n_steps))

    # all three must actually learn
    for tr in (f32_sel, f32_sel_seed1, bf16_sel):
        assert tr[-1] < tr[0] - 0.2, tr

    # the selection-dtype delta must not exceed the init-seed noise floor
    # (per-step mean over the back half, where drift has accumulated)
    half = n_steps // 2
    sel_delta = np.abs(bf16_sel[half:] - f32_sel[half:]).mean()
    seed_noise = np.abs(f32_sel_seed1[half:] - f32_sel[half:]).mean()
    # 1.5x headroom: this is a noise-floor comparison of two stochastic
    # quantities, not an exact bound
    assert sel_delta <= max(1.5 * seed_noise, 5e-3), (
        f"bf16-selection trajectory delta {sel_delta:.4g} exceeds "
        f"seed-level noise {seed_noise:.4g} — flip NEXTOU_KNN_BF16 "
        f"default off (VERDICT r3 #6)"
    )
    # record the numbers for PERF.md
    print(
        f"[bf16-knn-trajectory] sel_delta={sel_delta:.5f} "
        f"seed_noise={seed_noise:.5f} "
        f"final losses f32={f32_sel[-1]:.4f} bf16={bf16_sel[-1]:.4f}"
    )
