"""Training-dynamics parity against the torch reference.

Forward parity is covered voxel-level by ``test_torch_import``; this test
closes the loop on *training*: identical weights (torch init imported via
``compat/torch_import``), identical synthetic batches, the nnU-Net optimizer
protocol on both sides (SGD momentum 0.99 nesterov, weight_decay 3e-5,
grad-norm clip 12 — SURVEY.md §3.1), DC+CE loss (batch_dice, no bg,
smooth 1e-5), fp32, no DA — the loss trajectories must track step for step.

This is the cheapest available proxy for "Dice parity at convergence": no
BTCV/RAVIR/ICA data or GPU exists on this box, so full-training parity is
delegated to (a) forward parity, (b) loss-module parity (test_losses), and
(c) this joint network+loss+optimizer dynamics check.

Notes on determinism: DropPath is rate-0; the stochastic edge shuffle is
active in train mode but with dilation 1 it permutes neighbors only, and
MRConv's max-aggregation is permutation-invariant (SURVEY.md §2.3), so both
stacks are deterministic given the weights and batches.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nextou_tpu.compat.torch_import import (  # noqa: E402
    extract_network_weights,
    torch_state_dict_to_variables,
)
from nextou_tpu.losses import CompoundLossSpec  # noqa: E402
from nextou_tpu.models import NexToU  # noqa: E402
from nextou_tpu.models.presets import small_3d_spec  # noqa: E402
from nextou_tpu.train import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_train_step,
)

N_STEPS = 20
LR = 1e-2
WD = 3e-5
CLIP = 12.0
N_CLASSES = 3


def _build_reference(spec):
    from tests.test_torch_import import _build_reference_small

    return _build_reference_small(spec)


def _torch_dc_ce(logits, target):
    """Mirror of our dc_ce loss (losses/dice.py, batch_dice=True, do_bg=False,
    smooth=1e-5) + mean CE, in torch."""
    import torch.nn.functional as F

    ce = F.cross_entropy(logits, target)
    probs = torch.softmax(logits.float(), dim=1)
    oh = F.one_hot(target, probs.shape[1]).movedim(-1, 1).float()
    dims = (0,) + tuple(range(2, logits.ndim))
    intersect = (probs * oh).sum(dims)
    sum_pred = probs.sum(dims)
    sum_gt = oh.sum(dims)
    dc = (2.0 * intersect + 1e-5) / torch.clamp(sum_gt + sum_pred + 1e-5, min=1e-8)
    return ce - dc[1:].mean()


def _make_batches(spec, n_steps, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        x = rng.standard_normal((1, 1, *spec.patch_size)).astype(np.float32)
        # structured targets so Dice has signal (blobs, not salt & pepper)
        t = np.zeros((1, *spec.patch_size), np.int64)
        for lbl in (1, 2):
            c = [rng.integers(2, s - 2) for s in spec.patch_size]
            r = [max(2, s // 4) for s in spec.patch_size]
            sl = tuple(
                slice(max(0, ci - ri), min(s, ci + ri))
                for ci, ri, s in zip(c, r, spec.patch_size)
            )
            t[(0, *sl)] = lbl
        out.append((x, t))
    return out


@requires_reference
def test_training_dynamics_track_reference():
    spec = small_3d_spec(num_classes=N_CLASSES, deep_supervision=False)
    batches = _make_batches(spec, N_STEPS)

    # ---- torch side: reference model, nnU-Net optimizer protocol
    ref = _build_reference(spec)
    init_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    ref.train()
    opt = torch.optim.SGD(
        ref.parameters(), lr=LR, momentum=0.99, nesterov=True, weight_decay=WD
    )
    torch_losses = []
    for x, t in batches:
        opt.zero_grad()
        out = ref(torch.from_numpy(x))
        if isinstance(out, (list, tuple)):  # builder keeps DS heads; use full-res
            out = out[0]
        loss = _torch_dc_ce(out, torch.from_numpy(t))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), CLIP)
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- our side: same initial weights via the torch importer
    model = NexToU(spec=spec, dtype=jnp.float32)
    optimizer = make_optimizer(
        LR, momentum=0.99, nesterov=True, weight_decay=WD, clip_norm=CLIP
    )
    example = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.float32)
    state = create_train_state(model, optimizer, example, jax.random.PRNGKey(0))
    template = jax.device_get(
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "constants": state.constants,
        }
    )
    variables = torch_state_dict_to_variables(
        extract_network_weights({"network_weights": init_sd}),
        template,
        spec,
    )
    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
    )
    loss_spec = CompoundLossSpec(weight_ti=0.0, batch_dice=True)
    step = make_train_step(model, optimizer, loss_spec, ds_weights=[1.0])
    jax_losses = []
    for x, t in batches:
        batch = {
            "data": jnp.asarray(np.moveaxis(x, 1, -1)),
            "seg": jnp.asarray(t.astype(np.int32)),
        }
        state, metrics = step(state, batch)
        jax_losses.append(float(metrics["loss"]))

    torch_losses = np.asarray(torch_losses)
    jax_losses = np.asarray(jax_losses)
    # step 0 is pure forward parity on imported weights: tight
    assert abs(jax_losses[0] - torch_losses[0]) < 1e-3, (
        jax_losses[0],
        torch_losses[0],
    )
    # trajectories must track; fp noise compounds through momentum at
    # lr=1e-2, so later steps get a looser (but still meaningful) band
    diff = np.abs(jax_losses - torch_losses)
    scale = np.maximum(np.abs(torch_losses), 0.3)
    assert np.all(diff[:5] / scale[:5] < 0.02), (jax_losses[:5], torch_losses[:5])
    assert np.all(diff / scale < 0.10), list(zip(jax_losses, torch_losses))
    # and training must actually train on both sides
    assert torch_losses[-1] < torch_losses[0]
    assert jax_losses[-1] < jax_losses[0]
