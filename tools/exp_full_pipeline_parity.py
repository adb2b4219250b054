"""Full-pipeline Dice proxy: torch reference vs this stack (VERDICT r4 #6).

Closes the last gap between "losses/dynamics match" (tests/test_train_parity)
and "the PIPELINE produces the same model quality": both stacks train the
small_3d config from IDENTICAL init weights on IDENTICAL synthetic batches
(learnable: the image is the label map + noise), then the torch-trained
weights are imported into our model (compat/torch_import — voxel-level
forward parity proven by test_torch_import) and BOTH trained models run the
same sliding-window validation over held-out volumes; per-class Dice must
match.

Protocol (SURVEY §3.1): SGD momentum .99 nesterov, wd 3e-5, clip 12, fixed
LR 1e-2, DC+CE (batch_dice, no bg, smooth 1e-5), fp32 both sides, no DA,
deep supervision off. Inference: Gaussian sliding window, no TTA, shared
blender (inference parity is covered separately by the sliding-window
oracle + TTA tests).

Writes FULL_PIPELINE_PARITY.json at the repo root.

Run (CPU, ~30-60 min at 300 steps): python tools/exp_full_pipeline_parity.py [n_steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp

from nextou_tpu.compat.torch_import import (
    extract_network_weights,
    torch_state_dict_to_variables,
)
from nextou_tpu.infer import make_device_sliding_predictor
from nextou_tpu.infer.evaluate import dice_scores
from nextou_tpu.losses import CompoundLossSpec
from nextou_tpu.models import NexToU
from nextou_tpu.models.presets import small_3d_spec
from nextou_tpu.train import create_train_state, make_optimizer, make_train_step
from nextou_tpu.utils import fast_init

LR, WD, CLIP = 1e-2, 3e-5, 12.0
N_CLASSES = 3


def log(msg):
    print(f"[pipeline +{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_volume(rng, shape):
    """Learnable synthetic case: image = label map + noise."""
    seg = np.zeros(shape, np.int64)
    for lbl in (1, 2):
        for _ in range(3):
            c = [rng.integers(3, s - 3) for s in shape]
            r = [max(2, s // 6) for s in shape]
            sl = tuple(
                slice(max(0, ci - ri), min(s, ci + ri))
                for ci, ri, s in zip(c, r, shape)
            )
            seg[sl] = lbl
    img = seg.astype(np.float32) + 0.3 * rng.standard_normal(shape).astype(
        np.float32
    )
    return img, seg


def make_batches(spec, n_steps, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        img, seg = make_volume(rng, spec.patch_size)
        out.append(
            (img[None, None], seg[None])  # (1,1,*sp), (1,*sp)
        )
    return out


def torch_dc_ce(logits, target):
    import torch.nn.functional as F

    ce = F.cross_entropy(logits, target)
    probs = torch.softmax(logits.float(), dim=1)
    oh = F.one_hot(target, probs.shape[1]).movedim(-1, 1).float()
    dims = (0,) + tuple(range(2, logits.ndim))
    intersect = (probs * oh).sum(dims)
    sum_pred = probs.sum(dims)
    sum_gt = oh.sum(dims)
    dc = (2.0 * intersect + 1e-5) / torch.clamp(
        sum_gt + sum_pred + 1e-5, min=1e-8
    )
    return ce - dc[1:].mean()


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    spec = small_3d_spec(num_classes=N_CLASSES, deep_supervision=False)
    batches = make_batches(spec, n_steps)
    log(f"built {n_steps} training batches ({spec.patch_size})")

    # ---- identical init ------------------------------------------------
    sys.path.insert(0, "/root/repo/tests")
    from tests.test_torch_import import _build_reference_small

    torch.manual_seed(0)
    ref = _build_reference_small(spec)
    init_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    # ---- torch training -------------------------------------------------
    ref.train()
    opt = torch.optim.SGD(
        ref.parameters(), lr=LR, momentum=0.99, nesterov=True, weight_decay=WD
    )
    t0 = time.time()
    torch_losses = []
    for i, (x, t) in enumerate(batches):
        opt.zero_grad()
        out = ref(torch.from_numpy(x))
        if isinstance(out, (list, tuple)):
            out = out[0]
        loss = torch_dc_ce(out, torch.from_numpy(t))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), CLIP)
        opt.step()
        torch_losses.append(float(loss.detach()))
        if i % 50 == 0:
            log(f"torch step {i}: loss {torch_losses[-1]:.4f}")
    log(f"torch training done in {time.time()-t0:.0f}s "
        f"(final loss {torch_losses[-1]:.4f})")
    trained_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    # ---- our training ---------------------------------------------------
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
        extract_network_weights({"network_weights": init_sd}), template, spec
    )
    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
    )
    step = make_train_step(
        model, optimizer,
        CompoundLossSpec(weight_ti=0.0, batch_dice=True),
        ds_weights=[1.0],
    )
    t0 = time.time()
    jax_losses = []
    for i, (x, t) in enumerate(batches):
        batch = {
            "data": jnp.asarray(np.moveaxis(x, 1, -1)),
            "seg": jnp.asarray(t.astype(np.int32)),
        }
        state, metrics = step(state, batch)
        jax_losses.append(float(metrics["loss"]))
        if i % 50 == 0:
            log(f"jax step {i}: loss {jax_losses[-1]:.4f}")
    log(f"jax training done in {time.time()-t0:.0f}s "
        f"(final loss {jax_losses[-1]:.4f})")

    # ---- import torch-trained weights into our model --------------------
    variables_t = torch_state_dict_to_variables(
        extract_network_weights({"network_weights": trained_sd}), template, spec
    )

    # ---- shared sliding-window validation --------------------------------
    eval_shape = tuple(int(p * 1.4) for p in spec.patch_size)
    rng = np.random.default_rng(999)
    cases = [make_volume(rng, eval_shape) for _ in range(4)]
    labels = list(range(1, N_CLASSES))

    def predict_with(vars_):
        merged = {
            "params": vars_["params"],
            "batch_stats": vars_.get("batch_stats", {}),
            "constants": vars_.get("constants", {}),
        }

        def apply_fn(xt):
            return model.apply(merged, xt, train=False)

        pred = make_device_sliding_predictor(
            apply_fn, None, spec.patch_size, spec.num_classes,
            tile_batch=1, output="seg", transfer_dtype=jnp.float32,
        )
        return [np.asarray(pred(img[..., None])) for img, _ in cases]

    jax_vars = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "constants": jax.device_get(state.constants),
    }
    log("predicting with jax-trained weights")
    segs_j = predict_with(jax_vars)
    log("predicting with torch-trained weights (imported)")
    segs_t = predict_with(variables_t)

    per_case = []
    for (img, gt), sj, st_ in zip(cases, segs_j, segs_t):
        dj = dice_scores(sj, gt, labels)
        dt = dice_scores(st_, gt, labels)
        agree = dice_scores(sj, st_, labels)
        per_case.append(
            {
                "jax_dice": {str(k): round(v, 4) for k, v in dj.items()},
                "torch_dice": {str(k): round(v, 4) for k, v in dt.items()},
                "agreement_dice": {
                    str(k): round(v, 4) for k, v in agree.items()
                },
            }
        )
        log(f"case: jax {dj} torch {dt} agree {agree}")

    mean = lambda key, lbl: float(
        np.mean([c[key][str(lbl)] for c in per_case])
    )
    result = {
        "n_steps": n_steps,
        "config": "small_3d (16,112,96), DC+CE, SGD nesterov .99, lr 1e-2",
        "torch_final_loss": round(torch_losses[-1], 4),
        "jax_final_loss": round(jax_losses[-1], 4),
        "loss_max_abs_diff": round(
            float(np.max(np.abs(np.array(torch_losses) - np.array(jax_losses)))), 4
        ),
        "mean_dice": {
            str(lbl): {
                "jax": round(mean("jax_dice", lbl), 4),
                "torch": round(mean("torch_dice", lbl), 4),
                "agreement": round(mean("agreement_dice", lbl), 4),
            }
            for lbl in labels
        },
        "per_case": per_case,
    }
    with open("/root/repo/FULL_PIPELINE_PARITY.json", "w") as f:
        json.dump(result, f, indent=1)
    log("wrote FULL_PIPELINE_PARITY.json")
    print(json.dumps(result["mean_dice"], indent=1))


if __name__ == "__main__":
    main()
