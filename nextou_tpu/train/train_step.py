"""Jitted train / eval steps.

One sharded ``jit`` over the whole step — batch sharded on the mesh 'data'
axis, params replicated — is the TPU equivalent of the reference's
DDP+autocast+GradScaler loop (SURVEY.md §3.1): XLA inserts the gradient
all-reduces, bf16 compute with fp32 params replaces AMP (no grad scaler
needed — bf16 has fp32's exponent range), and the batch-Dice statistics
reduce globally because the loss is written in global-batch terms.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from nextou_tpu.losses import dc_ce_ti_loss, deep_supervised_loss, CompoundLossSpec
from nextou_tpu.train.state import TrainState


def make_train_step(
    model: nn.Module,
    optimizer: optax.GradientTransformation,
    loss_spec: CompoundLossSpec,
    ds_weights: Sequence[float] | None = None,
    augment=None,
    augment_gating: str = "cond",
) -> Callable[[TrainState, dict[str, jax.Array]], tuple[TrainState, dict]]:
    """Returns ``train_step(state, batch) -> (state, metrics)``.

    ``batch`` = {'data': (B, *sp, C) float, 'seg': (B, *sp) int}.

    ``augment`` (an :class:`~nextou_tpu.data.augment.AugmentConfig`) fuses
    on-device data augmentation into the compiled step — the loader then
    feeds raw patches and the host does no DA work at all (see
    :mod:`nextou_tpu.data.device_augment`). ``augment_gating``: 'cond' for
    single-chip, 'where' for SPMD-sharded multi-chip steps.

    The input ``state`` is DONATED (its buffers are reused for the new
    state — params + optimizer momentum are ~0.5 GB at flagship size):
    always use the ``state = train_step(state, batch)`` pattern and do not
    touch the old state afterwards on TPU/GPU backends.
    """

    cl = not getattr(model, "channel_major_logits", False)

    def loss_fn(params, state: TrainState, rngs, batch):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if state.constants:
            variables["constants"] = state.constants
        outs, mutated = model.apply(
            variables,
            batch["data"],
            train=True,
            rngs=rngs,
            mutable=["batch_stats"],
        )
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        loss = deep_supervised_loss(
            outs,
            batch["seg"],
            lambda o, t: dc_ce_ti_loss(o, t, loss_spec, channels_last=cl),
            ds_weights,
            channels_last=cl,
        )
        return loss, mutated.get("batch_stats", state.batch_stats)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        rng, dropout_rng, graph_rng, da_rng = jax.random.split(state.rng, 4)
        rngs = {"dropout": dropout_rng, "graph": graph_rng}
        if augment is not None:
            from nextou_tpu.data.device_augment import device_augment_batch

            data, seg, _ = device_augment_batch(
                da_rng,
                batch["data"],
                batch["seg"],
                augment,
                gating=augment_gating,
            )
            batch = {"data": data, "seg": seg}
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, rngs, batch
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            rng=rng,
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_eval_step(
    model: nn.Module,
    loss_spec: CompoundLossSpec,
    ds_weights: Sequence[float] | None = None,
) -> Callable[[TrainState, dict[str, jax.Array]], dict]:
    """Validation step: DS loss + global hard-Dice statistics (tp/fp/fn per
    foreground class on the full-res argmax), as nnU-Net's validation_step."""

    cl = not getattr(model, "channel_major_logits", False)

    @jax.jit
    def eval_step(state: TrainState, batch):
        variables = state.model_variables()
        outs = model.apply(variables, batch["data"], train=False)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        loss = deep_supervised_loss(
            outs,
            batch["seg"],
            lambda o, t: dc_ce_ti_loss(o, t, loss_spec, channels_last=cl),
            ds_weights,
            channels_last=cl,
        )
        logits = outs[0]
        num_classes = logits.shape[-1] if cl else logits.shape[1]
        seg = batch["seg"]
        # ignore_label voxels contribute nothing to the hard-Dice statistics
        # (nnU-Net validation_step masks get_tp_fp_fn_tn the same way); the
        # loss above already masks via loss_spec.ignore_label
        valid = (
            None
            if loss_spec.ignore_label is None
            else seg != loss_spec.ignore_label
        )
        tp, fp, fn = [], [], []
        if loss_spec.regions is not None:
            # region mode: sigmoid > 0.5 per channel (logit > 0)
            from nextou_tpu.losses.compound import region_targets

            gt = region_targets(seg, loss_spec.regions)
            axes = tuple(range(seg.ndim))
            for i in range(len(loss_spec.regions)):
                p = (logits[..., i] if cl else logits[:, i]) > 0
                g = gt[..., i]
                if valid is not None:
                    p, g = p & valid, g & valid
                tp.append(jnp.sum(p & g, axis=axes))
                fp.append(jnp.sum(p & ~g, axis=axes))
                fn.append(jnp.sum(~p & g, axis=axes))
        else:
            pred = jnp.argmax(logits, axis=-1 if cl else 1)
            axes = tuple(range(pred.ndim))
            for c in range(1, num_classes):
                p = pred == c
                g = seg == c
                if valid is not None:
                    p, g = p & valid, g & valid
                tp.append(jnp.sum(p & g, axis=axes))
                fp.append(jnp.sum(p & ~g, axis=axes))
                fn.append(jnp.sum(~p & g, axis=axes))
        return {
            "loss": loss,
            "tp": jnp.stack(tp),
            "fp": jnp.stack(fp),
            "fn": jnp.stack(fn),
        }

    return eval_step


def pseudo_dice(tp, fp, fn) -> jnp.ndarray:
    """Global per-class Dice from aggregated statistics.

    A class absent from both prediction and GT (denominator 0) is NaN, like
    nnU-Net's 0/0 — the trainer's np.nanmean then skips it instead of a
    spurious 0 dragging the EMA (and checkpoint_best selection) down."""
    denom = 2 * tp + fp + fn
    return jnp.where(
        denom > 0, (2 * tp) / jnp.clip(denom, min=1e-8), jnp.nan
    )
