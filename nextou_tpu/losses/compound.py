"""Compound Dice + CE + TI/BTI loss.

Equivalent of ``DC_and_CE_and_TI_Loss`` / ``DC_and_CE_and_BTI_Loss``
(``/root/reference/loss/compound_{ti,bti}_loss.py``): the two differ only in
the label-set semantics already folded into :class:`TILossSpec`. Reference
defaults: weight_ce = weight_dice = 1, weight_ti = 1e-6 (3D) / 1e-4 (2D).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nextou_tpu.losses.ce import cross_entropy_loss
from nextou_tpu.losses.dice import soft_dice_loss
from nextou_tpu.losses.ti import TILossSpec, ti_loss


@dataclasses.dataclass(frozen=True)
class CompoundLossSpec:
    weight_ce: float = 1.0
    weight_dice: float = 1.0
    weight_ti: float = 0.0
    batch_dice: bool = True
    smooth: float = 1e-5
    do_bg: bool = False
    ignore_label: int | None = None
    ti: TILossSpec | None = None
    # region-based training (nnU-Net's list-valued labels +
    # regions_class_order): one sigmoid channel per region; Dice on binary
    # region masks + BCE instead of softmax Dice + CE.
    regions: tuple[tuple[int, ...], ...] | None = None


def region_targets(
    target: jax.Array, regions: tuple[tuple[int, ...], ...]
) -> jax.Array:
    """(B, *sp) int labels -> (B, *sp, R) binary region masks
    (membership over each region's label set, torch.isin-equivalent)."""
    masks = []
    for region in regions:
        m = jnp.zeros(target.shape, bool)
        for l in region:
            m = m | (target == l)
        masks.append(m)
    return jnp.stack(masks, axis=-1)


def dc_ce_ti_loss(
    logits: jax.Array,
    target: jax.Array,
    spec: CompoundLossSpec,
    *,
    axis_name: str | None = None,
    channels_last: bool = True,
) -> jax.Array:
    """logits (B, *sp, C) — or (B, C, *sp) with ``channels_last=False``,
    the training path's TPU layout — target (B, *sp) int -> scalar.

    Ignore-label handling mirrors ``compound_bti_loss.py:40-57``: the Dice
    term is masked, the CE term uses ignore_index, and ignored voxels are
    replaced by 0 for the Dice one-hot.
    """
    if spec.ignore_label is not None:
        mask = target != spec.ignore_label
        target_dice = jnp.where(mask, target, 0)
        loss_mask = mask
    else:
        target_dice = target
        loss_mask = None

    if spec.regions is not None:
        if spec.weight_ti != 0 and spec.ti is not None and spec.ti.interactions:
            raise NotImplementedError(
                "TI/BTI loss with region-based training is not supported "
                "(the reference TI losses operate on integer label maps, "
                "not sigmoid region channels) — drop the regions or the "
                "TI interactions from the CompoundLossSpec"
            )
        from nextou_tpu.losses.dice import region_soft_dice_loss

        tgt_r = region_targets(target_dice, spec.regions).astype(jnp.float32)
        if not channels_last:
            tgt_r = jnp.moveaxis(tgt_r, -1, 1)
        total = jnp.zeros((), jnp.float32)
        if spec.weight_dice != 0:
            total = total + spec.weight_dice * region_soft_dice_loss(
                logits, tgt_r,
                batch_dice=spec.batch_dice, smooth=spec.smooth,
                loss_mask=loss_mask, axis_name=axis_name,
                channels_last=channels_last,
            )
        if spec.weight_ce != 0:  # BCE plays CE's role in region mode
            logp = jax.nn.log_sigmoid(logits.astype(jnp.float32))
            logq = jax.nn.log_sigmoid(-logits.astype(jnp.float32))
            bce = -(tgt_r * logp + (1.0 - tgt_r) * logq)
            if loss_mask is not None:
                # nnU-Net's DC_and_BCE_loss: (bce * mask).sum() / mask.sum()
                # — the (B,1,*sp) mask broadcasts over the R region channels
                # in the numerator while the denominator counts each voxel
                # ONCE, i.e. the per-voxel BCE summed over regions
                m = loss_mask.astype(jnp.float32)
                m = m[..., None] if channels_last else m[:, None]
                total = total + spec.weight_ce * (
                    jnp.sum(bce * m) / jnp.clip(jnp.sum(m), min=1e-8)
                )
            else:
                total = total + spec.weight_ce * jnp.mean(bce)
        return total

    total = jnp.zeros((), jnp.float32)
    if spec.weight_dice != 0:
        total = total + spec.weight_dice * soft_dice_loss(
            logits,
            target_dice,
            batch_dice=spec.batch_dice,
            do_bg=spec.do_bg,
            smooth=spec.smooth,
            loss_mask=loss_mask,
            axis_name=axis_name,
            channels_last=channels_last,
        )
    if spec.weight_ce != 0:
        total = total + spec.weight_ce * cross_entropy_loss(
            logits, target, ignore_index=spec.ignore_label,
            channels_last=channels_last,
        )
    if spec.weight_ti != 0 and spec.ti is not None and spec.ti.interactions:
        # reference passes the raw target to TI (no reference dataset uses an
        # ignore label); here the target is clamped into range for the CE
        # gather and the critical map is ANDed with the loss mask so ignored
        # voxels never contribute
        total = total + spec.weight_ti * ti_loss(
            logits,
            target_dice,
            spec.ti,
            channels_last=channels_last,
            loss_mask=loss_mask,
        )
    return total
