"""Loss parity tests: Dice/CE vs torch oracles, TI/BTI critical maps vs the
upstream reference implementation (mounted read-only)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nextou_tpu.losses import (
    soft_dice_loss,
    cross_entropy_loss,
    TILossSpec,
    ti_loss,
    critical_voxels_map,
    CompoundLossSpec,
    dc_ce_ti_loss,
    deep_supervision_weights,
    downsample_target,
    deep_supervised_loss,
)


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 5, 6, 4)).astype(np.float32)
    target = rng.integers(0, 4, (2, 5, 6))
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    # torch expects (B, C, *sp)
    lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(target).long()
    want = float(torch.nn.functional.cross_entropy(lt, tt))
    assert abs(got - want) < 1e-5


def test_dice_perfect_prediction_near_minus_one():
    target = jnp.zeros((1, 8, 8), jnp.int32).at[0, 2:6, 2:6].set(1)
    logits = jax.nn.one_hot(target, 2) * 100.0
    loss = float(soft_dice_loss(logits, target, batch_dice=True))
    assert loss < -0.999


def test_dice_matches_manual_formula():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    target = rng.integers(0, 3, (2, 4, 4))
    got = float(
        soft_dice_loss(jnp.asarray(logits), jnp.asarray(target), batch_dice=True)
    )
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    onehot = np.eye(3)[target]
    p, o = probs[..., 1:], onehot[..., 1:]
    tp = (p * o).sum((0, 1, 2))
    dc = (2 * tp + 1e-5) / np.maximum((p.sum((0, 1, 2)) + o.sum((0, 1, 2))) + 1e-5, 1e-8)
    assert abs(got - (-dc.mean())) < 1e-5


def _reference_ti_modules():
    sys.path.insert(0, "/root/reference/loss")
    import ti_loss as ref_ti
    import bti_loss as ref_bti

    return ref_ti, ref_bti


def test_ti_critical_map_matches_reference_2d():
    torch = pytest.importorskip("torch")
    ref_ti, _ = _reference_ti_modules()
    rng = np.random.default_rng(2)
    # synthetic 3-class label map with touching regions
    p = rng.integers(0, 3, (2, 16, 16))
    spec = TILossSpec.create(dim=2, connectivity=8, exclusion=[[1, 2]])
    got = np.asarray(critical_voxels_map(jnp.asarray(p), spec))

    ref = ref_ti.TI_Loss(dim=2, connectivity=8, inclusion=[], exclusion=[[1, 2]])
    pt = torch.from_numpy(p[:, None].astype(np.float64))
    want = ref.topological_interaction_module(pt).numpy()[:, 0]
    np.testing.assert_array_equal(got, want)


def test_ti_critical_map_inclusion_matches_reference_2d():
    torch = pytest.importorskip("torch")
    ref_ti, _ = _reference_ti_modules()
    rng = np.random.default_rng(3)
    p = rng.integers(0, 4, (1, 20, 20))
    spec = TILossSpec.create(dim=2, connectivity=4, inclusion=[[1, 2]])
    got = np.asarray(critical_voxels_map(jnp.asarray(p), spec))
    ref = ref_ti.TI_Loss(dim=2, connectivity=4, inclusion=[[1, 2]], exclusion=[])
    pt = torch.from_numpy(p[:, None].astype(np.float64))
    want = ref.topological_interaction_module(pt).numpy()[:, 0]
    np.testing.assert_array_equal(got, want)


def test_bti_critical_map_matches_reference_3d():
    torch = pytest.importorskip("torch")
    _, ref_bti = _reference_ti_modules()
    rng = np.random.default_rng(4)
    p = rng.integers(0, 5, (1, 8, 10, 9))
    exclusion = [[[1, 3], [2, 4]], [1, 3], [[2], [4]]]
    spec = TILossSpec.create(dim=3, connectivity=26, exclusion=exclusion)
    got = np.asarray(critical_voxels_map(jnp.asarray(p), spec))
    exc_t = [
        [torch.tensor([1, 3]), torch.tensor([2, 4])],
        [torch.tensor(1), torch.tensor(3)],
        [torch.tensor([2]), torch.tensor([4])],
    ]
    ref = ref_bti.BTI_Loss(dim=3, connectivity=26, inclusion=[], exclusion=exc_t)
    pt = torch.from_numpy(p[:, None].astype(np.float64))
    want = ref.binary_topological_interaction_module(pt).numpy()[:, 0]
    np.testing.assert_array_equal(got, want)


def test_ti_loss_value_matches_reference():
    torch = pytest.importorskip("torch")
    _, ref_bti = _reference_ti_modules()
    rng = np.random.default_rng(5)
    logits = rng.standard_normal((2, 10, 12, 4)).astype(np.float32)
    target = rng.integers(0, 4, (2, 10, 12))
    spec = TILossSpec.create(dim=2, connectivity=8, exclusion=[[[1, 2], [3]], [1, 2]])
    got = float(ti_loss(jnp.asarray(logits), jnp.asarray(target), spec))
    exc_t = [
        [torch.tensor([1, 2]), torch.tensor([3])],
        [torch.tensor(1), torch.tensor(2)],
    ]
    ref = ref_bti.BTI_Loss(dim=2, connectivity=8, inclusion=[], exclusion=exc_t)
    lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(target[:, None])
    want = float(ref(lt, tt))
    assert abs(got - want) < 1e-3 * max(1.0, abs(want))


def test_ds_weights():
    w = deep_supervision_weights(5)
    assert w[-1] == 0
    np.testing.assert_allclose(w.sum(), 1.0)
    np.testing.assert_allclose(w[0] / w[1], 2.0)


def test_downsample_target_nearest():
    t = jnp.arange(16, dtype=jnp.int32).reshape(1, 4, 4)
    d = downsample_target(t, (2, 2))
    np.testing.assert_array_equal(np.asarray(d), [[[0, 2], [8, 10]]])


def test_deep_supervised_compound_loss_runs():
    rng = np.random.default_rng(6)
    target = jnp.asarray(rng.integers(0, 3, (2, 8, 8)))
    outs = [
        jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 2, 2, 3)), jnp.float32),
    ]
    spec = CompoundLossSpec(
        weight_ti=1e-4,
        ti=TILossSpec.create(dim=2, connectivity=8, exclusion=[[1, 2]]),
    )
    loss = deep_supervised_loss(outs, target, lambda o, t: dc_ce_ti_loss(o, t, spec))
    assert np.isfinite(float(loss))


def test_ti_ignore_label_masks_critical_voxels():
    """Voxels carrying the ignore label must not contribute to the TI term.

    Construct an exclusion violation whose critical voxels all carry the
    ignore label: with them masked the TI contribution must be zero, and the
    full compound loss must equal the same compound on a target where those
    voxels are ordinary background handled by the Dice/CE masks.
    """
    from nextou_tpu.losses.compound import dc_ce_ti_loss

    # predictions put class 1 and class 2 adjacent -> critical under [[1,2]]
    logits = np.full((1, 6, 6, 4), -5.0, np.float32)
    logits[..., 0] = 5.0
    logits[0, 2, 1:3, :] = [-5, 5, -5, -5]  # pred class 1
    logits[0, 2, 3:5, :] = [-5, -5, 5, -5]  # pred class 2 (adjacent)
    target = np.zeros((1, 6, 6), np.int64)
    target[0, 2, :] = 3  # ignore label over the entire critical row

    spec_ti = TILossSpec.create(dim=2, connectivity=8, exclusion=[[1, 2]])
    # sanity: without masking the TI term is nonzero
    raw_ti = float(ti_loss(jnp.asarray(logits), jnp.asarray(target % 3), spec_ti))
    assert raw_ti > 0
    masked_ti = float(
        ti_loss(
            jnp.asarray(logits),
            jnp.asarray(target % 3),
            spec_ti,
            loss_mask=jnp.asarray(target != 3),
        )
    )
    assert masked_ti == 0.0

    spec = CompoundLossSpec(
        weight_ti=1.0,
        ignore_label=3,
        ti=spec_ti,
    )
    loss = float(dc_ce_ti_loss(jnp.asarray(logits), jnp.asarray(target), spec))
    assert np.isfinite(loss)
    # with the whole critical row ignored, TI adds nothing: same total as
    # weight_ti=0
    spec_no_ti = CompoundLossSpec(weight_ti=0.0, ignore_label=3, ti=spec_ti)
    loss_no_ti = float(
        dc_ce_ti_loss(jnp.asarray(logits), jnp.asarray(target), spec_no_ti)
    )
    assert abs(loss - loss_no_ti) < 1e-7


def test_ds_weights_single_output():
    """n_outputs=1 (deep supervision disabled) must be [1.0], not 0/0=nan
    (zeroing the only output would make every step NaN)."""
    w = deep_supervision_weights(1)
    np.testing.assert_allclose(w, [1.0])


def test_region_bce_mask_normalization_matches_torch():
    """Region-mode masked BCE must reproduce nnU-Net's DC_and_BCE_loss
    reduction: (bce * mask).sum() / mask.sum() — the (B,1,*sp) mask
    broadcasts over the R region channels in the numerator while the
    denominator counts each voxel once."""
    import torch

    from nextou_tpu.losses.compound import (
        CompoundLossSpec, dc_ce_ti_loss, region_targets,
    )

    rng = np.random.default_rng(2)
    regions = ((1, 2), (2,))
    logits = rng.standard_normal((2, 4, 4, len(regions))).astype(np.float32)
    target = rng.integers(0, 3, (2, 4, 4)).astype(np.int32)
    target[0, :2] = 9  # ignore label
    spec = CompoundLossSpec(
        weight_ce=1.0, weight_dice=0.0, regions=regions, ignore_label=9,
    )
    got = float(dc_ce_ti_loss(jnp.asarray(logits), jnp.asarray(target), spec))

    mask = torch.from_numpy((target != 9)[:, None].astype(np.float32))
    tgt_r = region_targets(np.where(target == 9, 0, target), regions)
    tgt_r = torch.from_numpy(
        np.moveaxis(np.asarray(tgt_r), -1, 1).astype(np.float32))
    lg = torch.from_numpy(np.moveaxis(logits, -1, 1))
    bce = torch.nn.BCEWithLogitsLoss(reduction="none")(lg, tgt_r)
    want = float((bce * mask).sum() / mask.sum().clip(min=1e-8))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_region_plus_ti_raises():
    """Regions + TI interactions is an unsupported combination and must be
    an explicit error, not a silently dropped TI term."""
    from nextou_tpu.losses.compound import CompoundLossSpec, dc_ce_ti_loss
    from nextou_tpu.losses.ti import TILossSpec

    spec = CompoundLossSpec(
        weight_ti=1e-6,
        ti=TILossSpec.create(dim=2, connectivity=8, exclusion=[[1, 2]]),
        regions=((1, 2), (2,)),
    )
    logits = jnp.zeros((1, 4, 4, 2))
    target = jnp.zeros((1, 4, 4), jnp.int32)
    with pytest.raises(NotImplementedError):
        dc_ce_ti_loss(logits, target, spec)
