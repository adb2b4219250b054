"""Channel-major logits (B, C, *sp): the training-path layout that avoids
TPU lane padding of small class dims. Must be numerically identical to the
channels-last path."""

import numpy as np
import jax
import jax.numpy as jnp

from nextou_tpu.losses import CompoundLossSpec, TILossSpec, dc_ce_ti_loss
from nextou_tpu.losses.deep_supervision import deep_supervised_loss
from nextou_tpu.models import NexToU
from nextou_tpu.utils import fast_init
from tests.test_model import tiny_2d_spec


def test_compound_loss_layouts_agree():
    rng = np.random.default_rng(4)
    B, sp, C = 2, (8, 12, 10), 5
    logits = jnp.asarray(rng.standard_normal((B, *sp, C)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, C, (B, *sp)).astype(np.int32))
    spec = CompoundLossSpec(
        weight_ti=1e-4,
        ti=TILossSpec.create(dim=3, connectivity=26, exclusion=[[1, 2]]),
        ignore_label=4,
    )
    a = dc_ce_ti_loss(logits, target, spec)
    b = dc_ce_ti_loss(
        jnp.moveaxis(logits, -1, 1), target, spec, channels_last=False
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_region_loss_layouts_agree():
    rng = np.random.default_rng(5)
    B, sp = 2, (6, 8)
    regions = ((1, 2), (2,))
    logits = jnp.asarray(rng.standard_normal((B, *sp, 2)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, 3, (B, *sp)).astype(np.int32))
    spec = CompoundLossSpec(regions=regions, batch_dice=True)
    a = dc_ce_ti_loss(logits, target, spec)
    b = dc_ce_ti_loss(
        jnp.moveaxis(logits, -1, 1), target, spec, channels_last=False
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_model_channel_major_is_transpose_of_channels_last():
    spec = tiny_2d_spec(deep_supervision=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, *spec.patch_size, spec.in_channels)).astype(
            np.float32
        )
    )
    m_cl = NexToU(spec=spec, dtype=jnp.float32)
    v = fast_init(m_cl, jax.random.PRNGKey(0), x, train=False)
    m_cm = NexToU(spec=spec, dtype=jnp.float32, channel_major_logits=True)
    outs_cl = m_cl.apply(v, x, train=False)
    outs_cm = m_cm.apply(v, x, train=False)
    assert len(outs_cl) == len(outs_cm)
    for a, b in zip(outs_cl, outs_cm):
        # random-init features reach ~1e5 here; differences are f32
        # summation-order rounding between x@w and the einsum
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(a), -1, 1), np.asarray(b),
            rtol=5e-4, atol=1e-3,
        )


def test_ds_loss_layouts_agree():
    rng = np.random.default_rng(1)
    B, C = 2, 4
    spec = CompoundLossSpec()
    shapes = [(16, 16), (8, 8)]
    outs_cl = [
        jnp.asarray(rng.standard_normal((B, *s, C)).astype(np.float32))
        for s in shapes
    ]
    target = jnp.asarray(rng.integers(0, C, (B, 16, 16)).astype(np.int32))
    w = [0.7, 0.3]
    a = deep_supervised_loss(
        outs_cl, target, lambda o, t: dc_ce_ti_loss(o, t, spec), w
    )
    outs_cm = [jnp.moveaxis(o, -1, 1) for o in outs_cl]
    b = deep_supervised_loss(
        outs_cm,
        target,
        lambda o, t: dc_ce_ti_loss(o, t, spec, channels_last=False),
        w,
        channels_last=False,
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
