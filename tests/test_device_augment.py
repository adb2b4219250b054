"""On-device augmentation (data/device_augment.py): parity of the resampling
primitives against the scipy implementations the host path uses, gating
equivalence, and integration with the jitted train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import ndimage

from nextou_tpu.data.augment import AugmentConfig
from nextou_tpu.data.device_augment import (
    affine_resample,
    device_augment_batch,
    gaussian_blur,
    lowres_axis_matrix,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _random_affine(rng, dim, shape):
    mat = np.eye(dim) + 0.08 * rng.standard_normal((dim, dim))
    center = (np.array(shape) - 1) / 2.0
    off = center - mat @ center
    return mat, off


@pytest.mark.parametrize("shape", [(19, 23), (13, 17, 11)])
def test_affine_order1_reflect_matches_scipy(rng, shape):
    vol = rng.standard_normal(shape).astype(np.float32)
    mat, off = _random_affine(rng, len(shape), shape)
    ref = ndimage.affine_transform(vol, mat, offset=off, order=1, mode="reflect")
    got = np.asarray(
        affine_resample(jnp.asarray(vol), jnp.asarray(mat), jnp.asarray(off), 1, "reflect")
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.parametrize("shape", [(19, 23), (13, 17, 11)])
def test_affine_order0_constant_matches_scipy(rng, shape):
    seg = rng.integers(0, 5, shape).astype(np.float32)
    mat, off = _random_affine(rng, len(shape), shape)
    ref = ndimage.affine_transform(seg, mat, offset=off, order=0, mode="constant")
    got = np.asarray(
        affine_resample(jnp.asarray(seg), jnp.asarray(mat), jnp.asarray(off), 0, "constant")
    )
    # float32 vs float64 coordinates can flip exact rounding ties
    assert (ref != got).mean() < 2e-3


def test_affine_identity_is_exact(rng):
    vol = rng.standard_normal((9, 12, 8)).astype(np.float32)
    eye, zero = jnp.eye(3), jnp.zeros(3)
    got = np.asarray(affine_resample(jnp.asarray(vol), eye, zero, 1, "reflect"))
    np.testing.assert_array_equal(got, vol)


@pytest.mark.parametrize("sigma", [0.5, 0.8, 1.0])
def test_gaussian_blur_matches_scipy(rng, sigma):
    vol = rng.standard_normal((14, 18, 10)).astype(np.float32)
    ref = ndimage.gaussian_filter(vol, sigma)
    got = np.asarray(gaussian_blur(jnp.asarray(vol), sigma, 4))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_lowres_matrix_identity_at_zoom_one():
    A = np.asarray(lowres_axis_matrix(48, 1.0))
    np.testing.assert_allclose(A, np.eye(48), atol=1e-6)


@pytest.mark.parametrize("n,zoom", [(64, 0.5), (224, 0.63), (17, 0.5)])
def test_lowres_matrix_close_to_scipy_roundtrip(rng, n, zoom):
    """Down stage matches scipy zoom(order=0); the upsample uses Keys cubic
    convolution instead of scipy's cubic B-spline (documented deviation), so
    the round-trip is compared loosely."""
    x = rng.standard_normal(n).astype(np.float32)
    small = ndimage.zoom(x, zoom, order=0)
    up = ndimage.zoom(small, n / len(small), order=3)
    if up.shape[0] != n:
        up = np.pad(up, (0, max(0, n - len(up))), mode="edge")[:n]
    got = np.asarray(lowres_axis_matrix(n, zoom)) @ x
    assert np.corrcoef(up, got)[0, 1] > 0.99


def _batch(rng, b=2, sp=(10, 14, 12), c=2, classes=4):
    data = rng.standard_normal((b, *sp, c)).astype(np.float32)
    seg = rng.integers(0, classes, (b, *sp)).astype(np.int32)
    return jnp.asarray(data), jnp.asarray(seg)


def test_no_trigger_config_is_identity(rng):
    cfg = AugmentConfig(
        p_rotation=0, p_scaling=0, p_noise=0, p_blur=0, p_brightness=0,
        p_contrast=0, p_lowres=0, p_gamma_invert=0, p_gamma=0, mirror_axes=(),
    )
    data, seg = _batch(rng)
    d, s, _ = device_augment_batch(jax.random.PRNGKey(0), data, seg, cfg)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(data))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(seg))


def test_cond_and_where_gating_agree(rng):
    """Same key -> identical RNG draws -> bit-identical results whichever
    gating strategy compiled."""
    cfg = AugmentConfig(mirror_axes=(0, 1, 2))
    data, seg = _batch(rng)
    key = jax.random.PRNGKey(3)
    f_cond = jax.jit(
        lambda k, d, s: device_augment_batch(k, d, s, cfg, gating="cond")[:2]
    )
    f_where = jax.jit(
        lambda k, d, s: device_augment_batch(k, d, s, cfg, gating="where")[:2]
    )
    dc, sc = f_cond(key, data, seg)
    dw, sw = f_where(key, data, seg)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dw), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sw))


def test_augment_changes_data_preserves_labels(rng):
    cfg = AugmentConfig(p_rotation=1.0, p_scaling=1.0, mirror_axes=(0, 1, 2))
    data, seg = _batch(rng, classes=4)
    d, s, _ = device_augment_batch(jax.random.PRNGKey(1), data, seg, cfg)
    assert not np.array_equal(np.asarray(d), np.asarray(data))
    assert set(np.unique(np.asarray(s))) <= set(range(5))
    assert s.dtype == seg.dtype and d.shape == data.shape


def test_prev_seg_rides_through(rng):
    cfg = AugmentConfig(p_rotation=1.0, mirror_axes=(0,))
    data, seg = _batch(rng)
    prev = jnp.asarray(
        np.random.default_rng(0).integers(0, 3, seg.shape).astype(np.int32)
    )
    d, s, p = device_augment_batch(jax.random.PRNGKey(2), data, seg, cfg, prev=prev)
    assert p is not None and p.shape == prev.shape and p.dtype == prev.dtype


def test_dummy_2d_keeps_first_axis(rng):
    """dummy-2D DA rotates in-plane only: axis-0 slices must not mix."""
    cfg = AugmentConfig(
        p_rotation=1.0, p_scaling=0, dummy_2d=True, p_noise=0, p_blur=0,
        p_brightness=0, p_contrast=0, p_lowres=0, p_gamma_invert=0,
        p_gamma=0, mirror_axes=(),
    )
    # data constant within each axis-0 slice, distinct across slices
    b, sp, c = 1, (6, 12, 12), 1
    base = np.arange(sp[0], dtype=np.float32).reshape(-1, 1, 1)
    data = jnp.asarray(np.broadcast_to(base, sp)[None, ..., None].copy())
    seg = jnp.zeros((b, *sp), jnp.int32)
    d, _, _ = device_augment_batch(jax.random.PRNGKey(5), data, seg, cfg)
    d = np.asarray(d)[0, ..., 0]
    for z in range(sp[0]):
        np.testing.assert_allclose(d[z], base[z, 0, 0], atol=1e-5)


def test_device_da_train_step_integration(rng):
    """A few train steps with fused device DA: finite loss, loss history
    comparable to the host-DA path's shapes."""
    from nextou_tpu.losses import CompoundLossSpec
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import small_3d_spec
    from nextou_tpu.train import create_train_state, make_optimizer, make_train_step

    spec = small_3d_spec(num_classes=3)
    model = NexToU(spec=spec, dtype=jnp.float32)
    opt = make_optimizer(1e-2)
    example = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.float32)
    state = create_train_state(model, opt, example, jax.random.PRNGKey(0))
    cfg = AugmentConfig(mirror_axes=(0, 1, 2))
    step = make_train_step(
        model, opt, CompoundLossSpec(), augment=cfg, augment_gating="cond"
    )
    for i in range(2):
        batch = {
            "data": jnp.asarray(
                rng.standard_normal((2, *spec.patch_size, spec.in_channels))
                .astype(np.float32)
            ),
            "seg": jnp.asarray(
                rng.integers(0, 3, (2, *spec.patch_size)).astype(np.int32)
            ),
        }
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


# ---- batchgenerators intensity semantics (both DA paths) --------------- #


def test_host_gamma_retain_stats_and_invert_equivalence(rng):
    """_gamma_channel follows batchgenerators augment_gamma with
    retain_stats=True: mean/std preserved; the inverted form equals the
    reference's negate -> gamma -> negate -> restore-stats path."""
    from nextou_tpu.data.augment import _gamma_channel

    x = rng.standard_normal((24, 20)).astype(np.float32) * 3 + 7
    for inverted in (False, True):
        y = _gamma_channel(x.copy(), (0.7, 1.5), inverted, np.random.default_rng(3))
        assert y.shape == x.shape
        np.testing.assert_allclose(y.mean(), x.mean(), atol=1e-3)
        np.testing.assert_allclose(y.std(), x.std(), rtol=1e-3)
        assert not np.allclose(y, x)  # gamma != 1 with this seed

    # inverted-form equivalence to batchgenerators' negation recipe
    r1, r2 = np.random.default_rng(5), np.random.default_rng(5)
    ours = _gamma_channel(x.copy(), (0.7, 1.5), True, r1)
    neg = -x
    mean_stat, sd_stat = neg.mean(), neg.std()
    if r2.uniform() < 0.5 and 0.7 < 1:
        gamma = r2.uniform(0.7, 1.0)
    else:
        gamma = r2.uniform(1.0, 1.5)
    mn, rngv = neg.min(), np.ptp(neg)
    t = ((neg - mn) / (rngv + 1e-7)) ** gamma * rngv + mn
    t = (t - t.mean()) / (t.std() + 1e-8) * sd_stat + mean_stat
    np.testing.assert_allclose(ours, -t, rtol=1e-4, atol=1e-4)


def test_host_gamma_two_sided_draw():
    """The gamma exponent is drawn 50/50 from [lo,1) and [1,hi] (the
    batchgenerators draw), not U(lo,hi)."""
    from nextou_tpu.data.augment import _gamma_channel

    x = np.linspace(0.0, 1.0, 256, dtype=np.float32).reshape(16, 16)
    below = above = 0
    for seed in range(80):
        y = _gamma_channel(x.copy(), (0.7, 1.5), False, np.random.default_rng(seed))
        # recover the direction from the mid-point before stats restore:
        # gamma<1 lifts the normalized curve, gamma>1 lowers it. Compare a
        # plain (non-retained) transform instead to classify:
        mid_ref = 0.5
        r = np.random.default_rng(seed)
        if r.uniform() < 0.5:
            g = r.uniform(0.7, 1.0)
        else:
            g = r.uniform(1.0, 1.5)
        below += g < 1
        above += g >= 1
        assert np.isfinite(y).all()
    assert below >= 20 and above >= 20


def test_host_intensity_per_channel_factors(rng):
    """With identical channels, per-channel contrast/brightness draws make
    the channels diverge (joint-factor behavior kept them equal)."""
    from nextou_tpu.data.augment import AugmentConfig, _intensity

    base = rng.standard_normal((16, 16)).astype(np.float32)
    data = np.stack([base.copy(), base.copy()])
    cfg = AugmentConfig(
        p_rotation=0, p_scaling=0, p_noise=0, p_blur=0, p_brightness=1.0,
        p_contrast=1.0, p_lowres=0, p_gamma=0, p_gamma_invert=0,
        mirror_axes=(),
    )
    out = _intensity(data, cfg, np.random.default_rng(0))
    assert not np.allclose(out[0], out[1])


def test_device_gamma_retain_stats(rng):
    """Device gamma restores per-channel mean/std (retain_stats=True) and
    channels get independent gamma draws."""
    import jax
    import jax.numpy as jnp
    from nextou_tpu.data.device_augment import AugmentConfig as DC
    from nextou_tpu.data.device_augment import device_augment_batch

    base = rng.standard_normal((12, 12)).astype(np.float32) * 2 + 5
    data = np.stack([base, base], axis=-1)[None]  # (1, 12, 12, 2)
    seg = np.zeros((1, 12, 12), np.int32)
    cfg = DC(
        p_rotation=0, p_scaling=0, p_noise=0, p_blur=0, p_brightness=0,
        p_contrast=0, p_lowres=0, p_gamma=1.0, p_gamma_invert=0,
        mirror_axes=(),
    )
    out, _, _ = device_augment_batch(
        jax.random.PRNGKey(7), jnp.asarray(data), jnp.asarray(seg), cfg
    )
    out = np.asarray(out)[0]
    for c in range(2):
        np.testing.assert_allclose(out[..., c].mean(), base.mean(), atol=1e-3)
        np.testing.assert_allclose(out[..., c].std(), base.std(), rtol=1e-3)
    assert not np.allclose(out[..., 0], out[..., 1])  # per-channel gammas


def test_device_contrast_per_channel_stats(rng):
    """Device contrast preserves each channel's own [min, max] range even
    when the channels' scales differ wildly (joint stats would clip the
    small channel against the big one's range)."""
    import jax
    import jax.numpy as jnp
    from nextou_tpu.data.device_augment import AugmentConfig as DC
    from nextou_tpu.data.device_augment import device_augment_batch

    c0 = rng.standard_normal((10, 10)).astype(np.float32) * 0.01
    c1 = rng.standard_normal((10, 10)).astype(np.float32) * 100.0
    data = np.stack([c0, c1], axis=-1)[None]
    seg = np.zeros((1, 10, 10), np.int32)
    cfg = DC(
        p_rotation=0, p_scaling=0, p_noise=0, p_blur=0, p_brightness=0,
        p_contrast=1.0, p_lowres=0, p_gamma=0, p_gamma_invert=0,
        mirror_axes=(), contrast_range=(3.0, 3.0),  # force big stretch
    )
    out, _, _ = device_augment_batch(
        jax.random.PRNGKey(1), jnp.asarray(data), jnp.asarray(seg), cfg
    )
    out = np.asarray(out)[0]
    assert out[..., 0].max() <= c0.max() + 1e-5
    assert out[..., 0].min() >= c0.min() - 1e-5
    assert out[..., 0].std() > c0.std() * 1.5  # stretch actually applied
