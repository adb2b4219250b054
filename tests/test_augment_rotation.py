"""Exact nnU-Net rotation-DA semantics (sample-larger-then-crop).

VERDICT r4 #5: the substrate extracts an INITIAL patch sized for the worst
rotation/scale, resamples it, and crops the final patch from the center —
border voxels read real image data, never padding. These tests pin:
(1) the initial-patch-size formula's guarantees (covers worst-case
rotation+scale, even margins, dummy-2D depth untouched),
(2) grid exactness: on a linear ramp the rotate-then-crop output equals the
analytic affine of the final-size grid centered on the source center — i.e.
the crop lands on EXACTLY the substrate's output grid (no half-voxel shift,
no reflect contamination),
(3) plumbing: augment_batch in/out shapes and label preservation.
"""

import numpy as np
import pytest

from nextou_tpu.data.augment import (
    AugmentConfig,
    _spatial,
    augment_batch,
    initial_patch_size,
)


def test_initial_patch_size_covers_rotation_and_scale():
    final = (224, 192)
    rot = (np.pi / 12.0,)
    init = initial_patch_size(final, rot, False, (0.7, 1.4))
    # worst-case extent: |R @ final| / min_scale
    c, s = np.cos(rot[0]), np.sin(rot[0])
    ext = np.abs(np.array([[c, -s], [s, c]]) @ np.array(final)) / 0.7
    assert all(i >= e - 1 for i, e in zip(init, ext)), (init, ext)
    # margins even (grid-exactness requirement, see augment.py)
    assert all((i - f) % 2 == 0 for i, f in zip(init, final)), init
    # at least the final size
    assert all(i >= f for i, f in zip(init, final))


def test_initial_patch_size_dummy2d_keeps_depth():
    final = (64, 224, 192)
    init = initial_patch_size(final, (np.pi,) * 3, True, (0.7, 1.4))
    assert init[0] == 64
    assert init[1] > 224 and init[2] > 192
    # ±180° caps at 90°: in-plane extent covers the axis swap / 0.7
    assert init[1] >= int(max(224, 192) / 0.7) - 1
    # 3D full rotation grows every axis
    init3 = initial_patch_size(final, (np.pi / 6,) * 3, False, (0.7, 1.4))
    assert all(i > f for i, f in zip(init3, final))


def test_rotate_then_crop_is_grid_exact():
    """On a linear ramp, order-1 resampling is exact, and with the margin no
    border mode ever triggers — so the cropped output must equal the
    analytic affine evaluated on the final grid centered on the SOURCE
    center. This is the substrate's direct-to-final-grid semantics."""
    final = (40, 36)
    cfg = AugmentConfig(
        rotation_rad=(np.pi / 10.0,),
        p_rotation=1.0,
        p_scaling=1.0,
        scale_range=(0.8, 1.3),
        final_patch_size=final,
    )
    init = initial_patch_size(
        final, cfg.rotation_rad, False, cfg.scale_range
    )
    g = np.array([0.7, -0.3])
    idx = np.stack(
        np.meshgrid(*[np.arange(n) for n in init], indexing="ij"), -1
    ).astype(np.float64)
    ramp = 5.0 + idx @ g  # linear field f(p) = 5 + g.p
    data = ramp[None].astype(np.float32)
    seg = np.zeros(init, np.int16)

    # reproduce the rng draws _spatial consumes to recover (mat, offset)
    for seed in (0, 3, 11):
        rng = np.random.default_rng(seed)
        out_d, out_s = _spatial(data.copy(), seg, cfg, rng)
        assert out_d.shape == (1, *final) and out_s.shape == final

        rng2 = np.random.default_rng(seed)
        assert rng2.uniform() < 1.0 and rng2.uniform() < 1.0  # rot+scale
        ang = rng2.uniform(-cfg.rotation_rad[0], cfg.rotation_rad[0])
        c, s = np.cos(ang), np.sin(ang)
        mat = np.eye(2) @ np.array([[c, -s], [s, c]])
        mat = mat * rng2.uniform(*cfg.scale_range)

        c_src = (np.array(init) - 1) / 2.0
        c_fin = (np.array(final) - 1) / 2.0
        yy = np.stack(
            np.meshgrid(*[np.arange(n) for n in final], indexing="ij"), -1
        ).astype(np.float64)
        src_pts = (yy - c_fin) @ mat.T + c_src
        want = 5.0 + src_pts @ g
        np.testing.assert_allclose(
            out_d[0].astype(np.float64), want, rtol=1e-4, atol=1e-3,
            err_msg=f"seed {seed}",
        )


def test_augment_batch_crops_to_final():
    final = (12, 14, 10)
    cfg = AugmentConfig(
        rotation_rad=(np.pi / 6,) * 3,
        p_rotation=0.5, p_scaling=0.5,
        final_patch_size=final,
        mirror_axes=(0, 1, 2),
    )
    init = initial_patch_size(final, cfg.rotation_rad, False, cfg.scale_range)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((3, 1, *init)).astype(np.float32)
    seg = rng.integers(0, 3, (3, *init)).astype(np.int16)
    out_d, out_s, out_p = augment_batch(data, seg, cfg, rng)
    assert out_d.shape == (3, 1, *final)
    assert out_s.shape == (3, *final)
    assert out_p is None
    assert set(np.unique(out_s)) <= {0, 1, 2}

    # no-DA batch (p=0): pure center crop, values must match the source crop
    cfg0 = AugmentConfig(
        rotation_rad=(np.pi / 6,) * 3, p_rotation=0.0, p_scaling=0.0,
        p_noise=0.0, p_blur=0.0, p_brightness=0.0, p_contrast=0.0,
        p_lowres=0.0, p_gamma=0.0, p_gamma_invert=0.0,
        final_patch_size=final,
    )
    out_d0, out_s0, _ = augment_batch(data, seg, cfg0, rng)
    lo = [(i - f) // 2 for i, f in zip(init, final)]
    sl = tuple(slice(l, l + f) for l, f in zip(lo, final))
    np.testing.assert_array_equal(out_d0, data[(slice(None), slice(None), *sl)])
    np.testing.assert_array_equal(out_s0, seg[(slice(None), *sl)])


def test_cascade_prev_rides_through_crop():
    from nextou_tpu.data.augment import augment_sample

    final = (10, 12, 8)
    cfg = AugmentConfig(
        rotation_rad=(np.pi / 8,) * 3, p_rotation=1.0, p_scaling=0.0,
        p_noise=0.0, p_blur=0.0, p_brightness=0.0, p_contrast=0.0,
        p_lowres=0.0, p_gamma=0.0, p_gamma_invert=0.0,
        final_patch_size=final,
    )
    init = initial_patch_size(final, cfg.rotation_rad, False, cfg.scale_range)
    rng = np.random.default_rng(1)
    data = rng.standard_normal((1, *init)).astype(np.float32)
    seg = rng.integers(0, 3, init).astype(np.int16)
    prev = rng.integers(0, 2, init).astype(np.int16)
    out_d, out_s, out_p = augment_sample(data, seg, cfg, rng, prev)
    assert out_d.shape == (1, *final)
    assert out_s.shape == final and out_p.shape == final
    assert set(np.unique(out_p)) <= {0, 1}
