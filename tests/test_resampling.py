"""nnU-Net resampling semantics: half-pixel convention, separate-z dispatch,
one-hot segmentation resizing (data/resampling.py).

Oracle strategy: the substrate's resampler is skimage-resize / explicit
half-pixel ``map_coordinates`` (mode 'edge'/'nearest'); the tests rebuild
those coordinate maps by hand (``np.mgrid`` -> ``(i+0.5)*scale-0.5``) and
compare against the module, so the two code paths share nothing but scipy's
spline evaluator. Reference semantics: nnU-Net v2 ``resample_data_or_seg_to_
shape`` as promised by the plans (/root/reference/nnUNetPlans.json:132-152).
"""

import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from nextou_tpu.data.resampling import (
    get_do_separate_z,
    get_lowres_axis,
    resample_data_or_seg_to_shape,
    resize_half_pixel,
    resize_segmentation,
)


def half_pixel_coords(in_shape, out_shape):
    grids = np.mgrid[tuple(slice(0, t) for t in out_shape)].astype(np.float64)
    for ax, (n_in, n_out) in enumerate(zip(in_shape, out_shape)):
        grids[ax] = (grids[ax] + 0.5) * (n_in / n_out) - 0.5
    return grids


def oracle_resize(x, out_shape, order):
    """skimage.resize(anti_aliasing=False, mode='edge', clip=True) by hand."""
    coords = half_pixel_coords(x.shape, out_shape)
    out = map_coordinates(
        x.astype(np.float64), coords, order=order, mode="nearest"
    )
    return np.clip(out, x.min(), x.max())


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize(
    "in_shape,out_shape",
    [((7, 9), (13, 5)), ((6, 5, 8), (9, 11, 4))],
)
def test_resize_half_pixel_matches_explicit_map(order, in_shape, out_shape):
    rng = np.random.default_rng(0)
    x = rng.normal(size=in_shape)
    got = resize_half_pixel(x, out_shape, order)
    want = oracle_resize(x, out_shape, order)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_resize_half_pixel_is_not_endpoint_aligned():
    # the legacy zoom(grid_mode=False) convention samples input 0 at output 0;
    # half-pixel does not (upsampling 2x puts output 0 at input -0.25)
    x = np.arange(4, dtype=np.float64)
    up = resize_half_pixel(x, (8,), order=1)
    assert up[0] == pytest.approx(0.0)  # clamped edge
    assert up[1] == pytest.approx(0.25)
    # downsample 4->2: outputs sample inputs 0.5 and 2.5
    down = resize_half_pixel(x, (2,), order=1)
    np.testing.assert_allclose(down, [0.5, 2.5])


def test_dispatch_rules():
    assert get_do_separate_z((3.0, 0.7, 0.7))
    assert not get_do_separate_z((1.0, 1.0, 1.0))
    assert not get_do_separate_z((2.0, 1.0, 1.0))  # ratio 2 <= 3
    assert list(get_lowres_axis((3.0, 0.7, 0.7))) == [0]
    assert list(get_lowres_axis((0.7, 0.7, 3.0))) == [2]
    # two equally-lowres axes -> separate-z disabled downstream
    assert list(get_lowres_axis((3.0, 3.0, 0.7))) == [0, 1]


def test_separate_z_data_matches_slicewise_oracle():
    """Anisotropic CT (3mm z): in-plane cubic per slice, nearest along z."""
    rng = np.random.default_rng(1)
    data = rng.normal(size=(2, 5, 12, 10))  # (C, z, y, x), z thick
    cur, new = (3.0, 0.7, 0.7), (3.0, 1.0, 1.0)
    out_shape = (5, 8, 7)
    got = resample_data_or_seg_to_shape(
        data, out_shape, cur, new, is_seg=False,
        order=3, order_z=0, force_separate_z=None,
    )
    # oracle: per-slice 2D half-pixel cubic; z count unchanged -> no z interp
    want = np.stack([
        np.stack([oracle_resize(data[c, s], out_shape[1:], 3)
                  for s in range(5)])
        for c in range(2)
    ])
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)
    # and it must DIFFER from full-3D cubic resampling (force_separate_z=False)
    full = resample_data_or_seg_to_shape(
        data, out_shape, cur, new, is_seg=False,
        order=3, order_z=0, force_separate_z=False,
    )
    assert np.abs(got - full).max() > 1e-4


def test_separate_z_changes_z_with_order_z_nearest():
    rng = np.random.default_rng(2)
    data = rng.normal(size=(1, 6, 8, 8))
    out_shape = (3, 8, 8)  # downsample z only: slices pass through untouched
    got = resample_data_or_seg_to_shape(
        data, out_shape, (3.0, 1.0, 1.0), (6.0, 1.0, 1.0), is_seg=False,
        order=3, order_z=0, force_separate_z=None,
    )
    # nearest z at half-pixel centers: output z=0,1,2 sample input z=1,3,5
    # ((i+0.5)*2-0.5 = 0.5,2.5,4.5 -> order-0 rounds to 1,3,5 via scipy's
    # floor(x+0.5))
    want = data[0, 1::2].astype(np.float32)
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_resize_segmentation_onehot_no_new_labels():
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 4, size=(9, 9)).astype(np.int16)
    out = resize_segmentation(seg, (14, 13), order=1)
    assert out.dtype == seg.dtype
    assert set(np.unique(out)) <= set(np.unique(seg))
    # order-1 one-hot argmax-ish differs from nearest on boundary voxels
    nearest = resize_segmentation(seg, (14, 13), order=0)
    assert (out != nearest).any()


def test_resize_segmentation_onehot_matches_manual():
    seg = np.zeros((6, 6), np.uint8)
    seg[2:5, 1:4] = 2
    seg[0:2, 4:6] = 7
    got = resize_segmentation(seg, (9, 8), order=1)
    want = np.zeros((9, 8), np.uint8)
    for lab in [0, 2, 7]:  # ascending: later labels overwrite on ties
        m = oracle_resize((seg == lab).astype(np.float64), (9, 8), 1)
        want[m >= 0.5] = lab
    np.testing.assert_array_equal(got, want)


def test_separate_z_seg_onehot_z_interp():
    """order_z > 0 on a seg goes one-hot + round along z (substrate path)."""
    seg = np.zeros((4, 6, 6), np.int16)
    seg[:2] = 1
    seg[2:, 3:] = 3
    got = resample_data_or_seg_to_shape(
        seg, (8, 6, 6), (3.0, 0.5, 0.5), (1.5, 0.5, 0.5), is_seg=True,
        order=1, order_z=1, force_separate_z=True,
    )
    assert set(np.unique(got)) <= {0, 1, 3}
    assert got.shape == (8, 6, 6)
    # interior slices map straight through (z=2,3 sample input z ~ 0.875,1.375
    # -> still label-1 region for rows)
    assert (got[0] == seg[0]).all()


def test_two_lowres_axes_fall_back_to_full_3d():
    rng = np.random.default_rng(4)
    data = rng.normal(size=(1, 8, 8, 4))
    cur = (3.0, 3.0, 0.5)  # two equally-thick axes
    got = resample_data_or_seg_to_shape(
        data, (6, 6, 6), cur, (4.0, 4.0, 0.33), is_seg=False,
        order=3, order_z=0, force_separate_z=None,
    )
    want = resample_data_or_seg_to_shape(
        data, (6, 6, 6), cur, (4.0, 4.0, 0.33), is_seg=False,
        order=3, order_z=0, force_separate_z=False,
    )
    np.testing.assert_allclose(got, want)


def test_preprocess_case_dispatches_on_plans_kwargs():
    from nextou_tpu.data.preprocessing import preprocess_case

    rng = np.random.default_rng(5)
    data = np.zeros((1, 8, 20, 20), np.float32)
    data[0, 1:7, 2:18, 2:18] = rng.normal(
        size=(6, 16, 16)
    ).astype(np.float32) + 5.0
    seg = (data[0] > 5).astype(np.int16)
    cur, tgt = [3.0, 0.7, 0.7], [3.0, 1.0, 1.0]
    kw = {"order": 3, "order_z": 0, "force_separate_z": None}
    kws = {"order": 0, "order_z": 0, "force_separate_z": None}
    d1, s1, _ = preprocess_case(
        data, seg, cur, tgt,
        resampling_data_kwargs=kw, resampling_seg_kwargs=kws,
    )
    d2, s2, _ = preprocess_case(data, seg, cur, tgt)  # legacy path
    assert d1.shape == d2.shape and s1.shape == s2.shape
    # separate-z cubic in-plane differs from legacy isotropic 3D zoom
    assert np.abs(d1 - d2).max() > 1e-4


def test_probabilities_roundtrip_shapes_via_raw_kwargs():
    """predict_raw_case honors the plans' resampling kwargs end to end."""
    from nextou_tpu.infer.raw import predict_raw_case

    rng = np.random.default_rng(6)
    img = np.zeros((1, 6, 24, 24), np.float32)
    img[0, 1:5, 4:20, 4:20] = rng.normal(size=(4, 16, 16)).astype(np.float32)
    seen = {}

    def predictor(x):
        seen["shape"] = x.shape
        probs = rng.normal(size=(*x.shape[:-1], 3)).astype(np.float32)
        e = np.exp(probs - probs.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    seg = predict_raw_case(
        predictor, img, (3.0, 0.7, 0.7),
        target_spacing=(3.0, 1.4, 1.4),
        normalization_schemes=["ZScoreNormalization"],
        use_mask_for_norm=[False],
        intensity_props=None,
        resampling_data_kwargs={
            "order": 3, "order_z": 0, "force_separate_z": None
        },
        resampling_probabilities_kwargs={
            "order": 1, "order_z": 0, "force_separate_z": None
        },
    )
    assert seg.shape == img.shape[1:]
    # anisotropic input downsampled in-plane only: 16/1.4*... cropped 4x16x16
    assert seen["shape"][0] == 4  # z preserved (same spacing)


def test_configuration_manager_exposes_resampling_kwargs():
    import json

    from nextou_tpu.plans.loader import PlansManager

    plans = json.load(open("/root/reference/nnUNetPlans.json"))
    pm = PlansManager(plans)
    cm = pm.get_configuration("3d_fullres_nextou")  # via inherits_from
    assert cm.resampling_fn_data_kwargs == {
        "order": 3, "order_z": 0, "force_separate_z": None,
    }
    assert cm.resampling_fn_seg_kwargs == {
        "order": 0, "order_z": 0, "force_separate_z": None,
    }
    assert cm.resampling_fn_probabilities_kwargs == {
        "order": 1, "order_z": 0, "force_separate_z": None,
    }
