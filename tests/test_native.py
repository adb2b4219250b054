"""Native C++ resampler (native/resample.cpp via nextou_tpu.native): scipy
parity of zoom/affine/gaussian, plus the preprocessing dispatch. Skipped when
the g++ toolchain is unavailable (NEXTOU_NATIVE=0 disables the lib)."""

import numpy as np
import pytest
from scipy import ndimage

from nextou_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (no g++?)"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("shape,out", [((23, 31, 17), (37, 20, 25)),
                                       ((40, 40), (25, 61))])
def test_zoom_matches_scipy(rng, order, shape, out):
    x = rng.standard_normal(shape).astype(np.float32)
    ref = ndimage.zoom(x, [t / s for t, s in zip(out, x.shape)], order=order)
    got = native.zoom_to_shape(x, ref.shape, order)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_affine_matches_scipy(rng):
    x = rng.standard_normal((23, 31, 17)).astype(np.float32)
    mat = np.eye(3) + 0.1 * rng.standard_normal((3, 3))
    center = (np.array(x.shape) - 1) / 2.0
    off = center - mat @ center
    ref = ndimage.affine_transform(x, mat, offset=off, order=1, mode="reflect")
    got = native.affine_transform(x, mat, off, 1, "reflect")
    np.testing.assert_allclose(got, ref, atol=1e-6)

    seg = rng.integers(0, 5, x.shape).astype(np.float32)
    ref0 = ndimage.affine_transform(seg, mat, offset=off, order=0, mode="constant")
    got0 = native.affine_transform(seg, mat, off, 0, "constant")
    assert (ref0 != got0).mean() == 0.0


def test_affine_2d(rng):
    x = rng.standard_normal((33, 29)).astype(np.float32)
    ang = 0.4
    mat = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    center = (np.array(x.shape) - 1) / 2.0
    off = center - mat @ center
    ref = ndimage.affine_transform(x, mat, offset=off, order=1, mode="reflect")
    got = native.affine_transform(x, mat, off, 1, "reflect")
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("sigma", [0.5, 1.2])
def test_gaussian_matches_scipy(rng, sigma):
    x = rng.standard_normal((14, 18, 10)).astype(np.float32)
    ref = ndimage.gaussian_filter(x, sigma)
    got = native.gaussian_filter(x, sigma)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_preprocessing_dispatches_native(rng):
    """resample_to_shape agrees with its scipy fallback (native maps to the
    requested shape directly — same endpoint-aligned grid when scipy's
    round(in*factor) lands on the requested size)."""
    from nextou_tpu.data.preprocessing import resample_to_shape

    x = rng.standard_normal((20, 24, 16)).astype(np.float32)
    out = resample_to_shape(x, (30, 36, 24), order=3)
    ref = ndimage.zoom(x, [30 / 20, 36 / 24, 24 / 16], order=3)
    assert out.shape == (30, 36, 24)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    seg = rng.integers(0, 4, (20, 24, 16)).astype(np.int16)
    out_s = resample_to_shape(seg, (30, 36, 24), is_seg=True)
    ref_s = ndimage.zoom(seg.astype(np.float32), [1.5, 1.5, 1.5], order=0)
    assert out_s.dtype == seg.dtype
    np.testing.assert_array_equal(out_s, ref_s.astype(seg.dtype))
