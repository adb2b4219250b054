"""NIfTI round-trip and preprocessing tests."""

import numpy as np
import pytest

from nextou_tpu.data.io import read_nifti, write_nifti
from nextou_tpu.data.preprocessing import (
    crop_to_nonzero,
    zscore_normalize,
    resample_to_shape,
    preprocess_case,
)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((7, 9, 11)).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    write_nifti(p, arr, spacing=(0.5, 1.0, 2.0))
    back, spacing = read_nifti(p)
    np.testing.assert_array_equal(back, arr)
    assert spacing == (0.5, 1.0, 2.0)


def test_nifti_int_roundtrip(tmp_path):
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "seg.nii")
    write_nifti(p, arr)
    back, _ = read_nifti(p)
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == np.int16


def test_crop_to_nonzero():
    data = np.zeros((1, 10, 10), np.float32)
    data[0, 2:5, 3:7] = 1.0
    seg = np.ones((10, 10), np.int16)
    cd, cs, bbox = crop_to_nonzero(data, seg)
    assert cd.shape == (1, 3, 4)
    assert cs.shape == (3, 4)
    assert bbox == [(2, 5), (3, 7)]


def test_zscore():
    rng = np.random.default_rng(1)
    data = rng.normal(10, 5, (2, 8, 8)).astype(np.float32)
    out = zscore_normalize(data)
    for c in range(2):
        assert abs(out[c].mean()) < 1e-5
        assert abs(out[c].std() - 1) < 1e-4


def test_resample_shapes():
    x = np.random.default_rng(2).standard_normal((8, 8)).astype(np.float32)
    y = resample_to_shape(x, (12, 6), order=1)
    assert y.shape == (12, 6)
    seg = np.random.default_rng(3).integers(0, 3, (8, 8)).astype(np.int16)
    ys = resample_to_shape(seg, (12, 6), is_seg=True)
    assert ys.shape == (12, 6)
    assert set(np.unique(ys)) <= {0, 1, 2}


def test_preprocess_case_pipeline():
    rng = np.random.default_rng(4)
    data = np.zeros((1, 16, 16, 16), np.float32)
    data[0, 4:12, 4:12, 4:12] = rng.normal(5, 2, (8, 8, 8))
    seg = (data[0] > 5).astype(np.int16)
    d, s, props = preprocess_case(
        data, seg, spacing=(2.0, 1.0, 1.0), target_spacing=(1.0, 1.0, 1.0)
    )
    assert d.shape[1] == 16  # z doubled from 8 after crop
    assert d.shape[1:] == s.shape
    assert props["bbox"][0] == [4, 12]
