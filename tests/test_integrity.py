"""Raw-dataset integrity verification (plans/integrity.py — the
--verify_dataset_integrity flag of plan_and_preprocess)."""

import json
import os

import numpy as np

from nextou_tpu.data.io import write_nifti
from nextou_tpu.plans.integrity import verify_dataset_integrity


def _make_raw(tmp_path, n_cases=2, labels=None, spacing=(1.0, 1.0, 1.0)):
    for d in ("imagesTr", "labelsTr"):
        os.makedirs(tmp_path / d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_cases):
        img = rng.standard_normal((6, 8, 7)).astype(np.float32)
        seg = rng.integers(0, 3, (6, 8, 7)).astype(np.int16)
        write_nifti(str(tmp_path / "imagesTr" / f"case_{i}_0000.nii.gz"),
                    img, spacing=spacing)
        write_nifti(str(tmp_path / "labelsTr" / f"case_{i}.nii.gz"),
                    seg, spacing=spacing)
    dj = {
        "channel_names": {"0": "MRI"},
        "labels": labels or {"background": 0, "a": 1, "b": 2},
        "numTraining": n_cases,
        "file_ending": ".nii.gz",
    }
    with open(tmp_path / "dataset.json", "w") as f:
        json.dump(dj, f)
    return tmp_path


def test_clean_dataset_passes(tmp_path):
    _make_raw(tmp_path)
    assert verify_dataset_integrity(str(tmp_path)) == []


def test_detects_missing_channel_and_count(tmp_path):
    _make_raw(tmp_path)
    os.remove(tmp_path / "imagesTr" / "case_1_0000.nii.gz")
    with open(tmp_path / "dataset.json") as f:
        dj = json.load(f)
    dj["numTraining"] = 5
    with open(tmp_path / "dataset.json", "w") as f:
        json.dump(dj, f)
    problems = verify_dataset_integrity(str(tmp_path))
    assert any("missing channel image" in p for p in problems)
    assert any("numTraining=5" in p for p in problems)


def test_detects_undeclared_labels_and_bad_background(tmp_path):
    _make_raw(tmp_path, labels={"background": 1, "a": 2})
    problems = verify_dataset_integrity(str(tmp_path))
    assert any("background" in p for p in problems)
    assert any("not in dataset.json" in p for p in problems)


def test_detects_shape_mismatch(tmp_path):
    _make_raw(tmp_path, n_cases=1)
    bad = np.zeros((5, 8, 7), np.int16)
    write_nifti(str(tmp_path / "labelsTr" / "case_0.nii.gz"), bad,
                spacing=(1, 1, 1))
    problems = verify_dataset_integrity(str(tmp_path))
    assert any("seg shape" in p for p in problems)


def test_region_labels_accepted(tmp_path):
    _make_raw(tmp_path, labels={"background": 0, "whole": [1, 2], "core": [2]})
    assert verify_dataset_integrity(str(tmp_path)) == []


def test_detects_seg_spacing_mismatch(tmp_path):
    folder = _make_raw(tmp_path)
    # rewrite one label with a different spacing (same grid, wrong header)
    seg = np.zeros((6, 8, 7), np.int16)
    write_nifti(str(tmp_path / "labelsTr" / "case_0.nii.gz"),
                seg, spacing=(1.0, 1.0, 5.0))
    problems = verify_dataset_integrity(str(folder))
    assert any("seg spacing" in p for p in problems)
