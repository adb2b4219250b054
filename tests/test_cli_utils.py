"""MSD conversion, find_best_configuration, env-var path resolution."""

import json
import os

import numpy as np

from nextou_tpu.convert_msd import convert_msd_dataset
from nextou_tpu.data.io import read_nifti, write_nifti
from nextou_tpu.find_best_configuration import find_best
from nextou_tpu.paths import resolve_preprocessed


def test_convert_msd_dataset(tmp_path):
    msd = tmp_path / "msd"
    for d in ("imagesTr", "labelsTr"):
        (msd / d).mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((10, 12, 11, 2)).astype(np.float32)
    seg = (rng.random((10, 12, 11)) > 0.8).astype(np.int16)
    write_nifti(str(msd / "imagesTr" / "case_0.nii.gz"), img, spacing=(1, 1, 1, 1))
    write_nifti(str(msd / "labelsTr" / "case_0.nii.gz"), seg, spacing=(1, 1, 1))
    (msd / "dataset.json").write_text(json.dumps({
        "name": "Task99", "modality": {"0": "T1", "1": "T2"},
        "labels": {"0": "background", "1": "lesion"}, "numTraining": 1,
    }))

    out = tmp_path / "raw"
    dj = convert_msd_dataset(str(msd), str(out), verbose=False)
    # per-channel files, v2-style labels
    a, _ = read_nifti(str(out / "imagesTr" / "case_0_0000.nii.gz"))
    b, _ = read_nifti(str(out / "imagesTr" / "case_0_0001.nii.gz"))
    np.testing.assert_allclose(a, img[..., 0], rtol=1e-6)
    np.testing.assert_allclose(b, img[..., 1], rtol=1e-6)
    assert dj["labels"] == {"background": 0, "lesion": 1}
    assert dj["channel_names"] == {"0": "T1", "1": "T2"}
    s, _ = read_nifti(str(out / "labelsTr" / "case_0.nii.gz"))
    np.testing.assert_array_equal(s, seg)


def test_find_best_ranks_by_fg_dice(tmp_path):
    runs = {}
    for name, dice in (("a", 0.7), ("b", 0.9), ("c", 0.8)):
        d = tmp_path / name / "validation"
        d.mkdir(parents=True)
        (d / "summary.json").write_text(
            json.dumps({"foreground_mean": {"Dice": dice}})
        )
        runs[name] = str(tmp_path / name)
    info = find_best(runs)
    assert info["best_configuration"] == "b"
    assert [r["name"] for r in info["ranking"]] == ["b", "c", "a"]


def test_resolve_preprocessed_env(tmp_path, monkeypatch):
    (tmp_path / "Dataset007").mkdir()
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path))
    assert resolve_preprocessed("Dataset007") == str(tmp_path / "Dataset007")
    # explicit existing path wins; unknown name passes through
    assert resolve_preprocessed(str(tmp_path)) == str(tmp_path)
    assert resolve_preprocessed("DatasetMissing") == "DatasetMissing"
