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


def test_find_best_ensemble_gt_shape_matching_and_pair_isolation(tmp_path):
    """Ensembling must (a) pick the preprocessed GT whose grid matches the
    prediction when several data_identifier subfolders hold the same case
    (the alphabetically-first one used to win — scoring 3d runs against the
    2d grid), and (b) skip a pair that fails to evaluate without aborting
    the ranking of the others."""
    from nextou_tpu.find_best_configuration import _ensemble_candidates

    dsj = {"labels": {"background": 0, "fg": 1}, "numTraining": 1,
           "channel_names": {"0": "img"}}

    def make_run(name, shape, hot):
        d = tmp_path / name / "validation"
        d.mkdir(parents=True)
        probs = np.zeros((*shape, 2), np.float16)
        probs[..., 0] = 1.0
        probs[hot][..., 0] = 0.0
        probs[hot][..., 1] = 1.0
        np.savez(d / "case0.npz", probabilities=probs)
        (tmp_path / name / "dataset.json").write_text(json.dumps(dsj))
        return {"name": name, "folder": str(tmp_path / name)}

    # two 4x4-grid runs agreeing on the same fg square, one 8x8-grid run
    hot = (slice(0, 2), slice(0, 2))
    a = make_run("runA", (4, 4), hot)
    b = make_run("runB", (4, 4), hot)
    c = make_run("runC", (8, 8), hot)  # different grid: unpairable with a/b

    # GT lives under two data_identifier subfolders; the 2d one sorts first
    # and has the WRONG grid for these runs
    ds = tmp_path / "preproc"
    (ds / "nnUNetPlans_2d").mkdir(parents=True)
    (ds / "nnUNetPlans_3d_fullres").mkdir()
    np.savez(ds / "nnUNetPlans_2d" / "case0.npz",
             seg=np.zeros((1, 2, 2), np.int16))
    gt = np.zeros((4, 4), np.int16)
    gt[0:2, 0:2] = 1  # exactly the runs' predicted fg square
    np.savez(ds / "nnUNetPlans_3d_fullres" / "case0.npz", seg=gt[None])

    out = _ensemble_candidates([a, b, c], str(ds))
    names = [o["name"] for o in out]
    assert names == ["ensemble runA + runB"]  # c-pairs skipped, not fatal
    assert out[0]["fg_mean_dice"] == 1.0  # scored against the matching grid


def test_find_best_determines_postprocessing_on_winner(tmp_path):
    """With -ds, find_best runs determine_postprocessing on the winner's CV
    segs and bakes the ops + apply step into inference_information (nnU-Net's
    find_best workflow). Label 1 has a spurious second component in the
    predictions (removal helps); label 2 legitimately has two components
    (removal hurts and must stay off)."""
    gt = np.zeros((12, 12), np.int16)
    gt[1:4, 1:4] = 1
    gt[7:10, 1:4] = 2
    gt[7:10, 7:10] = 2  # two real components of label 2
    pred = gt.copy()
    pred[11, 11] = 1  # spurious label-1 speck

    run = tmp_path / "best_run"
    vdir = run / "validation"
    vdir.mkdir(parents=True)
    (vdir / "summary.json").write_text(
        json.dumps({"foreground_mean": {"Dice": 0.9}})
    )
    np.savez(vdir / "case0.npz", seg=pred)
    ds = tmp_path / "preproc"
    ds.mkdir()
    np.savez(ds / "case0.npz", seg=gt)

    info = find_best({"best_run": str(run)}, dataset_folder=str(ds))
    pp = info["postprocessing"]["remove_all_but_largest_component"]
    assert pp["1"] is True
    assert pp["2"] is False
    assert "postprocess apply" in info["inference_instructions"]


def test_find_best_skips_postprocessing_without_cv_segs(tmp_path):
    """Runs predating stored CV segs (probabilities-only npz) must not
    crash find_best — postprocessing is skipped, ranking still returned."""
    run = tmp_path / "old_run"
    vdir = run / "validation"
    vdir.mkdir(parents=True)
    (vdir / "summary.json").write_text(
        json.dumps({"foreground_mean": {"Dice": 0.8}})
    )
    np.savez(vdir / "case0.npz",
             probabilities=np.ones((4, 4, 2), np.float16))
    (run / "dataset.json").write_text(json.dumps(
        {"labels": {"background": 0, "fg": 1}, "numTraining": 1,
         "channel_names": {"0": "img"}}
    ))
    ds = tmp_path / "preproc"
    ds.mkdir()
    np.savez(ds / "case0.npz", seg=np.zeros((4, 4), np.int16))
    info = find_best({"old_run": str(run)}, dataset_folder=str(ds))
    assert "postprocessing" not in info
    assert info["best_configuration"] == "old_run"
