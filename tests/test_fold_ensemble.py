"""Cross-fold ensembling in the predict CLI (nnU-Net's -f 0 1 2 3 4)."""

import os

import numpy as np
import pytest

from nextou_tpu import predict as predict_mod
from nextou_tpu.predict import _fold_model_folders, build_fold_ensemble_predictor


def test_fold_folders_sibling_layout(tmp_path):
    for f in (0, 1):
        os.makedirs(tmp_path / f"tr__cfg__fold_{f}")
    base = str(tmp_path / "tr__cfg__fold_0")
    got = _fold_model_folders(base, [0, 1])
    assert got == [str(tmp_path / "tr__cfg__fold_0"), str(tmp_path / "tr__cfg__fold_1")]


def test_fold_folders_subfolder_layout(tmp_path):
    for f in (0, 3):
        os.makedirs(tmp_path / f"fold_{f}")
    got = _fold_model_folders(str(tmp_path), [0, 3])
    assert got == [str(tmp_path / "fold_0"), str(tmp_path / "fold_3")]


def test_fold_folders_missing_raises(tmp_path):
    os.makedirs(tmp_path / "tr__cfg__fold_0")
    with pytest.raises(SystemExit):
        _fold_model_folders(str(tmp_path / "tr__cfg__fold_0"), [0, 4])


def test_ensemble_predictor_averages(monkeypatch):
    outs = {
        "a": np.full((4, 4, 2), 0.2, np.float32),
        "b": np.full((4, 4, 2), 0.6, np.float32),
    }
    monkeypatch.setattr(
        predict_mod,
        "build_predictor",
        lambda trainer, tile_batch=2, mesh=None, output="probs", **kw: (
            lambda data: outs[trainer]
        ),
    )
    pred = build_fold_ensemble_predictor(["a", "b"])
    got = pred(np.zeros((4, 4, 1), np.float32))
    np.testing.assert_allclose(got, 0.4)
    # single fold short-circuits to the bare predictor
    pred1 = build_fold_ensemble_predictor(["a"])
    np.testing.assert_allclose(pred1(None), 0.2)
