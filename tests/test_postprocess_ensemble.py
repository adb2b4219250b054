"""Largest-component postprocessing decisions + probability ensembling."""

import numpy as np

from nextou_tpu.postprocess import (
    apply_postprocessing,
    determine_postprocessing,
    remove_all_but_largest_component,
)
from nextou_tpu.ensemble import ensemble_case


def test_remove_all_but_largest_component():
    seg = np.zeros((10, 10), np.int16)
    seg[1:6, 1:6] = 1  # 25 voxels
    seg[8:10, 8:10] = 1  # 4 voxels -> removed
    seg[7, 0] = 2  # other labels untouched
    out = remove_all_but_largest_component(seg, 1)
    assert out[1:6, 1:6].min() == 1
    assert out[8:10, 8:10].max() == 0
    assert out[7, 0] == 2


def test_determine_postprocessing_per_class():
    gt = np.zeros((12, 12), np.int16)
    gt[2:8, 2:8] = 1
    gt[9:11, 0:2] = 2
    # class 1: spurious component -> removal helps
    # class 2: prediction is split into two true components -> removal hurts
    pred = gt.copy()
    pred[0, 11] = 1
    gt2 = gt.copy()
    gt2[9:11, 4:6] = 2
    pred2 = gt2.copy()
    pp = determine_postprocessing([(pred, gt), (pred2, gt2)], [0, 1, 2])
    assert pp["remove_all_but_largest_component"]["1"] is True
    assert pp["remove_all_but_largest_component"]["2"] is False
    # applying respects the decisions
    out = apply_postprocessing(pred, pp)
    assert out[0, 11] == 0
    out2 = apply_postprocessing(pred2, pp)
    assert (out2 == 2).sum() == (pred2 == 2).sum()


def test_ensemble_case_averages_probabilities():
    p1 = np.zeros((4, 4, 3), np.float16)
    p1[..., 1] = 0.6
    p1[..., 0] = 0.4
    p2 = np.zeros((4, 4, 3), np.float16)
    p2[..., 2] = 0.9
    p2[..., 0] = 0.1
    seg = ensemble_case([p1, p2])
    # means: (0.25, 0.3, 0.45) -> class 2
    assert (seg == 2).all()


def test_ensemble_case_region_mode():
    from nextou_tpu.plans.loader import LabelManager

    lm = LabelManager({
        "labels": {"background": 0, "whole": [1, 2], "core": [2]},
        "regions_class_order": [1, 2],
    })
    # two models' sigmoid region probabilities (no background channel)
    p1 = np.zeros((4, 4, 2), np.float16)
    p2 = np.zeros((4, 4, 2), np.float16)
    p1[1:3, 1:3, 0] = 0.8   # whole: mean 0.4 -> below threshold alone
    p2[1:3, 1:3, 0] = 0.6   # mean 0.7 -> whole painted as label 1
    p1[2, 2, 1] = 0.9       # core at (2,2): mean 0.55 -> label 2 overwrites
    p2[2, 2, 1] = 0.2
    seg = ensemble_case([p1, p2], lm)
    assert seg[0, 0] == 0
    assert seg[1, 1] == 1
    assert seg[2, 2] == 2
