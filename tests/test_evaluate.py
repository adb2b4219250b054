"""Golden tests for evaluation metrics (`infer/evaluate.py`), HD95 above all.

HD95 is the reference's second headline quality metric (BASELINE.md: BTCV
mean HD95 6.33). The oracle here is brute force: extract surface voxels
(mask XOR its connectivity-1 erosion, the medpy/nnU-Net convention), compute
every pairwise Euclidean distance between the two surfaces under the given
spacing, take directed min-distances both ways, pool them, and read the 95th
percentile — exactly medpy.metric.binary.hd95's definition, without EDT.
"""

import numpy as np
import pytest
from scipy import ndimage

from nextou_tpu.infer.evaluate import case_metrics, dice_scores, hd95


def _surface_coords(mask: np.ndarray, spacing) -> np.ndarray:
    border = mask ^ ndimage.binary_erosion(mask)
    coords = np.argwhere(border).astype(np.float64)
    return coords * np.asarray(spacing, np.float64)


def hd95_oracle(pred, ref, spacing=None) -> float:
    spacing = spacing if spacing is not None else (1.0,) * pred.ndim
    if not pred.any() or not ref.any():
        return float("nan")
    p = _surface_coords(pred, spacing)
    g = _surface_coords(ref, spacing)
    if len(p) == 0 or len(g) == 0:
        return float("nan")
    d = np.sqrt(((p[:, None, :] - g[None, :, :]) ** 2).sum(-1))
    directed = np.concatenate([d.min(axis=1), d.min(axis=0)])
    return float(np.percentile(directed, 95))


def _random_blob(rng, shape, p=0.5):
    m = rng.random(shape) < p
    # smooth into connected-ish blobs so surfaces are non-degenerate
    return ndimage.binary_closing(ndimage.binary_opening(m))


@pytest.mark.parametrize("spacing", [None, (1.0, 1.0, 1.0), (2.5, 0.7, 0.7)])
def test_hd95_matches_bruteforce_oracle_3d(spacing):
    rng = np.random.default_rng(0)
    for trial in range(5):
        a = np.zeros((12, 13, 11), bool)
        b = np.zeros((12, 13, 11), bool)
        a[2:7, 3:9, 2:8] = _random_blob(rng, (5, 6, 6))
        b[4:10, 2:8, 3:9] = _random_blob(rng, (6, 6, 6))
        if not (a.any() and b.any()):
            continue
        got = hd95(a, b, spacing)
        want = hd95_oracle(a, b, spacing)
        if np.isnan(want):
            assert np.isnan(got)
        else:
            assert got == pytest.approx(want, abs=1e-9), (trial, spacing)


def test_hd95_matches_bruteforce_oracle_2d():
    rng = np.random.default_rng(1)
    for _ in range(5):
        a = rng.random((20, 18)) < 0.4
        b = rng.random((20, 18)) < 0.4
        got = hd95(a, b)
        want = hd95_oracle(a, b)
        if np.isnan(want):
            assert np.isnan(got)
        else:
            assert got == pytest.approx(want, abs=1e-9)


def test_hd95_identical_masks_is_zero():
    m = np.zeros((8, 8, 8), bool)
    m[2:6, 2:6, 2:6] = True
    assert hd95(m, m) == 0.0


def test_hd95_known_shift():
    # two 1-voxel-thick planes 5 apart along a unit axis: every surface
    # voxel's nearest counterpart is exactly 5 away
    a = np.zeros((12, 6, 6), bool)
    b = np.zeros((12, 6, 6), bool)
    a[2] = True
    b[7] = True
    assert hd95(a, b) == pytest.approx(5.0)
    # anisotropic spacing scales the gap
    assert hd95(a, b, spacing=(2.0, 1.0, 1.0)) == pytest.approx(10.0)


def test_hd95_empty_and_degenerate_masks():
    empty = np.zeros((6, 6, 6), bool)
    cube = np.zeros((6, 6, 6), bool)
    cube[1:4, 1:4, 1:4] = True
    assert np.isnan(hd95(empty, cube))
    assert np.isnan(hd95(cube, empty))
    assert np.isnan(hd95(empty, empty))
    # single voxel: erosion removes it, its surface is itself
    single = np.zeros((6, 6, 6), bool)
    single[2, 2, 2] = True
    got = hd95(single, cube)
    want = hd95_oracle(single, cube)
    assert got == pytest.approx(want, abs=1e-9)


def test_hd95_mask_touching_volume_border():
    # voxels on the array edge count as surface (erosion's border_value=0,
    # the medpy convention)
    a = np.ones((4, 4, 4), bool)
    b = np.zeros((4, 4, 4), bool)
    b[0] = True
    got = hd95(a, b)
    want = hd95_oracle(a, b)
    assert got == pytest.approx(want, abs=1e-9)


def test_case_metrics_dice_iou_counts():
    pred = np.array([[0, 1, 1], [2, 2, 0]])
    ref = np.array([[0, 1, 2], [2, 2, 2]])
    m = case_metrics(pred, ref, labels=[0, 1, 2])
    assert m["1"]["TP"] == 1 and m["1"]["FP"] == 1 and m["1"]["FN"] == 0
    assert m["1"]["Dice"] == pytest.approx(2 / 3)
    assert m["2"]["TP"] == 2 and m["2"]["FP"] == 0 and m["2"]["FN"] == 2
    assert m["2"]["Dice"] == pytest.approx(2 * 2 / (2 + 4))
    assert m["2"]["IoU"] == pytest.approx(2 / 4)
    ds = dice_scores(pred, ref, [0, 1, 2])
    assert ds[1] == pytest.approx(2 / 3)
    # absent-from-both label -> NaN
    assert np.isnan(dice_scores(pred, ref, [7])[7])


def test_region_evaluation_membership_masks():
    """Tuple entries in `labels` are evaluated as region membership masks
    with nnU-Net-style '(1, 2)' keys (region-based datasets score regions,
    not individual labels)."""
    from nextou_tpu.infer.evaluate import evaluate_cases

    pred = np.zeros((6, 6), np.int16)
    ref = np.zeros((6, 6), np.int16)
    pred[0:3, :] = 1
    pred[3:5, :] = 2
    ref[0:4, :] = 1
    ref[4:5, :] = 2
    s = evaluate_cases([(pred, ref, "c0")], [(1, 2), (2,)])
    # region (1,2): pred rows 0-4 vs ref rows 0-4 -> Dice 1.0
    assert s["mean"]["(1, 2)"]["Dice"] == 1.0
    # region (2,): pred rows 3-4 vs ref row 4 -> Dice 2*6/(12+6)
    assert abs(s["mean"]["2"]["Dice"] - 2 * 6 / 18) < 1e-6
    assert abs(
        s["foreground_mean"]["Dice"] - (1.0 + 2 * 6 / 18) / 2
    ) < 1e-6
