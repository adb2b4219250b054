"""Experiment-planner golden tests.

The oracle is the reference's shipped plans file
(``/root/reference/nnUNetPlans.json``) — the *output* of nnU-Net's planner
on BTCV. Feeding its recorded medians through our planner must reproduce
the published configurations (patch sizes, topology, batch sizes) and the
NexToU overlay's 33/324 channel constraints.
"""

import json

import numpy as np
import pytest

from nextou_tpu.plans.planner import (
    compute_conv_feature_map_size,
    determine_fullres_target_spacing,
    determine_transpose,
    features_per_stage,
    get_pool_and_conv_props,
    nextou_feature_constraints,
    nextou_overlay,
    plan_configuration,
    plan_experiment,
)

# BTCV medians recorded in the reference plans file
BTCV_SPACING = [0.5999993681907654, 0.296875, 0.296875]
BTCV_MEDIAN_SHAPE_3D = [186.0, 575.5, 480.0]
BTCV_N_CASES = 30
BTCV_DATASET_VOXELS = float(np.prod(BTCV_MEDIAN_SHAPE_3D)) * BTCV_N_CASES
NUM_CLASSES = 14


def test_3d_fullres_matches_reference_plan():
    cfg = plan_configuration(
        BTCV_SPACING, BTCV_MEDIAN_SHAPE_3D, BTCV_DATASET_VOXELS, NUM_CLASSES
    )
    assert cfg["patch_size"] == [64, 192, 160]
    assert cfg["batch_size"] == 2
    assert cfg["num_pool_per_axis"] == [4, 5, 5]
    assert cfg["pool_op_kernel_sizes"] == [
        [1, 1, 1], [1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]
    ]
    assert cfg["conv_kernel_sizes"] == [
        [1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]
    ]
    assert cfg["unet_max_num_features"] == 320


def test_2d_matches_reference_plan():
    cfg = plan_configuration(
        BTCV_SPACING[1:], BTCV_MEDIAN_SHAPE_3D[1:], BTCV_DATASET_VOXELS,
        NUM_CLASSES,
    )
    assert cfg["patch_size"] == [512, 448]
    assert cfg["batch_size"] == 14
    assert cfg["num_pool_per_axis"] == [6, 6]
    assert len(cfg["pool_op_kernel_sizes"]) == 7
    assert cfg["unet_max_num_features"] == 512


def test_nextou_overlay_reproduces_reference_overrides():
    cfg = plan_configuration(
        BTCV_SPACING, BTCV_MEDIAN_SHAPE_3D, BTCV_DATASET_VOXELS, NUM_CLASSES
    )
    ov = nextou_overlay(cfg, "3d_fullres", BTCV_MEDIAN_SHAPE_3D)
    assert ov["inherits_from"] == "3d_fullres"
    assert ov["patch_size"] == [64, 224, 192]
    assert ov["UNet_base_num_features"] == 33
    assert ov["unet_max_num_features"] == 324


def test_nextou_feature_constraints():
    assert nextou_feature_constraints(3, 32, 320) == (33, 324)
    assert nextou_feature_constraints(2, 32, 512) == (32, 512)


def test_target_spacing_median_and_aniso():
    # isotropic-ish: plain median
    sp = np.array([[0.6, 0.3, 0.3]] * 10)
    sh = np.array([[180, 500, 480]] * 10)
    assert determine_fullres_target_spacing(sp, sh) == [0.6, 0.3, 0.3]
    # strongly anisotropic: worst axis snaps to its 10th percentile
    sp = np.array([[4.0 + 0.1 * i, 0.7, 0.7] for i in range(10)])
    sh = np.array([[40, 500, 480]] * 10)
    t = determine_fullres_target_spacing(sp, sh)
    assert t[0] == pytest.approx(np.percentile(sp[:, 0], 10))
    assert t[1:] == [0.7, 0.7]


def test_transpose_puts_coarsest_axis_first():
    fwd, bwd = determine_transpose([0.3, 1.5, 0.3])
    assert fwd == [1, 0, 2]
    assert [fwd[b] for b in bwd] == [0, 1, 2]


def test_feature_map_estimate_matches_reference_budget():
    """The estimator must put the published BTCV patch just under nnU-Net's
    560e6 budget (that is what pins patch_size to [64,192,160])."""
    pools = [[1, 1, 1], [1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]]
    feats = features_per_stage(6, 32, 320)
    est = compute_conv_feature_map_size(
        [64, 192, 160], feats, pools, [2] * 6, [2] * 5, num_classes=14
    )
    assert est <= 560_000_000
    est_bigger = compute_conv_feature_map_size(
        [64, 224, 160], feats, pools, [2] * 6, [2] * 5, num_classes=14
    )
    assert est_bigger > 560_000_000


def test_plan_experiment_full_schema():
    rng = np.random.default_rng(0)
    n = 12
    fp = {
        "spacings": [
            [0.6 + rng.uniform(-0.05, 0.05), 0.3, 0.3] for _ in range(n)
        ],
        "shapes_after_crop": [
            [int(180 + rng.integers(-20, 20)), 560, 470] for _ in range(n)
        ],
        "median_relative_size_after_cropping": 0.95,
        "foreground_intensity_properties_per_channel": {
            "0": {"max": 1.0, "mean": 0.5, "median": 0.5, "min": 0.0,
                  "percentile_00_5": 0.01, "percentile_99_5": 0.99,
                  "std": 0.2}
        },
    }
    dj = {
        "labels": {str(i): i for i in range(NUM_CLASSES)},
        "channel_names": {"0": "CT"},
    }
    plans = plan_experiment(fp, dj, dataset_name="DatasetTest")
    cfgs = plans["configurations"]
    # all reference config names present
    for name in ("2d", "3d_fullres", "3d_lowres", "3d_cascade_fullres",
                 "3d_fullres_nextou"):
        assert name in cfgs, name
    assert cfgs["3d_cascade_fullres"]["previous_stage"] == "3d_lowres"
    assert cfgs["3d_lowres"]["next_stage"] == "3d_cascade_fullres"
    assert cfgs["2d"]["normalization_schemes"] == ["CTNormalization"]
    assert plans["transpose_forward"] == [0, 1, 2]
    # lowres spacing is coarser and its patch covers >= 1/4 of median case
    lr = cfgs["3d_lowres"]
    assert all(
        a >= b for a, b in zip(lr["spacing"], cfgs["3d_fullres"]["spacing"])
    )
    cover = np.prod(lr["patch_size"]) / np.prod(
        lr["median_image_size_in_voxels"]
    )
    assert cover >= 0.25
    # the plans dict round-trips through our PlansManager
    from nextou_tpu.plans.loader import PlansManager

    pm = PlansManager(json.loads(json.dumps(plans)))
    cm = pm.get_configuration("3d_fullres_nextou")
    assert cm.UNet_base_num_features % 3 == 0
    assert cm.patch_size == cfgs["3d_fullres_nextou"].get(
        "patch_size", cfgs["3d_fullres"]["patch_size"]
    )


def test_pool_props_2d_single_axis_rule():
    # the 512/448 case: the lone remaining axis (size 8) must NOT pool again
    num_pool, pools, kernels, patch, div = get_pool_and_conv_props(
        [0.296875, 0.296875], [512, 448]
    )
    assert num_pool == [6, 6]
    assert patch == [512, 448]


def test_aniso_uses_max_of_other_spacings():
    """nnU-Net compares the worst axis against max(other_spacings): z twice
    as coarse as the coarser in-plane axis but < 3x it is NOT anisotropic,
    even when it is > 3x the finer one (min-based detection over-fired)."""
    sp = np.array([[3.0, 0.5, 1.1]] * 10)
    sh = np.array([[40, 500, 480]] * 10)
    assert determine_fullres_target_spacing(sp, sh) == [3.0, 0.5, 1.1]
    # truly anisotropic (median > 3x max(other)) with a 10th percentile
    # finer than the other axes: the clamp never lets the worst axis go
    # below max(other_spacings)
    z = [0.5, 0.6] + [4.0] * 8
    sp = np.array([[zi, 0.5, 1.1] for zi in z])
    t = determine_fullres_target_spacing(sp, sh)
    assert t[0] == pytest.approx(1.1 + 1e-5)


def test_lowres_spacing_loop_terminates_at_ratio_two(tmp_path):
    """Spacing ratio exactly 2 (e.g. 5.0 vs 2.5, a common CT protocol) used
    to make the lowres coarsening loop a no-op forever; nnU-Net's any/else
    structure coarsens all axes in that case."""
    from nextou_tpu.plans.planner import plan_experiment

    n = 12
    fp = {
        "spacings": [[5.0, 2.5, 2.5]] * n,
        "shapes_after_crop": [[96, 512, 512]] * n,
        "n_cases": n,
        "channel_names": {"0": "CT"},
        "normalization_schemes": ["ZScoreNormalization"],
        "use_mask_for_norm": [False],
        "foreground_intensity_properties_per_channel": {},
        "relative_size_after_cropping": [1.0] * n,
    }
    plans = plan_experiment(fp, {"labels": {"background": 0, "a": 1},
                                 "numTraining": n,
                                 "channel_names": {"0": "CT"}})
    assert "3d_lowres" in plans["configurations"]  # and we got here at all


def test_nextou_overlay_grows_both_2d_axes():
    """In 2D both axes are in-plane: the overlay may grow axis 0 too (the
    ax>0 guard is for the 3D z-axis only)."""
    from nextou_tpu.plans.planner import nextou_overlay

    cfg = {
        "patch_size": [512, 448],
        "pool_op_kernel_sizes": [[1, 1]] + [[2, 2]] * 6,
        "num_pool_per_axis": [6, 6],
        "UNet_base_num_features": 32,
        "unet_max_num_features": 512,
    }
    out = nextou_overlay(cfg, "2d", median_shape=[4000, 4000])
    assert out["patch_size"] == [512 + 64, 448 + 64]
