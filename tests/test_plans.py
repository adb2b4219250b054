"""Plans loader tests against the reference nnUNetPlans.json."""

import json
import os

import pytest

from nextou_tpu.plans import PlansManager

REF_PLANS = "/root/reference/nnUNetPlans.json"


@pytest.fixture(scope="module")
def pm():
    if not os.path.exists(REF_PLANS):
        pytest.skip("reference plans not available")
    return PlansManager(REF_PLANS)


def test_inherits_from_merging(pm):
    cfg = pm.get_configuration("3d_fullres_nextou")
    # overridden keys
    assert cfg.patch_size == [64, 224, 192]
    assert cfg.UNet_base_num_features == 33
    assert cfg.unet_max_num_features == 324
    # inherited keys from 3d_fullres
    assert cfg.batch_size == 2
    assert cfg.batch_dice is True
    assert cfg.pool_op_kernel_sizes[1] == [1, 2, 2]
    assert cfg.num_stages == 6


def test_features_per_stage(pm):
    cfg = pm.get_configuration("3d_fullres_nextou")
    assert cfg.features_per_stage() == [33, 66, 132, 264, 324, 324]


def test_2d_config(pm):
    cfg = pm.get_configuration("2d")
    assert cfg.patch_size == [512, 448]
    assert cfg.num_stages == 7
    assert cfg.spatial_dims == 2


def test_label_manager():
    dataset_json = {
        "labels": {"background": 0, "vessel": 1, "artery": 2},
        "numTraining": 10,
    }
    lm = PlansManager(
        {"configurations": {}}
    ).get_label_manager(dataset_json)
    assert lm.num_segmentation_heads == 3
    assert lm.foreground_labels == [1, 2]
    assert lm.ignore_label is None


def test_circular_inheritance_raises():
    pm = PlansManager(
        {
            "configurations": {
                "a": {"inherits_from": "b"},
                "b": {"inherits_from": "a"},
            }
        }
    )
    with pytest.raises(ValueError, match="circular"):
        pm.get_configuration("a")


def test_regions_without_class_order_is_an_error():
    """Region-based labels without regions_class_order must fail fast
    (nnU-Net requires it; a foreground_labels fallback can mismatch the
    region-channel count)."""
    from nextou_tpu.plans.loader import LabelManager

    lm = LabelManager({"labels": {"background": 0, "whole": [1, 3]}})
    assert lm.has_regions
    with pytest.raises(ValueError, match="regions_class_order"):
        lm.regions_class_order
