"""Region-based training (list-valued labels + regions_class_order)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nextou_tpu.data import make_synthetic_dataset
from nextou_tpu.plans.loader import LabelManager
from nextou_tpu.train import get_trainer_class

from tests.test_train_integration import TINY_PLANS

REGION_DATASET_JSON = {
    # hierarchical regions over labels {0,1,2}: "whole" = {1,2}, "core" = {2}
    "labels": {"background": 0, "whole": [1, 2], "core": [2]},
    "regions_class_order": [1, 2],
    "numTraining": 6,
    "channel_names": {"0": "img"},
}


def test_label_manager_regions():
    lm = LabelManager(REGION_DATASET_JSON)
    assert lm.has_regions
    assert lm.foreground_regions == [(1, 2), (2,)]
    assert lm.regions_class_order == [1, 2]
    assert lm.num_segmentation_heads == 2
    assert lm.all_labels == [0, 1, 2]

    # conversion: paint regions in order, later regions overwrite
    probs = np.zeros((4, 4, 2), np.float32)
    probs[1:3, 1:3, 0] = 0.9  # whole
    probs[2, 2, 1] = 0.8  # core inside whole
    seg = lm.convert_probabilities_to_segmentation(probs)
    assert seg[1, 1] == 1 and seg[2, 2] == 2 and seg[0, 0] == 0


def test_label_manager_plain_labels_unchanged():
    lm = LabelManager({"labels": {"background": 0, "a": 1, "b": 2}})
    assert not lm.has_regions
    assert lm.num_segmentation_heads == 3
    probs = np.zeros((2, 2, 3), np.float32)
    probs[..., 2] = 1.0
    assert (lm.convert_probabilities_to_segmentation(probs) == 2).all()


def test_region_training_end_to_end(tmp_path):
    folder = str(tmp_path / "regiondata")
    make_synthetic_dataset(folder, n_cases=6, shape=(64, 64), num_classes=3)
    cls = get_trainer_class("nnUNetTrainer_NexToU")
    trainer = cls(
        TINY_PLANS,
        "2d_tiny",
        fold=0,
        dataset_json=REGION_DATASET_JSON,
        preprocessed_folder=folder,
        output_folder=str(tmp_path / "out"),
        compute_dtype=jnp.float32,
        remat=False,
        num_epochs=2,
        num_iterations_per_epoch=8,
        num_val_iterations_per_epoch=2,
    )
    trainer.initialize()
    # region mode: 2 sigmoid heads, not 3 softmax heads
    assert trainer.model_spec.num_classes == 2
    assert trainer.loss_spec.regions == ((1, 2), (2,))
    trainer.run_training()
    h = trainer.log_history
    assert h[-1]["train_loss"] < h[0]["train_loss"]
    assert np.isfinite(h[-1]["train_loss"])
    # validation converts region probabilities back to labels and scores
    # PER REGION (nnU-Net semantics): keys are the region tuples
    summary = trainer.perform_actual_validation()
    assert "(1, 2)" in summary["mean"] and "2" in summary["mean"]
    assert np.isfinite(summary["foreground_mean"]["Dice"])
