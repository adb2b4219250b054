"""Learnability end-to-end: train briefly on easy synthetic data, run the
full sliding-window validation, check summary.json and a sane Dice."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nextou_tpu.data import make_synthetic_dataset
from nextou_tpu.train import get_trainer_class
from tests.test_train_integration import TINY_PLANS, DATASET_JSON


@pytest.mark.slow
def test_train_then_validate(tmp_path):
    folder = str(tmp_path / "synth")
    make_synthetic_dataset(folder, n_cases=6, shape=(64, 64), num_classes=3, seed=3)
    out = str(tmp_path / "run")
    cls = get_trainer_class("nnUNetTrainer_NexToU")
    trainer = cls(
        TINY_PLANS,
        "2d_tiny",
        fold=0,
        dataset_json=DATASET_JSON,
        preprocessed_folder=folder,
        output_folder=out,
        compute_dtype=jnp.float32,
        remat=False,
        num_epochs=10,
        num_iterations_per_epoch=20,
        num_val_iterations_per_epoch=2,
    )
    # single producer thread => deterministic batch order (multi-thread
    # order depends on OS scheduling and made this marginal-step-count
    # assertion flaky under box contention)
    trainer.loader_threads = 1
    trainer.run_training()
    summary = trainer.perform_actual_validation()
    path = os.path.join(out, "validation", "summary.json")
    assert os.path.exists(path)
    with open(path) as f:
        loaded = json.load(f)
    assert loaded["foreground_mean"]["Dice"] == summary["foreground_mean"]["Dice"]
    # easy blobs + 200 steps: should segment far better than chance
    assert summary["foreground_mean"]["Dice"] > 0.5, summary["mean"]
