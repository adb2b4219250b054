"""Cascade (3d_cascade_fullres-style) training and data plumbing.

The reference's plans include the cascade configuration
(``nnUNetPlans.json:436-439``); the substrate trains a lowres stage, predicts
the training set, and feeds one-hot previous-stage channels to the fullres
stage. These tests exercise the rebuilt chain on a tiny 2D dataset.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from nextou_tpu.data import make_synthetic_dataset, PreprocessedDataset
from nextou_tpu.data.loader import PatchDataLoader
from nextou_tpu.data.sampler import PatchSampler
from nextou_tpu.train import get_trainer_class

from tests.test_train_integration import TINY_PLANS, DATASET_JSON


@pytest.fixture(scope="module")
def cascade_folder(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("cascade"))
    make_synthetic_dataset(folder, n_cases=6, shape=(64, 64), num_classes=3)
    # fake previous-stage predictions: the GT with one label dropped
    prev_dir = os.path.join(folder, "predicted_next_stage", "2d_tiny")
    os.makedirs(prev_dir)
    ds = PreprocessedDataset(folder)
    for cid in ds.case_ids:
        seg = ds.load(cid).seg
        np.savez_compressed(
            os.path.join(prev_dir, f"{cid}.npz"),
            seg=np.where(seg == 2, 0, seg).astype(np.int16),
        )
    return folder


def _cascade_plans():
    plans = json.loads(json.dumps(TINY_PLANS))
    plans["configurations"]["2d_cascade"] = {
        "inherits_from": "2d_tiny",
        "previous_stage": "2d_tiny",
    }
    return plans


def test_loader_appends_onehot_prev_channels(cascade_folder):
    ds = PreprocessedDataset(
        cascade_folder,
        prev_stage_folder=os.path.join(
            cascade_folder, "predicted_next_stage", "2d_tiny"
        ),
    )
    sampler = PatchSampler(ds, (32, 32), batch_size=2, seed=0)
    loader = PatchDataLoader(
        sampler, augment=None, onehot_labels=(1, 2), cascade_noise=False
    )
    batch = next(iter(loader))
    loader.stop()
    # 1 image channel + 2 one-hot channels
    assert batch["data"].shape == (2, 32, 32, 3)
    hot = batch["data"][..., 1:]
    assert set(np.unique(hot)) <= {0.0, 1.0}
    # label 2 was erased from the fake prev predictions
    assert hot[..., 1].sum() == 0
    assert hot[..., 0].sum() > 0


def test_cascade_trainer_end_to_end(cascade_folder, tmp_path):
    cls = get_trainer_class("nnUNetTrainer_NexToU")
    trainer = cls(
        _cascade_plans(),
        "2d_cascade",
        fold=0,
        dataset_json=DATASET_JSON,
        preprocessed_folder=cascade_folder,
        output_folder=str(tmp_path / "out"),
        compute_dtype=jnp.float32,
        remat=False,
        num_epochs=1,
        num_iterations_per_epoch=4,
        num_val_iterations_per_epoch=1,
    )
    assert trainer._num_input_channels() == 1 + 2  # image + one-hot fg
    trainer.run_training()
    assert trainer.log_history, "no epochs logged"
    assert np.isfinite(trainer.log_history[-1]["train_loss"])


def test_cascade_trainer_missing_prev_predictions(tmp_path):
    folder = str(tmp_path / "nopred")
    make_synthetic_dataset(folder, n_cases=2, shape=(64, 64), num_classes=3)
    cls = get_trainer_class("nnUNetTrainer_NexToU")
    trainer = cls(
        _cascade_plans(), "2d_cascade", 0, DATASET_JSON,
        preprocessed_folder=folder, output_folder=str(tmp_path / "out2"),
        compute_dtype=jnp.float32, remat=False,
        num_epochs=1, num_iterations_per_epoch=1,
    )
    with pytest.raises(FileNotFoundError, match="predict_next_stage"):
        trainer.run_training()
