"""Trainer-level data parallelism: run_training on the 8-device virtual CPU
mesh (conftest) shards the batch over 'data' automatically and matches the
single-device loss trajectory in expectation (same seed, sharded execution
is numerically equivalent per tests/test_sharding.py; here we check the
Trainer wiring: mesh creation, state replication, batch sharding, device-DA
gating, checkpointing of the replicated state)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_train_integration import (
    DATASET_JSON,
    TINY_PLANS,
    _make_trainer,
    synth_folder,  # noqa: F401 (fixture)
)


def test_trainer_shards_over_mesh(synth_folder, tmp_path):  # noqa: F811
    assert jax.device_count() == 8
    tr = _make_trainer(
        "nnUNetTrainer_NexToU", synth_folder, str(tmp_path / "out"),
        batch_size=4, num_epochs=1, num_iterations_per_epoch=3,
        num_val_iterations_per_epoch=1,
    )
    tr.initialize()
    assert tr.mesh is not None
    assert tr.mesh.shape["data"] == 4  # gcd(batch 4, 8 devices)
    # params replicated over the mesh
    leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert len(leaf.sharding.device_set) == 4
    tr.run_training()
    assert np.isfinite(tr.log_history[-1]["train_loss"])
    # checkpoint of the replicated state round-trips
    tr2 = _make_trainer(
        "nnUNetTrainer_NexToU", synth_folder, str(tmp_path / "out"),
        batch_size=4, num_epochs=1, num_iterations_per_epoch=3,
        num_val_iterations_per_epoch=1,
    )
    tr2.load_checkpoint(str(tmp_path / "out" / "checkpoint_final.ckpt"))
    a = jax.device_get(jax.tree_util.tree_leaves(tr.state.params)[0])
    b = jax.device_get(jax.tree_util.tree_leaves(tr2.state.params)[0])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_indivisible_batch_falls_back_single_device(synth_folder, tmp_path):  # noqa: F811
    tr = _make_trainer(
        "nnUNetTrainer_NexToU", synth_folder, str(tmp_path / "o2"),
        batch_size=3, num_epochs=1, num_iterations_per_epoch=1,
    )
    tr.initialize()
    assert tr.mesh is None  # gcd(3, 8) == 1


def test_build_predictor_mesh_matches_single(synth_folder, tmp_path):  # noqa: F811
    """predict --all-devices path: build_predictor(mesh=...) replicates the
    variables via device_put_variables(NamedSharding) and shards the tile
    batch; output must match the single-device predictor."""
    from nextou_tpu.parallel import make_mesh
    from nextou_tpu.predict import build_predictor

    tr = _make_trainer(
        "nnUNetTrainer_NexToU", synth_folder, str(tmp_path / "p_out"),
        num_epochs=1, num_iterations_per_epoch=2,
        num_val_iterations_per_epoch=1,
    )
    tr.run_training()
    vol = np.random.default_rng(0).standard_normal((80, 72, 1)).astype(np.float32)
    single = build_predictor(tr, tile_batch=2)(vol)
    sharded = build_predictor(tr, tile_batch=2, mesh=make_mesh())(vol)
    np.testing.assert_allclose(sharded, single, atol=2e-5)
