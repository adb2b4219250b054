"""End-to-end model construction + forward shape tests (tiny 2D config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextou_tpu.models import build_model_spec, NexToU
from nextou_tpu.utils import fast_init


def tiny_2d_spec(deep_supervision=True, num_classes=3):
    # 5-stage 2D net, 64x64 patch: stage 0 conv, stages 1-4 hybrid GNN.
    return build_model_spec(
        in_channels=1,
        patch_size=(64, 64),
        n_stages=5,
        features_per_stage=[8, 8, 16, 16, 16],
        kernel_sizes=[(3, 3)] * 5,
        strides=[(1, 1)] + [(2, 2)] * 4,
        n_conv_per_stage=[2] * 5,
        n_conv_per_stage_decoder=[2] * 4,
        num_classes=num_classes,
        deep_supervision=deep_supervision,
    )


@pytest.fixture(scope="module")
def model_and_vars():
    spec = tiny_2d_spec()
    model = NexToU(spec=spec)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = fast_init(model, jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_forward_shapes_deep_supervision(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 1)), jnp.float32)
    outs = model.apply(variables, x, train=False)
    assert isinstance(outs, list) and len(outs) == 4
    assert outs[0].shape == (1, 64, 64, 3)
    assert outs[1].shape == (1, 32, 32, 3)
    assert outs[2].shape == (1, 16, 16, 3)
    assert outs[3].shape == (1, 8, 8, 3)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_train_mode_runs_and_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    x = jnp.ones((2, 64, 64, 1), jnp.float32)
    outs, mutated = model.apply(
        variables,
        x,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(2), "graph": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert len(outs) == 4
    assert "batch_stats" in mutated
    # some running stat must have moved away from init
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_constants_collection_has_relative_pos(model_and_vars):
    _, variables = model_and_vars
    assert "constants" in variables
    leaves = jax.tree_util.tree_leaves(variables["constants"])
    assert len(leaves) > 0
    # bias tables must be 2D (n, n_reduced)
    assert all(l.ndim == 2 for l in leaves)


def test_deep_supervision_off_single_output():
    spec = tiny_2d_spec(deep_supervision=False)
    model = NexToU(spec=spec)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = fast_init(model, jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 3)


def test_ds_params_match_non_ds():
    # seg heads are always built -> identical param trees either way
    spec_ds = tiny_2d_spec(deep_supervision=True)
    spec_no = tiny_2d_spec(deep_supervision=False)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    v_ds = fast_init(NexToU(spec=spec_ds), jax.random.PRNGKey(0), x, train=False)
    v_no = fast_init(NexToU(spec=spec_no), jax.random.PRNGKey(0), x, train=False)
    p_ds = jax.tree_util.tree_structure(v_ds["params"])
    p_no = jax.tree_util.tree_structure(v_no["params"])
    assert p_ds == p_no
    # and numerically identical with same seed
    for a, b in zip(
        jax.tree_util.tree_leaves(v_ds["params"]),
        jax.tree_util.tree_leaves(v_no["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int_seed_init_matches_prngkey():
    # fast_init(model, 0, ...) is the host-only cold-start path (no device
    # key creation): must be tree- and value-identical to PRNGKey(0) init.
    spec = tiny_2d_spec(deep_supervision=False)
    model = NexToU(spec=spec)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    v_int = fast_init(model, 0, x, train=False)
    v_key = fast_init(model, jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v_int) == jax.tree_util.tree_structure(v_key)
    for a, b in zip(
        jax.tree_util.tree_leaves(v_int), jax.tree_util.tree_leaves(v_key)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
