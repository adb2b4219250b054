"""End-to-end integration: synthetic dataset -> few-step training -> loss
decreases; checkpoint round-trip; trainer registry surface."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nextou_tpu.data import make_synthetic_dataset
from nextou_tpu.train import get_trainer_class, TRAINER_REGISTRY


TINY_PLANS = {
    "dataset_name": "Dataset999_Synth",
    "plans_name": "nnUNetPlans",
    "configurations": {
        "2d_tiny": {
            # 5 stages: a 4-stage net would put the first reduce_ratio=16
            # PoolGNN at stage 0 where the candidate set collapses (the
            # reference has the same constraint: its configs have >= 5 stages)
            "batch_size": 2,
            "patch_size": [64, 64],
            "spacing": [1.0, 1.0],
            "normalization_schemes": ["ZScoreNormalization"],
            "use_mask_for_norm": [False],
            "UNet_class_name": "PlainConvUNet",
            "UNet_base_num_features": 8,
            "unet_max_num_features": 16,
            "n_conv_per_stage_encoder": [2, 2, 2, 2, 2],
            "n_conv_per_stage_decoder": [2, 2, 2, 2],
            "pool_op_kernel_sizes": [[1, 1], [2, 2], [2, 2], [2, 2], [2, 2]],
            "conv_kernel_sizes": [[3, 3]] * 5,
            "batch_dice": True,
        }
    },
}

DATASET_JSON = {
    "labels": {"background": 0, "a": 1, "b": 2},
    "numTraining": 6,
    "channel_names": {"0": "img"},
}


@pytest.fixture(scope="module")
def synth_folder(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("synth"))
    make_synthetic_dataset(folder, n_cases=6, shape=(64, 64), num_classes=3)
    return folder


def _make_trainer(name, folder, out, **kw):
    cls = get_trainer_class(name)
    kwargs = dict(
        compute_dtype=jnp.float32,
        remat=False,
        num_epochs=2,
        num_iterations_per_epoch=8,
        num_val_iterations_per_epoch=2,
    )
    kwargs.update(kw)
    return cls(
        TINY_PLANS,
        "2d_tiny",
        fold=0,
        dataset_json=DATASET_JSON,
        preprocessed_folder=folder,
        output_folder=out,
        **kwargs,
    )


def test_registry_has_all_reference_names():
    for name in [
        "nnUNetTrainer_NexToU",
        "nnUNetTrainer_NexToU_NoMirroring",
        "nnUNetTrainer_NexToU_TI",
        "nnUNetTrainer_NexToU_TI_NoMirroring",
        "nnUNetTrainer_NexToU_BTI_Synapse",
        "nnUNetTrainer_NexToU_BTI_RAVIR",
        "nnUNetTrainer_NexToU_BTI_ICA_NoMirroring",
    ]:
        assert name in TRAINER_REGISTRY


def test_training_loss_decreases(synth_folder, tmp_path):
    trainer = _make_trainer(
        "nnUNetTrainer_NexToU_BTI_RAVIR", synth_folder, str(tmp_path / "out"),
        num_epochs=5,  # keep the PolyLR positive for all 30 steps below
    )
    trainer.initialize()
    # BTI trainer in 2D -> lambda 1e-4, connectivity 8
    assert trainer.loss_spec.weight_ti == 1e-4
    assert trainer.loss_spec.ti.connectivity == 8
    assert trainer.loss_spec.ti.interactions == ((False, (1,), (2,)),)

    train_loader, _ = trainer.get_dataloaders()
    with train_loader:
        it = iter(train_loader)
        losses = []
        for _ in range(30):
            batch = next(it)
            trainer.state, m = trainer.train_step(trainer.state, batch)
            losses.append(float(m["loss"]))
    # robust decrease check: last-5 mean well below first-5 mean
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.1, losses


def test_run_training_and_checkpoints(synth_folder, tmp_path):
    out = str(tmp_path / "out2")
    trainer = _make_trainer("nnUNetTrainer_NexToU", synth_folder, out,
                            num_epochs=1, num_iterations_per_epoch=3,
                            num_val_iterations_per_epoch=1)
    trainer.checkpoint_every = 1
    trainer.run_training()
    assert os.path.exists(os.path.join(out, "checkpoint_final.ckpt"))
    assert os.path.exists(os.path.join(out, "checkpoint_latest.ckpt"))
    assert os.path.exists(os.path.join(out, "checkpoint_best.ckpt"))
    assert len(trainer.log_history) == 1

    # round-trip
    t2 = _make_trainer("nnUNetTrainer_NexToU", synth_folder, out,
                       num_epochs=1, num_iterations_per_epoch=3,
                       num_val_iterations_per_epoch=1)
    extra = t2.load_checkpoint(os.path.join(out, "checkpoint_final.ckpt"))
    assert extra["trainer"] == "nnUNetTrainer_NexToU"
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_no_mirroring_trainer_config(synth_folder, tmp_path):
    trainer = _make_trainer(
        "nnUNetTrainer_NexToU_NoMirroring", synth_folder, str(tmp_path / "o3")
    )
    assert trainer.configure_mirroring() == ()
    assert trainer.inference_allowed_mirroring_axes is None
    base = _make_trainer("nnUNetTrainer_NexToU", synth_folder, str(tmp_path / "o4"))
    assert base.configure_mirroring() == (0, 1)
    assert base.inference_allowed_mirroring_axes == (0, 1)


def test_ti_trainer_all_pairs(synth_folder, tmp_path):
    trainer = _make_trainer(
        "nnUNetTrainer_NexToU_TI", synth_folder, str(tmp_path / "o5")
    )
    spec = trainer._loss_spec()
    # labels {0,1,2} -> fg pairs: (1,2)
    assert spec.ti.interactions == ((False, (1,), (2,)),)
    assert spec.weight_ti == 1e-4  # 2D


def test_vanilla_trainer_residual_encoder_unet(synth_folder, tmp_path):
    """plans naming ResidualEncoderUNet -> the vanilla trainer builds the
    residual-encoder spec (reference mapping nnUNetTrainer_NexToU.py:34
    minus the forced-NexToU line) and one train step runs."""
    import copy

    plans = copy.deepcopy(TINY_PLANS)
    cfg = plans["configurations"]["2d_tiny"]
    cfg["UNet_class_name"] = "ResidualEncoderUNet"
    cls = get_trainer_class("nnUNetTrainer")
    tr = cls(
        plans, "2d_tiny", fold=0,
        dataset_json=DATASET_JSON, preprocessed_folder=synth_folder,
        output_folder=str(tmp_path / "res_out"),
        compute_dtype=jnp.float32, remat=False,
        num_epochs=1, num_iterations_per_epoch=2,
        num_val_iterations_per_epoch=1,
    )
    spec = tr.build_network_spec()
    assert spec.stem_features == 8
    assert all(st.residual for st in spec.encoder)
    assert not any(getattr(st, "residual", False) for st in spec.decoder)
    tr.run_training()
    assert len(tr.log_history) == 1
    assert np.isfinite(tr.log_history[-1]["train_loss"])


def test_npz_validation_probs_and_find_best_ensembling(synth_folder, tmp_path):
    """--npz saves validation softmaxes; find_best(-ds) ranks the 2-way
    ensemble of two runs against the preprocessed GT (the substrate's
    find_best_configuration ensembling step)."""
    from nextou_tpu.find_best_configuration import find_best

    outs = {}
    for name, seed_epochs in (("runA", 1), ("runB", 1)):
        out = str(tmp_path / name)
        tr = _make_trainer(
            "nnUNetTrainer_NexToU", synth_folder, out,
            num_epochs=seed_epochs, num_iterations_per_epoch=2,
            num_val_iterations_per_epoch=1,
        )
        tr.run_training()
        tr.perform_actual_validation(save_probabilities=True)
        outs[name] = out

    # every validation case got a float16 (*sp, C) npz next to summary.json
    val = os.path.join(outs["runA"], "validation")
    npzs = [f for f in os.listdir(val) if f.endswith(".npz")]
    assert npzs
    z = np.load(os.path.join(val, npzs[0]))["probabilities"]
    assert z.dtype == np.float16 and z.shape == (64, 64, 3)
    np.testing.assert_allclose(z.astype(np.float32).sum(-1), 1.0, atol=1e-2)

    info = find_best(
        {n: f for n, f in outs.items()}, dataset_folder=synth_folder
    )
    names = [r["name"] for r in info["ranking"]]
    assert "ensemble runA + runB" in names
    ens = next(r for r in info["ranking"] if r["name"].startswith("ensemble"))
    assert np.isfinite(ens["fg_mean_dice"])
    if info["best_configuration"].startswith("ensemble"):
        assert "nextou_tpu.ensemble" in info["inference_instructions"]


def test_pretrained_weights_restore(synth_folder, tmp_path):
    """-pretrained_weights: params copy from the donor checkpoint where
    shapes match; optimizer state stays fresh; a different label count
    keeps its fresh seg heads (shape-skipped, like the substrate's
    load_pretrained_weights)."""
    from nextou_tpu.train.checkpoint import restore_pretrained

    donor_out = str(tmp_path / "donor")
    donor = _make_trainer(
        "nnUNetTrainer_NexToU", synth_folder, donor_out,
        num_epochs=1, num_iterations_per_epoch=2,
        num_val_iterations_per_epoch=1,
    )
    donor.run_training()
    ckpt = os.path.join(donor_out, "checkpoint_final.ckpt")
    assert os.path.exists(ckpt)

    fresh = _make_trainer(
        "nnUNetTrainer_NexToU", synth_folder, str(tmp_path / "fresh"),
        seed=123,
    )
    fresh.initialize()
    opt_before = jax.tree_util.tree_leaves(fresh.state.opt_state)
    new_state, report = restore_pretrained(fresh.state, ckpt)
    assert report["loaded"] and not report["skipped_shape"]
    donor_leaves = jax.tree_util.tree_leaves(
        jax.device_get(donor.state.params)
    )
    for a, b in zip(donor_leaves, jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(opt_before, jax.tree_util.tree_leaves(new_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # donor with a different label count: seg heads are shape-skipped
    import copy

    dj4 = copy.deepcopy(DATASET_JSON)
    dj4["labels"]["c"] = 3
    other = get_trainer_class("nnUNetTrainer_NexToU")(
        TINY_PLANS, "2d_tiny", fold=0, dataset_json=dj4,
        preprocessed_folder=synth_folder,
        output_folder=str(tmp_path / "other"),
        compute_dtype=jnp.float32, remat=False,
        num_epochs=1, num_iterations_per_epoch=2,
        num_val_iterations_per_epoch=1,
    )
    other.initialize()
    _, report4 = restore_pretrained(other.state, ckpt)
    assert report4["loaded"]
    assert all("seg_head" in n or "head" in n for n in report4["skipped_shape"])
    assert report4["skipped_shape"], "expected mismatched seg heads"


def test_2d_config_validates_3d_volumes(tmp_path):
    """A 2d configuration trained on volumetric data must predict full
    volumes slice-by-slice at validation (nnU-Net's 2d-on-3d inference) —
    build_predictor used to crash on the rank mismatch."""
    folder = str(tmp_path / "synth3d")
    make_synthetic_dataset(
        folder, n_cases=4, shape=(6, 48, 48), num_classes=3, seed=5
    )
    out = str(tmp_path / "run")
    cls = get_trainer_class("nnUNetTrainer_NexToU")
    trainer = cls(
        TINY_PLANS, "2d_tiny", fold=0,
        dataset_json={**DATASET_JSON, "numTraining": 4},
        preprocessed_folder=folder, output_folder=out,
        compute_dtype=jnp.float32, remat=False,
        num_epochs=1, num_iterations_per_epoch=2,
        num_val_iterations_per_epoch=1,
    )
    trainer.loader_threads = 1
    trainer.run_training()
    summary = trainer.perform_actual_validation(save_probabilities=True)
    assert summary["metric_per_case"]
    # the saved probabilities must be volumetric: (Z, H, W, C)
    import glob
    npzs = glob.glob(os.path.join(out, "validation", "*.npz"))
    assert npzs
    with np.load(npzs[0]) as z:
        assert z["probabilities"].shape == (6, 48, 48, 3)


def test_sampler_uniform_center_reaches_last_position():
    """Uniform center sampling must include the LAST valid patch position
    (rng.integers' exclusive bound used to drop it, so the trailing plane
    was never seen outside fg-forced patches)."""
    from nextou_tpu.data.dataset import Case
    from nextou_tpu.data.sampler import PatchSampler

    case = Case(
        data=np.zeros((1, 65, 64), np.float32),
        seg=np.zeros((65, 64), np.int16),
        class_locations={},
        properties={},
    )

    class _DS:
        case_ids = ["c"]

        def load(self, cid):
            return case

    s = PatchSampler(_DS(), (64, 64), batch_size=1,
                     oversample_foreground_percent=0.0, seed=0)
    centers = {
        int(s._sample_center(case, force_fg=False)[0]) for _ in range(200)
    }
    assert centers == {32, 33}  # both valid starts (0 and 1) drawn


def test_loader_surfaces_producer_errors():
    """A producer-thread exception must surface as RuntimeError from
    __next__, not hang training forever on an empty queue."""
    from nextou_tpu.data.loader import PatchDataLoader

    class _BoomSampler:
        def sample_batch(self, rng=None):
            raise ValueError("corrupt case")

    loader = PatchDataLoader(_BoomSampler(), augment=None, num_threads=2)
    with loader:
        with pytest.raises(RuntimeError, match="producer thread failed"):
            next(iter(loader))


def test_gaussian_noise_std_matches_batchgenerators():
    """The value drawn from noise_variance is np.random.normal's *scale*
    (std) in batchgenerators, despite the name — both DA paths must apply
    it un-sqrt'd."""
    from nextou_tpu.data.augment import AugmentConfig, _intensity

    cfg = AugmentConfig(
        p_noise=1.0, noise_variance=(0.1, 0.1), p_blur=0.0,
        p_brightness=0.0, p_contrast=0.0, p_lowres=0.0,
        p_gamma_invert=0.0, p_gamma=0.0,
    )
    rng = np.random.default_rng(0)
    data = np.zeros((1, 64, 64), np.float32)
    noised = _intensity(data.copy(), cfg, rng)
    assert abs(float(noised.std()) - 0.1) < 0.02  # std=0.1, not sqrt(0.1)


def test_pseudo_dice_absent_class_is_nan():
    """0/0 (class absent from prediction AND GT) must be NaN like nnU-Net,
    so nanmean skips it instead of a spurious 0 deflating the EMA."""
    from nextou_tpu.train.train_step import pseudo_dice

    d = np.asarray(pseudo_dice(
        jnp.asarray([0, 5]), jnp.asarray([0, 1]), jnp.asarray([0, 2])
    ))
    assert np.isnan(d[0]) and abs(d[1] - 10 / 13) < 1e-6


def test_loader_error_surfaces_even_with_surviving_thread():
    """One dead producer must surface promptly even while a second healthy
    thread keeps the prefetch queue full (the error check runs before each
    batch, not only on queue-empty)."""
    import threading

    from nextou_tpu.data.loader import PatchDataLoader

    crashed = threading.Event()

    class _HalfBoom:
        def __init__(self):
            self._lock = threading.Lock()
            self._first = True

        def sample_batch(self, rng=None):
            with self._lock:
                first, self._first = self._first, False
            if first:
                crashed.set()
                raise ValueError("corrupt case")
            data = np.zeros((1, 1, 4, 4), np.float32)
            return data, np.zeros((1, 4, 4), np.int16), None

    loader = PatchDataLoader(_HalfBoom(), augment=None, num_threads=2,
                             prefetch=2)
    import pytest as _pytest
    with loader:
        it = iter(loader)
        with pytest.raises(RuntimeError, match="producer thread failed"):
            crashed.wait(5.0)
            import time as _time
            _time.sleep(0.2)  # let the dying thread record its exception
            for _ in range(100):
                next(it)
