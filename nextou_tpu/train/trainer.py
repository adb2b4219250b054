"""The base trainer: nnU-Net's training protocol, TPU-native.

Public surface mirrors what the reference relies on (SURVEY.md §3.1):
``Trainer(plans, configuration, fold, dataset_json, ...)``, 1000 epochs x 250
iterations, SGD(momentum .99, nesterov) with PolyLR from 1e-2, grad-clip 12,
deep supervision with 1/2^i weights (last zeroed), 33% foreground
oversampling, EMA(0.9) pseudo-Dice model selection, checkpoint_latest every
50 epochs + checkpoint_best + checkpoint_final.

Architecture is forced to NexToU regardless of the plans' UNet_class_name,
exactly like the reference trainer (``nnUNetTrainer_NexToU.py:31``).
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nextou_tpu.data import (
    AugmentConfig,
    PatchDataLoader,
    PatchSampler,
    PreprocessedDataset,
    make_splits,
)
from nextou_tpu.losses import CompoundLossSpec, deep_supervision_weights
from nextou_tpu.models import NexToU, build_model_spec
from nextou_tpu.plans import PlansManager
from nextou_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from nextou_tpu.train.optimizer import make_optimizer, poly_lr
from nextou_tpu.train.registry import register_trainer
from nextou_tpu.train.state import create_train_state
from nextou_tpu.train.train_step import make_eval_step, make_train_step, pseudo_dice


@register_trainer
class NexToUTrainer:
    """Base trainer (registry name alias: ``nnUNetTrainer_NexToU``)."""

    num_epochs: int = 1000
    num_iterations_per_epoch: int = 250
    num_val_iterations_per_epoch: int = 50
    initial_lr: float = 1e-2
    weight_decay: float = 3e-5
    grad_clip_norm: float = 12.0
    oversample_foreground_percent: float = 0.333
    ema_decay: float = 0.9
    checkpoint_every: int = 50

    def __init__(
        self,
        plans: dict | str,
        configuration: str,
        fold: int,
        dataset_json: dict,
        preprocessed_folder: str | None = None,
        output_folder: str = "./nextou_output",
        *,
        compute_dtype: Any = jnp.bfloat16,
        remat: bool | str = "auto",
        device_da: bool | str = "auto",
        seed: int = 12345,
        num_epochs: int | None = None,
        num_iterations_per_epoch: int | None = None,
        num_val_iterations_per_epoch: int | None = None,
        batch_size: int | None = None,
    ):
        self.plans_manager = PlansManager(plans)
        self.configuration_name = configuration
        self.configuration_manager = self.plans_manager.get_configuration(configuration)
        self.fold = fold
        self.dataset_json = dataset_json
        self.label_manager = self.plans_manager.get_label_manager(dataset_json)
        self.preprocessed_folder = preprocessed_folder
        self.output_folder = output_folder
        self.compute_dtype = compute_dtype
        self.remat = remat
        # on-device DA (data/device_augment.py): the host feeds raw patches
        # and augmentation runs inside the compiled train step. "auto" = on
        # for TPU backends (TPU VMs are host-core-starved), off on CPU, and
        # off for cascade configurations (their one-hot corruption noise
        # needs host-side connected components).
        self.device_da = device_da
        self.seed = seed
        # producer threads for the host loader (nnUNet_n_proc_DA's role).
        # 1 = fully deterministic batch order (per-thread RNG streams make
        # multi-thread order depend on scheduling)
        self.loader_threads = int(os.environ.get("NEXTOU_LOADER_THREADS", "2"))
        if num_epochs is not None:
            self.num_epochs = num_epochs
        if num_iterations_per_epoch is not None:
            self.num_iterations_per_epoch = num_iterations_per_epoch
        if num_val_iterations_per_epoch is not None:
            self.num_val_iterations_per_epoch = num_val_iterations_per_epoch
        self.batch_size = batch_size or self.configuration_manager.batch_size

        self.enable_deep_supervision = True
        # TTA config; NoMirroring trainers set this to None
        dim = self.configuration_manager.spatial_dims
        self.inference_allowed_mirroring_axes: tuple[int, ...] | None = tuple(
            range(dim)
        )

        self.current_epoch = 0
        self._best_ema: float | None = None
        self.ema_pseudo_dice: float | None = None
        self.log_history: list[dict] = []
        self._initialized = False

    # ------------------------------------------------------------------ #
    # configuration hooks (overridden by the registry trainer subclasses)
    # ------------------------------------------------------------------ #

    def configure_mirroring(self) -> tuple[int, ...]:
        """Train-time mirror axes (all axes by default, nnU-Net style)."""
        return tuple(range(self.configuration_manager.spatial_dims))

    def configure_rotation_dummyDA_mirroring_and_initial_patch_size(self):
        """nnU-Net's DA-configuration hook (the reference's NoMirroring
        trainers override it, ``nnUNetTrainer_NexToU_NoMirroring.py:5``):
        rotation ranges depend on the patch aspect ratio, and strongly
        anisotropic 3D patches get in-plane-only ('dummy 2D') spatial DA.

        Returns (rotation_rad per axis, do_dummy_2d, mirror_axes).
        """
        patch = self.configuration_manager.patch_size
        dim = len(patch)
        if dim == 2:
            do_dummy = False
            if max(patch) / min(patch) > 1.5:
                rot = (np.pi / 12.0,)  # ±15° for elongated patches
            else:
                rot = (np.pi,)  # ±180°
        else:
            do_dummy = max(patch) / patch[0] > 3  # ANISO_THRESHOLD
            if do_dummy:
                rot = (np.pi,) * 3  # in-plane only (dummy_2d), ±180°
            else:
                rot = (np.pi / 6.0,) * 3  # ±30°
        return rot, do_dummy, self.configure_mirroring()

    def _resolve_device_da(self):
        cascade = self.configuration_manager.previous_stage_name is not None
        if self.device_da == "auto":
            self.device_da = jax.default_backend() == "tpu" and not cascade
        if self.device_da and cascade:
            self.print_to_log_file(
                "device_da disabled: cascade one-hot noise needs host-side "
                "connected components"
            )
            self.device_da = False

    def _augment_config(self) -> AugmentConfig:
        rot, do_dummy, mirror = (
            self.configure_rotation_dummyDA_mirroring_and_initial_patch_size()
        )
        return AugmentConfig(
            rotation_rad=tuple(rot), dummy_2d=do_dummy, mirror_axes=mirror,
            final_patch_size=tuple(self.configuration_manager.patch_size),
        )

    def _loss_spec(self) -> CompoundLossSpec:
        """DC + CE (base nnUNetTrainer loss); TI/BTI trainers override.
        Region-based datasets switch to sigmoid region-Dice + BCE."""
        regions = (
            tuple(self.label_manager.foreground_regions)
            if self.label_manager.has_regions
            else None
        )
        return CompoundLossSpec(
            weight_ce=1.0,
            weight_dice=1.0,
            weight_ti=0.0,
            batch_dice=self.configuration_manager.batch_dice,
            smooth=1e-5,
            do_bg=False,
            ignore_label=self.label_manager.ignore_label,
            regions=regions,
        )

    def build_network_spec(self):
        cm = self.configuration_manager
        return build_model_spec(
            in_channels=self._num_input_channels(),
            patch_size=cm.patch_size,
            n_stages=cm.num_stages,
            features_per_stage=cm.features_per_stage(),
            kernel_sizes=cm.conv_kernel_sizes,
            strides=cm.pool_op_kernel_sizes,
            n_conv_per_stage=cm.n_conv_per_stage_encoder,
            n_conv_per_stage_decoder=cm.n_conv_per_stage_decoder,
            num_classes=self.label_manager.num_segmentation_heads,
            deep_supervision=self.enable_deep_supervision,
        )

    def _num_input_channels(self) -> int:
        ch = self.dataset_json.get("channel_names") or self.dataset_json.get(
            "modality", {"0": "X"}
        )
        n = max(1, len(ch))
        # cascade: previous-stage prediction enters as one-hot foreground
        # channels (nnU-Net's determine_num_input_channels)
        if self.configuration_manager.previous_stage_name is not None:
            n += len(self.label_manager.foreground_labels)
        return n

    def _prev_stage_folder(self) -> str | None:
        prev = self.configuration_manager.previous_stage_name
        if prev is None:
            return None
        folder = os.path.join(
            self.preprocessed_folder, "predicted_next_stage", prev
        )
        if not os.path.isdir(folder):
            raise FileNotFoundError(
                f"cascade configuration '{self.configuration_name}' needs "
                f"previous-stage predictions at {folder} — run "
                f"`python -m nextou_tpu.predict_next_stage` on the "
                f"'{prev}' model first"
            )
        return folder

    # ------------------------------------------------------------------ #
    # initialization
    # ------------------------------------------------------------------ #

    def initialize(self):
        if self._initialized:
            return self
        self.model_spec = self.build_network_spec()
        if self.remat == "auto":
            # full remat costs ~1.4x step time; selective 'big' remat (only
            # the high-resolution stages, which hold most activation bytes)
            # costs a fraction of that. Pick by the activation-footprint
            # estimate (feature-map elements x batch x bf16 with backward
            # headroom) against one chip's HBM.
            net_probe = NexToU(spec=self.model_spec)
            est = (
                net_probe.compute_conv_feature_map_size()
                * self.batch_size * 2 * 6
            )
            # measured on v5e-16GB at flagship scale (round-4 sweep, bf16
            # norm/logit footprint): est 18.4 GiB (B=2) fits 'big' at
            # 575 ms/patch and OOMs remat=False; est 27.6 GiB (B=3) OOMs
            # 'big'; under 12 GiB store everything
            if est <= 12 * 1024**3:
                self.remat = False
            elif est <= 20 * 1024**3:
                self.remat = "big"
            else:
                self.remat = True
            self.print_to_log_file(
                f"auto remat: {self.remat!r} "
                f"(activation estimate {est / 1024**3:.1f} GiB)"
            )
        self.network = NexToU(
            spec=self.model_spec,
            dtype=self.compute_dtype,
            remat=self.remat,
            # channel-major logits for training: the small class dim on the
            # TPU lane axis would pad the full-res f32 logits up to 9x in
            # HBM; inference models keep channels-last (built separately in
            # predict.build_predictor)
            channel_major_logits=True,
        )
        self.loss_spec = self._loss_spec()
        n_ds = len(self.model_spec.decoder)
        self.ds_weights = (
            deep_supervision_weights(n_ds) if self.enable_deep_supervision else None
        )
        schedule = poly_lr(
            self.initial_lr,
            self.num_epochs,
            0.9,
            steps_per_epoch=self.num_iterations_per_epoch,
        )
        self.optimizer = make_optimizer(
            schedule,
            weight_decay=self.weight_decay,
            clip_norm=self.grad_clip_norm,
        )
        example = jnp.zeros(
            (1, *self.model_spec.patch_size, self.model_spec.in_channels),
            jnp.float32,
        )
        # int seed -> fully host-side init (utils/init.py): zero device
        # touches before the first step (the tunneled TPU's first D2H fetch
        # can stall minutes). NOTE the int-seed path is its own
        # deterministic stream, NOT bit-identical to create_train_state's
        # PRNGKey path (which splits the key before init) — reproducing a
        # run requires the same seed *form*, and both are deterministic.
        self.state = create_train_state(
            self.network, self.optimizer, example, self.seed
        )
        # data-parallel mesh over all devices whose count divides the batch
        # (the reference's DDP, SURVEY.md §2.4): params replicated, batch
        # sharded on 'data'; XLA inserts the gradient/batch-Dice psums.
        self.mesh = None
        n_dev = jax.device_count()
        if n_dev > 1:
            n_data = math.gcd(self.batch_size, n_dev)
            if n_data > 1:
                from nextou_tpu.parallel import make_mesh, replicate

                self.mesh = make_mesh(n_data=n_data)
                self.state = replicate(self.mesh, self.state)
                self.print_to_log_file(
                    f"data-parallel: batch {self.batch_size} sharded over "
                    f"{n_data} of {n_dev} devices"
                )
            else:
                self.print_to_log_file(
                    f"single-device training (batch {self.batch_size} not "
                    f"divisible across {n_dev} devices)"
                )
        self._resolve_device_da()
        self.train_step = make_train_step(
            self.network,
            self.optimizer,
            self.loss_spec,
            self.ds_weights,
            augment=self._augment_config() if self.device_da else None,
            augment_gating="where" if self.mesh is not None else "cond",
        )
        self.eval_step = make_eval_step(self.network, self.loss_spec, self.ds_weights)
        # persist plans + dataset.json next to the checkpoints (the substrate
        # does the same) so inference from raw images needs only this folder
        os.makedirs(self.output_folder, exist_ok=True)
        with open(os.path.join(self.output_folder, "plans.json"), "w") as f:
            json.dump(self.plans_manager.plans, f, indent=2, default=float)
        with open(os.path.join(self.output_folder, "dataset.json"), "w") as f:
            json.dump(self.dataset_json, f, indent=2)
        self._initialized = True
        return self

    # ------------------------------------------------------------------ #
    # data
    # ------------------------------------------------------------------ #

    def get_split(self):
        # plan_and_preprocess writes one subfolder per configuration
        # (keyed by data_identifier, like nnU-Net); flat folders still work.
        data_dir = self.preprocessed_folder
        ident = self.configuration_manager.data_identifier
        if ident and os.path.isdir(os.path.join(data_dir, ident)):
            data_dir = os.path.join(data_dir, ident)
        dataset = PreprocessedDataset(
            data_dir, prev_stage_folder=self._prev_stage_folder()
        )
        if self.fold == "all":
            return dataset, dataset
        splits_path = os.path.join(self.preprocessed_folder, "splits_final.json")
        if os.path.exists(splits_path):
            with open(splits_path) as f:
                splits = json.load(f)
        else:
            splits = make_splits(dataset.case_ids)
            with open(splits_path, "w") as f:
                json.dump(splits, f)
        fold = splits[int(self.fold)]
        return dataset.subset(fold["train"]), dataset.subset(fold["val"])

    def get_dataloaders(self):
        train_ds, val_ds = self.get_split()
        patch = tuple(self.configuration_manager.patch_size)
        # multi-host: each process loads only its share of the global batch
        # (shard_batch assembles the global array from the local shards);
        # per-process seed offsets keep hosts sampling different patches —
        # the DDP sampler-rank analog
        local_bs = self.batch_size
        seed = self.seed
        if jax.process_count() > 1:
            from nextou_tpu.parallel.distributed import local_share

            local_bs = local_share(self.batch_size)
            seed = self.seed + 9973 * jax.process_index()
        self._resolve_device_da()
        aug = None if self.device_da else self._augment_config()
        # host DA samples the LARGER initial patch (exact nnU-Net
        # rotate-then-crop semantics, data/augment.py); device DA and
        # validation sample the final size directly
        sampler_patch = patch
        if aug is not None and aug.final_patch_size is not None:
            from nextou_tpu.data.augment import initial_patch_size

            sampler_patch = initial_patch_size(
                patch, aug.rotation_rad, aug.dummy_2d, aug.scale_range
            )
            self.print_to_log_file(
                f"host DA: initial patch size {sampler_patch} -> {patch}"
            )
        train_sampler = PatchSampler(
            train_ds,
            sampler_patch,
            local_bs,
            self.oversample_foreground_percent,
            seed=seed,
        )
        val_sampler = PatchSampler(
            val_ds, patch, local_bs,
            self.oversample_foreground_percent, seed=seed + 1,
        )
        cascade = self.configuration_manager.previous_stage_name is not None
        onehot = (
            tuple(self.label_manager.foreground_labels) if cascade else None
        )
        train_loader = PatchDataLoader(
            train_sampler, augment=aug, seed=seed,
            num_threads=self.loader_threads,
            onehot_labels=onehot, cascade_noise=cascade,
        )
        val_loader = PatchDataLoader(
            val_sampler, augment=None, seed=seed + 7,
            num_threads=self.loader_threads,
            onehot_labels=onehot, cascade_noise=False,
        )
        return train_loader, val_loader

    # ------------------------------------------------------------------ #
    # training loop
    # ------------------------------------------------------------------ #

    def print_to_log_file(self, *msgs):
        line = " ".join(str(m) for m in msgs)
        if jax.process_index() != 0:
            return  # multi-host: only the lead process logs/writes files
        print(line, flush=True)
        os.makedirs(self.output_folder, exist_ok=True)
        with open(os.path.join(self.output_folder, "training_log.txt"), "a") as f:
            f.write(time.strftime("%Y-%m-%d %H:%M:%S ") + line + "\n")

    def profile_steps(self, n_steps: int = 5, trace_dir: str | None = None):
        """Capture a ``jax.profiler`` device trace of ``n_steps`` train steps
        (view with TensorBoard / xprof). The rebuild's tracing subsystem —
        the reference has none (SURVEY.md §5)."""
        self.initialize()
        train_loader, _ = self.get_dataloaders()
        trace_dir = trace_dir or os.path.join(self.output_folder, "trace")
        if self.mesh is not None:
            from nextou_tpu.parallel import shard_batch

            put = lambda b: shard_batch(self.mesh, b)  # noqa: E731
        else:
            put = lambda b: b  # noqa: E731
        with train_loader:
            it = iter(train_loader)
            batch = put(next(it))
            # compile outside the trace so the trace shows steady-state steps
            self.state, _ = self.train_step(self.state, batch)
            jax.block_until_ready(self.state.params)
            with jax.profiler.trace(trace_dir):
                for _ in range(n_steps):
                    batch = put(next(it))
                    self.state, m = self.train_step(self.state, batch)
                jax.block_until_ready(m["loss"])
        self.print_to_log_file(f"profiler trace written to {trace_dir}")
        return trace_dir

    def run_training(self):
        self.initialize()
        train_loader, val_loader = self.get_dataloaders()
        self.print_to_log_file(
            f"Training {type(self).__name__} on '{self.configuration_name}' "
            f"fold {self.fold}: {self.num_epochs} epochs x "
            f"{self.num_iterations_per_epoch} iters, batch {self.batch_size}"
        )
        if self.mesh is not None:
            from nextou_tpu.parallel import shard_batch

            put = lambda b: shard_batch(self.mesh, b)  # noqa: E731
        else:
            put = lambda b: b  # noqa: E731
        with train_loader, val_loader:
            train_it, val_it = iter(train_loader), iter(val_loader)
            for epoch in range(self.current_epoch, self.num_epochs):
                self.current_epoch = epoch
                t0 = time.time()
                losses = []
                for _ in range(self.num_iterations_per_epoch):
                    batch = put(next(train_it))
                    self.state, metrics = self.train_step(self.state, batch)
                    losses.append(metrics["loss"])
                train_loss = float(np.mean([jax.device_get(l) for l in losses]))

                val_losses, tps, fps, fns = [], [], [], []
                for _ in range(self.num_val_iterations_per_epoch):
                    vb = put(next(val_it))
                    out = self.eval_step(self.state, vb)
                    val_losses.append(out["loss"])
                    tps.append(out["tp"])
                    fps.append(out["fp"])
                    fns.append(out["fn"])
                val_loss = float(np.mean([jax.device_get(l) for l in val_losses]))
                tp = np.sum([jax.device_get(t) for t in tps], axis=0)
                fp = np.sum([jax.device_get(t) for t in fps], axis=0)
                fn = np.sum([jax.device_get(t) for t in fns], axis=0)
                dice_per_class = np.asarray(pseudo_dice(tp, fp, fn))
                mean_dice = float(np.nanmean(dice_per_class))
                if np.isnan(mean_dice):
                    # every class absent from pred AND GT this epoch (tiny
                    # smoke datasets): treat as 0 rather than poisoning the
                    # EMA with NaN (NaN > best is always False, so
                    # checkpoint_best would never be written again)
                    mean_dice = 0.0
                if self.ema_pseudo_dice is None:
                    self.ema_pseudo_dice = mean_dice
                else:
                    self.ema_pseudo_dice = (
                        self.ema_decay * self.ema_pseudo_dice
                        + (1 - self.ema_decay) * mean_dice
                    )

                epoch_time = time.time() - t0
                self.log_history.append(
                    {
                        "epoch": epoch,
                        "train_loss": train_loss,
                        "val_loss": val_loss,
                        "pseudo_dice": dice_per_class.tolist(),
                        "ema_pseudo_dice": self.ema_pseudo_dice,
                        "epoch_time_s": epoch_time,
                    }
                )
                self.print_to_log_file(
                    f"epoch {epoch}: train_loss {train_loss:.4f} "
                    f"val_loss {val_loss:.4f} "
                    f"pseudo_dice {np.round(dice_per_class, 4).tolist()} "
                    f"ema {self.ema_pseudo_dice:.4f} ({epoch_time:.1f}s)"
                )

                if self._best_ema is None or self.ema_pseudo_dice > self._best_ema:
                    self._best_ema = self.ema_pseudo_dice
                    self.save_checkpoint("checkpoint_best.ckpt")
                if (epoch + 1) % self.checkpoint_every == 0:
                    self.save_checkpoint("checkpoint_latest.ckpt")
                self.plot_progress()
        self.save_checkpoint("checkpoint_final.ckpt")
        return self.state

    def plot_progress(self):
        """Write ``progress.png`` (the substrate's per-epoch training curve:
        losses + EMA pseudo-Dice + epoch time; SURVEY.md §5)."""
        if jax.process_index() != 0:
            return
        if not self.log_history:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # plotting is best-effort observability
            return
        h = self.log_history
        ep = [e["epoch"] for e in h]
        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(8, 7), sharex=True)
        ax1.plot(ep, [e["train_loss"] for e in h], label="train loss")
        ax1.plot(ep, [e["val_loss"] for e in h], label="val loss")
        ax1b = ax1.twinx()
        ax1b.plot(
            ep, [e["ema_pseudo_dice"] for e in h],
            color="tab:green", label="EMA pseudo-Dice",
        )
        ax1.set_ylabel("loss")
        ax1b.set_ylabel("EMA pseudo-Dice")
        ax1.legend(loc="upper left")
        ax1b.legend(loc="upper right")
        ax2.plot(ep, [e["epoch_time_s"] for e in h])
        ax2.set_ylabel("epoch time (s)")
        ax2.set_xlabel("epoch")
        fig.tight_layout()
        fig.savefig(os.path.join(self.output_folder, "progress.png"), dpi=100)
        plt.close(fig)

    # ------------------------------------------------------------------ #
    # final validation (nnU-Net's perform_actual_validation + summary.json)
    # ------------------------------------------------------------------ #

    def load_pretrained_weights(self, path: str) -> None:
        """Seed this (fresh) training with another run's network weights —
        ``nnUNetv2_train -pretrained_weights`` (optimizer/RNG stay fresh;
        incompatible leaves keep their init). See
        ``train/checkpoint.py::restore_pretrained``."""
        from nextou_tpu.train.checkpoint import restore_pretrained

        self.initialize()
        self.state, report = restore_pretrained(self.state, path)
        self.print_to_log_file(
            f"pretrained weights from {path}: {len(report['loaded'])} "
            f"tensors loaded, {len(report['skipped_shape'])} shape-skipped, "
            f"{len(report['missing'])} missing"
        )
        for name in report["skipped_shape"]:
            self.print_to_log_file(f"  shape mismatch, kept fresh: {name}")

    def perform_actual_validation(
        self, tile_batch: int = 2, save_probabilities: bool = False
    ) -> dict:
        """Sliding-window prediction of every validation case, per-class Dice,
        written to ``<output>/validation/summary.json`` (the substrate's
        output format, SURVEY.md §5). Every case's predicted segmentation is
        stored as ``validation/{case}.npz`` ('seg', int16) — the CV
        predictions ``find_best_configuration`` determines postprocessing
        on, like nnU-Net's validation folder. With ``save_probabilities``
        (the ``--npz`` train flag) the softmax joins the same npz
        ('probabilities', float16, (*sp, C)) for ensembling."""
        from nextou_tpu.infer.evaluate import evaluate_cases
        from nextou_tpu.predict import build_predictor

        self.initialize()
        _, val_ds = self.get_split()
        val_dir = os.path.join(self.output_folder, "validation")
        os.makedirs(val_dir, exist_ok=True)
        predictor = build_predictor(self, tile_batch=tile_batch)
        fg = self.label_manager.foreground_labels
        cases = []
        for cid in val_ds.case_ids:
            case = val_ds.load(cid)
            data = np.moveaxis(case.data, 0, -1)
            if case.seg_prev is not None:  # cascade: one-hot prev channels
                hot = np.stack([case.seg_prev == l for l in fg], axis=-1)
                data = np.concatenate([data, hot.astype(np.float32)], axis=-1)
            probs = predictor(data)
            seg = self.label_manager.convert_probabilities_to_segmentation(
                probs
            )
            payload = {"seg": np.asarray(seg, np.int16)}
            if save_probabilities:
                payload["probabilities"] = np.asarray(probs, np.float16)
            np.savez_compressed(
                os.path.join(val_dir, f"{cid}.npz"), **payload
            )
            cases.append((seg, case.seg, cid))
        lm = self.label_manager
        # region datasets are evaluated per region mask, like nnU-Net
        labels = lm.foreground_regions if lm.has_regions else lm.all_labels
        summary = evaluate_cases(
            cases,
            labels,
            os.path.join(self.output_folder, "validation", "summary.json"),
        )
        self.print_to_log_file(
            "validation foreground mean Dice:",
            summary["foreground_mean"]["Dice"],
        )
        return summary

    # ------------------------------------------------------------------ #
    # checkpointing
    # ------------------------------------------------------------------ #

    def save_checkpoint(self, name: str):
        if jax.process_index() != 0:
            return  # multi-host: replicated state, lead process writes
        extra = {
            "epoch": self.current_epoch,
            "best_ema": self._best_ema,
            "ema_pseudo_dice": self.ema_pseudo_dice,
            "log_history": self.log_history,
            "trainer": type(self).__name__,
            "configuration": self.configuration_name,
            "fold": self.fold,
        }
        save_checkpoint(os.path.join(self.output_folder, name), self.state, extra)

    def load_checkpoint(self, path: str):
        self.initialize()
        self.state, extra = load_checkpoint(path, self.state)
        self.current_epoch = extra.get("epoch", 0) + 1
        self._best_ema = extra.get("best_ema")
        self.ema_pseudo_dice = extra.get("ema_pseudo_dice")
        self.log_history = extra.get("log_history", [])
        return extra
