"""CLI + API: full-volume prediction from a trained checkpoint.

The substrate's ``predict_from_raw_data`` equivalent (SURVEY.md §3.4):
sliding-window tiles (step 0.5 x patch), mirroring TTA over the trainer's
``inference_allowed_mirroring_axes``, Gaussian-weighted softmax accumulation,
argmax. Deep supervision is disabled at inference; the checkpoint's params
load unchanged because all seg heads are always built.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp


def build_predictor(
    trainer, tile_batch: int = 2, mesh=None, output: str = "probs",
    step_size: float = 0.5, disable_tta: bool = False,
):
    """From an initialized trainer (checkpoint loaded), build a function
    ``(data (*sp, C) float32) -> probs (*sp, num_classes)`` — or, with
    ``output='seg'`` (label mode), ``-> (*sp) int16`` argmaxed on device so
    only the segmentation leaves the chip.

    With ``mesh``, the tile batch is sharded across all mesh devices (params
    replicated) — the multi-chip serving path: every chip predicts its shard
    of tiles, host accumulates."""
    from nextou_tpu.infer import make_tile_predictor, sliding_window_predict
    from nextou_tpu.models import NexToU
    import dataclasses

    spec = dataclasses.replace(trainer.model_spec, deep_supervision=False)
    model = NexToU(spec=spec, dtype=trainer.compute_dtype, remat=False)
    from nextou_tpu.utils.transfer import device_put_variables

    variables = jax.device_get(trainer.state.model_variables())
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())
    # dedup + bf16 kernel pre-cast: bit-identical on the compute path,
    # ~halves the serving cold-start transfer (utils/transfer.py)
    variables = device_put_variables(
        variables, trainer.compute_dtype, device=sharding
    )

    def apply_fn(x):
        return model.apply(variables, x, train=False)

    activation = (
        "sigmoid" if trainer.label_manager.has_regions else "softmax"
    )
    if activation != "softmax":
        output = "probs"  # region mode needs the per-region channels
    mirror_axes = (
        None if disable_tta else trainer.inference_allowed_mirroring_axes
    )
    tile_pred = make_tile_predictor(
        apply_fn, mirror_axes, mesh=mesh,
        activation=activation,
    )
    patch = spec.patch_size
    ncls = spec.num_classes
    from nextou_tpu.infer import make_device_sliding_predictor

    device_pred = make_device_sliding_predictor(
        apply_fn, mirror_axes, patch, ncls,
        tile_batch=tile_batch, activation=activation, mesh=mesh,
        output=output, step_fraction=step_size,
    )

    # device-resident accumulation when the probability volume fits HBM
    # (f32 acc + weight + volume, with headroom for the model itself)
    ACC_BUDGET_BYTES = 4 << 30

    def predict(data: np.ndarray) -> np.ndarray:
        if data.ndim - 1 == len(patch) + 1:
            # 2d configuration on a volumetric case: predict slice-by-slice
            # along the leading axis (nnU-Net's 2d inference over 3d data)
            return np.stack([predict(data[z]) for z in range(data.shape[0])])
        vox = int(np.prod(data.shape[:-1]))
        acc_bytes = vox * (ncls + 1 + data.shape[-1]) * 4
        if device_pred is not None and acc_bytes <= ACC_BUDGET_BYTES:
            return np.asarray(device_pred(data))
        probs = sliding_window_predict(
            tile_pred, data, patch, ncls, tile_batch=tile_batch, mesh=mesh,
            step_fraction=step_size,
        )
        if output == "seg":  # host fallback for HBM-exceeding volumes
            return np.argmax(probs, axis=-1).astype(np.int16)
        return probs

    return predict


def build_fold_ensemble_predictor(
    trainers, tile_batch: int = 2, mesh=None, output: str = "probs",
    step_size: float = 0.5, disable_tta: bool = False,
):
    """Average the sliding-window probabilities of several folds' models —
    nnU-Net's default ``-f 0 1 2 3 4`` cross-validation ensemble
    (predict_from_raw_data averages softmax over folds before argmax).
    ``output='seg'`` only applies single-fold (ensembling needs the probs)."""
    if len(trainers) > 1:
        output = "probs"
    predictors = [
        build_predictor(
            t, tile_batch=tile_batch, mesh=mesh, output=output,
            step_size=step_size, disable_tta=disable_tta,
        )
        for t in trainers
    ]
    if len(predictors) == 1:
        return predictors[0]

    def predict(data: np.ndarray) -> np.ndarray:
        acc = None
        for p in predictors:
            probs = p(data)
            acc = probs if acc is None else acc + probs
        return acc / len(predictors)

    return predict


def _fold_model_folders(model_folder: str, folds) -> list[str]:
    """Resolve per-fold checkpoint folders: `..._fold_N` sibling naming (this
    repo's run_training layout) or `fold_N/` subfolders (nnU-Net layout)."""
    import re

    base = model_folder.rstrip("/")
    m = re.search(r"fold_(\d+|all)$", base)
    out = []
    for f in folds:
        if m is not None:
            out.append(base[: m.start()] + f"fold_{f}")
        elif os.path.isdir(os.path.join(base, f"fold_{f}")):
            out.append(os.path.join(base, f"fold_{f}"))
        else:
            raise SystemExit(
                f"cannot resolve fold {f}: {model_folder} neither ends in "
                "fold_N nor contains fold_N subfolders"
            )
    for p in out:
        if not os.path.isdir(p):
            raise SystemExit(f"fold folder does not exist: {p}")
    return out


def predict_case(trainer, data_chw: np.ndarray, tile_batch: int = 2) -> np.ndarray:
    """data (C, *sp) preprocessed -> argmax segmentation (*sp) int16."""
    predictor = build_predictor(trainer, tile_batch)
    probs = predictor(np.moveaxis(data_chw, 0, -1))
    return trainer.label_manager.convert_probabilities_to_segmentation(probs)


def main(argv=None):
    from nextou_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_folder", help="trainer output folder with checkpoints")
    ap.add_argument(
        "dataset_folder",
        help="preprocessed dataset folder, or (with --raw) a folder of raw "
             "images ({case}_{0000..}.nii.gz)",
    )
    ap.add_argument("configuration")
    ap.add_argument(
        "--raw", action="store_true",
        help="input is raw images: run the full preprocess -> predict -> "
             "resample-back -> revert-crop pipeline and write NIfTI segs "
             "(plans/dataset.json are read from the model folder)",
    )
    ap.add_argument("-tr", "--trainer", default="nnUNetTrainer_NexToU")
    ap.add_argument(
        "-f", "--folds", nargs="*", default=None,
        help="ensemble these folds (average probabilities, like nnU-Net's "
             "-f 0 1 2 3 4); model_folder may end in fold_N (siblings) or "
             "contain fold_N subfolders",
    )
    ap.add_argument("-chk", default="checkpoint_final.ckpt")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--cases", nargs="*", default=None)
    ap.add_argument("--tile-batch", type=int, default=2)
    ap.add_argument(
        "-step_size", "--step-size", type=float, default=0.5,
        help="sliding-window step as a fraction of patch size "
             "(nnUNetv2_predict -step_size; default 0.5)",
    )
    ap.add_argument(
        "--disable-tta", "--disable_tta", action="store_true",
        help="skip mirroring test-time augmentation (faster, slightly "
             "less accurate — like nnUNetv2_predict --disable_tta)",
    )
    ap.add_argument(
        "--all-devices", action="store_true",
        help="shard the tile batch across every visible device",
    )
    ap.add_argument(
        "-prev", "--prev-stage-predictions", default=None,
        help="cascade: folder of previous-stage {case}.npz segs on this "
             "configuration's grid (from predict_next_stage or predict)",
    )
    ap.add_argument(
        "-pp", "--postprocessing", default=None,
        help="apply determined postprocessing to every written segmentation: "
             "a postprocessing.json (from nextou_tpu.postprocess determine) "
             "or an inference_information.json carrying a 'postprocessing' "
             "key (from nextou_tpu.find_best_configuration)",
    )
    ap.add_argument(
        "--save-probabilities", action="store_true",
        help="also store the softmax probabilities (float16) in the output "
             "npz — needed for ensembling (nextou_tpu.ensemble)",
    )
    args = ap.parse_args(argv)

    postprocess = None
    if args.postprocessing is not None:
        import json as _json

        from nextou_tpu.postprocess import apply_postprocessing

        with open(args.postprocessing) as f:
            pp = _json.load(f)
        pp = pp.get("postprocessing", pp)  # inference_information.json form
        if "remove_all_but_largest_component" not in pp:
            raise SystemExit(
                f"{args.postprocessing} carries no postprocessing operations"
            )

        def postprocess(seg, _pp=pp):
            return apply_postprocessing(seg, _pp)

    from nextou_tpu.paths import resolve_preprocessed, resolve_raw
    args.dataset_folder = (resolve_raw if args.raw else resolve_preprocessed)(args.dataset_folder)
    from nextou_tpu.data import PreprocessedDataset
    from nextou_tpu.plans.loader import load_dataset_json
    from nextou_tpu.train import get_trainer_class

    if args.raw:
        # plans + dataset.json were saved next to the checkpoints at training
        dataset_json = load_dataset_json(args.model_folder)
        plans_path = os.path.join(args.model_folder, "plans.json")
    else:
        dataset_json = load_dataset_json(args.dataset_folder)
        plans_path = os.path.join(args.dataset_folder, "nnUNetPlans.json")
    cls = get_trainer_class(args.trainer)
    folders = (
        _fold_model_folders(args.model_folder, args.folds)
        if args.folds
        else [args.model_folder]
    )
    trainers = []
    for folder in folders:
        t = cls(
            plans_path, args.configuration, 0, dataset_json,
            preprocessed_folder=args.dataset_folder, output_folder=folder,
        )
        t.load_checkpoint(os.path.join(folder, args.chk))
        trainers.append(t)
    trainer = trainers[0]

    if args.raw:
        if args.save_probabilities:
            raise SystemExit(
                "--save-probabilities is not supported with --raw (raw mode "
                "writes NIfTI segmentations at the original geometry; "
                "ensembling inputs need predictions on the preprocessed "
                "grid — run predict on the preprocessed folder instead)"
            )
        from nextou_tpu.infer.raw import predict_raw_folder

        mesh = None
        if args.all_devices and len(jax.devices()) > 1:
            from nextou_tpu.parallel import make_mesh

            mesh = make_mesh()
        predictor = build_fold_ensemble_predictor(
            trainers, tile_batch=args.tile_batch, mesh=mesh,
            step_size=args.step_size, disable_tta=args.disable_tta,
        )
        prev_seg_loader = None
        if trainer.configuration_manager.previous_stage_name is not None:
            if args.prev_stage_predictions is None:
                raise SystemExit(
                    f"configuration '{args.configuration}' is a cascade "
                    "stage: pass -prev with the previous stage's predictions"
                )
            from nextou_tpu.data.preprocessing import resample_to_shape

            fg_labels = trainer.label_manager.foreground_labels

            def prev_seg_loader(cid, shape):
                # previous-stage seg -> one-hot channels on this case's
                # preprocessed grid (nearest resample if grids differ)
                with np.load(
                    os.path.join(args.prev_stage_predictions, f"{cid}.npz")
                ) as z:
                    prev = z["seg"]
                if tuple(prev.shape) != tuple(shape):
                    prev = resample_to_shape(
                        prev.astype(np.float32), shape, order=0
                    ).astype(np.int32)
                return np.stack(
                    [prev == l for l in fg_labels], axis=0
                ).astype(np.float32)

        predict_raw_folder(
            predictor,
            args.dataset_folder,
            args.output,
            trainer.plans_manager,
            trainer.configuration_manager,
            dataset_json,
            cases=args.cases,
            prev_seg_loader=prev_seg_loader,
            postprocess=postprocess,
        )
        return

    data_dir = args.dataset_folder
    ident = trainer.configuration_manager.data_identifier
    if ident and os.path.isdir(os.path.join(data_dir, ident)):
        data_dir = os.path.join(data_dir, ident)
    ds = PreprocessedDataset(data_dir, args.cases)
    os.makedirs(args.output, exist_ok=True)
    import json as _json

    with open(os.path.join(args.output, "dataset.json"), "w") as f:
        _json.dump(dataset_json, f)  # label semantics for ensemble/eval
    mesh = None
    if args.all_devices and len(jax.devices()) > 1:
        from nextou_tpu.parallel import make_mesh

        mesh = make_mesh()
    if (
        trainer.configuration_manager.previous_stage_name is not None
        and args.prev_stage_predictions is None
    ):
        raise SystemExit(
            f"configuration '{args.configuration}' is a cascade stage: pass "
            "-prev with the previous stage's predictions"
        )
    fg_labels = trainer.label_manager.foreground_labels
    # label mode, single fold, no saved probabilities: argmax on device and
    # ship only the int16 seg (240 MB -> 8 MB per flagship volume)
    want_seg = (
        not args.save_probabilities
        and not trainer.label_manager.has_regions
        and len(trainers) == 1
    )
    predictor = build_fold_ensemble_predictor(
        trainers, tile_batch=args.tile_batch, mesh=mesh,
        output="seg" if want_seg else "probs",
        step_size=args.step_size, disable_tta=args.disable_tta,
    )
    for cid in ds.case_ids:
        case = ds.load(cid)
        data = np.moveaxis(case.data, 0, -1)
        if args.prev_stage_predictions is not None:
            with np.load(
                os.path.join(args.prev_stage_predictions, f"{cid}.npz")
            ) as z:
                prev = z["seg"]
            prev = np.squeeze(prev) if prev.ndim == data.ndim else prev
            if tuple(prev.shape) != tuple(data.shape[:-1]):
                # plain `predict` outputs live on the PREVIOUS stage's grid
                # (unlike predict_next_stage's, already resampled): nearest-
                # resample here like the --raw path does
                from nextou_tpu.data.preprocessing import resample_to_shape

                prev = resample_to_shape(
                    prev.astype(np.float32), data.shape[:-1], order=0
                ).astype(np.int32)
            hot = np.stack([prev == l for l in fg_labels], axis=-1)
            data = np.concatenate([data, hot.astype(np.float32)], axis=-1)
        probs = predictor(data)
        seg = (
            probs
            if want_seg
            else trainer.label_manager.convert_probabilities_to_segmentation(probs)
        )
        if postprocess is not None:
            seg = postprocess(np.asarray(seg))
        payload = {"seg": seg}
        if args.save_probabilities:
            payload["probabilities"] = probs.astype(np.float16)
        np.savez_compressed(os.path.join(args.output, f"{cid}.npz"), **payload)
        print(f"predicted {cid}: {seg.shape}")


if __name__ == "__main__":
    main()
