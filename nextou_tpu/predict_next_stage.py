"""CLI: predict the next cascade stage's inputs from a trained lowres model.

The substrate's ``predict_next_stage`` step (nnU-Net cascade, which the
reference's plans include as ``3d_cascade_fullres``,
``/root/reference/nnUNetPlans.json:436-439``): run sliding-window inference
with the trained ``3d_lowres`` model over every *training* case, resample
the argmax segmentation (order 0) to the next stage's preprocessed grid, and
store it where the cascade trainer looks for it
(``<preprocessed>/predicted_next_stage/<lowres_config>/{case}.npz``).

    python -m nextou_tpu.predict_next_stage PREPROC_FOLDER MODEL_FOLDER \
        [-c 3d_lowres] [--next 3d_fullres] [-tr TRAINER] [-chk ckpt]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from nextou_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset_folder", help="preprocessed dataset folder")
    ap.add_argument("model_folder", help="trained lowres model folder")
    ap.add_argument("-c", "--configuration", default="3d_lowres")
    ap.add_argument("--next", dest="next_config", default="3d_fullres",
                    help="configuration whose grid to resample onto")
    ap.add_argument("-tr", "--trainer", default="nnUNetTrainer_NexToU")
    ap.add_argument("-chk", default="checkpoint_final.ckpt")
    ap.add_argument("--tile-batch", type=int, default=2)
    ap.add_argument(
        "-f", "--folds", nargs="*", default=None,
        help="predict each fold's VALIDATION cases with that fold's "
             "checkpoint (out-of-fold, nnU-Net semantics; together the 5 "
             "folds cover every training case). Without -f, the single "
             "given checkpoint predicts ALL cases — its own training split "
             "in-fold, which makes the cascade's prev channel unrealistically "
             "good at train time (a warning is printed).",
    )
    args = ap.parse_args(argv)

    from nextou_tpu.data import PreprocessedDataset
    from nextou_tpu.data.resampling import resample_data_or_seg_to_shape
    from nextou_tpu.plans.loader import load_dataset_json
    from nextou_tpu.predict import build_predictor
    from nextou_tpu.train import get_trainer_class

    dataset_json = load_dataset_json(args.dataset_folder)
    plans_path = os.path.join(args.dataset_folder, "nnUNetPlans.json")
    cls = get_trainer_class(args.trainer)

    if args.folds:
        from nextou_tpu.predict import _fold_model_folders

        jobs = list(zip(args.folds, _fold_model_folders(
            args.model_folder, args.folds)))
    else:
        print(
            "WARNING: no -f given — predicting every case with this one "
            "checkpoint; its own training split is predicted IN-fold, so "
            "the cascade's prev channel will look unrealistically good at "
            "train time. Pass -f 0 1 2 3 4 for nnU-Net's out-of-fold "
            "semantics."
        )
        jobs = [(None, args.model_folder)]

    out_dir = None
    for fold, folder in jobs:
        trainer = cls(
            plans_path, args.configuration,
            0 if fold is None else fold, dataset_json,
            preprocessed_folder=args.dataset_folder,
            output_folder=folder,
        )
        trainer.load_checkpoint(os.path.join(folder, args.chk))

        def data_dir(config_name: str) -> str:
            cm = trainer.plans_manager.get_configuration(config_name)
            sub = os.path.join(
                args.dataset_folder, cm.data_identifier or config_name
            )
            return sub if os.path.isdir(sub) else args.dataset_folder

        src = PreprocessedDataset(data_dir(args.configuration))
        dst_dir = data_dir(args.next_config)
        out_dir = os.path.join(
            args.dataset_folder, "predicted_next_stage", args.configuration
        )
        os.makedirs(out_dir, exist_ok=True)

        if fold is None:
            case_ids = src.case_ids
        else:
            # out-of-fold: this fold's checkpoint predicts its own
            # validation cases only
            _, val_ds = trainer.get_split()
            case_ids = val_ds.case_ids

        # label mode: argmax on device, ship int16 (predict.py's own
        # optimization); region mode needs the sigmoid channels + the
        # regions_class_order painting — plain argmax over region channels
        # would store region indices, not labels
        want_seg = not trainer.label_manager.has_regions
        predictor = build_predictor(
            trainer, tile_batch=args.tile_batch,
            output="seg" if want_seg else "probs",
        )
        for cid in case_ids:
            case = src.load(cid)
            out = predictor(np.moveaxis(case.data, 0, -1))
            seg = (
                out.astype(np.int16)
                if want_seg
                else trainer.label_manager.convert_probabilities_to_segmentation(out)
            )
            # resample onto the next stage's preprocessed grid with the
            # NEXT configuration's seg-resampling kwargs (separate-z honored;
            # current spacing = this stage's, new = next stage's)
            with np.load(os.path.join(dst_dir, f"{cid}.npz")) as z:
                target_shape = z["seg"].shape
            next_cm = trainer.plans_manager.get_configuration(
                args.next_config
            )
            seg_up = resample_data_or_seg_to_shape(
                seg,
                target_shape,
                trainer.configuration_manager.spacing,
                next_cm.spacing,
                is_seg=True,
                **next_cm.resampling_fn_seg_kwargs,
            )
            np.savez_compressed(
                os.path.join(out_dir, f"{cid}.npz"),
                seg=seg_up.astype(np.int16),
            )
            tag = "" if fold is None else f" (fold {fold})"
            print(f"{cid}{tag}: {seg.shape} -> {seg_up.shape}")
    print("done:", out_dir)


if __name__ == "__main__":
    main()
