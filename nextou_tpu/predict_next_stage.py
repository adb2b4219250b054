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
    args = ap.parse_args(argv)

    from nextou_tpu.data import PreprocessedDataset
    from nextou_tpu.data.preprocessing import resample_to_shape
    from nextou_tpu.plans.loader import load_dataset_json
    from nextou_tpu.predict import build_predictor
    from nextou_tpu.train import get_trainer_class

    dataset_json = load_dataset_json(args.dataset_folder)
    plans_path = os.path.join(args.dataset_folder, "nnUNetPlans.json")
    cls = get_trainer_class(args.trainer)
    trainer = cls(
        plans_path, args.configuration, 0, dataset_json,
        preprocessed_folder=args.dataset_folder,
        output_folder=args.model_folder,
    )
    trainer.load_checkpoint(os.path.join(args.model_folder, args.chk))

    def data_dir(config_name: str) -> str:
        cm = trainer.plans_manager.get_configuration(config_name)
        sub = os.path.join(args.dataset_folder, cm.data_identifier or config_name)
        return sub if os.path.isdir(sub) else args.dataset_folder

    src = PreprocessedDataset(data_dir(args.configuration))
    dst_dir = data_dir(args.next_config)
    out_dir = os.path.join(
        args.dataset_folder, "predicted_next_stage", args.configuration
    )
    os.makedirs(out_dir, exist_ok=True)

    predictor = build_predictor(trainer, tile_batch=args.tile_batch)
    for cid in src.case_ids:
        case = src.load(cid)
        probs = predictor(np.moveaxis(case.data, 0, -1))
        seg = np.argmax(probs, axis=-1).astype(np.int16)
        # resample onto the next stage's preprocessed grid (order 0)
        with np.load(os.path.join(dst_dir, f"{cid}.npz")) as z:
            target_shape = z["seg"].shape
        seg_up = resample_to_shape(seg, target_shape, is_seg=True)
        np.savez_compressed(
            os.path.join(out_dir, f"{cid}.npz"), seg=seg_up.astype(np.int16)
        )
        print(f"{cid}: {seg.shape} -> {seg_up.shape}")
    print("done:", out_dir)


if __name__ == "__main__":
    main()
