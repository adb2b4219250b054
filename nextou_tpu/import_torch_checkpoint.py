"""CLI: import an upstream PyTorch NexToU checkpoint.

Converts an nnU-Net/NexToU torch checkpoint (``checkpoint_final.pth`` /
``checkpoint_best.pth`` with ``network_weights``, or a raw ``state_dict``)
into this framework's checkpoint format so ``predict`` / ``run_training``
can use weights trained with the reference stack:

    python -m nextou_tpu.import_torch_checkpoint CKPT.pth DATASET_FOLDER \
        CONFIG [-tr TRAINER] [-p plans.json] -o OUT_FOLDER

OUT_FOLDER becomes a model folder (checkpoint_final.ckpt + plans.json +
dataset.json) usable directly by ``python -m nextou_tpu.predict``.

Forward parity of imported weights is covered by
``tests/test_torch_import.py`` (voxel-level agreement with the torch
reference on random weights).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_checkpoint")
    ap.add_argument("dataset_folder", help="preprocessed dataset folder")
    ap.add_argument("configuration", help="e.g. 3d_fullres_nextou")
    ap.add_argument("-tr", "--trainer", default="nnUNetTrainer_NexToU")
    ap.add_argument("-p", "--plans", default=None)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument(
        "--trust-checkpoint",
        action="store_true",
        help="allow full (arbitrary-pickle) torch.load for checkpoints that "
        "weights_only loading rejects; only use on files you trust",
    )
    args = ap.parse_args(argv)

    import torch

    import jax
    import numpy as np

    from nextou_tpu.compat.torch_import import (
        extract_network_weights,
        torch_state_dict_to_variables,
    )
    from nextou_tpu.paths import resolve_preprocessed
    from nextou_tpu.plans.loader import load_dataset_json
    from nextou_tpu.train import get_trainer_class
    from nextou_tpu.train.checkpoint import save_checkpoint

    args.dataset_folder = resolve_preprocessed(args.dataset_folder)
    plans_path = args.plans or os.path.join(
        args.dataset_folder, "nnUNetPlans.json"
    )
    dataset_json = load_dataset_json(args.dataset_folder)

    trainer = get_trainer_class(args.trainer)(
        plans_path,
        args.configuration,
        0,
        dataset_json,
        preprocessed_folder=args.dataset_folder,
        output_folder=args.output,
    ).initialize()

    try:
        ckpt = torch.load(
            args.torch_checkpoint, map_location="cpu", weights_only=True
        )
    except Exception:
        # nnU-Net checkpoints pickle non-tensor objects (plans dicts etc.);
        # full unpickling executes arbitrary code, so it is opt-in
        if not args.trust_checkpoint:
            raise SystemExit(
                "checkpoint requires full pickle loading (arbitrary code "
                "execution risk); re-run with --trust-checkpoint if you "
                "trust this file"
            )
        ckpt = torch.load(
            args.torch_checkpoint, map_location="cpu", weights_only=False
        )
    sd = extract_network_weights(ckpt)
    template = jax.device_get(trainer.state.model_variables())
    variables = torch_state_dict_to_variables(sd, template, trainer.model_spec)

    state = trainer.state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
    )
    extra = {
        "trainer": args.trainer,
        "configuration": args.configuration,
        "imported_from": os.path.abspath(args.torch_checkpoint),
    }
    if isinstance(ckpt, dict) and "current_epoch" in ckpt:
        extra["epoch"] = int(ckpt["current_epoch"])
    out_path = os.path.join(args.output, "checkpoint_final.ckpt")
    save_checkpoint(out_path, state, extra)
    n_params = sum(
        np.asarray(x).size for x in jax.tree.leaves(variables["params"])
    )
    print(f"imported {len(sd)} tensors -> {out_path} ({n_params:,} params)")


if __name__ == "__main__":
    main()
