"""CLI: train a model.

Mirrors the reference's entry
``nnUNetv2_train DATASET CONFIG FOLD -tr TRAINER`` (``README.md:81-92``):

    python -m nextou_tpu.run_training DATASET_FOLDER CONFIG FOLD \
        -tr nnUNetTrainer_NexToU_BTI_Synapse [-p plans.json] [--c]

DATASET_FOLDER must contain preprocessed ``.npz`` cases plus ``dataset.json``
and (unless -p overrides) ``nnUNetPlans.json``.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    from nextou_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # multi-host pods: one process per host, same CLI on each; must init
    # BEFORE the first backend touch (parallel/distributed.py has the
    # v5e-pod launch path)
    from nextou_tpu.parallel.distributed import (
        distributed_requested,
        initialize_distributed,
    )

    if distributed_requested():
        pid, n = initialize_distributed()
        print(f"distributed: process {pid}/{n}", flush=True)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset_folder", help="preprocessed dataset folder")
    ap.add_argument("configuration", help="e.g. 3d_fullres_nextou")
    ap.add_argument("fold", help="0-4 or 'all'")
    ap.add_argument("-tr", "--trainer", default="nnUNetTrainer_NexToU")
    ap.add_argument("-p", "--plans", default=None, help="plans json path")
    ap.add_argument("-o", "--output", default=None, help="output folder")
    ap.add_argument("--c", "--continue", dest="resume", action="store_true",
                    help="resume from checkpoint_latest")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument(
        "--profile", type=int, default=0, metavar="N",
        help="instead of training, capture a jax.profiler trace of N steps",
    )
    ap.add_argument(
        "--val", action="store_true",
        help="skip training: load checkpoint_final and run the final "
             "validation (sliding-window prediction + summary.json)",
    )
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument(
        "--npz", action="store_true",
        help="save each validation case's softmax as validation/{case}.npz "
             "during the final validation (find_best_configuration's "
             "ensembling input, like nnUNetv2_train --npz)",
    )
    ap.add_argument(
        "-pretrained_weights", "--pretrained-weights", default=None,
        metavar="CKPT",
        help="seed the network with weights from another run's checkpoint "
             "before training (optimizer/RNG stay fresh; incompatible "
             "tensors keep their initialization)",
    )
    ap.add_argument(
        "--device-da", choices=["auto", "on", "off"], default="auto",
        help="run data augmentation on the accelerator inside the compiled "
             "train step (auto: on for TPU, off for CPU/cascade)",
    )
    args = ap.parse_args(argv)

    from nextou_tpu.paths import resolve_preprocessed
    args.dataset_folder = resolve_preprocessed(args.dataset_folder)
    from nextou_tpu.plans.loader import load_dataset_json
    from nextou_tpu.train import get_trainer_class

    plans_path = args.plans or os.path.join(args.dataset_folder, "nnUNetPlans.json")
    dataset_json = load_dataset_json(args.dataset_folder)
    fold = args.fold if args.fold == "all" else int(args.fold)
    output = args.output or os.path.join(
        args.dataset_folder,
        f"{args.trainer}__{args.configuration}__fold_{fold}",
    )

    cls = get_trainer_class(args.trainer)
    trainer = cls(
        plans_path,
        args.configuration,
        fold,
        dataset_json,
        preprocessed_folder=args.dataset_folder,
        output_folder=output,
        num_epochs=args.epochs,
        num_iterations_per_epoch=args.iters,
        batch_size=args.batch_size,
        device_da={"auto": "auto", "on": True, "off": False}[args.device_da],
    )
    if args.pretrained_weights:
        trainer.load_pretrained_weights(args.pretrained_weights)
    latest = os.path.join(output, "checkpoint_latest.ckpt")
    if args.resume:
        if os.path.exists(latest):
            trainer.load_checkpoint(latest)
        else:
            print(
                f"WARNING: --c requested but {latest} does not exist "
                "(checkpoint_latest is written every 50 epochs); "
                "starting from scratch"
            )
    if args.profile:
        trainer.profile_steps(args.profile)
        return
    if args.val:
        final = os.path.join(output, "checkpoint_final.ckpt")
        trainer.load_checkpoint(final)
        trainer.perform_actual_validation(save_probabilities=args.npz)
        return
    trainer.run_training()
    trainer.perform_actual_validation(save_probabilities=args.npz)


if __name__ == "__main__":
    main()
