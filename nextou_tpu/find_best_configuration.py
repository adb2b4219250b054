"""CLI: pick the best configuration/ensemble from cross-validation results.

The substrate's ``nnUNetv2_find_best_configuration`` equivalent: read the
``validation/summary.json`` of each trained (trainer, configuration) run,
optionally evaluate 2-way ensembles of their saved probabilities, rank by
foreground mean Dice, and write ``inference_information.json`` describing
what to run at inference time.

    python -m nextou_tpu.find_best_configuration RUNS... [-o OUT.json]

where each RUN is a trainer output folder (containing
``validation/summary.json``) or a ``name=folder`` pair for labeling.
"""

from __future__ import annotations

import argparse
import json
import os


def read_fg_dice(run_folder: str) -> float:
    path = os.path.join(run_folder, "validation", "summary.json")
    with open(path) as f:
        return float(json.load(f)["foreground_mean"]["Dice"])


def _ensemble_candidates(results: list[dict], dataset_folder: str) -> list[dict]:
    """Evaluate every 2-way ensemble of runs whose final validation saved
    probabilities (``nnUNetv2_train --npz``): average the two softmaxes per
    case, convert to labels, score against the preprocessed GT — the
    substrate's find_best ensembling step. Runs without npz files (or with
    disjoint case sets) are silently not paired."""
    import itertools

    import numpy as np

    from nextou_tpu.infer.evaluate import evaluate_cases
    from nextou_tpu.plans.loader import LabelManager, load_dataset_json

    def _prob_cases(folder: str) -> dict[str, str]:
        vdir = os.path.join(folder, "validation")
        if not os.path.isdir(vdir):
            return {}
        return {
            f[:-4]: os.path.join(vdir, f)
            for f in os.listdir(vdir)
            if f.endswith(".npz")
        }

    out = []
    for a, b in itertools.combinations(results, 2):
        pa, pb = _prob_cases(a["folder"]), _prob_cases(b["folder"])
        shared = sorted(set(pa) & set(pb))
        if not shared:
            continue
        try:
            lm = LabelManager(load_dataset_json(a["folder"]))
        except (FileNotFoundError, KeyError) as e:
            print(
                f"skipping ensemble {a['name']} + {b['name']}: "
                f"no readable dataset.json in {a['folder']} ({e})"
            )
            continue
        cases = []
        for cid in shared:
            probs = (
                np.load(pa[cid])["probabilities"].astype(np.float32)
                + np.load(pb[cid])["probabilities"].astype(np.float32)
            ) / 2.0
            seg = lm.convert_probabilities_to_segmentation(probs)
            gt_path = os.path.join(dataset_folder, f"{cid}.npz")
            if not os.path.exists(gt_path):
                # preprocessed cases may live under a data_identifier
                # subfolder (e.g. nnUNetPlans_3d_fullres/)
                hits = [
                    os.path.join(dataset_folder, d, f"{cid}.npz")
                    for d in sorted(os.listdir(dataset_folder))
                    if os.path.isdir(os.path.join(dataset_folder, d))
                ]
                hits = [h for h in hits if os.path.exists(h)]
                if not hits:
                    raise FileNotFoundError(gt_path)
                gt_path = hits[0]
            gt = np.load(gt_path)["seg"]
            cases.append((seg, gt, cid))
        summary = evaluate_cases(cases, lm.all_labels)
        out.append(
            {
                "name": f"ensemble {a['name']} + {b['name']}",
                "folder": [a["folder"], b["folder"]],
                "fg_mean_dice": summary["foreground_mean"]["Dice"],
            }
        )
    return out


def find_best(runs: dict[str, str], dataset_folder: str | None = None) -> dict:
    """runs: name -> trainer output folder. With ``dataset_folder`` (the
    preprocessed GT), 2-way ensembles of saved validation probabilities
    join the ranking. Returns the ranking dict."""
    results = []
    for name, folder in runs.items():
        try:
            dice = read_fg_dice(folder)
        except FileNotFoundError:
            print(f"skipping {name}: no validation/summary.json in {folder}")
            continue
        results.append({"name": name, "folder": folder, "fg_mean_dice": dice})
    if not results:
        raise SystemExit("no run has a validation/summary.json")
    if dataset_folder is not None:
        results += _ensemble_candidates(results, dataset_folder)
    results.sort(key=lambda r: r["fg_mean_dice"], reverse=True)
    best = results[0]
    if isinstance(best["folder"], list):  # a 2-way ensemble won
        steps = [
            f"python -m nextou_tpu.predict {f} <DATA> <CONFIG> "
            f"-o <OUT_{i}> --save-probabilities"
            for i, f in enumerate(best["folder"])
        ]
        steps.append(
            "python -m nextou_tpu.ensemble <OUT_0> <OUT_1> -o <OUT>"
        )
        instructions = " && ".join(steps)
    else:
        instructions = (
            f"python -m nextou_tpu.predict {best['folder']} <DATA> "
            "<CONFIG> -o <OUT>  # then postprocess apply if determined"
        )
    return {
        "best_configuration": best["name"],
        "best_fg_mean_dice": best["fg_mean_dice"],
        "ranking": results,
        "inference_instructions": instructions,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+",
                    help="trainer output folders (or name=folder)")
    ap.add_argument("-o", "--output", default="inference_information.json")
    ap.add_argument(
        "-ds", "--dataset-folder", default=None,
        help="preprocessed dataset folder (GT): also rank 2-way ensembles "
             "of runs that saved validation probabilities (train --npz)",
    )
    args = ap.parse_args(argv)

    runs = {}
    for r in args.runs:
        if "=" in r:
            name, folder = r.split("=", 1)
        else:
            name, folder = os.path.basename(os.path.normpath(r)), r
        runs[name] = folder

    info = find_best(runs, dataset_folder=args.dataset_folder)
    with open(args.output, "w") as f:
        json.dump(info, f, indent=2)
    print(
        f"best: {info['best_configuration']} "
        f"(fg mean Dice {info['best_fg_mean_dice']:.4f})"
    )
    for r in info["ranking"]:
        print(f"  {r['fg_mean_dice']:.4f}  {r['name']}")
    print("written:", args.output)


if __name__ == "__main__":
    main()
