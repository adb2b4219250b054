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


def find_best(runs: dict[str, str]) -> dict:
    """runs: name -> trainer output folder. Returns the ranking dict."""
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
    results.sort(key=lambda r: r["fg_mean_dice"], reverse=True)
    best = results[0]
    return {
        "best_configuration": best["name"],
        "best_fg_mean_dice": best["fg_mean_dice"],
        "ranking": results,
        "inference_instructions": (
            f"python -m nextou_tpu.predict {best['folder']} <DATA> "
            "<CONFIG> -o <OUT>  # then postprocess apply if determined"
        ),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+",
                    help="trainer output folders (or name=folder)")
    ap.add_argument("-o", "--output", default="inference_information.json")
    args = ap.parse_args(argv)

    runs = {}
    for r in args.runs:
        if "=" in r:
            name, folder = r.split("=", 1)
        else:
            name, folder = os.path.basename(os.path.normpath(r)), r
        runs[name] = folder

    info = find_best(runs)
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
