"""One-process in-model A/B of the round-3 layout/dtype experiments.

Benches the flagship batch-2 forward under all combinations of

  NEXTOU_NO_FOLD (keep (1,3,3) convs rank-3 instead of depth-folding to 2D
  — kills the batch-on-lanes layout copies the trace showed) x
  NEXTOU_KNN_BF16 (bf16 normalized coordinates into the kNN selection —
  1-pass MXU distance dot)

on top of the always-on round-3 changes (InstanceNorm without f32
materialization, bf16 channels-last logits). Env vars are read at trace
time, so flipping them between jit traces in one process is sound.

Run on TPU: python tools/exp_ab_layout.py [repeats]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from nextou_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from nextou_tpu.models import NexToU
from nextou_tpu.models.presets import flagship_3d_spec
from nextou_tpu.utils import fast_init
from nextou_tpu.utils.timing import device_loop_time


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spec = flagship_3d_spec(deep_supervision=False)
    B = 2
    x = jnp.zeros((B, *spec.patch_size, spec.in_channels), jnp.bfloat16)

    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    from nextou_tpu.utils.transfer import device_put_variables
    v = device_put_variables(fast_init(model, 0, x, train=False), jnp.bfloat16)
    jax.block_until_ready(v)
    print("init done", flush=True)

    # optional argv[2]: grid points separated by ":". Each point is either
    # the original two-digit "NF KB" shorthand ("01" = NEXTOU_NO_FOLD=0,
    # NEXTOU_KNN_BF16=1) or a comma-separated env assignment list
    # ("NEXTOU_IN_SCALAR_AB=0,NEXTOU_ONEPASS_IN=1") benched verbatim.
    combos = [f"{nf}{kb}" for nf in ("0", "1") for kb in ("1", "0")]
    if len(sys.argv) > 2:
        combos = sys.argv[2].split(":")

    results = {}
    for combo in combos:
            if "=" in combo:
                env = dict(kv.split("=", 1) for kv in combo.split(","))
                key = combo
            else:
                env = {
                    "NEXTOU_NO_FOLD": combo[0],
                    "NEXTOU_KNN_BF16": combo[1],
                }
                key = f"nofold={combo[0]} knnbf16={combo[1]}"
            for name, val in env.items():
                os.environ[name] = val
            dts = [
                device_loop_time(
                    lambda x: model.apply(v, x, train=False),
                    x,
                    n_small=1,
                    n_large=6,
                    repeats=1,
                )
                for _ in range(repeats)
            ]
            results[key] = min(dts)
            print(
                f"{key}: " + " ".join(f"{d*1e3:.1f}" for d in dts)
                + f" ms  (min {min(dts)*1e3:.1f}, {B} patches, "
                f"{B/min(dts):.2f} p/s)",
                flush=True,
            )
    best = min(results, key=results.get)
    print(f"best: {best} at {results[best]*1e3:.1f} ms "
          f"-> {B/results[best]:.2f} patches/s", flush=True)


if __name__ == "__main__":
    main()
