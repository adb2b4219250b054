"""One-process A/B of the gated conv lowerings in the FULL flagship model.

Benches all four combinations of

  NEXTOU_SHUFFLE_TRANSPCONV (decoder upsample: pixel-shuffle matmul vs
  lax.conv_transpose) x NEXTOU_PHASE_CONV (strided convs: polyphase
  stride-1 sum vs native strided lowering)

with the same params and inputs. The env vars are read at trace time, so
flipping them between jit traces inside one process is sound; one process
amortizes backend init and params transfer over the tunneled TPU.

Run on TPU: python tools/exp_ab_lowerings.py [repeats]
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

    results = {}
    for shuffle in ("1", "0"):
        for phase in ("0", "1"):
            os.environ["NEXTOU_SHUFFLE_TRANSPCONV"] = shuffle
            os.environ["NEXTOU_PHASE_CONV"] = phase
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
            key = f"shuffle={shuffle} phase={phase}"
            results[key] = min(dts)
            print(
                f"{key}: " + " ".join(f"{d*1e3:.1f}" for d in dts)
                + f" ms  (min {min(dts)*1e3:.1f}, {B} patches)",
                flush=True,
            )
    best = min(results, key=results.get)
    print(f"best: {best} at {results[best]*1e3:.1f} ms "
          f"-> {B/results[best]:.2f} patches/s", flush=True)

    # batch sweep at the winning combo: larger tile batches amortize the
    # per-dispatch fixed cost if HBM allows (flagship activations ~2 GB/patch
    # with remat off at inference)
    shuffle, phase = (kv.split("=")[1] for kv in best.split())
    os.environ["NEXTOU_SHUFFLE_TRANSPCONV"] = shuffle
    os.environ["NEXTOU_PHASE_CONV"] = phase
    for b in (3, 4):
        xb = jnp.zeros((b, *spec.patch_size, spec.in_channels), jnp.bfloat16)
        try:
            dt = device_loop_time(
                lambda x: model.apply(v, x, train=False),
                xb,
                n_small=1,
                n_large=6,
                repeats=2,
            )
            print(
                f"batch {b}: {dt*1e3:.1f} ms -> {b/dt:.2f} patches/s",
                flush=True,
            )
        except Exception as e:  # OOM etc. — report and keep going
            print(f"batch {b}: failed ({type(e).__name__}: {e})", flush=True)

    # one-pass instance-norm statistics at the winning combo (batch 2)
    os.environ["NEXTOU_ONEPASS_IN"] = "1"
    dt = device_loop_time(
        lambda x: model.apply(v, x, train=False),
        x,
        n_small=1,
        n_large=6,
        repeats=2,
    )
    print(f"onepass-IN: {dt*1e3:.1f} ms -> {B/dt:.2f} patches/s", flush=True)
    del os.environ["NEXTOU_ONEPASS_IN"]


if __name__ == "__main__":
    main()