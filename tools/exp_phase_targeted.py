"""In-model A/B of TARGETED polyphase conv (NEXTOU_PHASE_CONV=cin-cout,...).

Round-3 found the global polyphase mode loses 24 ms to fusion breakage
across all strided convs, while the per-op roofline blames only two
lowerings (e1a 33-66 at 12.7 TF/s, e2a 66-132 at 15 TF/s). This measures
the flagship batch-2 forward with phasing restricted to those two pairs,
against the default and global modes, same params/inputs, one process.

Run on TPU: python tools/exp_phase_targeted.py [repeats]
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

    modes = ["0", "33-66,66-132", "33-66", "66-132", "1"]
    results = {}
    for mode in modes:
        os.environ["NEXTOU_PHASE_CONV"] = mode
        try:
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
            results[mode] = min(dts)
            print(
                f"phase={mode!r}: "
                + " ".join(f"{d*1e3:.1f}" for d in dts)
                + f" ms  (min {min(dts)*1e3:.1f}, {B} patches, "
                f"{B/min(dts):.2f} p/s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"phase={mode!r}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
    if results:
        best = min(results, key=results.get)
        print(
            f"best: phase={best!r} at {results[best]*1e3:.1f} ms "
            f"-> {B/results[best]:.2f} patches/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
