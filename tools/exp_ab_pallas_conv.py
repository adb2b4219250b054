"""One-process in-model A/B of the tap-list Pallas conv dispatch
(kernels/conv.py via nn/layers.py::FoldedConv, NEXTOU_PALLAS_CONV).

Benches the FULL flagship forward (batch 2, bf16) with the dispatch on
vs off, plus a numeric agreement check between the two traces. The env
var is read at trace time, so flipping it between jit traces inside one
process is sound.

Run on TPU: python tools/exp_ab_pallas_conv.py [repeats]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from nextou_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from nextou_tpu.models import NexToU
from nextou_tpu.models.presets import flagship_3d_spec
from nextou_tpu.utils import fast_init
from nextou_tpu.utils.timing import device_loop_time


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else ["0", "1"]
    spec = flagship_3d_spec(deep_supervision=False)
    B = 2
    x = jnp.zeros((B, *spec.patch_size, spec.in_channels), jnp.bfloat16)

    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    from nextou_tpu.utils.transfer import device_put_variables
    v = device_put_variables(fast_init(model, 0, x, train=False), jnp.bfloat16)
    jax.block_until_ready(v)
    print("init done", flush=True)

    results = {}
    for pallas in modes:
        os.environ["NEXTOU_PALLAS_CONV"] = pallas
        dts = [
            device_loop_time(
                lambda x: model.apply(v, x, train=False),
                x, n_small=1, n_large=6, repeats=1,
            )
            for _ in range(repeats)
        ]
        results[pallas] = min(dts)
        print(
            f"pallas={pallas}: " + " ".join(f"{d*1e3:.1f}" for d in dts)
            + f" ms  (min {min(dts)*1e3:.1f}, {B} patches, "
            f"{B/min(dts):.2f} patches/s)",
            flush=True,
        )

    # numeric agreement on real data (bf16 model: conv-algorithm swaps
    # reorder bf16 rounding, amplified through 6 norm stages — expect
    # same-ballpark logits, not tight agreement; per-conv exactness is
    # asserted by tests/test_conv_kernel.py)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
    os.environ["NEXTOU_PALLAS_CONV"] = modes[0]
    y0 = np.asarray(jax.jit(
        lambda x: model.apply(v, x, train=False))(xr), np.float32)
    os.environ["NEXTOU_PALLAS_CONV"] = modes[-1]
    y1 = np.asarray(jax.jit(
        lambda x: model.apply(v, x, train=False))(xr), np.float32)
    err = np.abs(y0 - y1).max()
    scale = np.abs(y0).max()
    print(f"max|logit diff| {err:.4g} (|y| {scale:.3g})", flush=True)
    speedup = results[modes[0]] / results[modes[-1]]
    print(f"speedup x{speedup:.3f} ({results[modes[0]]*1e3:.1f} -> "
          f"{results[modes[-1]]*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
