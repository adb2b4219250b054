"""Per-stage conv microbenchmark on TPU: roofline + channel-padding probe.

For every conv in the flagship forward (encoder + decoder, batch 2, bf16)
this times the op standalone and reports achieved TF/s and GB/s (unpadded
byte counts), then re-times it with channels padded up to multiples of a
lane-friendly width. If padded variants run FASTER in absolute terms, odd
channel counts are triggering an XLA pathology worth exploiting (padding is
math-identical with zero-extended weights); if they run at the same wall
time, the lanes are already the constraint and padding only inflates
nominal-FLOP MFU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nextou_tpu.utils.cache import enable_compilation_cache
from nextou_tpu.utils.timing import device_loop_time

enable_compilation_cache()

B = 2
PEAK_TF = 197.0  # v5e bf16
PEAK_GB = 819.0  # v5e HBM


def conv(x, w, stride):
    nd = len(stride)
    letters = "DHW"[-nd:]
    dn = (f"N{letters}C", f"{letters}IO", f"N{letters}C")
    pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in w.shape[:nd])
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad, dimension_numbers=dn
    )


def bench_one(name, in_shape, cin, cout, kernel, stride, pad_to=None):
    ci, co = cin, cout
    if pad_to:
        ci = -(-cin // pad_to) * pad_to
        co = -(-cout // pad_to) * pad_to
    x = jnp.zeros((B, *in_shape, ci), jnp.bfloat16)
    w = jnp.zeros((*kernel, ci, co), jnp.bfloat16)
    f = jax.jit(lambda x, w: conv(x, w, stride))
    try:
        dt = device_loop_time(lambda x: f(x, w), x, n_small=1, n_large=9, repeats=1)
    except Exception as e:
        print(f"{name}: FAILED {e}")
        return None
    out_shape = tuple(s // st for s, st in zip(in_shape, stride))
    flops = 2 * B * np.prod(out_shape) * np.prod(kernel) * cin * cout
    bytes_ = 2 * B * (np.prod(in_shape) * cin + np.prod(out_shape) * cout)
    tf = flops / dt / 1e12
    gb = bytes_ / dt / 1e9
    tag = f" pad{pad_to}({ci}->{co})" if pad_to else ""
    print(
        f"{name}{tag}: {dt*1e3:7.2f} ms  {tf:6.1f} TF/s ({100*tf/PEAK_TF:4.1f}%)"
        f"  {gb:6.1f} GB/s ({100*gb/PEAK_GB:4.1f}%)",
        flush=True,
    )
    return dt


CONVS = [
    # name, in_shape, cin, cout, kernel, stride
    ("e0a", (64, 224, 192), 1, 33, (1, 3, 3), (1, 1, 1)),
    ("e0b", (64, 224, 192), 33, 33, (1, 3, 3), (1, 1, 1)),
    ("e1a", (64, 224, 192), 33, 66, (3, 3, 3), (1, 2, 2)),
    ("e1b", (64, 112, 96), 66, 66, (3, 3, 3), (1, 1, 1)),
    ("e2a", (64, 112, 96), 66, 132, (3, 3, 3), (2, 2, 2)),
    ("e2b", (32, 56, 48), 132, 132, (3, 3, 3), (1, 1, 1)),
    ("e3a", (32, 56, 48), 132, 264, (3, 3, 3), (2, 2, 2)),
    ("e3b", (16, 28, 24), 264, 264, (3, 3, 3), (1, 1, 1)),
    ("e4a", (16, 28, 24), 264, 324, (3, 3, 3), (2, 2, 2)),
    ("e4b", (8, 14, 12), 324, 324, (3, 3, 3), (1, 1, 1)),
    ("e5a", (8, 14, 12), 324, 324, (3, 3, 3), (2, 2, 2)),
    ("e5b", (4, 7, 6), 324, 324, (3, 3, 3), (1, 1, 1)),
    # decoder convs after skip concat: 2C -> C at each resolution
    ("d4", (8, 14, 12), 648, 324, (3, 3, 3), (1, 1, 1)),
    ("d3", (16, 28, 24), 528, 264, (3, 3, 3), (1, 1, 1)),
    ("d2", (32, 56, 48), 264, 132, (3, 3, 3), (1, 1, 1)),
    ("d1", (64, 112, 96), 132, 66, (3, 3, 3), (1, 1, 1)),
    ("d0", (64, 224, 192), 66, 33, (1, 3, 3), (1, 1, 1)),
]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else None
    total = 0.0
    for row in CONVS:
        if which and row[0] != which:
            continue
        dt = bench_one(*row)
        total += (dt or 0) * 2  # each appears ~2x per fwd (a+b pairs approx)
        for pad_to in (64, 128):
            bench_one(*row, pad_to=pad_to)
    print(f"~sum x2: {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()