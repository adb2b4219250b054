"""Transposed-conv lowering probe at flagship decoder shapes (TPU).

Every NexToU upsample is a ConvTranspose with kernel == stride (nnU-Net
protocol). That makes it algebraically a single matmul Cin -> prod(k)*Cout
followed by a pixel-shuffle (window merge): out has exactly one weight tap
per output voxel. This tool times XLA's native conv_transpose lowering
against the matmul+shuffle form at the five flagship decoder shapes to see
which one the compiler handles better (batch 2, bf16).
"""

import sys

sys.path.insert(0, "/root/repo")

import math

import jax
import jax.numpy as jnp
import numpy as np

from nextou_tpu.utils.cache import enable_compilation_cache
from nextou_tpu.utils.timing import device_loop_time

enable_compilation_cache()

B = 2
PEAK_TF = 197.0

# name, in_shape, cin, cout, stride(=kernel)
UPS = [
    ("u5", (4, 7, 6), 324, 324, (2, 2, 2)),
    ("u4", (8, 14, 12), 324, 264, (2, 2, 2)),
    ("u3", (16, 28, 24), 264, 132, (2, 2, 2)),
    ("u2", (32, 56, 48), 132, 66, (2, 2, 2)),
    ("u1", (64, 112, 96), 66, 33, (1, 2, 2)),
]


def native(x, w, stride):
    # flax ConvTranspose lowering: conv_transpose, NDHWC / DHWIO
    nd = len(stride)
    letters = "DHW"[-nd:]
    dn = (f"N{letters}C", f"{letters}IO", f"N{letters}C")
    return jax.lax.conv_transpose(
        x, w, strides=stride, padding="VALID", dimension_numbers=dn
    )


def shuffle(x, w2, stride):
    # x: (B, d, h, w, Cin) @ w2: (Cin, prod(k)*Cout) -> pixel shuffle
    b = x.shape[0]
    sp = x.shape[1:-1]
    cout = w2.shape[-1] // math.prod(stride)
    y = x @ w2  # (B, d, h, w, P*Cout)
    y = y.reshape(b, *sp, *stride, cout)
    # (B, d, h, w, kd, kh, kw, C) -> (B, d, kd, h, kh, w, kw, C)
    nd = len(sp)
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm.append(1 + 2 * nd)
    y = jnp.transpose(y, perm)
    out_sp = [s * k for s, k in zip(sp, stride)]
    return y.reshape(b, *out_sp, cout)


def main():
    for name, in_shape, cin, cout, stride in UPS:
        x = jnp.zeros((B, *in_shape, cin), jnp.bfloat16)
        w = jnp.zeros((*stride, cin, cout), jnp.bfloat16)
        w2 = jnp.zeros((cin, math.prod(stride) * cout), jnp.bfloat16)
        fn = jax.jit(lambda x, w=w, s=stride: native(x, w, s))
        fs = jax.jit(lambda x, w2=w2, s=stride: shuffle(x, w2, s))
        # check equivalence shape
        assert fn(x).shape == fs(x).shape, (fn(x).shape, fs(x).shape)
        tn = device_loop_time(fn, x, n_small=2, n_large=50, repeats=2)
        ts = device_loop_time(fs, x, n_small=2, n_large=50, repeats=2)
        tn, ts = max(tn, 1e-9), max(ts, 1e-9)
        flops = 2 * B * math.prod(in_shape) * cin * math.prod(stride) * cout
        print(
            f"{name} {in_shape} {cin}->{cout} s{stride}: native {tn*1e3:6.2f} ms"
            f" ({flops/tn/1e12:5.1f} TF/s) | matmul+shuffle {ts*1e3:6.2f} ms"
            f" ({flops/ts/1e12:5.1f} TF/s)  [{tn/ts:.2f}x]",
            flush=True,
        )


if __name__ == "__main__":
    main()