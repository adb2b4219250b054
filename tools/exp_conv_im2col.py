"""Experiment: explicit-im2col matmul form for the worst-lowered convs.

Hypothesis (from tools/bench_convs.py): XLA's TPU conv emitter runs the
full-res 33-channel (1,3,3) convs at ~9-10 TF/s because both the per-tap
contraction (C=33 padded to the lane granularity per tap) and the output
width (N=33 of 128 lanes) pad away ~93% of the MXU. An explicit im2col
(concat 9 shifted slices on channels -> one dot_general with contiguous
K=9*33=297) only pays the output-lane padding (~25 TF/s ceiling) plus the
patch-buffer traffic.

Variants, each checked for exactness vs lax.conv on a small shape first:
  xla     — lax.conv_general_dilated (the production FoldedConv lowering)
  im2col  — shifted-slice concat + single dot_general
  im2col_nhwc — same but patches assembled along W only (9 taps = 3x3)

Run on TPU: python tools/exp_conv_im2col.py
"""

import sys
import functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nextou_tpu.utils.timing import device_loop_time


def conv_xla(x, w):
    # x (B, H, W, C), w (kh, kw, C, O), stride 1, symmetric pad 1
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_im2col(x, w):
    B, H, W, C = x.shape
    kh, kw, _, O = w.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    cols = [
        xp[:, i : i + H, j : j + W, :] for i in range(kh) for j in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B, H, W, kh*kw*C)
    return jax.lax.dot_general(
        patches,
        w.reshape(kh * kw * C, O),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv_im2col_rows(x, w):
    # assemble the 3 W-taps once (cheap, reused by H-taps via row shifts)
    B, H, W, C = x.shape
    kh, kw, _, O = w.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    rows = jnp.concatenate(
        [xp[:, :, j : j + W, :] for j in range(kw)], axis=-1
    )  # (B, H+2ph, W, kw*C)
    patches = jnp.concatenate(
        [rows[:, i : i + H] for i in range(kh)], axis=-1
    )  # (B, H, W, kh*kw*C)
    return jax.lax.dot_general(
        patches,
        w.reshape(kh, kw, C, O).transpose(0, 1, 2, 3).reshape(kh * kw * C, O),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def check():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    a = conv_xla(x, w)
    for f in (conv_im2col, conv_im2col_rows):
        b = f(x, w)
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-3, (f.__name__, err)
    print("exactness ok", flush=True)


def bench_case(name, B, H, W, C, O):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, O)), jnp.bfloat16)
    flops = 2 * B * H * W * 9 * C * O
    for f in (conv_xla, conv_im2col, conv_im2col_rows):
        dt = device_loop_time(lambda x: f(x, w), x, n_small=2, n_large=12, repeats=2)
        print(
            f"{name} {f.__name__}: {dt*1e3:7.2f} ms  {flops/dt/1e12:5.1f} TF/s",
            flush=True,
        )


def main():
    check()
    # e0b-class: folded (1,3,3) conv at full res, batch 2 -> B=128 images
    bench_case("e0b 33->33 (128,224,192)", 128, 224, 192, 33, 33)
    # d0-class: decoder full-res convs
    bench_case("d0a 66->33 (128,224,192)", 128, 224, 192, 66, 33)
    # d1-class folded depth: 132->66 at (64,112,96) folded -> B=128? d1 is
    # (3,3,3); skip here (im2col form targets the folded 2D convs).


if __name__ == "__main__":
    main()