"""Experiment: Pallas im2col conv kernel vs XLA conv at NexToU shapes.

XLA's TPU convolutions run at 5-20% of roofline at NexToU's odd channel
counts (tools/bench_convs.py). This prototypes a Pallas kernel: per grid
step, DMA an input slab (with halo) into VMEM, build the im2col patch
matrix, and issue ONE MXU matmul with K = taps*C (vs K=C for tap-wise
accumulation — the difference between ~7% and ~20-40% MXU utilization at
C=33..66).

Layout trick: the input is reshaped to (N, D, H, W*C) OUTSIDE the kernel.
With channels minor, the W-axis im2col window for tap kw is just the flat
lane slice [kw*C : kw*C + Wo*C] — contiguous, no strided gather; stride-2
axes use an even/odd phase reshape instead of strided slices. This also
keeps the DMA minor dim large (W*C), which Mosaic requires to be
tile-aligned when slicing.

Usage: python tools/exp_conv_kernel.py [check|bench]
"""

import functools
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextou_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _conv_kernel(
    x_hbm, w_ref, out_ref, slab, patches, sem,
    *, kd, kh, kw, sd, sh, sw, TH, TH_in, Wo, C, Co, W_p
):
    n = pl.program_id(0)
    do = pl.program_id(1)
    ht = pl.program_id(2)
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(do * sd, kd), pl.ds(ht * TH * sh, TH_in)],
        slab,
        sem,
    )
    dma.start()
    dma.wait()
    x = slab[...]  # (kd, TH_in, W_p*C)
    t = 0
    for kdi in range(kd):
        for khi in range(kh):
            if sh == 1:
                rows = x[kdi, khi : khi + TH]
            else:  # even/odd phase pick, no strided slice
                rows = x[kdi].reshape(TH_in // 2, 2 * W_p * C)[
                    khi // 2 : khi // 2 + TH,
                    (khi % 2) * W_p * C : ((khi % 2) + 1) * W_p * C,
                ]
            for kwi in range(kw):
                if sw == 1:
                    win = rows[:, kwi * C : kwi * C + Wo * C]
                else:
                    win = rows.reshape(TH, W_p // 2, 2 * C)[
                        :, kwi // 2 : kwi // 2 + Wo,
                        (kwi % 2) * C : (kwi % 2) * C + C,
                    ].reshape(TH, Wo * C)
                patches[:, :, t * C : (t + 1) * C] = win.reshape(TH, Wo, C)
                t += 1
    p = patches[...].reshape(TH * Wo, kd * kh * kw * C)
    y = jax.lax.dot_general(
        p,
        w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = y.reshape(1, 1, TH, Wo, Co).astype(out_ref.dtype)


def pallas_conv(x, w, stride, TH=None):
    """x (N, D, H, W, C) channels-last, w (kd, kh, kw, C, Co),
    symmetric (k-1)//2 padding. Returns (N, Do, Ho, Wo, Co)."""
    N, D, H, W, C = x.shape
    kd, kh, kw, _, Co = w.shape
    sd, sh, sw = stride
    Do, Ho, Wo = D // sd, H // sh, W // sw
    if TH is None:
        TH = max(1, min(Ho, 2048 // Wo))
        while Ho % TH:
            TH -= 1
    TH_in = (TH - 1) * sh + kh
    if sh == 2 and TH_in % 2:
        TH_in += 1
    # left-pad by (k-1)//2; right-pad so every slab DMA slice is in range
    need_d = (Do - 1) * sd + kd
    need_h = (Ho // TH - 1) * TH * sh + TH_in
    need_w = (Wo - 1) * sw + kw
    pd, ph, pw = (kd - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pd, max(0, need_d - D - pd)),
            (ph, max(0, need_h - H - ph)),
            (pw, max(0, need_w - W - pw)),
            (0, 0),
        ),
    )
    W_p = xp.shape[3]
    if sw == 2 and W_p % 2:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))
        W_p += 1
    xp = xp.reshape(N, xp.shape[1], xp.shape[2], W_p * C)
    wmat = w.reshape(kd * kh * kw * C, Co)
    grid = (N, Do, Ho // TH)
    kern = functools.partial(
        _conv_kernel,
        kd=kd, kh=kh, kw=kw, sd=sd, sh=sh, sw=sw,
        TH=TH, TH_in=TH_in, Wo=Wo, C=C, Co=Co, W_p=W_p,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (kd * kh * kw * C, Co),
                lambda n, d, h: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TH, Wo, Co), lambda n, d, h: (n, d, h, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((N, Do, Ho, Wo, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((kd, TH_in, W_p * C), x.dtype),
            pltpu.VMEM((TH, Wo, kd * kh * kw * C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Do * Ho * Wo * kd * kh * kw * C * Co,
            bytes_accessed=xp.size * x.dtype.itemsize
            + N * Do * Ho * Wo * Co * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wmat)


def xla_conv(x, w, stride):
    dn = ("NDHWC", "DHWIO", "NDHWC")
    pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3])
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad, dimension_numbers=dn
    )


CASES = [
    # name, (N,D,H,W,C), Co, kernel, stride
    ("e0b", (128, 1, 224, 192, 33), 33, (1, 3, 3), (1, 1, 1)),
    ("e1a", (2, 64, 224, 192, 33), 66, (3, 3, 3), (1, 2, 2)),
    ("e1b", (2, 64, 112, 96, 66), 66, (3, 3, 3), (1, 1, 1)),
    ("e2a", (2, 64, 112, 96, 66), 132, (3, 3, 3), (2, 2, 2)),
    ("e2b", (2, 32, 56, 48, 132), 132, (3, 3, 3), (1, 1, 1)),
    ("d4", (2, 8, 14, 12, 648), 324, (3, 3, 3), (1, 1, 1)),
    ("d0", (128, 1, 224, 192, 66), 33, (1, 3, 3), (1, 1, 1)),
]


def check():
    rng = np.random.default_rng(0)
    for name, shape, co, k, s in CASES:
        small = (2, 8 if shape[1] > 1 else 1, 16, 12, shape[4])
        x = jnp.asarray(rng.standard_normal(small), jnp.float32)
        w = jnp.asarray(rng.standard_normal((*k, shape[4], co)) * 0.1, jnp.float32)
        want = xla_conv(x, w, s)
        got = pallas_conv(x, w, s)
        err = float(jnp.max(jnp.abs(want - got)))
        scale = float(jnp.max(jnp.abs(want)))
        print(f"{name}: shape {small} max err {err:.2e} (scale {scale:.1f})", flush=True)
        assert err < 1e-3 * max(scale, 1), name


def bench():
    from nextou_tpu.utils.timing import device_loop_time

    for name, shape, co, k, s in CASES:
        x = jnp.zeros(shape, jnp.bfloat16)
        w = jnp.zeros((*k, shape[4], co), jnp.bfloat16)
        flops = 2 * np.prod(shape) / np.prod(s) * np.prod(k) * co
        variants = [
            ("banded", lambda x: banded_conv(x, w, s)),
            ("xla", lambda x: xla_conv(x, w, s)),
        ]
        if "--pallas" in sys.argv:
            variants.insert(0, ("pallas", lambda x: pallas_conv(x, w, s)))
        for label, fn in variants:
            try:
                f = jax.jit(fn)
                dt = device_loop_time(f, x, n_small=1, n_large=9, repeats=1)
                print(
                    f"{name} {label}: {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TF/s",
                    flush=True,
                )
            except Exception as e:
                print(f"{name} {label}: FAILED {type(e).__name__}: {e}", flush=True)


# ---------------------------------------------------------------------------
# Banded-matmul conv in PURE XLA: tile the W axis; per (kd, kh) tap-row,
# matmul flat (rows, (TW*sw+kw-1)*C) windows against a banded weight matrix
# ((TW*sw+kw-1)*C, TW*Co) built host-side from w. K and N become ~tile-
# aligned regardless of odd C/Co; the waste factor (band sparsity) is
# (K_pad*N_pad)/(TW*Co*kw*C), typically 3-6x, which still beats XLA's native
# conv by 2-4x at NexToU's shapes.
# ---------------------------------------------------------------------------


def _band_matrix(w_kh, TW, sw, kw, C, Co, dtype):
    """w_kh: (kw, C, Co) -> banded ((TW*sw + kw - 1)*C, TW*Co)."""
    KW = (TW - 1) * sw + kw
    band = np.zeros((KW, C, TW, Co), np.float32)
    wnp = np.asarray(w_kh, np.float32)
    for t in range(TW):
        band[t * sw : t * sw + kw, :, t, :] = wnp
    return jnp.asarray(band.reshape(KW * C, TW * Co), dtype)


def banded_conv(x, w, stride, TW=None):
    """Same contract as pallas_conv, implemented as XLA banded matmuls."""
    N, D, H, W, C = x.shape
    kd, kh, kw, _, Co = w.shape
    sd, sh, sw = stride
    Do, Ho, Wo = D // sd, H // sh, W // sw
    if TW is None:
        TW = 8 if C * 10 <= 512 else 4
        while Wo % TW:
            TW //= 2
    KW = (TW - 1) * sw + kw
    pd, ph, pw = (kd - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    need_w = (Wo // TW - 1) * TW * sw + KW
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pd, max(0, (Do - 1) * sd + kd - D - pd)),
            (ph, max(0, (Ho - 1) * sh + kh - H - ph)),
            (pw, max(0, need_w - W - pw)),
            (0, 0),
        ),
    )
    D_p, H_p, W_p = xp.shape[1:4]
    xf = xp.reshape(N, D_p, H_p, W_p * C)
    nW = Wo // TW
    acc = None
    for kdi in range(kd):
        for khi in range(kh):
            # rows for this tap-plane: (N, Do, Ho, W_p*C)
            rows = jax.lax.slice(
                xf,
                (0, kdi, khi, 0),
                (N, kdi + (Do - 1) * sd + 1, khi + (Ho - 1) * sh + 1, W_p * C),
                (1, sd, sh, 1),
            )
            band = _band_matrix_jnp(w[kdi, khi], TW, sw, kw, C, Co, x.dtype)
            # windows: (N, Do, Ho, nW, KW*C) via gather-free strided slices
            wins = [
                jax.lax.slice_in_dim(rows, i * TW * sw * C, i * TW * sw * C + KW * C, axis=3)
                for i in range(nW)
            ]
            wins = jnp.stack(wins, axis=3)
            part = jax.lax.dot_general(
                wins,
                band,
                (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (N, Do, Ho, nW, TW*Co)
            acc = part if acc is None else acc + part
    y = acc.reshape(N, Do, Ho, Wo, Co).astype(x.dtype)
    return y





def _band_matrix_jnp(w_kh, TW, sw, kw, C, Co, dtype):
    """Trace-safe band build: (kw, C, Co) -> ((TW-1)*sw+kw)*C x TW*Co."""
    KW = (TW - 1) * sw + kw
    band = jnp.zeros((KW, C, TW, Co), jnp.float32)
    for t in range(TW):
        band = band.at[t * sw : t * sw + kw, :, t, :].set(
            w_kh.astype(jnp.float32)
        )
    return band.reshape(KW * C, TW * Co).astype(dtype)


def decomposed3d_conv(x, w, stride):
    """(kd,3,3) conv = sum over kd of D-shifted folded-2D (3,3) convs.

    Each term folds (N, D) into the batch and runs XLA's fast 2D conv path
    (~38-43 TF/s vs ~13-15 TF/s for the rank-5 3D lowering)."""
    N, D, H, W, C = x.shape
    kd, kh, kw, _, Co = w.shape
    sd, sh, sw = stride
    Do, Ho, Wo = D // sd, H // sh, W // sw
    pd = (kd - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pd, pd + (kd - 1 - 2 * pd)), (0, 0), (0, 0), (0, 0)))
    acc = None
    pad2 = tuple(((k - 1) // 2, (k - 1) // 2) for k in (kh, kw))
    for kdi in range(kd):
        planes = jax.lax.slice_in_dim(xp, kdi, kdi + (Do - 1) * sd + 1, stride=sd, axis=1)
        x2 = planes.reshape(N * Do, H, W, C)
        y2 = jax.lax.conv_general_dilated(
            x2, w[kdi], window_strides=(sh, sw), padding=pad2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        acc = y2 if acc is None else acc + y2
    return acc.reshape(N, Do, Ho, Wo, Co).astype(x.dtype)


def bench2():
    from nextou_tpu.utils.timing import device_loop_time

    cases = [c for c in CASES if c[3] == (3, 3, 3)] + [
        ("d1", (2, 64, 112, 96, 132), 66, (3, 3, 3), (1, 1, 1)),
        ("d2", (2, 32, 56, 48, 264), 132, (3, 3, 3), (1, 1, 1)),
    ]
    for name, shape, co, k, s in cases:
        x = jnp.zeros(shape, jnp.bfloat16)
        w = jnp.zeros((*k, shape[4], co), jnp.bfloat16)
        flops = 2 * np.prod(shape) / np.prod(s) * np.prod(k) * co
        for label, fn in (
            ("dec2d", lambda x: decomposed3d_conv(x, w, s)),
            ("xla", lambda x: xla_conv(x, w, s)),
        ):
            try:
                f = jax.jit(fn)
                dt = device_loop_time(f, x, n_small=1, n_large=9, repeats=1)
                print(f"{name} {label}: {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name} {label}: FAILED {type(e).__name__}: {e}", flush=True)





# ---------------------------------------------------------------------------
# csub_conv: Pallas conv with C on sublanes. Input pre-transposed to
# (N, D_p, H_p*C, W_p) so DMA slices stay legal; im2col assembled as
# pat (K, TH*W) via 2D sublane/lane-offset stores (probed legal); one MXU
# matmul per grid step with K = kd*kh*kw*C.  Stride-1 only (the strided
# convs go through other paths).
# ---------------------------------------------------------------------------


def _csub_kernel(x_hbm, w_ref, out_ref, slab, pat, sem, *, kd, kh, kw, TH, C, Co, W_p, Wo):
    n = pl.program_id(0)
    do = pl.program_id(1)
    ht = pl.program_id(2)
    TH_in = TH + kh - 1
    rows8 = -(-(TH_in * C) // 8) * 8  # DMA length 8-row aligned
    copies = [
        pltpu.make_async_copy(
            x_hbm.at[n, do + kdi, pl.ds(ht * TH * C, rows8)],
            slab.at[kdi],
            sem,
        )
        for kdi in range(kd)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    x = slab[:, : TH_in * C, :].reshape(kd, TH_in, C, W_p)
    t = 0
    for kdi in range(kd):
        for khi in range(kh):
            for kwi in range(kw):
                for h in range(TH):
                    pat[t * C : (t + 1) * C, h * Wo : (h + 1) * Wo] = x[
                        kdi, khi + h, :, kwi : kwi + Wo
                    ]
                t += 1
    y = jax.lax.dot_general(
        pat[...],
        w_ref[...],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TH*Wo, Co)
    out_ref[...] = y.reshape(1, 1, TH, Wo, Co).astype(out_ref.dtype)


def csub_conv(x, w, TH=None):
    """Stride-1 conv, x (N,D,H,W,C) channels-last, w (kd,kh,kw,C,Co)."""
    N, D, H, W, C = x.shape
    kd, kh, kw, _, Co = w.shape
    pd, ph, pw = (kd - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    xt = jnp.pad(
        x.transpose(0, 1, 2, 4, 3),  # (N, D, H, C, W)
        ((0, 0), (pd, kd - 1 - pd), (ph, kh - 1 - ph), (0, 0), (pw, kw - 1 - pw)),
    )
    D_p, H_p = xt.shape[1], xt.shape[2]
    W_p = xt.shape[4]
    # Mosaic DMA: sliced copies need a tile-aligned (128-multiple) minor dim
    W_pp = -(-W_p // 128) * 128
    if W_pp != W_p:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, 0), (0, W_pp - W_p)))
        W_p = W_pp
    xt = xt.reshape(N, D_p, H_p * C, W_p)
    if TH is None:
        TH = max(1, min(H, 6 * 1024 * 1024 // (kd * kh * kw * C * W_p * 2)))
        # DMA offsets ht*TH*C must land on 8-row boundaries
        while H % TH or (TH * C) % 8:
            TH -= 1
            if TH == 0:
                TH = H  # fall back: single tile (offset 0 always aligned)
                break
    wmat = w.reshape(kd * kh * kw * C, Co)
    K = kd * kh * kw * C
    TH_in = TH + kh - 1
    rows8 = -(-(TH_in * C) // 8) * 8
    # make sure the last tile's (aligned) DMA stays in range
    total_rows = (H // TH - 1) * TH * C + rows8
    if total_rows > H_p * C:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, total_rows - H_p * C), (0, 0)))
    y = pl.pallas_call(
        functools.partial(
            _csub_kernel, kd=kd, kh=kh, kw=kw, TH=TH, C=C, Co=Co, W_p=W_p, Wo=W
        ),
        interpret=bool(int(os.environ.get("CSUB_INTERPRET", "0"))),
        grid=(N, D, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((K, Co), lambda n, d, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TH, W, Co), lambda n, d, h: (n, d, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((kd, rows8, W_p), x.dtype),
            pltpu.VMEM((K, TH * W), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * H * W * K * Co,
            bytes_accessed=2 * xt.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xt, wmat)
    return y


def check3():
    rng = np.random.default_rng(0)
    for k in [(3, 3, 3), (1, 3, 3)]:
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 12, 5)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((*k, 5, 4)) * 0.1, jnp.float32)
        want = xla_conv(x, w, (1, 1, 1))
        got = csub_conv(x, w)
        err = float(jnp.max(jnp.abs(want - got)))
        print(f"csub {k}: max err {err:.2e}", flush=True)
        assert err < 5e-2, k


def bench3():
    from nextou_tpu.utils.timing import device_loop_time

    cases = [
        ("e1b", (2, 64, 112, 96, 66), 66, (3, 3, 3)),
        ("e2b", (2, 32, 56, 48, 132), 132, (3, 3, 3)),
        ("d1", (2, 64, 112, 96, 132), 66, (3, 3, 3)),
        ("d2", (2, 32, 56, 48, 264), 132, (3, 3, 3)),
        ("d3", (2, 16, 28, 24, 528), 264, (3, 3, 3)),
        ("e0b", (128, 1, 224, 192, 33), 33, (1, 3, 3)),
    ]
    for name, shape, co, k in cases:
        x = jnp.zeros(shape, jnp.bfloat16)
        w = jnp.zeros((*k, shape[4], co), jnp.bfloat16)
        flops = 2 * np.prod(shape) * np.prod(k) * co
        for label, fn in (
            ("csub", lambda x: csub_conv(x, w)),
            ("xla", lambda x: xla_conv(x, w, (1, 1, 1))),
        ):
            try:
                f = jax.jit(fn)
                dt = device_loop_time(f, x, n_small=1, n_large=9, repeats=1)
                print(f"{name} {label}: {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name} {label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    {"check": check, "bench": bench, "bench2": bench2, "bench3": bench3, "check3": check3}[mode]()
