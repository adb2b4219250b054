"""Experiment: space-to-depth phase form for the worst-lowered strided convs.

A stride-2 k=3 pad-1 conv axis reads input index 2i+t-1, t in {0,1,2}.
Splitting the axis into even/odd phases (ph[p, phi] = x[2p+phi]) turns it
into a k=2 stride-1 conv over phase-stacked channels:

    out[i] = w[1]*ph0[i] + w[0]*ph1[i-1] + w[2]*ph1[i]

i.e. new taps at offsets {-1, 0} (left pad 1), with per-(tap, phase) weights
scattered from the original taps: t=0 -> (tap 0, phi 1), t=1 -> (tap 1,
phi 0), t=2 -> (tap 1, phi 1). Benefits on TPU: the conv becomes stride-1
(XLA's good lowering, PERF.md: 37-48 TF/s vs 12-15 for the strided forms)
with input channels multiplied by the phase count (33*4=132, 66*8=528 —
lane-friendly). Cost: the s2d reshape/transpose of the input.

Checks exactness vs lax.conv first, then benches the three big strided
encoder convs of the flagship.

Run on TPU: python tools/exp_conv_s2d.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from nextou_tpu.utils.timing import device_loop_time


def conv_ref(x, w, stride):
    pads = [((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3]]
    return jax.lax.conv_general_dilated(
        x, w, stride, pads, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


def s2d_weights(w, stride):
    """Scatter (kd,kh,kw,C,O) taps into the phase form's weight tensor."""
    ks = w.shape[:3]
    C, O = w.shape[3], w.shape[4]
    phases = [2 if s == 2 else 1 for s in stride]
    P = int(np.prod(phases))
    new_ks = [2 if s == 2 else k for s, k in zip(stride, ks)]
    wn = np.zeros((*new_ks, P * C, O), np.float32)
    w = np.asarray(w, np.float32)
    for td in range(ks[0]):
        for th in range(ks[1]):
            for tw in range(ks[2]):
                taps, phis = [], []
                for ax, t in zip(range(3), (td, th, tw)):
                    if stride[ax] == 2:
                        # t=0 -> (tap 0, phi 1); t=1 -> (tap 1, phi 0);
                        # t=2 -> (tap 1, phi 1)
                        taps.append(0 if t == 0 else 1)
                        phis.append(1 if t != 1 else 0)
                    else:
                        taps.append(t)
                        phis.append(0)
                phi_flat = 0
                for ax in range(3):
                    if stride[ax] == 2:
                        phi_flat = phi_flat * 2 + phis[ax]
                wn[taps[0], taps[1], taps[2],
                   phi_flat * C:(phi_flat + 1) * C, :] += w[td, th, tw]
    return jnp.asarray(wn)


def s2d_input(x, stride):
    """(B, D, H, W, C) -> (B, D', H', W', P*C) with phases flattened
    row-major over strided axes (matching s2d_weights)."""
    B = x.shape[0]
    C = x.shape[-1]
    sp = x.shape[1:4]
    shape = [B]
    perm_src = []
    for ax in range(3):
        if stride[ax] == 2:
            shape += [sp[ax] // 2, 2]
        else:
            shape += [sp[ax]]
    shape += [C]
    x = x.reshape(shape)
    # bring phase dims (after each strided spatial dim) to just before C
    dims = list(range(len(shape)))
    phase_dims = []
    keep = [0]
    i = 1
    for ax in range(3):
        keep.append(i)
        i += 1
        if stride[ax] == 2:
            phase_dims.append(i)
            i += 1
    x = x.transpose(*keep, *phase_dims, i)
    newsp = [sp[ax] // stride[ax] for ax in range(3)]
    P = 2 ** sum(1 for s in stride if s == 2)
    return x.reshape(B, *newsp, P * C)


def conv_s2d(x, w, stride):
    xs = s2d_input(x, stride)
    ws = s2d_weights(w, stride).astype(x.dtype)
    pads = []
    for ax in range(3):
        if stride[ax] == 2:
            pads.append((1, 0))
        else:
            k = w.shape[ax]
            pads.append(((k - 1) // 2, (k - 1) // 2))
    return jax.lax.conv_general_dilated(
        xs, ws, (1, 1, 1), pads, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


def check():
    rng = np.random.default_rng(0)
    for stride in [(1, 2, 2), (2, 2, 2)]:
        x = jnp.asarray(rng.standard_normal((1, 8, 12, 10, 5)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 7)) * 0.1, jnp.float32)
        a = np.asarray(conv_ref(x, w, stride))
        b = np.asarray(conv_s2d(x, w, stride))
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        print(f"stride {stride}: rel err {err:.2e}", flush=True)
        assert err < 1e-5, err


def bench():
    rng = np.random.default_rng(0)
    cases = [
        ("e1a 33->66 s(1,2,2)", (2, 64, 224, 192, 33), 66, (1, 2, 2)),
        ("e2a 66->132 s(2,2,2)", (2, 64, 112, 96, 66), 132, (2, 2, 2)),
        ("e3a 132->264 s(2,2,2)", (2, 32, 56, 48, 132), 264, (2, 2, 2)),
    ]
    for tag, xs, o, stride in cases:
        x = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, xs[-1], o)) * 0.1,
                        jnp.bfloat16)
        ws = s2d_weights(w, stride).astype(jnp.bfloat16)
        flops = 2 * np.prod(xs[:4]) / np.prod(stride) * 27 * xs[-1] * o
        t_ref = device_loop_time(lambda x: conv_ref(x, w, stride), x,
                                 n_small=2, n_large=20, repeats=2)
        t_s2d = device_loop_time(lambda x: conv_s2d(x, w, stride), x,
                                 n_small=2, n_large=20, repeats=2)

        # s2d with the transpose paid separately (pre-transformed input):
        xs2 = s2d_input(x, stride)
        pads = [(1, 0) if s == 2 else (1, 1) for s in stride]
        t_s2d_pre = device_loop_time(
            lambda xs2: jax.lax.conv_general_dilated(
                xs2, ws, (1, 1, 1), pads,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
            xs2, n_small=2, n_large=20, repeats=2)
        print(f"{tag}: ref {t_ref*1e3:6.2f} ms ({flops/t_ref/1e12:5.1f} TF/s)"
              f" | s2d {t_s2d*1e3:6.2f} ms ({flops/t_s2d/1e12:5.1f} TF/s)"
              f" | s2d-pre {t_s2d_pre*1e3:6.2f} ms"
              f" ({flops/t_s2d_pre/1e12:5.1f} TF/s)", flush=True)


check()
bench()
