"""Experiment: polyphase decomposition of the worst-lowered strided convs.

A stride-2 k=3 pad-1 conv axis reads x[2i + t - 1], t in {0,1,2}. Splitting
x into even/odd phases turns the op into a SUM of stride-1 convs, one per
phase combination, with no zero-padded weights (unlike the s2d single-conv
form, exp_conv_s2d.py, which was 27/64 dense and lost):

    out[i] = w[1] * x_e[i]  +  (w[0], w[2]) *conv* x_o   (kernel 2, pad (1,0))

Per strided axis the even phase keeps 1 tap, the odd phase 2 taps: total
taps preserved (3 = 1 + 2), FLOPs identical. Every resulting conv is
stride-1 — XLA's good TPU lowering (37-48 TF/s, PERF.md) vs 12-15 TF/s for
the strided originals. Cost: the phase slices (strided relayout reads).

Checks exactness vs lax.conv, then benches the flagship's strided convs.

Run on TPU: python tools/exp_conv_phase.py
"""

import itertools
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


def phase_conv(x, w, stride):
    """Sum of per-phase stride-1 convs. Only k==3/s==2 (pad 1) and s==1 axes."""
    ks = w.shape[:3]
    # per axis: list of (phase, taps, pad) entries
    per_axis = []
    for k, s in zip(ks, stride):
        if s == 1:
            per_axis.append([(None, list(range(k)), ((k - 1) // 2,) * 2)])
        else:
            assert k == 3 and s == 2, (k, s)
            per_axis.append([
                (0, [1], (0, 0)),        # even phase: center tap only
                (1, [0, 2], (1, 0)),     # odd phase: outer taps, left pad
            ])
    out = None
    for combo in itertools.product(*per_axis):
        sl = tuple(
            slice(None) if ph is None else slice(ph, None, 2)
            for ph, _, _ in combo
        )
        xp = x[(slice(None), *sl, slice(None))]
        wp = w[np.ix_(*[taps for _, taps, _ in combo])]
        pads = [p for _, _, p in combo]
        y = jax.lax.conv_general_dilated(
            xp, wp, (1, 1, 1), pads, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
        )
        out = y if out is None else out + y
    return out


B = 2
CASES = [
    ("e1a", (64, 224, 192), 33, 66, (1, 2, 2)),
    ("e2a", (64, 112, 96), 66, 132, (2, 2, 2)),
    ("e3a", (32, 56, 48), 132, 264, (2, 2, 2)),
    ("e4a", (16, 28, 24), 264, 324, (2, 2, 2)),
]


def main():
    # exactness (small case, CPU-friendly shapes still run on TPU fine)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 12, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 7)), jnp.float32)
    for stride in [(1, 2, 2), (2, 2, 2)]:
        ref = conv_ref(x, w, stride)
        got = phase_conv(x, w, stride)
        err = float(jnp.abs(ref - got).max())
        print(f"exactness s{stride}: shape {got.shape} vs {ref.shape}, "
              f"max err {err:.2e}", flush=True)
        assert got.shape == ref.shape

    for name, in_shape, cin, cout, stride in CASES:
        x = jnp.asarray(
            rng.standard_normal((B, *in_shape, cin)), jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        fr = jax.jit(lambda x, w=w, s=stride: conv_ref(x, w, s))
        fp = jax.jit(lambda x, w=w, s=stride: phase_conv(x, w, s))
        tr = device_loop_time(fr, x, n_small=2, n_large=20, repeats=2)
        tp = device_loop_time(fp, x, n_small=2, n_large=20, repeats=2)
        out_vox = np.prod([s // st for s, st in zip(in_shape, stride)])
        flops = 2 * B * out_vox * 27 * cin * cout
        print(
            f"{name} {in_shape} {cin}->{cout} s{stride}: native {tr*1e3:6.2f} ms"
            f" ({flops/tr/1e12:5.1f} TF/s) | phase {tp*1e3:6.2f} ms"
            f" ({flops/tp/1e12:5.1f} TF/s)  [{tr/max(tp,1e-9):.2f}x]",
            flush=True,
        )


if __name__ == "__main__":
    main()