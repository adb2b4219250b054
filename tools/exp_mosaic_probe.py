"""Probe which Mosaic ops the conv kernel design needs are supported:

P1: value reshape splitting a NON-minor dim: (TH_in*C, W) -> (TH_in, C, W)
P2: store at a sublane (second-minor) offset: pat[:, t*C:(t+1)*C, :] = v
P3: loop of 2D dots from a 3D ref: dot(pat[h], wmat)
P4: in-kernel 2D transpose (Wo, Co) -> (Co, Wo)
P5: lane slice at arbitrary offset feeding a store
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, C, W, Co = 4, 33, 256, 33
K = 3 * C


def kern(x_ref, w_ref, out_ref, pat, *, transpose_out):
    x = x_ref[...]  # (TH_in*C, W) with TH_in = TH+2
    x3 = x.reshape(TH + 2, C, W)  # P1
    for khi in range(3):
        rows = x3[khi : khi + TH]  # (TH, C, W)
        win = rows[:, :, 5 : 5 + W - 8]  # P5 arbitrary lane offset
        win = rows  # keep full W for shape simplicity
        pat[:, khi * C : (khi + 1) * C, :] = win  # P2
    for h in range(TH):
        y = jax.lax.dot_general(
            pat[h],  # (K, W)
            w_ref[...],  # (K, Co)
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W, Co)
        if transpose_out:
            out_ref[h] = y.T.astype(out_ref.dtype)  # P4 -> (Co, W)
        else:
            out_ref[h] = y.astype(out_ref.dtype)


def run(transpose_out):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(((TH + 2) * C, W)), jnp.float32
    )
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((K, Co)) * 0.1, jnp.float32
    )
    out_shape = (TH, Co, W) if transpose_out else (TH, W, Co)
    y = pl.pallas_call(
        lambda a, b, o, p: kern(a, b, o, p, transpose_out=transpose_out),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TH, K, W), jnp.float32)],
    )(x, w)
    # oracle
    x3 = np.asarray(x).reshape(TH + 2, C, W)
    pat = np.concatenate([x3[k : k + TH] for k in range(3)], axis=1)
    want = np.einsum("hkw,ko->hwo", pat, np.asarray(w))
    got = np.asarray(y)
    if transpose_out:
        got = got.transpose(0, 2, 1)
    err = np.max(np.abs(got - want))
    print(f"transpose_out={transpose_out}: max err {err:.2e}")
    assert err < 5e-2  # TPU f32 matmul defaults to bf16 precision


if __name__ == "__main__":
    run(False)
    run(True)
    print("ALL PROBES PASS")
