"""Tap-list Pallas conv kernel (kernels/conv.py) parity vs XLA conv, in
interpret mode on CPU. Covers stride-1 and s2d-folded strided geometry,
chunked assembly, the channels-last wrapper, and the custom-vjp gradients
(backward must be exactly XLA's conv vjp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nextou_tpu.kernels.conv import (
    _xla_conv,
    pallas_conv,
    pallas_conv_wins,
)


CASES = [
    # B, spatial, C, Co, kernel, strides, n_chunks
    (1, (4, 16, 120), 5, 7, (3, 3, 3), (1, 1, 1), 0),
    (1, (4, 16, 120), 5, 7, (3, 3, 3), (1, 1, 1), -1),  # zero-copy
    (1, (4, 16, 120), 5, 7, (3, 3, 3), (1, 1, 1), -2),  # output-roll
    (2, (3, 8, 126), 33, 33, (1, 3, 3), (1, 1, 1), 3),
    (1, (4, 32, 64), 9, 8, (3, 3, 3), (1, 2, 2), 0),
    (1, (8, 16, 32), 7, 10, (3, 3, 3), (2, 2, 2), 3),
]


@pytest.mark.parametrize("B,sp,C,Co,ks,st,nc", CASES)
def test_pallas_conv_matches_xla(B, sp, C, Co, ks, st, nc):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, *sp, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((*ks, C, Co)) * 0.1, jnp.float32)
    want = _xla_conv(x, w, st)
    got = pallas_conv(x, w, st, nc, True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=1e-3
    )


def test_pallas_conv_grads_are_xla_grads():
    """The custom vjp routes backward through jax.vjp of the XLA conv —
    gradients must be bit-identical to differentiating the XLA conv."""
    rng = np.random.default_rng(1)
    st = (1, 2, 2)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 64, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 6)) * 0.1, jnp.float32)

    def loss_pallas(x, w):
        y = pallas_conv(x, w, st, 0, True)
        return jnp.sum(jnp.sin(y))

    def loss_xla(x, w):
        return jnp.sum(jnp.sin(_xla_conv(x, w, st)))

    gx_p, gw_p = jax.grad(loss_pallas, (0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_xla, (0, 1))(x, w)
    # forward (hence sin'(y)) differs by kernel rounding at ~1e-6; the
    # vjp structure itself is identical
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=0, atol=1e-4)


def test_dispatch_policy_flagship_table():
    """The measured win table (PERF.md): strided e1a/e2a and decoder d1/e1b
    route to Pallas; (1,3,3) stages, deep stages, and tiny spatials stay
    on XLA."""
    assert pallas_conv_wins((64, 192, 224), 33, 66, (3, 3, 3), (1, 2, 2))
    assert pallas_conv_wins((64, 96, 112), 66, 132, (3, 3, 3), (2, 2, 2))
    assert pallas_conv_wins((64, 96, 112), 132, 66, (3, 3, 3), (1, 1, 1))
    assert pallas_conv_wins((64, 96, 112), 66, 66, (3, 3, 3), (1, 1, 1))
    # FoldedConv territory
    assert not pallas_conv_wins((64, 192, 224), 33, 33, (1, 3, 3), (1, 1, 1))
    # deep small-spatial: XLA wins outright
    assert not pallas_conv_wins((16, 24, 28), 264, 264, (3, 3, 3), (1, 1, 1))
    assert not pallas_conv_wins((32, 48, 56), 264, 132, (3, 3, 3), (1, 1, 1))
    # odd geometry must fall back
    assert not pallas_conv_wins((5, 7, 6), 324, 324, (3, 3, 3), (1, 1, 1))
