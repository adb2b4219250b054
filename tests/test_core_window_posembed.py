"""Window partition/reverse round-trips and positional-embedding parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from nextou_tpu.core import (
    window_partition,
    window_reverse,
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
    get_2d_relative_pos_embed,
    get_3d_relative_pos_embed,
    relative_pos_bias,
)
from nextou_tpu.core.resize import bicubic_resize_2d


def test_window_roundtrip_2d():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 6, 5)).astype(np.float32)
    w = window_partition(jnp.asarray(x), (4, 3))
    assert w.shape == (2 * 2 * 2, 4, 3, 5)
    back = window_reverse(w, (4, 3), (8, 6))
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_roundtrip_3d():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 6, 8, 3)).astype(np.float32)
    w = window_partition(jnp.asarray(x), (2, 3, 4))
    assert w.shape == (2 * 2 * 2 * 2, 2, 3, 4, 3)
    back = window_reverse(w, (2, 3, 4), (4, 6, 8))
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_partition_layout_3d():
    # window content must be the corresponding contiguous block
    S, H, W = 4, 4, 4
    x = np.arange(S * H * W, dtype=np.float32).reshape(1, S, H, W, 1)
    w = np.asarray(window_partition(jnp.asarray(x), (2, 2, 2)))
    # first window == x[:, :2, :2, :2]
    np.testing.assert_array_equal(w[0], x[0, :2, :2, :2])
    # window order is (s_blk, h_blk, w_blk) row-major: second window is w-shifted
    np.testing.assert_array_equal(w[1], x[0, :2, :2, 2:])


@pytest.mark.parametrize("dim,grid", [(8, 4), (12, 5)])
def test_pos_embed_2d_reference_parity(dim, grid):
    import sys

    sys.path.insert(0, "/root/reference/network_architecture")
    pos_embed = pytest.importorskip("pos_embed")
    np.testing.assert_allclose(
        get_2d_sincos_pos_embed(dim, grid),
        pos_embed.get_2d_sincos_pos_embed(dim, grid),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        get_2d_relative_pos_embed(dim, grid),
        pos_embed.get_2d_relative_pos_embed(dim, grid),
        atol=1e-12,
    )


@pytest.mark.parametrize("dim,grid", [(6, 3), (18, 4)])
def test_pos_embed_3d_reference_parity(dim, grid):
    import sys

    sys.path.insert(0, "/root/reference/network_architecture")
    pos_embed = pytest.importorskip("pos_embed")
    np.testing.assert_allclose(
        get_3d_sincos_pos_embed(dim, grid),
        pos_embed.get_3d_sincos_pos_embed(dim, grid),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        get_3d_relative_pos_embed(dim, grid),
        pos_embed.get_3d_relative_pos_embed(dim, grid),
        atol=1e-12,
    )


def test_bicubic_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((9, 9)).astype(np.float32)
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x)[None, None].double(),
            size=(13, 5),
            mode="bicubic",
            align_corners=False,
        )
        .numpy()
        .squeeze()
    )
    got = bicubic_resize_2d(x, (13, 5))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_relative_pos_bias_matches_reference_assembly():
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference/network_architecture")
    pos_embed = pytest.importorskip("pos_embed")

    channels, n, r = 12, 168, 2
    n_red = n // (r ** 3)
    rel = pos_embed.get_3d_relative_pos_embed(channels, int(n ** (1 / 3)))
    want = (
        -torch.nn.functional.interpolate(
            torch.from_numpy(np.float32(rel))[None, None],
            size=(n, n_red),
            mode="bicubic",
            align_corners=False,
        )
        .numpy()
        .squeeze()
    )
    got = relative_pos_bias(channels, n, n_red, spatial_dims=3)
    np.testing.assert_allclose(got, want, atol=1e-5)
