"""Topological Interaction (TI) and Binary TI (BTI) losses.

Re-implementation of the reference's critical-voxel algorithm
(``/root/reference/loss/ti_loss.py`` and ``bti_loss.py`` — identical control
flow; BTI generalizes scalar class labels to label *sets* via set membership,
``bti_loss.py:90-98``). Both are expressed by one spec here: a TI interaction
is just a BTI interaction with singleton label sets.

Algorithm per interaction ``(type, A, C)`` (``bti_loss.py:76-117``):
  1. discrete map ``P = argmax softmax(logits)``;
  2. ``mask_A = P ∈ A``; inclusion: ``mask_C = ¬(P∈C ∪ mask_A)``,
     exclusion: ``mask_C = P ∈ C``;
  3. dilate both by the connectivity kernel (conv + threshold >= 1);
  4. critical = (dilate(C) ∧ A) ∨ (dilate(A) ∧ C); OR-accumulate.
Loss = per-voxel CE masked by the critical map, summed over space, meaned
over batch (``bti_loss.py:141-143``).

Deviation from the reference: computation runs in fp32 instead of fp64
(float64 on TPU is emulated and slow). The quantities are {0,1} masks and
small integer neighbor counts — exactly representable in fp32 — and the CE
term is a standard log-softmax; with the reference's λ_ti = 1e-6 the
difference is far below training noise. Tests verify the critical maps are
bit-identical to the fp64 torch reference on synthetic label maps.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from nextou_tpu.losses.ce import cross_entropy_elementwise


def _connectivity_kernel(dim: int, connectivity: int, min_thick: int) -> np.ndarray:
    """The dilation structuring element (``bti_loss.py:52-73``)."""
    k = 2 * min_thick + 1
    if dim == 2:
        if connectivity == 4:
            return np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.float32)
        if connectivity == 8:
            return np.ones((k, k), np.float32)
    elif dim == 3:
        if connectivity == 6:
            kern = np.zeros((3, 3, 3), np.float32)
            kern[1, 1, :] = kern[1, :, 1] = kern[:, 1, 1] = 1
            return kern
        if connectivity == 26:
            return np.ones((k, k, k), np.float32)
    raise ValueError(f"unsupported dim={dim} connectivity={connectivity}")


def _normalize_label_sets(pairs) -> tuple[tuple[tuple[int, ...], tuple[int, ...]], ...]:
    """Each interaction entry may be [A, C] with scalar or list members, or a
    flat list of scalars meaning A=first, C=second... The reference trainers
    pass entries like ``[[1,3],[11,13]]`` (set vs set) and ``[1, 3]``
    (scalar vs scalar) interchangeably (``nnUNetTrainer_NexToU_BTI_Synapse.py:43``)."""
    out = []
    for pair in pairs:
        a, c = pair[0], pair[1]
        a = tuple(a) if isinstance(a, (list, tuple)) else (int(a),)
        c = tuple(c) if isinstance(c, (list, tuple)) else (int(c),)
        out.append((a, c))
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class TILossSpec:
    """Static configuration of a TI/BTI loss term."""

    dim: int = 3
    connectivity: int = 26
    min_thick: int = 1
    # interactions: (is_inclusion, A labels, C labels)
    interactions: tuple[tuple[bool, tuple[int, ...], tuple[int, ...]], ...] = ()

    @classmethod
    def create(
        cls,
        dim: int,
        connectivity: int,
        inclusion: Sequence = (),
        exclusion: Sequence = (),
        min_thick: int = 1,
    ) -> "TILossSpec":
        inter = tuple(
            (True, a, c) for a, c in _normalize_label_sets(inclusion)
        ) + tuple((False, a, c) for a, c in _normalize_label_sets(exclusion))
        return cls(
            dim=dim,
            connectivity=connectivity,
            min_thick=min_thick,
            interactions=inter,
        )


def _isin(p: jax.Array, labels: tuple[int, ...]) -> jax.Array:
    """Membership mask; static label set unrolled into equality ORs."""
    m = p == labels[0]
    for l in labels[1:]:
        m = m | (p == l)
    return m


def _dilate(mask: jax.Array, kernel: jax.Array, dim: int) -> jax.Array:
    """Binary dilation = conv with structuring element, thresholded >= 1."""
    if dim == 2:
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        dn = ("NDHWC", "DHWIO", "NDHWC")
    x = mask.astype(jnp.float32)[..., None]
    k = kernel[..., None, None]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1,) * dim, padding="SAME", dimension_numbers=dn
    )
    return y[..., 0] >= 1.0


def critical_voxels_map(p: jax.Array, spec: TILossSpec) -> jax.Array:
    """Critical voxel mask for a discrete label map ``p`` of shape (B, *sp)."""
    kernel = jnp.asarray(
        _connectivity_kernel(spec.dim, spec.connectivity, spec.min_thick)
    )
    crit = jnp.zeros(p.shape, bool)
    for is_inclusion, labels_a, labels_c in spec.interactions:
        mask_a = _isin(p, labels_a)
        if is_inclusion:
            mask_c = ~(_isin(p, labels_c) | mask_a)
        else:
            mask_c = _isin(p, labels_c)
        neigh_c = _dilate(mask_c, kernel, spec.dim)
        neigh_a = _dilate(mask_a, kernel, spec.dim)
        violating = (neigh_c & mask_a) | (neigh_a & mask_c)
        crit = crit | violating
    return crit.astype(jnp.float32)


def ti_loss(
    logits: jax.Array,
    target: jax.Array,
    spec: TILossSpec,
    channels_last: bool = True,
    loss_mask: jax.Array | None = None,
) -> jax.Array:
    """TI/BTI loss: critical-voxel-masked CE, space-summed, batch-meaned.

    Args:
        logits: (B, *sp, C) — or (B, C, *sp) with ``channels_last=False``;
        target: (B, *sp) int.
        loss_mask: optional (B, *sp) bool — voxels outside it (e.g. an
            ignore label) can neither be critical nor contribute CE. The
            reference has no ignore-label datasets, so this is an extension,
            not a deviation.
    """
    if not spec.interactions:
        return jnp.zeros((), jnp.float32)
    p = jnp.argmax(logits, axis=-1 if channels_last else 1)
    crit = critical_voxels_map(p, spec)
    if loss_mask is not None:
        crit = crit * loss_mask.astype(crit.dtype)
    ce = cross_entropy_elementwise(logits, target, channels_last)
    spatial_axes = tuple(range(1, ce.ndim))
    return jnp.mean(jnp.sum(ce * crit, axis=spatial_axes))
