"""Host-side data augmentation (NumPy/SciPy).

Reproduces the nnU-Net v2 default training pipeline the reference inherits
(SURVEY.md §2.4/§5): spatial rotation+scaling, Gaussian noise/blur,
multiplicative brightness, contrast, simulated low resolution, gamma (plain +
inverted), and mirroring — with nnU-Net's trigger probabilities. The
NoMirroring trainers pass ``mirror_axes=()``.

Deviation (documented): rotations are applied to the extracted patch with
edge reflection instead of nnU-Net's sample-larger-then-crop; border voxels
may differ slightly. Everything runs on host CPU, overlapped with device
compute by the prefetching loader.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from scipy import ndimage


def _affine(x, mat, offset, order, mode, cval=0.0):
    """scipy.ndimage.affine_transform, via the native C++ resampler when
    built (3x scipy single-core, thread-parallel; exact parity)."""
    from nextou_tpu import native

    if native.available() and order in (0, 1) and mode in ("reflect", "constant"):
        return native.affine_transform(
            np.asarray(x, np.float32), mat, offset, order, mode, cval
        )
    return ndimage.affine_transform(
        x, mat, offset=offset, order=order, mode=mode, cval=cval
    )


def _gauss(x, sigma):
    from nextou_tpu import native

    if native.available():
        return native.gaussian_filter(np.asarray(x, np.float32), sigma)
    return ndimage.gaussian_filter(x, sigma)


@dataclass
class AugmentConfig:
    rotation_rad: tuple[float, ...] = (0.5235987755982988,) * 3  # ±30°
    # anisotropic 3D patches: rotate in-plane only (nnU-Net's dummy-2D DA)
    dummy_2d: bool = False
    p_rotation: float = 0.2
    scale_range: tuple[float, float] = (0.7, 1.4)
    p_scaling: float = 0.2
    p_noise: float = 0.1
    noise_variance: tuple[float, float] = (0.0, 0.1)
    p_blur: float = 0.2
    blur_sigma: tuple[float, float] = (0.5, 1.0)
    p_brightness: float = 0.15
    brightness_range: tuple[float, float] = (0.75, 1.25)
    p_contrast: float = 0.15
    contrast_range: tuple[float, float] = (0.75, 1.25)
    p_lowres: float = 0.25
    lowres_zoom: tuple[float, float] = (0.5, 1.0)
    p_gamma_invert: float = 0.1
    p_gamma: float = 0.3
    gamma_range: tuple[float, float] = (0.7, 1.5)
    mirror_axes: tuple[int, ...] = field(default_factory=tuple)


def _spatial(data, seg, cfg: AugmentConfig, rng: np.random.Generator):
    dim = seg.ndim
    do_rot = rng.uniform() < cfg.p_rotation
    do_scale = rng.uniform() < cfg.p_scaling
    if not (do_rot or do_scale):
        return data, seg

    # build affine: rotation (per-axis Euler) composed with isotropic scale
    mat = np.eye(dim)
    if do_rot:
        if dim == 3 and cfg.dummy_2d:
            # rotate only within the in-plane axes (1, 2)
            ang = rng.uniform(-cfg.rotation_rad[0], cfg.rotation_rad[0])
            c, s = np.cos(ang), np.sin(ang)
            r = np.eye(3)
            r[1, 1], r[1, 2], r[2, 1], r[2, 2] = c, -s, s, c
            mat = mat @ r
        elif dim == 3:
            angles = [rng.uniform(-a, a) for a in cfg.rotation_rad[:3]]
            for axis_pair, ang in zip(((1, 2), (0, 2), (0, 1)), angles):
                r = np.eye(3)
                i, j = axis_pair
                c, s = np.cos(ang), np.sin(ang)
                r[i, i], r[i, j], r[j, i], r[j, j] = c, -s, s, c
                mat = mat @ r
        else:
            ang = rng.uniform(-cfg.rotation_rad[0], cfg.rotation_rad[0])
            c, s = np.cos(ang), np.sin(ang)
            mat = mat @ np.array([[c, -s], [s, c]])
    if do_scale:
        scale = rng.uniform(*cfg.scale_range)
        if dim == 3 and cfg.dummy_2d:
            mat = mat @ np.diag([1.0, scale, scale])
        else:
            mat = mat * scale

    center = (np.array(seg.shape) - 1) / 2.0
    offset = center - mat @ center
    out_d = np.empty_like(data)
    for c in range(data.shape[0]):
        out_d[c] = _affine(data[c], mat, offset, 1, "reflect")
    out_s = _affine(
        seg.astype(np.float32), mat, offset, 0, "constant"
    ).astype(seg.dtype)
    return out_d, out_s


def _gamma_channel(x, gamma_range, inverted, rng: np.random.Generator):
    """batchgenerators ``augment_gamma`` semantics on one channel: two-sided
    gamma draw (50% in [lo, 1) when lo < 1, else [max(lo,1), hi]) and
    ``retain_stats=True`` (nnU-Net passes it) — mean/std restored after the
    power transform. The ``invert_image`` branch (negate, gamma, negate)
    algebraically equals the 1-(1-t)^g form with stats retained on the
    original sign."""
    mean_stat, sd_stat = x.mean(), x.std()
    if rng.uniform() < 0.5 and gamma_range[0] < 1:
        gamma = rng.uniform(gamma_range[0], 1.0)
    else:
        gamma = rng.uniform(max(gamma_range[0], 1.0), gamma_range[1])
    mn, rngv = x.min(), np.ptp(x)
    t = (x - mn) / (rngv + 1e-7)
    t = 1.0 - (1.0 - t) ** gamma if inverted else t**gamma
    x = t * rngv + mn
    return (x - x.mean()) / (x.std() + 1e-8) * sd_stat + mean_stat


def _intensity(data, cfg: AugmentConfig, rng: np.random.Generator):
    """Per-channel factor/statistics semantics follow the batchgenerators
    transforms nnU-Net v2 configures (per_channel=True for blur sigma,
    brightness, contrast, lowres zoom, gamma; noise is joint)."""
    C = data.shape[0]
    if rng.uniform() < cfg.p_noise:
        # batchgenerators' augment_gaussian_noise passes the value drawn
        # from noise_variance directly as np.random.normal's *scale* (std),
        # despite the name — no sqrt, or the noise is ~3x too strong
        sd = rng.uniform(*cfg.noise_variance)
        data = data + rng.normal(0, sd, data.shape).astype(np.float32)
    if rng.uniform() < cfg.p_blur:
        for c in range(C):
            if rng.uniform() < 0.5:
                sigma = rng.uniform(*cfg.blur_sigma)
                data[c] = _gauss(data[c], sigma)
    if rng.uniform() < cfg.p_brightness:
        for c in range(C):
            data[c] = data[c] * rng.uniform(*cfg.brightness_range)
    if rng.uniform() < cfg.p_contrast:
        for c in range(C):
            factor = rng.uniform(*cfg.contrast_range)
            mean = data[c].mean()
            mn, mx = data[c].min(), data[c].max()
            data[c] = np.clip((data[c] - mean) * factor + mean, mn, mx)
    if rng.uniform() < cfg.p_lowres:
        for c in range(C):
            if rng.uniform() < 0.5:
                zoom = rng.uniform(*cfg.lowres_zoom)
                # anisotropic patches keep full through-plane resolution:
                # nnU-Net passes ignore_axes=(0,) to SimulateLowResolution
                # when do_dummy_2d is on
                factors = [zoom] * data[c].ndim
                if cfg.dummy_2d and data[c].ndim == 3:
                    factors[0] = 1.0
                small = ndimage.zoom(data[c], factors, order=0)
                data[c] = _zoom_to(small, data[c].shape, order=3)
    for inverted, p in ((True, cfg.p_gamma_invert), (False, cfg.p_gamma)):
        if rng.uniform() < p:
            for c in range(C):
                data[c] = _gamma_channel(
                    data[c], cfg.gamma_range, inverted, rng
                )
    return data.astype(np.float32)


def _zoom_to(x: np.ndarray, shape, order: int) -> np.ndarray:
    factors = [t / s for t, s in zip(shape, x.shape)]
    out = ndimage.zoom(x, factors, order=order)
    # guard off-by-one from float rounding
    slices = tuple(slice(0, t) for t in shape)
    if out.shape != tuple(shape):
        pad = [(0, max(0, t - o)) for t, o in zip(shape, out.shape)]
        out = np.pad(out, pad, mode="edge")[slices]
    return out


def augment_sample(
    data, seg, cfg: AugmentConfig, rng: np.random.Generator, prev=None
):
    """data (C, *sp) float32, seg (*sp) int -> augmented tuple.

    ``prev`` (cascade: previous-stage seg, (*sp) int) rides through the same
    spatial transforms and mirrors as ``seg`` (order 0, no intensity) —
    nnU-Net treats it as an extra segmentation channel during DA."""
    if prev is None:
        data, seg = _spatial(data, seg, cfg, rng)
    else:
        stacked = np.stack([seg.astype(np.int16), prev.astype(np.int16)])
        # transform both label maps with one shared affine by flattening
        # them into a combined code (both are small non-negative ints)
        code = stacked[0].astype(np.int32) * 32768 + stacked[1]
        data, code = _spatial(data, code, cfg, rng)
        seg, prev = code // 32768, code % 32768
    data = _intensity(data.copy(), cfg, rng)
    if cfg.mirror_axes:
        for ax in cfg.mirror_axes:
            if rng.uniform() < 0.5:
                data = np.flip(data, axis=ax + 1)
                seg = np.flip(seg, axis=ax)
                if prev is not None:
                    prev = np.flip(prev, axis=ax)
    return (
        np.ascontiguousarray(data),
        np.ascontiguousarray(seg),
        None if prev is None else np.ascontiguousarray(prev),
    )


def augment_batch(
    data, seg, cfg: AugmentConfig, rng: np.random.Generator, prev=None
):
    """data (B, C, *sp), seg (B, *sp), optional prev (B, *sp)."""
    out_d = np.empty_like(data)
    out_s = np.empty_like(seg)
    out_p = None if prev is None else np.empty_like(prev)
    for b in range(data.shape[0]):
        p = None if prev is None else prev[b]
        out_d[b], out_s[b], pb = augment_sample(data[b], seg[b], cfg, rng, p)
        if out_p is not None:
            out_p[b] = pb
    return out_d, out_s, out_p


def cascade_onehot_noise(
    onehot: np.ndarray,
    rng: np.random.Generator,
    p_binary_op: float = 0.4,
    p_remove_component: float = 0.2,
    max_component_frac: float = 0.15,
) -> np.ndarray:
    """DA noise on the one-hot previous-stage channels (nnU-Net's
    ApplyRandomBinaryOperator + RemoveRandomConnectedComponent transforms):
    per channel, randomly dilate/erode/open/close with a random structuring
    element, and occasionally delete a small connected component — so the
    fullres net learns not to blindly trust the lowres prediction."""
    ops = (
        ndimage.binary_dilation,
        ndimage.binary_erosion,
        ndimage.binary_opening,
        ndimage.binary_closing,
    )
    out = onehot
    for c in range(out.shape[0]):
        if rng.uniform() < p_binary_op:
            op = ops[rng.integers(len(ops))]
            size = int(rng.integers(1, 8))
            strel = ndimage.generate_binary_structure(out[c].ndim, 1)
            strel = ndimage.iterate_structure(strel, max(1, size // 2))
            out[c] = op(out[c] > 0.5, structure=strel).astype(out.dtype)
        if rng.uniform() < p_remove_component:
            labeled, n = ndimage.label(out[c] > 0.5)
            if n:
                sizes = ndimage.sum_labels(
                    np.ones_like(labeled), labeled, index=np.arange(1, n + 1)
                )
                small = np.where(sizes / out[c].size < max_component_frac)[0]
                if len(small):
                    kill = int(small[rng.integers(len(small))]) + 1
                    out[c] = np.where(labeled == kill, 0, out[c])
    return out
