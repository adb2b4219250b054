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


@dataclass
class AugmentConfig:
    rotation_rad: tuple[float, ...] = (0.5235987755982988,) * 3  # ±30°
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
        if dim == 3:
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
        mat = mat * scale

    center = (np.array(seg.shape) - 1) / 2.0
    offset = center - mat @ center
    out_d = np.empty_like(data)
    for c in range(data.shape[0]):
        out_d[c] = ndimage.affine_transform(
            data[c], mat, offset=offset, order=1, mode="reflect"
        )
    out_s = ndimage.affine_transform(
        seg.astype(np.float32), mat, offset=offset, order=0, mode="constant"
    ).astype(seg.dtype)
    return out_d, out_s


def _intensity(data, cfg: AugmentConfig, rng: np.random.Generator):
    if rng.uniform() < cfg.p_noise:
        var = rng.uniform(*cfg.noise_variance)
        data = data + rng.normal(0, np.sqrt(var), data.shape).astype(np.float32)
    if rng.uniform() < cfg.p_blur:
        sigma = rng.uniform(*cfg.blur_sigma)
        for c in range(data.shape[0]):
            if rng.uniform() < 0.5:
                data[c] = ndimage.gaussian_filter(data[c], sigma)
    if rng.uniform() < cfg.p_brightness:
        data = data * rng.uniform(*cfg.brightness_range)
    if rng.uniform() < cfg.p_contrast:
        factor = rng.uniform(*cfg.contrast_range)
        mean = data.mean()
        mn, mx = data.min(), data.max()
        data = np.clip((data - mean) * factor + mean, mn, mx)
    if rng.uniform() < cfg.p_lowres:
        zoom = rng.uniform(*cfg.lowres_zoom)
        for c in range(data.shape[0]):
            if rng.uniform() < 0.5:
                small = ndimage.zoom(data[c], zoom, order=0)
                data[c] = _zoom_to(small, data[c].shape, order=3)
    for inverted, p in ((True, cfg.p_gamma_invert), (False, cfg.p_gamma)):
        if rng.uniform() < p:
            gamma = rng.uniform(*cfg.gamma_range)
            mn, rngv = data.min(), np.ptp(data)
            if rngv > 1e-7:
                x = (data - mn) / rngv
                if inverted:
                    x = 1.0 - (1.0 - x) ** gamma
                else:
                    x = x**gamma
                data = x * rngv + mn
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


def augment_sample(data, seg, cfg: AugmentConfig, rng: np.random.Generator):
    """data (C, *sp) float32, seg (*sp) int -> augmented pair."""
    data, seg = _spatial(data, seg, cfg, rng)
    data = _intensity(data.copy(), cfg, rng)
    if cfg.mirror_axes:
        for ax in cfg.mirror_axes:
            if rng.uniform() < 0.5:
                data = np.flip(data, axis=ax + 1)
                seg = np.flip(seg, axis=ax)
    return np.ascontiguousarray(data), np.ascontiguousarray(seg)


def augment_batch(data, seg, cfg: AugmentConfig, rng: np.random.Generator):
    """data (B, C, *sp), seg (B, *sp)."""
    out_d = np.empty_like(data)
    out_s = np.empty_like(seg)
    for b in range(data.shape[0]):
        out_d[b], out_s[b] = augment_sample(data[b], seg[b], cfg, rng)
    return out_d, out_s
