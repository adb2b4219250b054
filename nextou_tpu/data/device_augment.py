"""On-device (TPU) data augmentation — the whole nnU-Net DA pipeline as a
jit-able JAX function, fused into the train step.

Why this exists: the reference relies on nnU-Net's *host-side* multi-process
augmentation workers (SURVEY.md §2.4 — batchgenerators CPU pool) because on
GPU boxes there are dozens of idle host cores. A TPU VM often has few (this
dev host has one); burning them on `scipy.ndimage.affine_transform` starves
the chip. The TPU-native design moves DA onto the device: spatial resampling
becomes 8-tap gathers, Gaussian blur and low-res simulation become small
banded/interpolation *matmuls* on the MXU, and every stochastic trigger is an
explicit `jax.random` draw folded into `jnp.where` — no data-dependent
control flow, one compiled program per training step, zero extra dispatches.

Semantics mirror :mod:`nextou_tpu.data.augment` (the host/parity path, which
reproduces nnU-Net's trigger probabilities and transform list):

- rotation+scaling: trilinear (data, reflect boundary) / nearest (seg,
  constant) resampling — matches `scipy.ndimage.affine_transform` order 1/0.
- Gaussian noise, blur (per-channel coin), multiplicative brightness,
  contrast (clipped to the pre-transform range), gamma (plain + inverted),
  mirroring.
- simulated low resolution: nearest-neighbor downsample by zoom∈[0.5,1) then
  smooth upsample. Deviation (documented): the upsample uses the Keys cubic
  *convolution* kernel (a=-0.5, what `jax.image.resize` uses) instead of
  scipy's cubic B-*spline*; both are C¹ cubic interpolants and the transform
  is stochastic corruption, not a quantity under test.

RNG draw *order* differs from the host path (documented; the distributions
are identical). Cascade one-hot noise (connected components) stays on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nextou_tpu.data.augment import AugmentConfig


# --------------------------------------------------------------------- #
# spatial resampling (scipy.ndimage.affine_transform semantics)
# --------------------------------------------------------------------- #


def _reflect_index(idx, n: int):
    """scipy 'reflect' (symmetric) extension for integer tap indices:
    (d c b a | a b c d | d c b a)."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n
    idx = jnp.remainder(idx, period)
    return jnp.where(idx >= n, period - 1 - idx, idx)


def affine_resample(vol, mat, offset, order: int, mode: str, cval=0.0):
    """Resample ``vol`` (*sp) at input coords ``mat @ o + offset`` for every
    output index ``o`` — `scipy.ndimage.affine_transform` for order ∈ {0, 1},
    mode ∈ {'reflect', 'constant'}; ``mat``/``offset`` may be traced.
    """
    dim = vol.ndim
    grids = jnp.meshgrid(
        *[jnp.arange(n, dtype=jnp.float32) for n in vol.shape], indexing="ij"
    )
    out_coords = jnp.stack([g.reshape(-1) for g in grids])  # (dim, N)
    # elementwise multiply-add, NOT a matmul: geometry must stay exact f32
    # (TPU matmuls default to bf16 inputs — fatal for coordinates)
    mat = mat.astype(jnp.float32)
    off = offset.astype(jnp.float32)
    in_coords = jnp.stack(
        [
            sum(mat[d, j] * out_coords[j] for j in range(dim)) + off[d]
            for d in range(dim)
        ]
    )

    if order == 0:
        idx = jnp.floor(in_coords + 0.5).astype(jnp.int32)
        if mode == "constant":
            # scipy's constant-mode domain for order 0 is [0, len-1] on the
            # un-rounded coordinate (ni_interpolation.c map_coordinate)
            valid = jnp.ones(idx.shape[1], dtype=bool)
            taps = []
            for d, n in enumerate(vol.shape):
                valid &= (in_coords[d] >= 0) & (in_coords[d] <= n - 1)
                taps.append(jnp.clip(idx[d], 0, n - 1))
            out = vol[tuple(taps)]
            out = jnp.where(valid, out, jnp.asarray(cval, vol.dtype))
        else:
            taps = [
                _reflect_index(idx[d], n) for d, n in enumerate(vol.shape)
            ]
            out = vol[tuple(taps)]
        return out.reshape(vol.shape)

    assert order == 1, order
    lo = jnp.floor(in_coords)
    frac = in_coords - lo
    lo = lo.astype(jnp.int32)
    out = jnp.zeros(in_coords.shape[1], jnp.float32)
    if mode == "constant":
        inside = jnp.ones(in_coords.shape[1], dtype=bool)
        for d, n in enumerate(vol.shape):
            inside &= (in_coords[d] >= -0.5) & (in_coords[d] <= n - 0.5)
    for corner in range(2**dim):
        w = jnp.ones(in_coords.shape[1], jnp.float32)
        taps = []
        for d, n in enumerate(vol.shape):
            hi_bit = (corner >> d) & 1
            tap = lo[d] + hi_bit
            w = w * jnp.where(hi_bit, frac[d], 1.0 - frac[d])
            if mode == "constant":
                tap = jnp.clip(tap, 0, n - 1)
            else:
                tap = _reflect_index(tap, n)
            taps.append(tap)
        out = out + w * vol[tuple(taps)].astype(jnp.float32)
    if mode == "constant":
        out = jnp.where(inside, out, jnp.asarray(cval, jnp.float32))
    return out.reshape(vol.shape).astype(vol.dtype)


def _rotation_scale_matrix(key, cfg: AugmentConfig, dim: int):
    """Random rotation∘scale matrix + the do-nothing identity fallback,
    reproducing the host path's composition (augment.py::_spatial)."""
    k_trig, k_ang, k_scale = jax.random.split(key, 3)
    p_rot, p_scale = jax.random.uniform(k_trig, (2,))
    do_rot = p_rot < cfg.p_rotation
    do_scale = p_scale < cfg.p_scaling

    mat = jnp.eye(dim)
    if dim == 3:
        a = jax.random.uniform(
            k_ang,
            (3,),
            minval=-jnp.asarray(cfg.rotation_rad[:3]),
            maxval=jnp.asarray(cfg.rotation_rad[:3]),
        )
        if cfg.dummy_2d:
            c, s = jnp.cos(a[0]), jnp.sin(a[0])
            rot = jnp.stack(
                [
                    jnp.array([1.0, 0.0, 0.0]),
                    jnp.stack([jnp.zeros(()), c, -s]),
                    jnp.stack([jnp.zeros(()), s, c]),
                ]
            )
        else:
            rot = jnp.eye(3)
            for (i, j), ang in zip(((1, 2), (0, 2), (0, 1)), a):
                c, s = jnp.cos(ang), jnp.sin(ang)
                r = jnp.eye(3)
                r = r.at[i, i].set(c).at[i, j].set(-s)
                r = r.at[j, i].set(s).at[j, j].set(c)
                rot = rot @ r
        mat = jnp.where(do_rot, mat @ rot, mat)
        scale = jax.random.uniform(
            k_scale, minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
        )
        sdiag = (
            jnp.diag(jnp.stack([jnp.ones(()), scale, scale]))
            if cfg.dummy_2d
            else jnp.eye(3) * scale
        )
        mat = jnp.where(do_scale, mat @ sdiag, mat)
    else:
        ang = jax.random.uniform(
            k_ang, minval=-cfg.rotation_rad[0], maxval=cfg.rotation_rad[0]
        )
        c, s = jnp.cos(ang), jnp.sin(ang)
        rot = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
        mat = jnp.where(do_rot, mat @ rot, mat)
        scale = jax.random.uniform(
            k_scale, minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
        )
        mat = jnp.where(do_scale, mat * scale, mat)
    return mat, do_rot | do_scale


# --------------------------------------------------------------------- #
# Gaussian blur as banded matmuls
# --------------------------------------------------------------------- #


def _gaussian_kernel(sigma, radius: int):
    """Normalized Gaussian taps exp(-0.5 (i/σ)²), i ∈ [-radius, radius] —
    scipy.ndimage.gaussian_filter's kernel (σ may be traced; the static
    ``radius`` over-covers small σ, the extra taps carry ~e^-18 weight)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    return w / jnp.sum(w)


def _banded_reflect_ops(n: int, radius: int):
    """Static 0/1 matrices P_t (t ∈ [-r, r]) with P_t[i, reflect(i+t)] = 1;
    a traced blur matrix is then W = Σ_t k_t·P_t (applied as one MXU matmul
    per axis — there is no scatter and no dynamic shape anywhere)."""
    import numpy as np

    ops = []
    for t in range(-radius, radius + 1):
        idx = np.arange(n) + t
        period = 2 * n
        idx = np.remainder(idx, period)
        idx = np.where(idx >= n, period - 1 - idx, idx)
        p = np.zeros((n, n), np.float32)
        p[np.arange(n), idx] = 1.0
        ops.append(p)
    return jnp.asarray(np.stack(ops))  # (2r+1, n, n)


def gaussian_blur(vol, sigma, radius: int, banded_ops=None):
    """Separable Gaussian blur of ``vol`` (*sp) with traced ``sigma``,
    'reflect' boundary, via per-axis banded matmuls."""
    k = _gaussian_kernel(sigma, radius)
    out = vol.astype(jnp.float32)
    for ax in range(vol.ndim):
        ops = (
            banded_ops[ax]
            if banded_ops is not None
            else _banded_reflect_ops(vol.shape[ax], radius)
        )
        w = jnp.einsum(
            "t,tij->ij", k, ops, precision=jax.lax.Precision.HIGHEST
        )
        out = jnp.moveaxis(
            jnp.tensordot(
                w,
                jnp.moveaxis(out, ax, 0),
                axes=1,
                precision=jax.lax.Precision.HIGHEST,
            ),
            0,
            ax,
        )
    return out.astype(vol.dtype)


# --------------------------------------------------------------------- #
# simulated low resolution as interpolation matmuls
# --------------------------------------------------------------------- #


def _cubic_keys_weight(t):
    """Keys cubic convolution kernel, a = -0.5 (Catmull-Rom)."""
    a = -0.5
    t = jnp.abs(t)
    w1 = (a + 2) * t**3 - (a + 3) * t**2 + 1
    w2 = a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
    return jnp.where(t <= 1, w1, jnp.where(t < 2, w2, 0.0))


def lowres_axis_matrix(n: int, zoom):
    """(n, n) operator = cubic-upsample ∘ nearest-downsample along one axis
    for traced ``zoom``∈(0,1]: scipy's `zoom(x, z, order=0)` to
    ``n_s = round(n·z)`` samples then smooth interpolation back to ``n``
    (SimulateLowResolution). Built from one-hot comparisons — static shape,
    MXU-friendly."""
    iota = jnp.arange(n, dtype=jnp.float32)
    n_s = jnp.round(n * zoom)  # round-half-even, like scipy's int(round())
    n_s = jnp.clip(n_s, 1.0, float(n))
    # nearest-downsample S: row j (< n_s) samples source round(j·(n-1)/(n_s-1))
    step_down = jnp.where(n_s > 1, (n - 1) / jnp.maximum(n_s - 1, 1.0), 0.0)
    src = jnp.floor(iota * step_down + 0.5)
    s_valid = iota < n_s
    S = jnp.where(
        s_valid[:, None] & (src[:, None] == iota[None, :]), 1.0, 0.0
    )
    # cubic upsample U: out o interpolates small coord o·(n_s-1)/(n-1)
    step_up = jnp.where(n_s > 1, (n_s - 1) / max(n - 1, 1), 0.0)
    pos = iota * step_up
    base = jnp.floor(pos)
    U = jnp.zeros((n, n))
    wsum = jnp.zeros((n,))
    for t in range(-1, 3):
        tap = base + t
        w = _cubic_keys_weight(pos - tap)
        # clamp taps into the valid small range (edge extension)
        tap = jnp.clip(tap, 0.0, n_s - 1.0)
        onehot = jnp.where(tap[:, None] == iota[None, :], 1.0, 0.0)
        U = U + w[:, None] * onehot
        wsum = wsum + w
    U = U / wsum[:, None]
    return U @ S


# --------------------------------------------------------------------- #
# the per-sample pipeline
# --------------------------------------------------------------------- #


def _blur_radius(cfg: AugmentConfig) -> int:
    return max(1, int(4.0 * cfg.blur_sigma[1] + 0.5))


def _gate(gating: str, trig, fn, operands):
    """Apply ``fn(operands)`` only when ``trig`` (traced bool) fires.

    gating='cond' emits a real `lax.cond` — the transform costs nothing on
    the ~(1-p) of steps where it doesn't trigger (right for one chip, where
    the resampling gathers dominate). gating='where' computes both sides and
    selects — uniform SPMD control flow for sharded multi-chip steps, where
    per-sample conds on sharded data would serialize the mesh."""
    if gating == "cond":
        return jax.lax.cond(trig, fn, lambda ops: ops, operands)
    new = fn(operands)
    return jax.tree.map(lambda a, b: jnp.where(trig, a, b), new, operands)


def _augment_sample(key, data, seg, prev, cfg: AugmentConfig, banded_ops,
                    gating: str = "where"):
    """data (*sp, C) f32, seg (*sp) i32, prev (*sp) i32 | None."""
    dim = seg.ndim
    sp = seg.shape
    (
        k_spatial,
        k_noise,
        k_blur,
        k_bright,
        k_contrast,
        k_lowres,
        k_gamma,
        k_mirror,
    ) = jax.random.split(key, 8)

    # ---- spatial (rotation + scaling) ---------------------------------- #
    if cfg.p_rotation > 0 or cfg.p_scaling > 0:
        mat, any_spatial = _rotation_scale_matrix(k_spatial, cfg, dim)
        center = (jnp.asarray(sp, jnp.float32) - 1.0) / 2.0
        offset = center - mat @ center

        def _resample(ops):
            d, s, p = ops
            d = jnp.stack(
                [
                    affine_resample(d[..., c], mat, offset, 1, "reflect")
                    for c in range(d.shape[-1])
                ],
                axis=-1,
            )
            s = affine_resample(
                s.astype(jnp.float32), mat, offset, 0, "constant"
            ).astype(s.dtype)
            if p is not None:
                p = affine_resample(
                    p.astype(jnp.float32), mat, offset, 0, "constant"
                ).astype(p.dtype)
            return d, s, p

        data, seg, prev = _gate(
            gating, any_spatial, _resample, (data, seg, prev)
        )

    # ---- Gaussian noise ------------------------------------------------ #
    if cfg.p_noise > 0:
        kp, kv, kn = jax.random.split(k_noise, 3)
        trig = jax.random.uniform(kp) < cfg.p_noise
        # the drawn value is np.random.normal's *scale* (std) in
        # batchgenerators' augment_gaussian_noise, despite the name — no
        # sqrt (kept aligned with data/augment.py)
        sd = jax.random.uniform(
            kv, minval=cfg.noise_variance[0], maxval=cfg.noise_variance[1]
        )
        noise = jax.random.normal(kn, data.shape) * sd
        data = jnp.where(trig, data + noise, data)

    # ---- Gaussian blur (per-channel coin + per-channel sigma, like
    # batchgenerators' different_sigma_per_channel=True) ------------------ #
    if cfg.p_blur > 0:
        kp, ks, kc = jax.random.split(k_blur, 3)
        trig = jax.random.uniform(kp) < cfg.p_blur
        sigma = jax.random.uniform(
            ks, (data.shape[-1],),
            minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1],
        )
        coins = jax.random.uniform(kc, (data.shape[-1],)) < 0.5

        def _blur(ops):
            (d,) = ops
            blurred = jnp.stack(
                [
                    gaussian_blur(
                        d[..., c], sigma[c], _blur_radius(cfg), banded_ops
                    )
                    for c in range(d.shape[-1])
                ],
                axis=-1,
            )
            return (jnp.where(coins, blurred, d),)

        (data,) = _gate(gating, trig, _blur, (data,))

    # ---- brightness ---------------------------------------------------- #
    if cfg.p_brightness > 0:
        kp, kf = jax.random.split(k_bright)
        trig = jax.random.uniform(kp) < cfg.p_brightness
        f = jax.random.uniform(
            kf, (data.shape[-1],),
            minval=cfg.brightness_range[0], maxval=cfg.brightness_range[1],
        )
        data = jnp.where(trig, data * f, data)

    # ---- contrast ------------------------------------------------------ #
    if cfg.p_contrast > 0:
        kp, kf = jax.random.split(k_contrast)
        trig = jax.random.uniform(kp) < cfg.p_contrast
        f = jax.random.uniform(
            kf, (data.shape[-1],),
            minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1],
        )
        ax_sp = tuple(range(data.ndim - 1))
        mean = data.mean(axis=ax_sp, keepdims=True)
        mn = data.min(axis=ax_sp, keepdims=True)
        mx = data.max(axis=ax_sp, keepdims=True)
        data = jnp.where(
            trig, jnp.clip((data - mean) * f + mean, mn, mx), data
        )

    # ---- simulated low resolution (per-channel coin) ------------------- #
    if cfg.p_lowres > 0:
        kp, kz, kc = jax.random.split(k_lowres, 3)
        trig = jax.random.uniform(kp) < cfg.p_lowres
        zoom = jax.random.uniform(
            kz, (data.shape[-1],),
            minval=cfg.lowres_zoom[0], maxval=cfg.lowres_zoom[1],
        )
        coins = jax.random.uniform(kc, (data.shape[-1],)) < 0.5

        def _lowres(ops):
            (d,) = ops
            chans = []
            for c in range(d.shape[-1]):  # per-channel zoom (batchgenerators
                low = d[..., c]           # SimulateLowRes per_channel=True)
                for ax in range(dim):
                    if cfg.dummy_2d and dim == 3 and ax == 0:
                        # nnU-Net passes ignore_axes=(0,) when do_dummy_2d:
                        # the thin axis keeps full resolution
                        continue
                    A = lowres_axis_matrix(sp[ax], zoom[c])
                    low = jnp.moveaxis(
                        jnp.tensordot(
                            A,
                            jnp.moveaxis(low, ax, 0),
                            axes=1,
                            precision=jax.lax.Precision.HIGHEST,
                        ),
                        0,
                        ax,
                    )
                chans.append(low)
            low = jnp.stack(chans, axis=-1)
            return (jnp.where(coins, low, d),)

        (data,) = _gate(gating, trig, _lowres, (data,))

    # ---- gamma (inverted then plain, like the host path) --------------- #
    # gamma, batchgenerators augment_gamma semantics (see
    # data/augment.py::_gamma_channel): per-channel two-sided gamma draw
    # and retain_stats=True (nnU-Net passes it) — mean/std restored after
    # the power transform.
    for i, (inverted, p) in enumerate(
        ((True, cfg.p_gamma_invert), (False, cfg.p_gamma))
    ):
        if p <= 0:
            continue
        kp, kg, ks = jax.random.split(jax.random.fold_in(k_gamma, i), 3)
        trig = jax.random.uniform(kp) < p
        C = data.shape[-1]
        side = jax.random.uniform(ks, (C,)) < 0.5
        lo, hi = cfg.gamma_range
        g_lo = jax.random.uniform(kg, (C,), minval=lo, maxval=1.0)
        g_hi = jax.random.uniform(
            jax.random.fold_in(kg, 1), (C,), minval=max(lo, 1.0), maxval=hi
        )
        gamma = jnp.where(side & (lo < 1), g_lo, g_hi)
        ax_sp = tuple(range(data.ndim - 1))
        mean_stat = data.mean(axis=ax_sp, keepdims=True)
        sd_stat = data.std(axis=ax_sp, keepdims=True)
        mn = data.min(axis=ax_sp, keepdims=True)
        rngv = data.max(axis=ax_sp, keepdims=True) - mn
        x = (data - mn) / (rngv + 1e-7)
        x = 1.0 - (1.0 - x) ** gamma if inverted else x**gamma
        x = x * rngv + mn
        x = (x - x.mean(axis=ax_sp, keepdims=True)) / (
            x.std(axis=ax_sp, keepdims=True) + 1e-8
        ) * sd_stat + mean_stat
        data = jnp.where(trig, x, data)

    # ---- mirroring ----------------------------------------------------- #
    if cfg.mirror_axes:
        coins = jax.random.uniform(k_mirror, (len(cfg.mirror_axes),)) < 0.5
        for i, ax in enumerate(cfg.mirror_axes):
            data = jnp.where(coins[i], jnp.flip(data, axis=ax), data)
            seg = jnp.where(coins[i], jnp.flip(seg, axis=ax), seg)
            if prev is not None:
                prev = jnp.where(coins[i], jnp.flip(prev, axis=ax), prev)

    return data, seg, prev


def device_augment_batch(
    key, data, seg, cfg: AugmentConfig, prev=None, gating: str = "cond"
):
    """Augment a batch on device: data (B, *sp, C) f32, seg (B, *sp) int.

    Jit-able (``cfg``, ``gating`` static). Returns (data, seg, prev) with
    identical shapes/dtypes.

    gating='cond' (default, single-chip): per-sample Python loop with real
    `lax.cond` around the heavy transforms — a step only pays for the
    transforms that trigger. gating='where': vmapped, compute-all-select —
    uniform control flow for SPMD-sharded multi-chip steps.
    """
    keys = jax.random.split(key, data.shape[0])
    radius = _blur_radius(cfg)
    banded_ops = (
        [_banded_reflect_ops(n, radius) for n in seg.shape[1:]]
        if cfg.p_blur > 0
        else None
    )
    if gating == "cond":
        outs = [
            _augment_sample(
                keys[b],
                data[b],
                seg[b],
                None if prev is None else prev[b],
                cfg,
                banded_ops,
                gating="cond",
            )
            for b in range(data.shape[0])
        ]
        data = jnp.stack([o[0] for o in outs])
        seg = jnp.stack([o[1] for o in outs])
        prev = None if prev is None else jnp.stack([o[2] for o in outs])
        return data, seg, prev
    if prev is None:
        fn = lambda k, d, s: _augment_sample(
            k, d, s, None, cfg, banded_ops, gating="where"
        )[:2]
        data, seg = jax.vmap(fn)(keys, data, seg)
        return data, seg, None
    fn = lambda k, d, s, p: _augment_sample(
        k, d, s, p, cfg, banded_ops, gating="where"
    )
    return jax.vmap(fn)(keys, data, seg, prev)
