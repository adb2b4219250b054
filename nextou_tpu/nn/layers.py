"""Basic flax layers: activations, norms, DropPath, grouped channel-MLP.

These correspond to the reference's ``torch_nn.py`` helpers (``act_layer``,
``norm_layer``, ``BasicConv``) and timm's ``DropPath``, re-expressed
channels-last. A 1x1 (grouped) convolution over a channels-last tensor is just
a (block-diagonal) dense layer on the channel axis — on TPU this lowers to a
single MXU matmul, so ``BasicConv`` becomes :class:`GroupedMLP`.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# He-init matching the reference's InitWeights_He(neg_slope=1e-2):
# std = sqrt(2 / (1 + a^2)) / sqrt(fan_in), biases zero
# (nnUNetTrainer_NexToU.py:88 applies this to every conv).
HE_GAIN_SQ = 2.0 / (1.0 + 1e-2 ** 2)

import numpy as np  # noqa: E402

# Host-side init RNG. Parameter initialization deliberately does NOT consume
# the flax PRNG key: materializing flax's lazily-folded keys costs one
# threefry program compile per parameter (minutes of XLA compile for the full
# model on a slow host, for a one-time side effect). Instead params are drawn
# from this NumPy generator — reseed with :func:`seed_init` (done by
# ``create_train_state``) for reproducibility; parameter values are then
# deterministic in (seed, module construction order).
_INIT_RNG = np.random.default_rng(0)


def seed_init(seed: int) -> None:
    global _INIT_RNG
    _INIT_RNG = np.random.default_rng(seed)


def _sample_normal(key, shape, dtype, std: float):
    del key  # see note on _INIT_RNG
    from nextou_tpu.utils import init as init_util

    if init_util.shape_only():  # under fast_init's eval_shape pass
        return jnp.zeros(shape, dtype)
    return jnp.asarray(std * _INIT_RNG.standard_normal(shape), dtype)


def he_normal_init(fan_in_axes: Sequence[int] = (-2,)):
    """Kaiming-normal initializer with explicit fan-in axes."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = 1
        for a in fan_in_axes:
            fan_in *= shape[a]
        std = (HE_GAIN_SQ / fan_in) ** 0.5
        return _sample_normal(key, shape, dtype, std)

    return init


def conv_he_normal(key, shape, dtype=jnp.float32):
    """He-normal for conv kernels shaped (*spatial, Cin/groups, Cout)."""
    fan_in = 1
    for a in shape[:-1]:
        fan_in *= a
    std = (HE_GAIN_SQ / fan_in) ** 0.5
    return _sample_normal(key, shape, dtype, std)


def transp_conv_he_normal(key, shape, dtype=jnp.float32):
    """He-normal for TRANSPOSED-conv kernels shaped (*spatial, Cin, Cout).

    torch's kaiming_normal_ (the reference's InitWeights_He) computes
    fan_in from dim 1 of the (Cin, Cout, *k) ConvTranspose weight, i.e.
    ``Cout * prod(k)`` — NOT Cin * prod(k) like a forward conv."""
    fan_in = shape[-1]
    for a in shape[:-2]:
        fan_in *= a
    std = (HE_GAIN_SQ / fan_in) ** 0.5
    return _sample_normal(key, shape, dtype, std)


class FoldedConv(nn.Module):
    """Conv with trivial leading spatial axes folded into the batch.

    nnU-Net's anisotropic stages use kernels like (1, 3, 3) with stride
    (1, s, s): the depth axis is pointwise. XLA's TPU 3D convolution is ~2x
    slower than the equivalent depth-batched 2D convolution at those shapes
    (measured: 10.5 -> 5.3 ms for 33ch 64x224x192, 2.5 -> 0.25 ms for the
    1->33 stem), so this module reshapes ``(B, D, H, W, C) -> (B*D, H, W, C)``
    for every leading axis whose kernel and stride are 1, then convolves over
    the rest. Parameter names and shapes ('kernel' (*k, I, O), 'bias') are
    identical to ``nn.Conv``; checkpoints are interchangeable.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[tuple[int, int]]
    use_bias: bool = True
    dtype: Any = None
    # The caller already folded this many leading (pointwise) spatial axes
    # into the batch (stage-persistent fold, conv_blocks.py): the input is
    # (B*prod(lead), *rest, C) and the output is returned folded too. The
    # 'kernel' param keeps its FULL rank (checkpoints/importer unchanged);
    # only the apply drops the unit leading taps.
    pre_folded: int = 0

    @nn.compact
    def __call__(self, x) -> jax.Array:
        # A TUPLE input means "conv of the concatenation of these parts":
        # conv(concat(a, b), W) == conv(a, W[..., :Ca, :]) + conv(b,
        # W[..., Ca:, :]) exactly, with the SAME single 'kernel' parameter
        # (checkpoints/importer unaffected). The split form skips
        # materializing the concat and lets XLA lower two well-shaped convs
        # — the round-3 trace showed the decoder's concat-fed stage-2 conv
        # running 3.4x slower than its encoder twin (PERF.md). Selected by
        # the decoder under NEXTOU_SPLIT_CONCAT=1.
        parts = x if isinstance(x, (tuple, list)) else (x,)
        cin = sum(p.shape[-1] for p in parts)
        k = tuple(self.kernel_size)
        s = tuple(self.strides)
        pad = tuple(tuple(p) for p in self.padding)
        kernel = self.param(
            "kernel", conv_he_normal, (*k, cin, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dt = self.dtype or parts[0].dtype
        if self.pre_folded:
            nf = self.pre_folded
            assert all(
                k[i] == 1 and s[i] == 1 and pad[i] == (0, 0) for i in range(nf)
            ), (k, s, pad, nf)
            kernel = kernel.reshape(*k[nf:], cin, self.features)
            k, s, pad = k[nf:], s[nf:], pad[nf:]
        if len(parts) > 1:
            off, ys = 0, []
            for p in parts:
                kp = jax.lax.slice_in_dim(
                    kernel, off, off + p.shape[-1], axis=len(k)
                )
                ys.append(
                    _folded_conv_apply(p, kp, None, self.features, k, s, pad, dt)
                )
                off += p.shape[-1]
            y = sum(ys)
            return y + bias.astype(dt) if bias is not None else y
        return _folded_conv_apply(
            parts[0], kernel, bias, self.features, k, s, pad, dt
        )


def _folded_conv_apply(x, kernel, bias, features, k, s, pad, dt):
        x = x.astype(dt)
        kernel = kernel.astype(dt)

        n_fold = 0
        # NEXTOU_NO_FOLD=1 keeps every conv rank-(len(k)) even when leading
        # axes are pointwise. The fold is ~2x faster STANDALONE (docstring),
        # but the round-3 TPU trace shows XLA assigning batch-on-lanes
        # layouts to the folded (128, H, W, C) convs and paying multi-GB
        # layout copies at the fold/unfold seams — this knob lets the
        # in-model A/B decide (tools/exp_ab_layout.py).
        if os.environ.get("NEXTOU_NO_FOLD", "0") != "1":
            while (
                n_fold < len(k) - 1
                and k[n_fold] == 1
                and s[n_fold] == 1
                and pad[n_fold] == (0, 0)
            ):
                n_fold += 1
        lead = x.shape[: 1 + n_fold]
        if n_fold:
            x = x.reshape(-1, *x.shape[1 + n_fold :])
            kernel = kernel.reshape(*k[n_fold:], x.shape[-1], features)
        nd = len(k) - n_fold
        letters = "DHW"[-nd:] if nd <= 3 else None
        assert letters is not None
        kk, ss, pp = k[n_fold:], s[n_fold:], pad[n_fold:]
        # NEXTOU_PHASE_CONV: "1" phases every eligible strided conv;
        # "cin-cout[,cin-cout...]" phases only the named channel pairs —
        # the global A/B lost 24 ms to fusion breakage across ALL strided
        # convs (PERF.md r3), but the per-op roofline says only TWO
        # lowerings are pathological (e1a 33-66 at 12.7 TF/s, e2a 66-132
        # at 15 TF/s vs 37-48 elsewhere), so targeted phasing can capture
        # their ~13 ms headroom while fusing everywhere else.
        phase_env = os.environ.get("NEXTOU_PHASE_CONV", "0")
        if phase_env in ("", "0"):
            phase_want = False
        elif phase_env == "1":
            phase_want = True
        else:
            pairs = set()
            # "+" is an accepted pair separator alongside "," (tool env
            # grammars use "," between assignments, e.g. exp_ab_layout)
            for p in phase_env.replace("+", ",").split(","):
                if not p.strip():
                    continue  # tolerate trailing/duplicate separators
                a, _, b = p.partition("-")
                try:
                    pairs.add((int(a), int(b)))
                except ValueError as e:
                    raise ValueError(
                        f"NEXTOU_PHASE_CONV: bad token {p!r} (expected "
                        f"'CIN-COUT' pairs, e.g. '33-66,66-132', or 0/1)"
                    ) from e
            phase_want = (x.shape[-1], features) in pairs
        phase_ok = (
            phase_want
            and any(s_ > 1 for s_ in ss)
            and all(
                s_ == 1 or (s_ == 2 and k_ == 3 and p_ == (1, 1))
                for k_, s_, p_ in zip(kk, ss, pp)
            )
            and all(
                x.shape[1 + i] % 2 == 0
                for i, s_ in enumerate(ss)
                if s_ == 2
            )
        )
        pallas_mode = os.environ.get("NEXTOU_PALLAS_CONV", "0")
        pallas_ok = (
            nd == 3
            and n_fold == 0
            and kk == (3, 3, 3)
            and all(p_ == (1, 1) for p_ in pp)
            and pallas_mode in ("1", "s1", "s2")
            and (
                pallas_mode == "1"
                or (pallas_mode == "s1" and all(s_ == 1 for s_ in ss))
                # "s2": ONLY the strided lowerings (e1a/e2a — the two
                # pathological XLA shapes, 13.4/15.7 TF/s) go through the
                # kernel; stride-1 convs keep XLA's conv+epilogue fusion
                or (pallas_mode == "s2" and any(s_ > 1 for s_ in ss))
            )
        )
        if pallas_ok:
            from nextou_tpu.kernels.conv import (
                pallas_conv, pallas_conv_wins, runtime_platform,
            )
            pallas_ok = runtime_platform() == "tpu" and pallas_conv_wins(
                x.shape[1:4], x.shape[-1], features, kk, ss
            )
        if pallas_ok:
            # Tap-list Pallas kernel (kernels/conv.py) on the shapes where
            # it beat XLA's conv lowering STANDALONE on v5e (PERF.md): the
            # large-spatial (3,3,3) stages. Zero-copy mode for stride-1
            # (9 accumulating dots off the rolled slab), chunked
            # double-buffered patch assembly for the s2d-folded strided
            # form. Backward is XLA's own conv vjp (numerics match the
            # fallback exactly). OPT-IN (NEXTOU_PALLAS_CONV=1, or "s1" for
            # stride-1 shapes only): the round-3 in-model A/B
            # (tools/exp_ab_pallas_conv.py) measured the full dispatch at
            # x0.878 of the XLA baseline — the standalone win does not
            # survive the lost conv+epilogue fusion in context.
            nc = -1 if all(s_ == 1 for s_ in ss) else 3
            y = pallas_conv(x, kernel, ss, nc)
        elif phase_ok:
            # polyphase decomposition: a stride-2 k=3 pad-1 axis splits into
            # an even phase (center tap, stride-1) and an odd phase (outer
            # taps, kernel 2, pad (1,0)) — a SUM of stride-1 convs with no
            # zero-padded weights. XLA's stride-1 TPU conv runs 2.5-3x the
            # strided lowering's TF/s (tools/exp_conv_phase.py); opt-in until
            # the in-model effect is measured (cf. the dec2d experiment
            # below, which won standalone but lost to fusion breakage).
            y = _phase_conv(x, kernel, ss, pp)
        elif (
            nd == 3
            and kk[0] > 1
            and ss == (1, 1, 1)
            and os.environ.get("NEXTOU_DEC2D", "0") == "1"
        ):
            # decompose the unstrided 3D conv into kd depth-shifted 2D convs
            # folded into the batch. Wins 1.1-2x standalone
            # (tools/exp_conv_kernel.py bench2) but LOSES ~4 ms in the full
            # model (breaks XLA's fusion with the adjacent norm/act and adds
            # partial-sum traffic) — opt-in experiment, off by default
            y = _dec2d_conv(x, kernel, pp)
        elif (
            nd == 3
            and kk == (3, 3, 3)
            and any(s_ > 1 for s_ in ss)
            and all(s_ in (1, 2) for s_ in ss)
            and ss[1] == ss[2]
            and all(p_ == (1, 1) for p_ in pp)
            and x.shape[1] % ss[0] == 0
            and os.environ.get("NEXTOU_DEC2D_STRIDED", "0") == "1"
        ):
            # STRIDED dec2d (round 5): only the pathological strided 3D
            # lowerings (e1a/e2a) route through kd depth-batched 2D
            # stride-2 convs — the shape XLA lowers best — while stride-1
            # convs keep their fused 3D lowering (the global dec2d's loss)
            y = _dec2d_conv(x, kernel, pp, ss)
        else:
            dn = (f"N{letters}C", f"{letters}IO", f"N{letters}C")
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=ss,
                padding=pp,
                dimension_numbers=dn,
            )
        if n_fold:
            y = y.reshape(*lead, *y.shape[1:])
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class ShuffleConvTranspose(nn.Module):
    """ConvTranspose with kernel == stride, computed as one matmul + pixel
    shuffle.

    Every nnU-Net/NexToU decoder upsample has kernel == stride (the shape
    program guarantees it), so each output voxel receives exactly one weight
    tap: ``out[b, d*kd+i, h*kh+j, w*kw+l, co] = sum_ci x[b,d,h,w,ci] *
    W[i,j,l,ci,co] (+ bias)``. XLA's native conv_transpose lowering leaves
    3.4x on the table at the flagship's high-res stage (measured 3.53 ->
    1.03 ms for 66->33 at (64,112,96), `tools/exp_transpconv.py`); a single
    ``Cin -> prod(k)*Cout`` matmul followed by a reshape/transpose is faster
    and numerically identical up to fp summation order (same contraction,
    one weight tap per output voxel).

    Parameter names and shapes ('kernel' (*k, Cin, Cout), 'bias' (Cout,))
    are identical to ``nn.ConvTranspose(padding='VALID')``; checkpoints and
    the torch importer are interchangeable. Falls back to
    ``lax.conv_transpose`` if kernel != stride.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import math

        k = tuple(self.kernel_size)
        s = tuple(self.strides)
        kernel = self.param(
            "kernel", transp_conv_he_normal,
            (*k, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        nd = len(k)
        B, sp, cin = x.shape[0], x.shape[1:-1], x.shape[-1]

        # default OFF: the round-3 in-model A/B measured lax.conv_transpose
        # at 169.8 ms vs 173.4 ms with the pixel-shuffle matmul (batch-2
        # flagship forward) — the shuffle's layout transpose eats its
        # standalone 3.4x win in context (tools/exp_ab_lowerings.py)
        if k != s or os.environ.get("NEXTOU_SHUFFLE_TRANSPCONV", "0") == "0":
            letters = "DHW"[-nd:]
            dn = (f"N{letters}C", f"{letters}IO", f"N{letters}C")
            y = jax.lax.conv_transpose(
                x, kernel, strides=s, padding="VALID", dimension_numbers=dn
            )
        else:
            # lax.conv_transpose (transpose_kernel=False) applies the kernel
            # spatially *flipped* relative to the pixel-shuffle indexing;
            # flip here so the module is bit-identical to nn.ConvTranspose
            # (verified against random weights in tests/test_nn_modules.py::
            # test_shuffle_conv_transpose_matches_flax).
            w = kernel[(slice(None, None, -1),) * nd]
            w2 = jnp.moveaxis(w, nd, 0).reshape(cin, math.prod(k) * self.features)
            y = x @ w2  # (B, *sp, P*Cout)
            y = y.reshape(B, *sp, *k, self.features)
            perm = [0]
            for i in range(nd):
                perm += [1 + i, 1 + nd + i]
            perm.append(1 + 2 * nd)
            y = jnp.transpose(y, perm)
            y = y.reshape(B, *[d * kk for d, kk in zip(sp, k)], self.features)
        if bias is not None:
            y = y + bias.astype(dt)
        return y


def _phase_conv(x, kernel, strides, pads):
    """Polyphase form of a strided conv: sum of per-phase stride-1 convs.

    Exact (same taps, same FLOPs — 3 = 1 + 2 taps per strided axis) for
    stride-2 / kernel-3 / pad-(1,1) axes on even-length inputs; stride-1
    axes keep all taps. See :class:`FoldedConv` for when it is selected.
    """
    import itertools

    nd = len(strides)
    per_axis = []
    for i, (s_, p_) in enumerate(zip(strides, pads)):
        k_ = kernel.shape[i]
        if s_ == 1:
            per_axis.append([(None, list(range(k_)), tuple(p_))])
        else:
            per_axis.append([(0, [1], (0, 0)), (1, [0, 2], (1, 0))])
    letters = "DHW"[-nd:]
    dn = (f"N{letters}C", f"{letters}IO", f"N{letters}C")
    out = None
    for combo in itertools.product(*per_axis):
        sl = tuple(
            slice(ph, None, 2) if ph is not None else slice(None)
            for ph, _, _ in combo
        )
        xp = x[(slice(None), *sl, slice(None))]
        wp = kernel[np.ix_(*[taps for _, taps, _ in combo])]
        y = jax.lax.conv_general_dilated(
            xp,
            wp,
            window_strides=(1,) * nd,
            padding=[p_ for _, _, p_ in combo],
            dimension_numbers=dn,
        )
        out = y if out is None else out + y
    return out


def _dec2d_conv(x, kernel, pad, strides=(1, 1, 1)):
    """(N, D, H, W, C) x (kd, kh, kw, C, Co): sum over kd of D-shifted
    (stride-1 depth) or D-strided-sliced (stride-2 depth), depth-batched 2D
    convolutions. The 2D convs carry the in-plane strides — for the
    pathological 3D strided lowerings (e1a 13.4 / e2a 15.7 TF/s, PERF.md)
    this routes the work through XLA's stride-2 3x3 2D conv (the classic
    ResNet downsample shape) at folded batch N*D_out."""
    N, D, H, W, C = x.shape
    kd = kernel.shape[0]
    Co = kernel.shape[-1]
    sd, sh, sw = strides
    Do = D // sd
    xp = jnp.pad(x, ((0, 0), pad[0], (0, 0), (0, 0), (0, 0)))
    acc = None
    for kdi in range(kd):
        if sd == 1:
            planes = jax.lax.slice_in_dim(xp, kdi, kdi + D, axis=1)
        else:
            planes = jax.lax.slice(
                xp,
                (0, kdi, 0, 0, 0),
                (N, kdi + sd * (Do - 1) + 1, H, W, C),
                (1, sd, 1, 1, 1),
            )
        # input-dtype output: preferred_element_type=f32 breaks the VJP
        # (XLA's grad conv then mixes bf16/f32 operands). The MXU still
        # accumulates each conv in f32 internally; only the kd-sum rounds
        # at the compute dtype (<=2 ulp vs the single 3D conv).
        y2 = jax.lax.conv_general_dilated(
            planes.reshape(N * Do, H, W, C),
            kernel[kdi],
            window_strides=(sh, sw),
            padding=pad[1:],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        acc = y2 if acc is None else acc + y2
    return acc.reshape(N, Do, *acc.shape[1:3], Co).astype(x.dtype)


def act(name: str, x: jax.Array, neg_slope: float = 1e-2) -> jax.Array:
    """Functional activation dispatch (reference ``torch_nn.py:13-29``).

    'prelu' is parametric (learnable slope) and therefore lives in
    :class:`PReLU` / :class:`ActLayer`; it cannot be expressed functionally.
    """
    name = name.lower()
    if name == "relu":
        return jax.nn.relu(x)
    if name == "leakyrelu":
        return jax.nn.leaky_relu(x, neg_slope)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "hswish":
        return jax.nn.hard_swish(x)
    if name == "prelu":
        raise NotImplementedError(
            "prelu is parametric — use ActLayer/PReLU (module form)"
        )
    raise NotImplementedError(f"activation [{name}] is not found")


class PReLU(nn.Module):
    """Parametric ReLU, ``torch.nn.PReLU(num_parameters, init)`` semantics
    (reference ``torch_nn.py:21-22``): ``max(0,x) + alpha * min(0,x)`` with a
    learnable ``alpha`` of ``n_prelu`` entries broadcast over the channel
    (last) axis.

    NOTE: :func:`nextou_tpu.utils.init.fast_init` materializes ``alpha`` at
    the reference default 1e-2 (``act_layer``'s ``neg_slope``); a different
    ``init`` only takes effect under flax's own ``Module.init``.
    """

    n_prelu: int = 1
    init_value: float = 1e-2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.n_prelu,),
        )
        a = alpha.astype(x.dtype)
        if self.n_prelu > 1:
            assert x.shape[-1] == self.n_prelu, (x.shape, self.n_prelu)
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class ActLayer(nn.Module):
    """Module-form activation dispatch (reference ``act_layer``,
    ``torch_nn.py:13-29``): like :func:`act` but supports the parametric
    'prelu'."""

    name_: str
    neg_slope: float = 1e-2
    n_prelu: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.name_.lower() == "prelu":
            return PReLU(n_prelu=self.n_prelu, init_value=self.neg_slope)(x)
        return act(self.name_, x, self.neg_slope)


class InstanceNorm(nn.Module):
    """Instance norm over spatial axes (per sample, per channel), affine.

    Equivalent to ``nn.InstanceNorm{2,3}d(affine=True)`` on channels-last
    input (reference ``torch_nn.py:42-48``): normalizes each sample's each
    channel over all spatial positions. Statistics in fp32.
    """

    epsilon: float = 1e-5
    dtype: Any = None
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        C = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        # Statistics in fp32 WITHOUT materializing an fp32 copy of the
        # feature map: reduce the (bf16) input with an fp32 accumulator
        # (jnp.mean dtype=) and keep the fp32 cast inside the elementwise
        # consumers. Bit-identical to casting first (bf16->f32 is exact and
        # the accumulation dtype is the same), but the round-3 TPU trace
        # showed the explicit `x.astype(f32)` form materializing full-res
        # f32 buffers + 1.4 GB layout copies at stage 0 (PERF.md).
        if os.environ.get("NEXTOU_ONEPASS_IN", "0") == "1":
            # one-pass statistics: sum and sum-of-squares are INDEPENDENT
            # reductions over the same input, so XLA multi-output-fuses them
            # into a single HBM read; the default two-pass form (var depends
            # on mean) forces a second full read of the feature map per norm.
            # fp32 E[x^2]-mean^2 loses ~2*log2(|mean|/std) mantissa bits to
            # cancellation — opt-in until the in-model win/parity is measured.
            mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
            meansq = jnp.mean(
                jnp.square(x.astype(jnp.float32)), axis=axes, keepdims=True
            )
            var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        else:
            mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
            var = jnp.mean(
                jnp.square(x.astype(jnp.float32) - mean),
                axis=axes, keepdims=True,
            )
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        out_dtype = self.dtype or orig_dtype
        if out_dtype == jnp.bfloat16 and (
            os.environ.get("NEXTOU_IN_SCALAR_AB", "1") == "1"
        ):
            # Fold the whole normalization into per-(sample, channel) affine
            # coefficients computed in f32 (tiny tensors), applied as ONE
            # bf16 multiply-add on the original input:
            #   y = x * a + b,  a = scale/sigma,  b = bias - mean * a.
            # With the straightforward f32 elementwise form, the round-3 TPU
            # trace showed XLA materializing the PRE-convert f32 feature map
            # whenever the norm output fans out (encoder skip + next conv):
            # a 726 MB f32 buffer + layout copies + triple converts at
            # full res. Expressing the apply in pure bf16 makes an f32
            # feature map unrepresentable. Rounding a,b to bf16 adds <=2 ulp
            # vs normalize-then-round — same order as the bf16 output
            # rounding itself, and the torch reference's AMP behavior
            # (fp32 IN -> fp16 cast) is an approximation of the same kind.
            # NEXTOU_IN_SCALAR_AB=0 restores the f32 elementwise apply.
            a = scale * jax.lax.rsqrt(var + self.epsilon)  # f32 (B,1..,C)
            b = bias - mean * a
            y = x.astype(jnp.bfloat16) * a.astype(jnp.bfloat16) + b.astype(
                jnp.bfloat16
            )
            return y
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(out_dtype)


def make_norm(
    kind: str,
    *,
    train: bool,
    name: str | None = None,
    dtype=None,
    zero_init_scale: bool = False,
):
    """Instantiate a norm module by kind ('batch' | 'instance').

    BatchNorm matches torch defaults (eps 1e-5, momentum 0.1 -> flax 0.9) and
    uses running averages at eval time. ``zero_init_scale`` starts the affine
    scale at 0 (``init_last_bn_before_add_to_0`` of residual blocks); the
    module MUST then be named 'norm2' — ``utils/init.py::fast_init``
    replicates initialization by leaf path and keys the zero-scale rule on
    that name.
    """
    kind = kind.lower()
    assert not zero_init_scale or name == "norm2", (name, "see docstring")
    scale_init = nn.initializers.zeros if zero_init_scale else nn.initializers.ones
    if kind == "batch":
        # dtype is the model COMPUTE dtype: flax computes the batch
        # statistics in >=f32 regardless (``_compute_stats`` promotes), but
        # the normalize elementwise runs at this dtype. The old hardcoded
        # f32 made every BatchNorm emit an f32 feature map — at full res
        # that's a 726 MB materialization + layout copies + re-converts per
        # norm (round-3 TPU trace, PERF.md). bf16 normalize applies
        # per-channel constants at <=2 ulp cost, the same order as the
        # output rounding the next conv performs anyway (and the torch
        # reference under AMP rounds its f32 BN output to fp16 too).
        # NEXTOU_F32_NORM=1 restores the f32 elementwise form.
        bn_dtype = (
            jnp.float32
            if os.environ.get("NEXTOU_F32_NORM", "0") == "1"
            else dtype
        )
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=bn_dtype,
            scale_init=scale_init,
            name=name,
        )
    if kind == "instance":
        return InstanceNorm(name=name, dtype=dtype, scale_init=scale_init)
    raise NotImplementedError(f"normalization layer [{kind}] is not found")


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm ``DropPath`` semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        if self.rate <= 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class GroupedDense(nn.Module):
    """Block-diagonal dense layer on the channel axis = grouped 1x1 conv.

    Input ``(..., Cin)`` -> output ``(..., Cout)`` with ``groups`` independent
    blocks (reference ``BasicConv`` uses groups=4 in 2D / 6 in 3D,
    ``torch_nn.py:73,77``).
    """

    features: int
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        g = self.groups
        assert cin % g == 0 and self.features % g == 0, (
            f"channels ({cin}->{self.features}) must be divisible by groups={g}"
        )
        ci, co = cin // g, self.features // g
        w = self.param("kernel", he_normal_init((1,)), (g, ci, co), jnp.float32)
        dt = self.dtype or x.dtype
        lead = x.shape[:-1]
        if g > 1 and ci <= 96:
            # tiny per-group contractions (flagship: ci=44..88) run the MXU
            # at ~4 TF/s; scatter the groups into one block-diagonal
            # (cin, features) weight and issue a single dense matmul — g x
            # the nominal FLOPs at 6-10x the utilization (measured 7.4 ->
            # ~3.5 ms for the stage-2 grouped MLP). Math-identical.
            wb = jnp.zeros((cin, self.features), dt)
            for gi in range(g):
                wb = wb.at[
                    gi * ci : (gi + 1) * ci, gi * co : (gi + 1) * co
                ].set(w[gi].astype(dt))
            y = jnp.einsum(
                "...i,io->...o", x.astype(dt), wb,
                preferred_element_type=jnp.float32,
            )
        else:
            xg = x.reshape(*lead, g, ci)
            y = jnp.einsum(
                "...gi,gio->...go", xg, w.astype(dt),
                preferred_element_type=jnp.float32,
            )
            y = y.reshape(*lead, g * co)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b
        return y.astype(dt)


class GroupedMLP(nn.Module):
    """Stack of grouped 1x1 convs with norm + act — the reference's
    ``BasicConv`` (``torch_nn.py:66-92``) in channels-last form.

    ``channels`` lists the layer widths ``[cin, c1, ..., cout]``.
    """

    channels: Sequence[int]
    act_name: str = "relu"
    norm: str | None = None
    use_bias: bool = True
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        for i in range(1, len(self.channels)):
            x = GroupedDense(
                features=self.channels[i],
                groups=self.groups,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name=f"dense_{i - 1}",
            )(x)
            if self.norm is not None and self.norm.lower() != "none":
                x = make_norm(
                    self.norm, train=train, name=f"norm_{i - 1}", dtype=self.dtype
                )(x)
            if self.act_name is not None and self.act_name.lower() != "none":
                x = ActLayer(self.act_name, name=f"act_{i - 1}")(x)
        return x


class MLP(nn.Module):
    """Dense-layer MLP (reference ``torch_nn.py:54-64``): per width in
    ``channels[1:]``, a Linear (+ activation, + norm). Unused by NexToU
    upstream; provided for API completeness.

    Faithful quirk: the reference constructs every norm with ``channels[-1]``
    features, so with ``norm`` set the intermediate widths must all equal the
    final width (torch would raise a shape error otherwise) — asserted here.
    """

    channels: Sequence[int]
    act_name: str | None = "relu"
    norm: str | None = None
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        assert x.shape[-1] == self.channels[0], (x.shape, self.channels)
        for i in range(1, len(self.channels)):
            x = GroupedDense(
                features=self.channels[i],
                groups=1,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name=f"lin_{i - 1}",
            )(x)
            if self.act_name is not None and self.act_name.lower() != "none":
                x = ActLayer(self.act_name, name=f"act_{i - 1}")(x)
            if self.norm is not None and self.norm.lower() != "none":
                assert self.channels[i] == self.channels[-1], (
                    "reference MLP builds norms with channels[-1] features "
                    f"(torch_nn.py:63); got width {self.channels[i]}"
                )
                x = make_norm(
                    self.norm, train=train, name=f"norm_{i - 1}", dtype=self.dtype
                )(x)
        return x
