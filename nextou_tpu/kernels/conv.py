"""Tap-list Pallas TPU conv kernel (patches-stationary orientation).

NexToU's conv stack runs at odd channel counts (33/66/132/264/324,
reference ``nnUNetPlans.json:433-434`` + ``nnUNetTrainer_NexToU.py:78-79``)
where XLA's TPU conv lowering leaves measurable headroom on specific
shapes: the stride-1 (3,3,3) decoder convs after skip-concat (Cin = 2*Cout)
and the two strided encoder convs (PERF.md roofline sweep). This kernel
flips the usual im2col matmul to ``out(Co, S) = W(Co, K) @ P(K, S)`` so the
MXU's *stationary* operand is the patch matrix with K = taps*Cp on
sublanes (pads to the 128 grid with <5% waste at C=33, where putting
Co=33 on lanes wastes 74%) and a spatial tile S on lanes.

Layout: inputs live as (B, D_in, Cf, H_in*Wp) "channel-first flat" slabs —
channels on sublanes, a whole padded W row on lanes. Patch assembly is then
all sublane/lane-ALIGNED ops: tap (kd,kh,kw) is a lane roll of the VMEM
slab by -kw' (shared across kd,kh) plus an aligned slice at row offset kh —
no Mosaic relayouts (the failure mode of the round-1 spatial-major attempt,
PERF.md "Pallas im2col kernel").

Strided convs enter as their space-to-depth fold, but via an explicit TAP
LIST — (slab_d, row_offset, lane_shift, channel_offset) per ORIGINAL tap —
so only the real taps are assembled from per-phase-padded channel slices:
zero extra FLOPs vs the naive s2d fold's 1.78-2.37x zero-weight blowup.

Measured (v5e, bf16, batch 2, ``tools/exp_conv_v2.py bench``): d1 decoder
conv 18.1 -> 12.8 ms (50 TF/s), e1a strided 12.8 -> 9.5 ms, e2a strided
5.9 -> 5.2 ms vs XLA. XLA keeps the deep small-spatial shapes (e2b/e3b/d2)
and the (1,3,3) stages (FoldedConv's depth-batched 2D conv is faster
there); dispatch in ``nn/layers.py`` follows that table.

Gradients: ``pallas_conv`` carries a custom_vjp whose backward re-derives
the cotangents through XLA's own conv (``jax.vjp`` of the reference
lowering), so training numerics match the fallback path exactly and only
the forward changes speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _axis_taps(k: int, s: int):
    """Per-axis tap -> (block offset q, phase r) for the s2d fold of a
    symmetric-padded (pad (k-1)//2) stride-s conv: input position
    s*o + t - k//2 = s*(o+q) + r."""
    return [divmod(t - k // 2, s) for t in range(k)]


def make_taps(kernel_shape, strides, cpt):
    """Tap list for the kernel + fold geometry.

    Returns (taps, spans, pad_lefts): taps[i] = (slab_d, row_idx,
    lane_shift, c0) in the ORIGINAL (kd, kh, kw) weight-loop order, spans =
    per-axis block span of the folded kernel, pad_lefts = per-axis left
    padding in blocks.
    """
    per_axis = [_axis_taps(k, s) for k, s in zip(kernel_shape, strides)]
    qs = [[q for q, _ in ax] for ax in per_axis]
    pad_l = [-min(q) for q in qs]
    spans = [max(q) - min(q) + 1 for q in qs]
    sd, sh, sw = strides
    taps = []
    for qd, pd in per_axis[0]:
        for qh, ph in per_axis[1]:
            for qw, pw in per_axis[2]:
                phase = (pd * sh + ph) * sw + pw
                taps.append((
                    qd + pad_l[0],   # slab d index (into padded blocks)
                    qh + pad_l[1],   # row offset (in Wp rows)
                    -qw,             # lane roll: out lane l reads l + qw
                    phase * cpt,
                ))
    return tuple(taps), tuple(spans), tuple(pad_l)


# --------------------------------------------------------------------- #
# kernel
# --------------------------------------------------------------------- #

def _kernel(x_hbm, w_ref, out_ref, slab, patches, sem, *,
            taps, cpt, TH, Co, Wp, kd_span, kh_span, n_chunks):
    """Grid step = (batch, d_out, h_tile): one (Co, TH*Wp) output block.

    x_hbm: (B, D_in, Cf, H_in*Wp) flat channel rows; D_in/H_in include the
    conv halo (+span-1 blocks), W pad lanes are zero. Cf = phases*cpt sits
    second-minor so every block satisfies Mosaic's (8,128)-or-full rule.
    w_ref: (Co, K) with K = len(taps)*cpt, rows in tap order.
    slab:  VMEM (kd_span, Cf, (TH+kh_span-1)*Wp) scratch.
    patches: VMEM (nbuf, chunk*cpt, TH*Wp) scratch (stationary operand).

    With n_chunks>0 the taps are assembled in groups and partial dots
    accumulated, double-buffered so Mosaic can overlap chunk i+1's VPU
    assembly with chunk i's MXU dot (measured +22% on e1b).
    """
    b = pl.program_id(0)
    d = pl.program_id(1)
    ht = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_ht = pl.num_programs(2)
    total = pl.num_programs(0) * n_d * n_ht
    step = (b * n_d + d) * n_ht + ht
    TH_in = TH + kh_span - 1

    # Double-buffered slab DMA across grid steps: scratch + semaphores
    # persist between (sequential) steps, so step i prefetches step i+1's
    # slab while computing — the per-step HBM fetch is hidden behind the
    # MXU instead of serializing with it (measured ~25% on e1b/d1).
    def get_dma(slot, s):
        bb = s // (n_d * n_ht)
        rem = s % (n_d * n_ht)
        dd = rem // n_ht
        hh = rem % n_ht
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(dd, kd_span), :,
                     pl.ds(hh * TH * Wp, TH_in * Wp)],
            slab.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(step + 1 < total)
    def _():
        get_dma((step + 1) % 2, step + 1).start()

    get_dma(step % 2, step).wait()

    x = slab[step % 2]  # (kd_span, Cf, TH_in*Wp)
    rolled_cache = {}

    def rolled_for(shift):
        if shift in rolled_cache:
            return rolled_cache[shift]
        n_lanes = x.shape[2]
        if not shift:
            r = x
        elif x.dtype == jnp.bfloat16:
            # Mosaic's rotate is 32-bit-only; bf16 -> f32 -> roll -> bf16
            # is exact and the converts are cheap VPU passes
            r = pltpu.roll(
                x.astype(jnp.float32), shift % n_lanes, 2
            ).astype(jnp.bfloat16)
        else:
            r = pltpu.roll(x, shift % n_lanes, 2)
        rolled_cache[shift] = r
        return r

    acc = jnp.zeros((Co, TH * Wp), jnp.float32)
    if n_chunks == -2:
        # OUTPUT-ROLL mode (stride-1 (3,3,3) only): the dots read direct
        # aligned slices of the UNrolled slab — zero patch copies, zero
        # dtype round trips — and tap kw's lane shift is applied to the
        # (Co, TH*Wp) f32 partial result instead (native 32-bit roll,
        # ~kd_span*Cf/Co x fewer bytes than rolling the slab). Wrap-around
        # bleed lands in / comes from zeroed pad lanes (Wp >= W+3), which
        # ``from_cf_flat`` discards. Weights must be packed in
        # ``pack_weights_zc`` order: one contiguous (Co, kd_span*cpt) block
        # per (kh, kw) tap group.
        x2 = x.reshape(kd_span * x.shape[1], TH_in * Wp)
        KC = kd_span * cpt
        for g in range(9):
            kh, kw = divmod(g, 3)
            y = jax.lax.dot_general(
                w_ref[:, g * KC: (g + 1) * KC],
                x2[:, kh * Wp: kh * Wp + TH * Wp],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if kw != 1:
                y = pltpu.roll(y, (1 - kw) % (TH * Wp), 1)
            acc = acc + y
        out_ref[...] = acc.reshape(1, 1, Co, TH * Wp).astype(out_ref.dtype)
        return
    if n_chunks == -1:
        # ZERO-COPY mode (stride-1 (3,3,3) only): no patch materialization
        # at all. The rolled slab viewed as (kd_span*Cf, TH_in*Wp) already
        # IS a valid stationary operand for each (kh, kw) tap group — rows
        # are all (kd, c) pairs, the lane window [kh*Wp, kh*Wp+TH*Wp) is
        # 128-aligned. 9 accumulating dots of K = kd_span*cpt replace the
        # 1 big dot + 27 slab->patches copies. Weights in pack_weights_zc
        # order. Best stride-1 mode measured (e1b 7.19 ms vs 8.2 XLA).
        KC = kd_span * cpt
        for g in range(9):
            kh, kw = divmod(g, 3)
            r = rolled_for(1 - kw).reshape(kd_span * x.shape[1], TH_in * Wp)
            acc = acc + jax.lax.dot_general(
                w_ref[:, g * KC: (g + 1) * KC],
                r[:, kh * Wp: kh * Wp + TH * Wp],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[...] = acc.reshape(1, 1, Co, TH * Wp).astype(out_ref.dtype)
        return
    nc = n_chunks or 1
    per = (len(taps) + nc - 1) // nc
    for c in range(nc):
        chunk = taps[c * per: (c + 1) * per]
        if not chunk:
            break
        buf = c % 2 if n_chunks else 0
        for j, (kdi, rowi, shift, c0) in enumerate(chunk):
            patches[buf, j * cpt: (j + 1) * cpt, :] = (
                rolled_for(shift)[kdi, c0: c0 + cpt,
                                  rowi * Wp: rowi * Wp + TH * Wp]
            )
        k0 = (c * per) * cpt
        acc = acc + jax.lax.dot_general(
            w_ref[:, k0: k0 + len(chunk) * cpt],   # (Co, Kc) streams
            patches[buf, : len(chunk) * cpt, :],   # (Kc, TH*Wp) stationary
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[...] = acc.reshape(1, 1, Co, TH * Wp).astype(out_ref.dtype)


# --------------------------------------------------------------------- #
# flat-layout entry point
# --------------------------------------------------------------------- #

@functools.partial(
    jax.jit,
    static_argnames=("taps", "spans", "cpt", "W", "TH", "interpret",
                     "out_dtype", "n_chunks"),
)
def conv_cf_flat(xcf, w2, *, taps, spans, cpt, W, TH=8, interpret=False,
                 out_dtype=jnp.bfloat16, n_chunks=0):
    """Stride-1 (possibly s2d-folded) conv on channel-first flat input.

    xcf: (B, D_in, Cf, H_in*Wp) -- D/H halos included, zero pad lanes.
    w2:  (Co, len(taps)*cpt).
    Returns (B, D_out, Co, H_out*Wp), H_out = H_in - kh_span + 1.
    """
    kd_span, kh_span, _ = spans
    B, D_in, Cf, HWp = xcf.shape
    Wp = _round_up(W + 3, 128)
    H_in = HWp // Wp
    H_out = H_in - kh_span + 1
    D_out = D_in - kd_span + 1
    Co, K = w2.shape
    assert K == len(taps) * cpt, (K, len(taps), cpt)
    assert H_out % TH == 0, (H_out, TH)

    nc = n_chunks if n_chunks > 0 else 1
    per = (len(taps) + nc - 1) // nc
    nbuf = 2 if n_chunks > 0 else 1
    if n_chunks < 0:
        per, nbuf = 1, 1  # zc/output-roll: patches scratch unused (min alloc)
    body = functools.partial(
        _kernel, taps=taps, cpt=cpt, TH=TH, Co=Co, Wp=Wp,
        kd_span=kd_span, kh_span=kh_span, n_chunks=n_chunks,
    )
    grid = (B, D_out, H_out // TH)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM; DMA'd
            pl.BlockSpec(
                (Co, K), lambda b, d, h: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Co, TH * Wp),
            lambda b, d, h: (b, d, 0, h),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D_out, Co, H_out * Wp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kd_span, Cf, (TH + kh_span - 1) * Wp), xcf.dtype),
            pltpu.VMEM((nbuf, per * cpt, TH * Wp), xcf.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xcf, w2)
    return out


# --------------------------------------------------------------------- #
# layout helpers (XLA side)
# --------------------------------------------------------------------- #

def to_cf_flat(x, kernel_shape, strides=(1, 1, 1), dtype=None, cp_mult=16):
    """(B, D, H, W, C) channels-last -> (B, D_in, Cf, H_in*Wp) folded
    channel-first flat layout with conv halo blocks zero-padded.

    For strides > 1 this is the space-to-depth fold: spatial dims shrink by
    the stride, channels become phases * round_up(C, cp_mult) (per-phase
    padded so every tap's channel slice is sublane-aligned).
    Returns (xcf, meta)."""
    sd, sh, sw = strides
    B, D, H, W, C = x.shape
    assert D % sd == 0 and H % sh == 0 and W % sw == 0
    cpt = _round_up(C, cp_mult)
    Db, Hb, Wb = D // sd, H // sh, W // sw
    _, spans, pad_l = make_taps(kernel_shape, strides, cpt)
    pad_r = [s - 1 - p for s, p in zip(spans, pad_l)]
    Wp = _round_up(Wb + pad_l[2] + 2, 128)

    # fold phases into channels (phase-major), pad each phase to cpt
    x = jnp.pad(x, ((0, 0),) * 4 + ((0, cpt - C),))
    x = x.reshape(B, Db, sd, Hb, sh, Wb, sw, cpt)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        B, Db, Hb, Wb, sd * sh * sw * cpt
    )
    # halo blocks + lane padding (left pad_l[2] lanes, zeros to Wp)
    x = jnp.pad(
        x,
        ((0, 0), (pad_l[0], pad_r[0]), (pad_l[1], pad_r[1]),
         (pad_l[2], Wp - Wb - pad_l[2]), (0, 0)),
    )
    xcf = jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(
        B, Db + spans[0] - 1, sd * sh * sw * cpt, (Hb + spans[1] - 1) * Wp
    )
    meta = dict(B=B, D=Db, H=Hb, W=Wb, C=C, cpt=cpt, Wp=Wp,
                spans=spans, pad_l=pad_l, strides=strides)
    if dtype is not None:
        xcf = xcf.astype(dtype)
    return xcf, meta


def from_cf_flat(ycf, meta, Co):
    """(B, D, Co, H*Wp) -> (B, D, H, W, Co) channels-last."""
    B, D, _, HWp = ycf.shape
    Wp = meta["Wp"]
    off = meta["pad_l"][2]
    H = HWp // Wp
    y = ycf.reshape(B, D, Co, H, Wp)[..., off: off + meta["W"]]
    return jnp.transpose(y, (0, 1, 3, 4, 2))


def pack_weights(w, taps_order, cpt, dtype=None):
    """Traced (kd, kh, kw, C, Co) -> (Co, n_taps*cpt) in make_taps order
    (plain (kd, kh, kw) loop order), channels zero-padded to cpt."""
    kd, kh, kw, C, Co = w.shape
    n = kd * kh * kw
    wf = w.reshape(n, C, Co)
    wf = jnp.pad(wf, ((0, 0), (0, cpt - C), (0, 0)))
    w2 = wf.reshape(n * cpt, Co).T
    return w2 if dtype is None else w2.astype(dtype)


def pack_weights_zc(w, cpt, dtype=None):
    """Traced (kd, kh, kw, C, Co) -> (Co, 27*cpt) in output-roll order:
    K index = ((kh*3 + kw)*kd + kdi)*cpt + c, so each (kh, kw) tap group is
    one contiguous (Co, kd*cpt) block whose rows match the (kd, c) layout
    of the flattened slab."""
    kd, kh, kw, C, Co = w.shape
    wf = jnp.pad(w, ((0, 0),) * 3 + ((0, cpt - C), (0, 0)))
    w2 = jnp.transpose(wf, (1, 2, 0, 3, 4)).reshape(kh * kw * kd * cpt, Co).T
    return w2 if dtype is None else w2.astype(dtype)


# --------------------------------------------------------------------- #
# channels-last wrapper + gradients
# --------------------------------------------------------------------- #

def _xla_conv(x, w, strides):
    pads = [((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3]]
    return jax.lax.conv_general_dilated(
        x, w, strides, pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _pallas_fwd(x, w, strides, n_chunks, interpret):
    ks = w.shape[:3]
    Co = w.shape[4]
    if n_chunks < 0:
        assert tuple(ks) == (3, 3, 3) and tuple(strides) == (1, 1, 1), (
            "zero-copy/output-roll modes are stride-1 (3,3,3) only")
    xcf, meta = to_cf_flat(x, ks, strides)
    taps, spans, _ = make_taps(ks, strides, meta["cpt"])
    if n_chunks < 0:
        w2 = pack_weights_zc(w, meta["cpt"])
    else:
        w2 = pack_weights(w, taps, meta["cpt"])
    Ho = meta["H"]
    TH = max(th for th in (8, 4, 2, 1) if Ho % th == 0)
    ycf = conv_cf_flat(
        xcf, w2, taps=taps, spans=spans, cpt=meta["cpt"], W=meta["W"],
        TH=TH, interpret=interpret, out_dtype=x.dtype, n_chunks=n_chunks,
    )
    return from_cf_flat(ycf, meta, Co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_conv(x, w, strides=(1, 1, 1), n_chunks=0, interpret=False):
    """Channels-last symmetric-padded conv, Pallas forward / XLA backward.

    x: (B, D, H, W, C); w: (kd, kh, kw, C, Co); stride divides the spatial
    dims (nnU-Net patch sizes guarantee this). Output matches
    ``lax.conv_general_dilated`` with pad (k-1)//2 per axis.
    """
    return _pallas_fwd(x, w, strides, n_chunks, interpret)


def _vjp_fwd(x, w, strides, n_chunks, interpret):
    return _pallas_fwd(x, w, strides, n_chunks, interpret), (x, w)


def _vjp_bwd(strides, n_chunks, interpret, res, g):
    x, w = res
    # Backward through XLA's own conv lowering: training numerics are
    # bit-identical to the non-Pallas path; only the forward gets faster.
    _, vjp = jax.vjp(lambda x_, w_: _xla_conv(x_, w_, strides), x, w)
    return vjp(g.astype(x.dtype))


pallas_conv.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------- #
# dispatch policy
# --------------------------------------------------------------------- #

def runtime_platform() -> str:
    """Platform the computation will actually run on: honors a
    ``jax.default_device`` scope (e.g. an fp32-CPU oracle inside a TPU
    process) over the process default backend. Same resolution as
    ``kernels/knn.py``."""
    default_dev = jax.config.jax_default_device
    if default_dev is None:
        return jax.devices()[0].platform
    if isinstance(default_dev, str):  # jax also accepts platform names
        return default_dev
    return default_dev.platform

def pallas_conv_wins(in_spatial, C, Co, kernel_shape, strides) -> bool:
    """True where the Pallas kernel beat the model's actual XLA lowering in
    the v5e sweep (``tools/exp_conv_v2.py bench``/``benchwrap``, PERF.md).

    The winning region: 3D (3,3,3) kernels at large spatial extent —
    decoder convs after skip-concat and the strided encoder downsamples.
    (1,*,*) kernels lose to FoldedConv's depth-batched 2D conv; deep
    small-spatial stages lose to XLA (e3b: 110 TF/s XLA vs 27 Pallas).
    """
    if tuple(kernel_shape) != (3, 3, 3):
        return False
    if any(s % st for s, st in zip(in_spatial, strides)):
        return False
    out_sp = [s // st for s, st in zip(in_spatial, strides)]
    # H must tile (TH>=2) and W must not waste most of the padded lane row
    if out_sp[1] % 2 or out_sp[2] < 48:
        return False
    # measured crossover: wins when the INPUT extent is >= ~(64,96,112)
    # (e1a/e2a/e1b/d1 in the flagship); the next stage down (e2b/d2 read
    # (32,48,56)) already loses to XLA (110 TF/s at e3b vs 27 Pallas)
    return int(np.prod(in_spatial)) >= 64 * 96 * 112 and max(C, Co) <= 192
