"""Pallas conv kernel, round 2: patches-STATIONARY orientation.

Round 1 (tools/exp_conv_kernel.py) im2col'd with spatial-major patches,
P(spatial, K) @ W(K, Co): the MXU pads the stationary operand's N dim
(= Co = 33..132) to 128 -> 74% waste at Co=33, and patch assembly needed
lane-offset stores at multiples of C (unaligned) -> Mosaic relayouts.
PERF.md recorded it 3-4x slower than XLA.

This round flips the matmul: out(Co, S) = W2(Co, K) @ P(K, S).
The STATIONARY operand is now P with K = taps*Cp on sublanes and the
spatial tile S on lanes:

- K pads to 128 with <5% waste (27*48=1296 for C=33); the tiny channel
  count Co only streams as lhs rows, costing pipeline fill, not lanes.
- P assembly is all ALIGNED ops: the input slab lives in VMEM as
  (Cp, rows*Wp) with Cp a sublane-tile multiple (16 for bf16) and Wp a
  lane-tile multiple (128); tap (kh,kw) is a lane-ROLL of the whole slab
  by -(kw-1) (reused across kh,kd) plus an aligned lane slice at row
  offset kh*Wp, stored at sublane offset t*Cp -- no relayouts anywhere.
- The OUTPUT stays in the same (Co, rows*Wp) flat channel-first layout,
  so consecutive convs compose without transposes; conv zero-padding is
  carried as zeroed pad lanes (columns 0 and W+1 of each Wp row).

Strided convs enter as their space-to-depth form (tools/exp_conv_s2d.py),
but NOT the naive fold (which carries 1.78-2.37x zero-weight FLOPs): the
kernel takes an explicit TAP LIST -- (slab_d, row_offset, lane_shift,
channel_offset) per original tap -- so only the 27 real taps are
assembled, each reading one phase's per-phase-padded channel slice.
K stays taps*Cp(C_orig), identical to the equivalent stride-1 conv:
zero extra FLOPs, all slices still sublane/lane aligned.

Usage:
  python tools/exp_conv_v2.py check          # CPU interpret-mode parity
  python tools/exp_conv_v2.py bench [name]   # TPU: vs XLA conv per shape
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextou_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _round_up(x, m):
    return (x + m - 1) // m * m


def _axis_taps(k, s):
    """Per-axis tap -> (block offset q, phase r) for the s2d fold of a
    symmetric-padded (pad k//2) stride-s conv: input position
    s*o + t - k//2 = s*(o+q) + r."""
    return [divmod(t - k // 2, s) for t in range(k)]


def make_taps(kernel_shape, strides, cpt):
    """Tap list for the kernel + fold geometry.

    Returns (taps, spans, pad_lefts) where taps[i] = (slab_d, row_idx,
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
    patches: VMEM (2?, chunk*cpt, TH*Wp) scratch (stationary matmul operand).

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
    # MXU instead of serializing with it.
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
        # OUTPUT-ROLL mode (stride-1 (3,3,3)): dots read direct aligned
        # slices of the UNrolled slab; the lane shift for tap kw is applied
        # to the (Co, TH*Wp) f32 partial result instead (native 32-bit
        # roll, ~35x fewer bytes than rolling the slab, no dtype round
        # trips). Wrap-around bleed lands in / comes from zeroed pad lanes
        # (Wp >= W+3), which from_cf_flat discards.
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
        # ZERO-COPY mode (stride-1 (3,3,3) only): no patch materialization.
        # The rolled slab viewed as (kd_span*Cf, TH_in*Wp) already IS a
        # valid stationary operand for each (kh, kw) tap group -- rows are
        # all (kd, c) pairs, the lane window [kh*Wp, kh*Wp+TH*Wp) is
        # 128-aligned. 9 accumulating dots of K = kd_span*cpt replace the
        # 1 big dot + 27 slab->patches copies.
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
# host wrapper
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
        per, nbuf = 1, 1  # zero-copy: patches scratch unused (minimal alloc)
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

def to_cf_flat(x, kernel_shape, strides=(1, 1, 1), dtype=jnp.bfloat16,
               cp_mult=16):
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
    return xcf.astype(dtype), meta


def from_cf_flat(ycf, meta, Co):
    """(B, D, Co, H*Wp) -> (B, D, H, W, Co) channels-last."""
    B, D, _, HWp = ycf.shape
    Wp = meta["Wp"]
    off = meta["pad_l"][2]
    H = HWp // Wp
    y = ycf.reshape(B, D, Co, H, Wp)[..., off: off + meta["W"]]
    return jnp.transpose(y, (0, 1, 3, 4, 2))


def pack_weights(w, taps_order, cpt, C, dtype=jnp.bfloat16):
    """(kd, kh, kw, C, Co) -> (Co, n_taps*cpt) in make_taps order
    (which is plain (kd, kh, kw) loop order), zero-padded channels."""
    kd, kh, kw, _, Co = w.shape
    n = kd * kh * kw
    wp = np.zeros((n, cpt, Co), np.float32)
    wf = np.asarray(w, np.float32).reshape(n, C, Co)
    wp[:, :C] = wf
    return jnp.asarray(wp.reshape(n * cpt, Co).T, dtype)


def pack_weights_zc(w, cpt, C, dtype=jnp.bfloat16):
    """Zero-copy order: K index = ((kh*3 + kw)*kd_span + kd)*cpt + c, so
    each (kh, kw) tap group is one contiguous (Co, kd_span*cpt) block whose
    rows match the (kd, c) layout of the flattened slab."""
    kd, kh, kw, _, Co = w.shape
    wp = np.zeros((kh, kw, kd, cpt, Co), np.float32)
    wp[:, :, :, :C] = np.transpose(np.asarray(w, np.float32),
                                   (1, 2, 0, 3, 4))
    return jnp.asarray(wp.reshape(kh * kw * kd * cpt, Co).T, dtype)


# --------------------------------------------------------------------- #
# check / bench
# --------------------------------------------------------------------- #

def conv_ref(x, w, strides=(1, 1, 1)):
    pads = [((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3]]
    return jax.lax.conv_general_dilated(
        x, w, strides, pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def run_pallas(x, w, strides, TH, n_chunks, interpret, dtype):
    ks = w.shape[:3]
    C, Co = w.shape[3], w.shape[4]
    xcf, meta = to_cf_flat(x, ks, strides, dtype=dtype)
    taps, spans, _ = make_taps(ks, strides, meta["cpt"])
    if n_chunks < 0:
        w2 = pack_weights_zc(np.asarray(w, np.float32), meta["cpt"], C,
                             dtype=dtype)
    else:
        w2 = pack_weights(np.asarray(w, np.float32), taps, meta["cpt"], C,
                          dtype=dtype)
    ycf = conv_cf_flat(
        xcf, w2, taps=taps, spans=spans, cpt=meta["cpt"], W=meta["W"],
        TH=TH, interpret=interpret, out_dtype=dtype, n_chunks=n_chunks,
    )
    return from_cf_flat(ycf, meta, Co)


def check():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    for (B, D, H, W, C, Co, ks, st, TH) in [
        (1, 4, 16, 120, 5, 7, (3, 3, 3), (1, 1, 1), 8),
        (2, 3, 8, 126, 33, 33, (1, 3, 3), (1, 1, 1), 4),
        (1, 5, 16, 96, 12, 9, (3, 3, 3), (1, 1, 1), 8),
        (1, 4, 32, 64, 9, 8, (3, 3, 3), (1, 2, 2), 8),
        (1, 8, 16, 32, 7, 10, (3, 3, 3), (2, 2, 2), 4),
    ]:
        x = rng.standard_normal((B, D, H, W, C)).astype(np.float32)
        w = (rng.standard_normal((*ks, C, Co)) * 0.1).astype(np.float32)
        want = np.asarray(conv_ref(jnp.asarray(x), jnp.asarray(w), st))
        ncs = (0, 3, -1, -2) if (ks == (3, 3, 3) and st == (1, 1, 1)) else (0, 3)
        for nc in ncs:
            got = np.asarray(run_pallas(
                jnp.asarray(x), jnp.asarray(w), st, TH, nc, interpret,
                jnp.float32,
            ))
            err = float(np.abs(got - want).max())
            scale = float(np.abs(want).max())
            status = "OK" if err < 1e-3 * max(scale, 1) else "FAIL"
            print(f"{status} nc{nc} B{B} D{D} H{H} W{W} C{C}->{Co} k{ks} "
                  f"s{st}: max|err| {err:.2e} (|y| {scale:.1f})", flush=True)


def bench():
    from nextou_tpu.utils.timing import device_loop_time

    which = sys.argv[2] if len(sys.argv) > 2 else None
    B = 2
    shapes = [
        # name, IN spatial (D,H,W), C, Co, kernel, stride
        ("e0b", (64, 192, 224), 33, 33, (1, 3, 3), (1, 1, 1)),
        ("e1b", (64, 96, 112), 66, 66, (3, 3, 3), (1, 1, 1)),
        ("e2b", (32, 48, 56), 132, 132, (3, 3, 3), (1, 1, 1)),
        ("e3b", (16, 24, 28), 264, 264, (3, 3, 3), (1, 1, 1)),
        ("d1", (64, 96, 112), 132, 66, (3, 3, 3), (1, 1, 1)),
        ("d2", (32, 48, 56), 264, 132, (3, 3, 3), (1, 1, 1)),
        ("d0", (64, 192, 224), 66, 33, (1, 3, 3), (1, 1, 1)),
        # strided convs; kernel sees the s2d fold with real taps only
        ("e1a", (64, 192, 224), 33, 66, (3, 3, 3), (1, 2, 2)),
        ("e2a", (64, 96, 112), 66, 132, (3, 3, 3), (2, 2, 2)),
    ]
    rng = np.random.default_rng(0)
    for name, sp, C, Co, ks, st in shapes:
        if which and name != which:
            continue
        D, H, W = sp
        Ho = H // st[1]
        TH = 8 if Ho % 8 == 0 else 4
        x = jnp.asarray(
            rng.standard_normal((B, D, H, W, C)), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.standard_normal((*ks, C, Co)) * 0.05, jnp.bfloat16
        )
        out_sp = D // st[0] * Ho * (W // st[2])
        flops = 2 * B * out_sp * int(np.prod(ks)) * C * Co

        dt_x = device_loop_time(
            lambda x: conv_ref(x, w, st).astype(jnp.bfloat16), x,
            n_small=1, n_large=6, repeats=2,
        )
        xcf, meta = to_cf_flat(x, ks, st)
        taps, spans, _ = make_taps(ks, st, meta["cpt"])
        w2 = pack_weights(np.asarray(w, np.float32), taps, meta["cpt"], C)
        w2zc = (pack_weights_zc(np.asarray(w, np.float32), meta["cpt"], C)
                if (ks == (3, 3, 3) and st == (1, 1, 1)) else None)
        row = f"{name}: XLA {dt_x*1e3:7.2f} ms ({flops/dt_x/1e12:5.1f} TF/s)"
        for nc in (0, 3, -1, -2):
            if nc < 0 and w2zc is None:
                continue
            f = functools.partial(
                conv_cf_flat, taps=taps, spans=spans, cpt=meta["cpt"],
                W=meta["W"], TH=TH, n_chunks=nc,
            )
            wsel = w2zc if nc < 0 else w2
            dt_p = device_loop_time(lambda t: f(t, wsel), xcf,
                                    n_small=1, n_large=6, repeats=2)
            row += (f" | nc{nc} {dt_p*1e3:7.2f} ms"
                    f" ({flops/dt_p/1e12:5.1f} TF/s)")
        print(row, flush=True)


def benchwrap():
    """Channels-last in/out: layout conversions INSIDE the jit, so this is
    the cost of dropping the kernel into the model as a plain conv
    replacement (transposes not amortized across consecutive convs)."""
    from nextou_tpu.utils.timing import device_loop_time

    which = sys.argv[2] if len(sys.argv) > 2 else None
    B = 2
    shapes = [
        ("e1b", (64, 96, 112), 66, 66, (3, 3, 3), (1, 1, 1)),
        ("d1", (64, 96, 112), 132, 66, (3, 3, 3), (1, 1, 1)),
        ("d2", (32, 48, 56), 264, 132, (3, 3, 3), (1, 1, 1)),
        ("e1a", (64, 192, 224), 33, 66, (3, 3, 3), (1, 2, 2)),
        ("e2a", (64, 96, 112), 66, 132, (3, 3, 3), (2, 2, 2)),
    ]
    rng = np.random.default_rng(0)
    for name, sp, C, Co, ks, st in shapes:
        if which and name != which:
            continue
        D, H, W = sp
        Ho = H // st[1]
        TH = 8 if Ho % 8 == 0 else 4
        x = jnp.asarray(
            rng.standard_normal((B, D, H, W, C)), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.standard_normal((*ks, C, Co)) * 0.05, jnp.bfloat16
        )
        out_sp = D // st[0] * Ho * (W // st[2])
        flops = 2 * B * out_sp * int(np.prod(ks)) * C * Co

        dt_x = device_loop_time(
            lambda x: conv_ref(x, w, st).astype(jnp.bfloat16), x,
            n_small=1, n_large=6, repeats=2,
        )
        # weights packed once outside (as the model would at param load)
        cpt = _round_up(C, 16)
        taps, spans, _ = make_taps(ks, st, cpt)
        w2 = pack_weights(np.asarray(w, np.float32), taps, cpt, C)
        row = f"{name}: XLA {dt_x*1e3:7.2f} ms ({flops/dt_x/1e12:5.1f} TF/s)"
        for nc in (0, 3):
            def wrapped(t, nc=nc):
                xcf, meta = to_cf_flat(t, ks, st)
                ycf = conv_cf_flat(
                    xcf, w2, taps=taps, spans=spans, cpt=meta["cpt"],
                    W=meta["W"], TH=TH, n_chunks=nc,
                )
                return from_cf_flat(ycf, meta, Co)
            dt_p = device_loop_time(wrapped, x, n_small=1, n_large=6,
                                    repeats=2)
            row += (f" | wrap-nc{nc} {dt_p*1e3:7.2f} ms"
                    f" ({flops/dt_p/1e12:5.1f} TF/s)")
        print(row, flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    {"check": check, "bench": bench, "benchwrap": benchwrap}[mode]()
