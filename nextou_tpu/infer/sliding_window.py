"""Gaussian-blended sliding-window inference with mirroring TTA.

The north-star workload (SURVEY.md §3.4): tile the volume with 50%-overlap
patches, per tile average softmax over the allowed mirror flips, weight by a
Gaussian importance map (sigma = patch/8), accumulate, normalize.

TPU design: the per-tile forward + TTA + softmax + Gaussian weighting is one
jitted function over a *batch of tiles* (``tile_batch`` tiles per device
step, so the MXU sees large batched convs); accumulation into the full
volume happens host-side in fp32 (volumes can exceed HBM for large cases).
Mirror combinations are static (compiled in), matching
``inference_allowed_mirroring_axes`` semantics.
"""

from __future__ import annotations

import itertools
import math
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def compute_sliding_window_steps(
    image_size: Sequence[int], patch_size: Sequence[int], step_fraction: float = 0.5
) -> list[list[int]]:
    """Per-axis tile start coordinates (nnU-Net's algorithm: cover the volume
    with >= 1/step_fraction overlap, ends aligned)."""
    steps = []
    for img, patch in zip(image_size, patch_size):
        assert img >= patch, (image_size, patch_size)
        target = patch * step_fraction
        num = int(np.ceil((img - patch) / target)) + 1
        if num > 1:
            actual = (img - patch) / (num - 1)
            steps.append([int(round(i * actual)) for i in range(num)])
        else:
            steps.append([0])
    return steps


def gaussian_importance_map(
    patch_size: Sequence[int], sigma_scale: float = 1.0 / 8
) -> np.ndarray:
    """Separable Gaussian centered on the patch, max 1, strictly positive."""
    axes = []
    for p in patch_size:
        c = (p - 1) / 2.0
        sigma = p * sigma_scale
        i = np.arange(p, dtype=np.float64)
        axes.append(np.exp(-0.5 * ((i - c) / sigma) ** 2))
    g = axes[0]
    for a in axes[1:]:
        g = np.multiply.outer(g, a)
    g = g / g.max()
    g = np.maximum(g, g[g > 0].min())
    return g.astype(np.float32)


def _activation_fn(name: str):
    """'softmax' (label mode) or 'sigmoid' (region-based training)."""
    if name == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"unknown activation '{name}'")


def make_tile_predictor(
    apply_fn: Callable[[jax.Array], jax.Array],
    mirror_axes: Sequence[int] | None,
    mesh: "jax.sharding.Mesh | None" = None,
    activation: str = "softmax",
) -> Callable[[jax.Array], jax.Array]:
    """Wrap a logits function into a jitted softmax+TTA tile predictor.

    Args:
        apply_fn: ``(B, *patch, C_in) -> (B, *patch, num_classes)`` logits
            (the model's full-res head, deep supervision off).
        mirror_axes: spatial axes for flip-TTA (None/() disables). 2^|axes|
            forward passes, averaged (SURVEY.md §3.4).
        mesh: optional device mesh — the tile batch is sharded over all its
            axes (the north-star deployment: the tile pipeline spread over a
            TPU slice; each device runs full forward passes on its shard of
            tiles, no cross-device communication inside the step).
    """
    axes = tuple(mirror_axes) if mirror_axes else ()
    combos = []
    for r in range(len(axes) + 1):
        combos.extend(itertools.combinations(axes, r))
    act = _activation_fn(activation)

    def predict(tiles: jax.Array) -> jax.Array:
        total = None
        for combo in combos:
            flip_dims = tuple(a + 1 for a in combo)  # skip batch dim
            x = jnp.flip(tiles, flip_dims) if combo else tiles
            logits = apply_fn(x)
            if combo:
                logits = jnp.flip(logits, flip_dims)
            probs = act(logits.astype(jnp.float32))
            total = probs if total is None else total + probs
        return total / float(len(combos))

    if mesh is None:
        return jax.jit(predict)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(mesh.axis_names))
    return jax.jit(predict, in_shardings=sh, out_shardings=sh)


def make_device_sliding_predictor(
    apply_fn: Callable[[jax.Array], jax.Array],
    mirror_axes: Sequence[int] | None,
    patch_size: Sequence[int],
    num_classes: int,
    *,
    tile_batch: int = 4,
    use_gaussian: bool = True,
    fused: bool = False,
    activation: str = "softmax",
    mesh: "jax.sharding.Mesh | None" = None,
    output: str = "probs",
    transfer_dtype=None,
    step_fraction: float = 0.5,
):
    """Fully device-resident sliding window: the volume is transferred to
    HBM once; tile extraction (dynamic_slice), TTA forward, softmax,
    Gaussian-weighted accumulation into logit/weight volumes, normalization
    and argmax all run on device — host<->device traffic is one volume in,
    one (seg or probs) out. This is the TPU-native serving path (SURVEY.md
    §7); the host-accumulation path below remains the fallback for volumes
    whose probability accumulator does not fit HBM.

    ``fused=True`` compiles the ENTIRE sliding window (all chunks, blending,
    normalization) into one program dispatched once per volume — the lowest
    possible per-volume latency, but the model is recompiled for every new
    volume shape. Use for fixed-shape serving; the default split form shares
    one model program across all volume shapes.

    ``output='probs'`` returns ``(*sp, num_classes) f32``; ``output='seg'``
    (label mode only) argmaxes ON DEVICE and returns ``(*sp) int16`` — the
    blend-weight division cancels inside the argmax, and the host transfer
    shrinks by ``4*num_classes`` (240 MB -> 8 MB per flagship volume), which
    matters through PCIe and even more through a tunneled TPU; with
    ``num_classes <= 255`` the seg ships as uint8, halving it again.

    ``transfer_dtype`` (default bfloat16) is the dtype the volume is cast to
    on the HOST before the device transfer — the model computes in bf16
    anyway, and halving the upload is a measured ~200 ms/volume through the
    tunneled transport (~40 MB/s). Pass jnp.float32 to ship full precision.
    """
    assert output in ("probs", "seg"), output
    if output == "seg" and activation != "softmax":
        raise ValueError("output='seg' requires softmax label mode")
    patch = tuple(patch_size)
    dim = len(patch)
    axes = tuple(mirror_axes) if mirror_axes else ()
    combos = []
    for r in range(len(axes) + 1):
        combos.extend(itertools.combinations(axes, r))
    gauss_np = (
        gaussian_importance_map(patch)
        if use_gaussian
        else np.ones(patch, np.float32)
    )
    act = _activation_fn(activation)

    # Three small programs instead of one monolith (the model-sized program
    # would recompile per volume shape and takes minutes on a tunneled TPU;
    # split this way, only `extract`/`accumulate` — trivial compiles — depend
    # on the volume shape, and the heavy TTA forward is shared across all
    # volumes). Device arrays flow between jits without leaving HBM.

    def _extract(vol, coords):
        def one(c):
            return jax.lax.dynamic_slice(
                vol, (*c, 0), (*patch, vol.shape[-1])
            )

        return jax.vmap(one)(coords)  # (T, *patch, Cin)

    # Mirror-batched TTA (NEXTOU_TTA_BATCH_MIRRORS=g): stack g of the
    # 2^|axes| flip variants per forward, i.e. ceil(len(combos)/g) forwards
    # of batch g*T instead of len(combos) sequential forwards of batch T.
    # Same FLOPs; lets the forward run at the device-optimal batch even
    # when the accumulation tile_batch T is small (TTA backs off to T=2 on
    # 16 GB HBM, but the flagship forward is fastest around batch 4).
    # "0" or "1" = sequential (one mirror per dispatch); "all" = every
    # mirror variant in ONE dispatch (max memory — this is the mode that
    # OOMed at tile_batch 4). Default 2 — the round-4 on-chip A/B
    # (tools/exp_tta_groups.py, tile_batch 2): g=2 3.438 s/volume vs
    # sequential 5.087 (+32% tiles/s); g=4 (batch-8 forward) OOMs compile.
    import os as _os

    _mg_env = _os.environ.get("NEXTOU_TTA_BATCH_MIRRORS", "2")
    _mirror_group = len(combos) if _mg_env == "all" else int(_mg_env)
    _batch_mirrors = len(combos) > 1 and _mirror_group > 1

    def _tile_forward(tiles):
        if _batch_mirrors:
            total = None
            for g0 in range(0, len(combos), _mirror_group):
                group = combos[g0 : g0 + _mirror_group]
                stacked = jnp.concatenate(
                    [
                        jnp.flip(tiles, tuple(a + 1 for a in combo))
                        if combo
                        else tiles
                        for combo in group
                    ],
                    axis=0,
                )
                logits = apply_fn(stacked)
                parts = jnp.split(logits, len(group), axis=0)
                for combo, part in zip(group, parts):
                    if combo:
                        part = jnp.flip(part, tuple(a + 1 for a in combo))
                    probs = act(part.astype(jnp.float32))
                    total = probs if total is None else total + probs
            return total / float(len(combos))
        total = None
        for combo in combos:
            flip_dims = tuple(a + 1 for a in combo)
            x = jnp.flip(tiles, flip_dims) if combo else tiles
            logits = apply_fn(x)
            if combo:
                logits = jnp.flip(logits, flip_dims)
            probs = act(logits.astype(jnp.float32))
            total = probs if total is None else total + probs
        return total / float(len(combos))

    def _accumulate(acc, weight, probs, coords, valid):
        gauss = jnp.asarray(gauss_np)
        w = valid.astype(jnp.float32)  # mask padded duplicate tiles

        def body(i, carry):
            acc, weight = carry
            c = coords[i]
            g = gauss * w[i]
            sl = jax.lax.dynamic_slice(acc, (*c, 0), (*patch, num_classes))
            acc = jax.lax.dynamic_update_slice(
                acc, sl + probs[i] * g[..., None], (*c, 0)
            )
            ws = jax.lax.dynamic_slice(weight, c, patch)
            weight = jax.lax.dynamic_update_slice(weight, ws + g, tuple(c))
            return acc, weight

        return jax.lax.fori_loop(0, coords.shape[0], body, (acc, weight))

    seg_dtype = jnp.uint8 if num_classes <= 255 else jnp.int16

    def _finalize(acc, weight):
        if output == "seg":
            # argmax(acc / w) == argmax(acc): w > 0 and identical per class
            return jnp.argmax(acc, axis=-1).astype(seg_dtype)
        return acc / weight[..., None]

    if mesh is None:
        extract = jax.jit(_extract)
        tile_forward = jax.jit(_tile_forward)
        accumulate = jax.jit(_accumulate, donate_argnums=(0, 1))
        finalize = jax.jit(_finalize)
        n_dev = 1
    else:
        # multi-chip serving: volume + accumulators replicated, the tile
        # batch sharded over all mesh axes; GSPMD partitions the forward
        # per shard and inserts the gather feeding the accumulate loop
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        shd = NamedSharding(mesh, P(mesh.axis_names))
        n_dev = int(np.prod(list(mesh.shape.values())))
        extract = jax.jit(_extract, in_shardings=(rep, rep), out_shardings=shd)
        tile_forward = jax.jit(_tile_forward, in_shardings=shd, out_shardings=shd)
        accumulate = jax.jit(
            _accumulate, donate_argnums=(0, 1),
            in_shardings=(rep, rep, shd, rep, rep), out_shardings=(rep, rep),
        )
        finalize = jax.jit(
            _finalize, in_shardings=(rep, rep), out_shardings=rep
        )

    @jax.jit
    def run_fused(vol, coords, valid):
        """One dispatch for the whole volume: lax loop over tile chunks."""
        psp = vol.shape[:-1]
        acc = jnp.zeros((*psp, num_classes), jnp.float32)
        weight = jnp.zeros(psp, jnp.float32)

        def chunk_body(i, carry):
            acc, weight = carry
            probs = _tile_forward(_extract(vol, coords[i]))
            return _accumulate(acc, weight, probs, coords[i], valid[i])

        acc, weight = jax.lax.fori_loop(
            0, coords.shape[0], chunk_body, (acc, weight)
        )
        return _finalize(acc, weight)

    def _chunks(coords):
        tb = int(math.ceil(tile_batch / n_dev)) * n_dev
        chunks, valids = [], []
        for i in range(0, len(coords), tb):
            chunk = coords[i : i + tb]
            valid = np.ones(len(chunk), bool)
            if len(chunk) < tb:
                n_pad = tb - len(chunk)
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], n_pad, 0)])
                valid = np.concatenate([valid, np.zeros(n_pad, bool)])
            chunks.append(chunk)
            valids.append(valid)
        return np.asarray(chunks, np.int32), np.asarray(valids)

    tdt = jnp.bfloat16 if transfer_dtype is None else transfer_dtype

    def predict(data) -> jax.Array:
        spatial = data.shape[:-1]
        pad = [(0, max(0, p - s)) for s, p in zip(spatial, patch)]
        if any(p[1] for p in pad):
            data = np.pad(np.asarray(data), pad + [(0, 0)])
        if data.dtype != tdt:
            # halve the host->device transfer; also applies to jax-array
            # inputs so an explicit transfer_dtype override always holds
            data = data.astype(tdt)
        psp = data.shape[:-1]
        steps = compute_sliding_window_steps(psp, patch, step_fraction)
        coords = np.asarray(list(itertools.product(*steps)), np.int32)
        chunks, valids = _chunks(coords)

        vol = jnp.asarray(data)
        if fused:
            out = run_fused(vol, jnp.asarray(chunks), jnp.asarray(valids))
        else:
            acc = jnp.zeros((*psp, num_classes), jnp.float32)
            weight = jnp.zeros(psp, jnp.float32)
            for chunk, valid in zip(chunks, valids):
                acc, weight = accumulate(
                    acc, weight,
                    tile_forward(extract(vol, jnp.asarray(chunk))),
                    jnp.asarray(chunk), jnp.asarray(valid),
                )
            out = finalize(acc, weight)
        sl = tuple(slice(0, s) for s in spatial)
        return out[sl] if output == "seg" else out[sl + (slice(None),)]

    return predict


def sliding_window_predict(
    tile_predictor: Callable[[jax.Array], jax.Array],
    data: np.ndarray,
    patch_size: Sequence[int],
    num_classes: int,
    *,
    step_fraction: float = 0.5,
    use_gaussian: bool = True,
    tile_batch: int = 4,
    mesh: "jax.sharding.Mesh | None" = None,
) -> np.ndarray:
    """Predict class probabilities for a full volume.

    Args:
        data: ``(*spatial, C_in)`` preprocessed image (channels-last).
        mesh: optional device mesh; the tile batch is sharded across its
            devices (pass a ``tile_predictor`` built with the same mesh).
            ``tile_batch`` is rounded up to a multiple of the mesh size.
    Returns:
        ``(*spatial, num_classes)`` float32 probabilities.
    """
    put = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod(list(mesh.shape.values())))
        tile_batch = int(math.ceil(tile_batch / n_dev)) * n_dev
        sh = NamedSharding(mesh, P(mesh.axis_names))
        put = lambda x: jax.device_put(x, sh)  # noqa: E731
    spatial = data.shape[:-1]
    patch = tuple(patch_size)
    # pad up to patch size if needed
    pad = [(0, max(0, p - s)) for s, p in zip(spatial, patch)]
    padded = np.pad(data, pad + [(0, 0)]) if any(p[1] for p in pad) else data
    psp = padded.shape[:-1]

    steps = compute_sliding_window_steps(psp, patch, step_fraction)
    coords = list(itertools.product(*steps))
    gauss = (
        gaussian_importance_map(patch)
        if use_gaussian
        else np.ones(patch, np.float32)
    )

    acc = np.zeros((*psp, num_classes), np.float32)
    weight = np.zeros(psp, np.float32)

    for i in range(0, len(coords), tile_batch):
        chunk = coords[i : i + tile_batch]
        tiles = np.stack(
            [
                padded[tuple(slice(c, c + p) for c, p in zip(co, patch))]
                for co in chunk
            ]
        )
        # pad the tile batch to a fixed size so the jit sees one shape
        n_real = len(chunk)
        if n_real < tile_batch:
            tiles = np.concatenate(
                [tiles, np.repeat(tiles[-1:], tile_batch - n_real, axis=0)]
            )
        probs = np.asarray(tile_predictor(put(tiles)))[:n_real]
        for co, pr in zip(chunk, probs):
            sl = tuple(slice(c, c + p) for c, p in zip(co, patch))
            acc[sl] += pr * gauss[..., None]
            weight[sl] += gauss
    acc /= weight[..., None]
    # crop padding back off
    sl = tuple(slice(0, s) for s in spatial)
    return acc[sl]
