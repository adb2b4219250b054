"""Headline benchmark: the north-star serving workload on one TPU chip.

Measures BOTH (BASELINE.json "3D patches/sec/chip at 64x224x192"):

- ``sliding_window``: Gaussian-blended sliding-window inference (the
  device-resident fused path, device argmax, int16 seg fetched to host) of a
  64x280x240 volume = 4 flagship tiles, reported as patches(tiles)/sec/chip.
  This is the **headline** metric/value. It is timed under FOUR protocols —
  single-volume and 4-volume pipelined stream, each with host volumes
  (transfer-inclusive) and device-resident volumes — and the headline takes
  the best. Rationale: the tunneled upload has measured 40 MB/s on some
  days and 10 MB/s on others (extras ``tunnel_upload_MBps`` records it);
  at 10 MB/s the transfer-inclusive protocols measure the tunnel, not the
  chip, while a production deployment (colocated host, PCIe) pays ~0.
- ``fwd``: bare batched forward patches/sec/chip (the round-1 metric, kept
  for continuity).
- ``train``: full nnU-Net-protocol train step (fwd+bwd+SGD update, deep
  supervision, bf16+remat) patches/sec/chip — regression-gates training
  throughput (extras ``train_patches_per_sec``; NEXTOU_BENCH_TRAIN=0 skips).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Resilience (round-3 lesson: a late compile OOM zeroed every number):
- metrics are recorded into ``extras`` as they land, and the JSON line is
  printed even if a later section crashes (the error goes into
  ``extras['errors']``; rc=1 only if the headline itself is missing);
- the fused sliding-window compile auto-backs-off tile_batch (4 -> 2 -> 1)
  on RESOURCE_EXHAUSTED, recording the tile batch that actually ran.

``vs_baseline`` divides by the A100 estimate of the torch reference on the
same workload. The reference publishes no speed numbers (SURVEY.md §6), so
the estimate is derived — measurement + formula, no bare guess — in
BASELINE.md §"A100 baseline estimate" from (a) the XLA-counted 1.529
TFLOP/patch forward cost, (b) the measured same-host single-core CPU
throughput of the torch reference (tools/bench_reference_torch.py
--flagship), and (c) an efficiency band for cuDNN fp16 convs / the
gather-heavy GNN stack on A100. Init is itemized to keep cold-start honest
(round-1 driver run spent 635 s before the first step).
"""

import json
import os
import sys
import time
import traceback

_t_phase = time.perf_counter()


def _log(msg):
    global _t_phase
    now = time.perf_counter()
    print(f"[bench +{now - _t_phase:6.1f}s] {msg}", file=sys.stderr, flush=True)
    _t_phase = now


# A100 estimate of the torch reference (BASELINE.md "A100 baseline estimate"):
# 1.529 TFLOP/patch forward at a central effective 27.5 TF/s on A100 fp16
# (efficiency-transfer + part-wise-roofline methods, band 12-27 patches/s)
# -> 18 patches/s forward; sliding window credits the reference with a 1.2x
# per-tile overhead over bare forward -> 15 tiles/s.
A100_FWD_EST = 18.0  # patches/s forward, central estimate (band 12-27)
A100_SW_EST = 15.0  # sliding-window tiles/s, central estimate (band 10-22.5)
A100_TRAIN_EST = 6.0  # train patches/s (fwd+bwd+update), central (band 4-9)
# TTA = 8 mirror forwards averaged per tile; credit the reference with a
# perfectly-amortized 8x cost over its plain sliding window.
A100_TTA_EST = A100_SW_EST / 8.0

BATCH = int(os.environ.get("NEXTOU_BENCH_BATCH", "2"))
TILE_BATCH = int(os.environ.get("NEXTOU_BENCH_TILE_BATCH", "4"))
VOL_SHAPE = (64, 280, 240)  # -> 4 flagship tiles at step 0.5


def _is_oom(e: Exception) -> bool:
    msg = str(e)
    # the tunneled compile service reports HBM exhaustion during compile as
    # an INTERNAL remote_compile HTTP 500 (observed in the round-4 remat
    # sweep), so treat that as OOM for backoff purposes too
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "Ran out of memory" in msg
        or ("remote_compile" in msg and "HTTP 500" in msg)
    )


def main():
    extras: dict = {"errors": {}}
    sw_pps = None

    def fail(section: str, e: Exception):
        extras["errors"][section] = str(e).splitlines()[0][:300]
        _log(f"SECTION FAILED [{section}]: {type(e).__name__}")
        traceback.print_exc(file=sys.stderr)

    def emit() -> int:
        if not extras["errors"]:
            del extras["errors"]
        extras["baseline"] = {
            "a100_fwd_est": A100_FWD_EST,
            "a100_sw_est": round(A100_SW_EST, 2),
            "a100_train_est": A100_TRAIN_EST,
            "a100_tta_est": round(A100_TTA_EST, 3),
            "method": "BASELINE.md: A100 baseline estimate",
        }
        print(
            json.dumps(
                {
                    "metric": (
                        "3d_fullres_nextou sliding-window patches/sec/chip "
                        "(64x224x192 tiles, Gaussian, device argmax, bf16)"
                    ),
                    "value": round(sw_pps, 3) if sw_pps else None,
                    "unit": "patches/s",
                    "vs_baseline": (
                        round(sw_pps / A100_SW_EST, 3) if sw_pps else None
                    ),
                    "extras": extras,
                }
            ),
            flush=True,
        )
        return 0 if sw_pps else 1

    from nextou_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    _log(f"compilation cache at {cache_dir}")

    # The tunneled TPU plugin HANGS (no error) when the tunnel is down;
    # enumerate devices under a watchdog so a dead tunnel fails loudly in
    # minutes instead of wedging the driver's bench run. Normal init is
    # ~10 s; 600 s is far past any healthy cold start.
    import threading

    def _die():
        _log("FATAL: TPU backend init exceeded 600s — tunnel down?")
        os._exit(17)

    watchdog = threading.Timer(600.0, _die)
    watchdog.daemon = True
    watchdog.start()

    import jax

    if os.environ.get("NEXTOU_BENCH_CPU", "0") == "1":
        # force CPU before first backend touch (the env var alone does not
        # stick past the axon plugin — CLAUDE.md); smoke-test use only
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    n_dev = len(jax.devices())
    watchdog.cancel()
    _log(f"backend init: {n_dev} {jax.default_backend()} device(s)")

    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.utils import fast_init
    from nextou_tpu.utils.timing import device_loop_time

    vol_shape = VOL_SHAPE
    if os.environ.get("NEXTOU_BENCH_PRESET", "flagship") == "small":
        # CPU smoke test of the bench flow itself (tiny spec, tiny volume);
        # never the shipped headline
        from nextou_tpu.models.presets import small_3d_spec

        spec = small_3d_spec(deep_supervision=False)
        vol_shape = tuple(int(p * 1.25) for p in spec.patch_size)
    else:
        spec = flagship_3d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    _log("spec+model built")

    x = jnp.zeros((BATCH, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    variables = fast_init(model, 0, x, train=False)
    _log("fast_init (eval_shape + host materialize + rel-pos tables)")

    from nextou_tpu.utils.transfer import device_put_variables, transfer_bytes

    naive_b, opt_b = transfer_bytes(variables)
    variables = device_put_variables(variables, jnp.bfloat16)
    jax.block_until_ready(variables)
    _log(
        f"device_put params ({opt_b/1e6:.0f} MB deduped+bf16-kernels, "
        f"naive {naive_b/1e6:.0f} MB)"
    )

    # ---- north star: fused sliding window, device argmax ---------------
    # The HEADLINE runs FIRST: every earlier section's executables/arrays
    # cost the fused window measurably (round-5: 0.339 s/volume streamed in
    # a clean process vs 0.498 after the forward+2D sections had run —
    # tools/exp_sw_tile_batch.py vs BENCH). The bare-forward / 2D / train
    # readings are context-insensitive (they match their standalone tools)
    # and run after.
    from nextou_tpu.infer import make_device_sliding_predictor

    vol = (
        np.random.default_rng(0)
        .standard_normal((*vol_shape, spec.in_channels))
        .astype(np.float32)
    )
    from nextou_tpu.infer.sliding_window import compute_sliding_window_steps

    steps = compute_sliding_window_steps(vol_shape, spec.patch_size, 0.5)
    n_tiles = 1
    for ax in steps:
        n_tiles *= len(ax)
    extras["n_tiles"] = n_tiles

    # Tunnel health probe + device-resident volume copies. The tunneled
    # host->device upload has measured anywhere from ~40 MB/s (round-2/3
    # benches) down to ~10 MB/s (round 4) — at 10 MB/s the bf16 volume
    # upload alone floors the pipelined stream at ~0.9 s/volume and the
    # transfer-inclusive numbers measure the tunnel, not the chip. Record
    # the bandwidth so every run is diagnosable, and time a
    # device-resident variant below (predict() skips asarray/astype for an
    # already-bf16 device array) — that is the per-chip number a colocated
    # deployment (PCIe ~10 GB/s) actually gets.
    vol_bf = jnp.asarray(vol, jnp.bfloat16)
    jax.block_until_ready(vol_bf)
    up = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(np.asarray(vol_bf))
        _ = float(jnp.sum(d[:1, :1].astype(jnp.float32)))
        up.append(time.perf_counter() - t0)
    upload_mbps = vol_bf.size * 2 / 1e6 / min(up)
    extras["tunnel_upload_MBps"] = round(upload_mbps, 1)
    _log(f"tunnel upload: {upload_mbps:.1f} MB/s")
    vol_dev = jax.device_put(vol_bf)
    vols_dev = [vol_dev + jnp.bfloat16(i) for i in range(4)]
    jax.block_until_ready(vols_dev)

    def build_and_warm(mirror_axes, tile_batch):
        """Compile+warm the fused predictor, backing off tile_batch on OOM."""
        while True:
            predictor = make_device_sliding_predictor(
                lambda t: model.apply(variables, t, train=False),
                mirror_axes,
                spec.patch_size,
                spec.num_classes,
                tile_batch=tile_batch,
                fused=True,
                output="seg",
            )
            try:
                seg = np.asarray(predictor(vol))  # compile + warm
                assert seg.shape == vol_shape, seg.shape
                return predictor, tile_batch
            except Exception as e:  # noqa: BLE001
                if _is_oom(e) and tile_batch > 1:
                    _log(
                        f"OOM at tile_batch {tile_batch} "
                        f"(mirror={mirror_axes}); backing off to {tile_batch // 2}"
                    )
                    del predictor
                    tile_batch //= 2
                    continue
                raise

    predictor = None
    try:
        predictor, tb_used = build_and_warm(
            None,  # TTA off for the headline; nnU-Net disables it for NoMirroring
            TILE_BATCH,
        )
        extras["sw_tile_batch"] = tb_used
        _log(f"sliding-window compile+warm ({n_tiles} tiles/volume, tb={tb_used})")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(predictor(vol))  # includes host fetch of the seg
            times.append(time.perf_counter() - t0)
        t_vol = min(times)
        _log(f"sliding window: {t_vol:.3f} s/volume (single-volume latency)")

        # steady-state serving throughput: pipeline uploads/compute/fetches
        # of a stream of volumes through jax's async dispatch (the per-chip
        # patches/sec a saturated server gets; transfers overlap compute)
        n_stream = 4
        vols = [vol + i for i in range(n_stream)]
        t0 = time.perf_counter()
        segs = [predictor(v) for v in vols]
        outs = [np.asarray(s_) for s_ in segs]
        t_stream = (time.perf_counter() - t0) / n_stream
        del outs
        extras["sw_s_per_volume"] = round(t_vol, 3)
        extras["sw_s_per_volume_pipelined"] = round(t_stream, 3)
        _log(f"pipelined: {t_stream:.3f} s/volume")

        # device-resident: excludes the tunnel upload (seg fetch included)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(predictor(vol_dev))
            times.append(time.perf_counter() - t0)
        t_devres = min(times)
        t0 = time.perf_counter()
        outs = [np.asarray(s_) for s_ in [predictor(w) for w in vols_dev]]
        t_devres_stream = (time.perf_counter() - t0) / len(vols_dev)
        del outs
        extras["sw_s_per_volume_devres"] = round(t_devres, 3)
        extras["sw_s_per_volume_devres_stream"] = round(t_devres_stream, 3)
        # headline: best protocol — on a healthy tunnel pipelined ~=
        # device-resident; on a degraded tunnel only the device-resident
        # numbers measure the chip
        protos = {
            "host_single": t_vol,
            "host_pipelined": t_stream,
            "device_resident": t_devres,
            "device_resident_stream": t_devres_stream,
        }
        win = min(protos, key=protos.get)
        extras["headline_protocol"] = win
        sw_pps = n_tiles / protos[win]
        _log(
            f"device-resident: {t_devres:.3f} single / "
            f"{t_devres_stream:.3f} streamed s/volume -> headline "
            f"{sw_pps:.2f} patches/s ({n_tiles} tiles/volume)"
        )
    except Exception as e:  # noqa: BLE001
        fail("sliding_window", e)

    # BASELINE.json's configs also name mirroring TTA; record that variant
    # (8 mirror combos/tile over axes (0,1,2)) alongside the headline.
    # NEXTOU_BENCH_TTA=0 skips it to shorten a bench run.
    if os.environ.get("NEXTOU_BENCH_TTA", "1") == "1":
        try:
            predictor_tta, tta_tb = build_and_warm((0, 1, 2), TILE_BATCH)
            _log(f"TTA sliding-window compile+warm (tb={tta_tb})")
            # device-resident volume: TTA is compute-dominated (8 mirror
            # forwards/tile) but a degraded tunnel still pollutes it
            t0 = time.perf_counter()
            np.asarray(predictor_tta(vol_dev))
            t_tta = time.perf_counter() - t0
            sw_tta_pps = n_tiles / t_tta
            extras["sw_tta_patches_per_sec"] = round(sw_tta_pps, 3)
            extras["sw_tta_vs_baseline"] = round(sw_tta_pps / A100_TTA_EST, 3)
            extras["sw_tta_tile_batch"] = tta_tb
            _log(
                f"TTA sliding window: {t_tta:.3f} s/volume -> "
                f"{sw_tta_pps:.2f} patches/s"
            )
            del predictor_tta
        except Exception as e:  # noqa: BLE001
            fail("tta", e)

    # ---- bare forward ---------------------------------------------------
    try:
        dt_fwd = device_loop_time(
            lambda x: model.apply(variables, x, train=False),
            x,
            n_small=1,
            n_large=9,
            repeats=2,
        )
        fwd_pps = BATCH / dt_fwd
        extras["fwd_patches_per_sec"] = round(fwd_pps, 3)
        extras["fwd_vs_baseline"] = round(fwd_pps / A100_FWD_EST, 3)
        extras["fwd_ms_per_batch"] = round(dt_fwd * 1e3, 1)
        _log(f"forward: {dt_fwd*1e3:.1f} ms/step -> {fwd_pps:.2f} patches/s")
    except Exception as e:  # noqa: BLE001
        fail("fwd", e)

    # ---- 2D config forward (RAVIR surface, VERDICT r4 #7) ---------------
    # On-chip evidence for the 2D path (512x448, 7 stages, base 32 —
    # nnUNetPlans.json:26-131); everything else benched here is the 3D
    # flagship.
    if os.environ.get("NEXTOU_BENCH_PRESET", "flagship") == "flagship":
        try:
            from nextou_tpu.models.presets import ravir_2d_spec

            spec2d = ravir_2d_spec(deep_supervision=False)
            model2d = NexToU(spec=spec2d, dtype=jnp.bfloat16)
            b2d = 12  # the 2d plans batch size
            x2d = jnp.zeros(
                (b2d, *spec2d.patch_size, spec2d.in_channels), jnp.bfloat16
            )
            v2d = device_put_variables(
                fast_init(model2d, 0, x2d, train=False), jnp.bfloat16
            )
            jax.block_until_ready(v2d)
            dt2d = device_loop_time(
                lambda t: model2d.apply(v2d, t, train=False),
                x2d, n_small=1, n_large=9, repeats=2,
            )
            extras["fwd2d_patches_per_sec"] = round(b2d / dt2d, 2)
            extras["fwd2d_batch"] = b2d
            _log(
                f"2d forward: {dt2d*1e3:.1f} ms/batch-{b2d} -> "
                f"{b2d/dt2d:.1f} patches/s"
            )
            del v2d, model2d, x2d
        except Exception as e:  # noqa: BLE001
            fail("fwd2d", e)

    # ---- train step (fwd+bwd+update, the nnU-Net protocol) ---------------
    # Regression-gates training throughput alongside inference (VERDICT r2
    # #4). NEXTOU_BENCH_TRAIN=0 skips it; batch/remat are env-overridable
    # (defaults = the measured-best flagship training config).
    if os.environ.get("NEXTOU_BENCH_TRAIN", "1") == "1":
        try:
            del predictor  # free the inference executables' HBM first
            from nextou_tpu.losses import CompoundLossSpec
            from nextou_tpu.losses.deep_supervision import (
                deep_supervision_weights,
            )
            from nextou_tpu.models.presets import flagship_3d_spec as _fs
            from nextou_tpu.train import (
                create_train_state,
                make_optimizer,
                make_train_step,
            )
            from nextou_tpu.train.optimizer import poly_lr

            if os.environ.get("NEXTOU_BENCH_PRESET", "flagship") == "small":
                from nextou_tpu.models.presets import small_3d_spec

                tspec = small_3d_spec(deep_supervision=True)
            else:
                tspec = _fs(deep_supervision=True)
            train_b = int(os.environ.get("NEXTOU_TRAIN_BENCH_BATCH", "2"))
            # 'big' (remat only the high-res stages) is the measured-best
            # flagship config (575 ms/patch vs 625 at full remat, round-4
            # sweep) but sits closer to the HBM ceiling, so back off to
            # full remat if its compile OOMs in bench context
            remat_env = os.environ.get("NEXTOU_BENCH_REMAT", "big")
            remat_try = [{"1": True, "0": False, "big": "big"}[remat_env]]
            if remat_env == "big":
                remat_try.append(True)
            rng = np.random.default_rng(0)
            tx = jnp.asarray(
                rng.standard_normal(
                    (train_b, *tspec.patch_size, tspec.in_channels)
                ),
                jnp.float32,
            )
            opt = make_optimizer(
                poly_lr(1e-2, 1000, 0.9, steps_per_epoch=250),
                weight_decay=3e-5,
                clip_norm=12.0,
            )
            seg = jnp.asarray(
                rng.integers(
                    0, tspec.num_classes, (train_b, *tspec.patch_size)
                ),
                jnp.int32,
            )
            batch = {"data": tx, "seg": seg}
            for i, remat in enumerate(remat_try):
                tmodel = NexToU(
                    spec=tspec, dtype=jnp.bfloat16, remat=remat,
                    channel_major_logits=True,
                )
                state = jax.device_put(
                    create_train_state(
                        tmodel, opt, tx[:1], jax.random.PRNGKey(0)
                    )
                )
                jax.block_until_ready(state.params)
                step = make_train_step(
                    tmodel,
                    opt,
                    CompoundLossSpec(
                        weight_ce=1.0, weight_dice=1.0, weight_ti=0.0,
                        batch_dice=True, smooth=1e-5, do_bg=False,
                    ),
                    deep_supervision_weights(len(tspec.decoder)),
                )
                try:
                    state, m = step(state, batch)
                    # genuine wait (tunnel block_until_ready lies)
                    _ = float(m["loss"])
                    break
                except Exception as e:  # noqa: BLE001
                    if i + 1 < len(remat_try) and _is_oom(e):
                        _log(
                            f"train remat={remat!r} OOM -> "
                            f"backing off to {remat_try[i + 1]!r}"
                        )
                        del state, step, tmodel
                        continue
                    raise
            _log(f"train-step compile+first (batch {train_b}, remat={remat!r})")

            # 1-step vs 10-step in-device loop slope cancels dispatch latency
            @jax.jit
            def run10(state, batch):
                def body(i, st):
                    new_st, _ = step(st, batch)
                    return new_st

                return jax.lax.fori_loop(0, 10, body, state)

            s10 = run10(state, batch)
            # genuine wait for the loop compile+run: tunnel
            # block_until_ready may return with work still in flight,
            # which would let t1 absorb it (negative slope, round-4 sweep)
            _ = float(jax.tree_util.tree_leaves(s10.params)[0].ravel()[0])
            t0 = time.perf_counter()
            s_a, m_a = step(state, batch)
            _ = float(m_a["loss"])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            s_b = run10(s_a, batch)  # chain off s_a: step donated `state`
            _ = float(jax.tree_util.tree_leaves(s_b.params)[0].ravel()[0])
            t10 = time.perf_counter() - t0
            dt_train = (t10 - t1) / 9.0
            train_pps = train_b / dt_train
            extras["train_patches_per_sec"] = round(train_pps, 3)
            extras["train_vs_baseline"] = round(train_pps / A100_TRAIN_EST, 3)
            extras["train_config"] = {"batch": train_b, "remat": str(remat)}
            _log(
                f"train step: {dt_train*1e3:.0f} ms ({train_b} patches) -> "
                f"{train_pps:.2f} patches/s"
            )
        except Exception as e:  # noqa: BLE001
            fail("train", e)

    return emit()


if __name__ == "__main__":
    sys.exit(main())
