"""Op-level device-time profile of the flagship forward (real TPU).

Captures a jax.profiler trace around a few forward steps and aggregates
the XPlane device events by HLO category/op, printing the top items by
total device time. This is the ground-truth "where do the milliseconds
go" view that the ablation tools (profile_breakdown / grapher_parts)
approximate by model surgery.

Usage:  python tools/profile_trace.py [fwd|sw|train] [top_n]
"""

import collections
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nextou_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

TRACE_DIR = "/tmp/nextou_trace"


def aggregate(trace_dir, top_n=45):
    """Parse the newest xplane.pb under trace_dir; per-op device totals."""
    import glob

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("NO TRACE FILES FOUND — profiler unsupported on this backend?")
        return
    pd = jax.profiler.ProfileData.from_file(paths[-1])
    # Per device plane: print per-line totals, then aggregate the leaf op
    # line ("XLA Ops") by FULL op name (dedup across repeats of the step).
    for plane in pd.planes:
        name = plane.name
        if "TPU" not in name or "Host" in name:
            continue
        print(f"\n==== plane: {name} ====")
        lines = {ln.name: ln for ln in plane.lines}
        for ln_name, ln in lines.items():
            tot = sum(ev.duration_ns for ev in ln.events) / 1e6
            n = len(list(ln.events))
            print(f"  line {ln_name!r}: {n} events, {tot:.1f} ms total")
        op_line = None
        for key in ("XLA Ops", "XLA TraceMe", "Ops"):
            if key in lines:
                op_line = lines[key]
                break
        if op_line is None:
            # fall back: the line with the most events
            op_line = max(lines.values(),
                          key=lambda ln: len(list(ln.events)))
        per_op = collections.Counter()
        n_op = collections.Counter()
        dev_total = 0.0
        for ev in op_line.events:
            dur_ms = ev.duration_ns / 1e6
            per_op[ev.name] += dur_ms
            n_op[ev.name] += 1
            dev_total += dur_ms
        print(f"\n  leaf line {op_line.name!r}: total {dev_total:.1f} ms")
        print(f"  -- top {top_n} ops (full name, summed over repeats) --")
        for nm, ms in per_op.most_common(top_n):
            print(f"  {ms:9.2f} ms {100*ms/max(dev_total,1e-9):5.1f}% "
                  f"x{n_op[nm]:<3d} {nm[:140]}")


def main(which="fwd", top_n=45):
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.utils import fast_init
    from nextou_tpu.utils.transfer import device_put_variables

    B = int(os.environ.get("NEXTOU_BENCH_BATCH", "2"))
    n_iter = 4

    if which in ("fwd", "sw"):
        spec = flagship_3d_spec(deep_supervision=False)
        model = NexToU(spec=spec, dtype=jnp.bfloat16)
        x = jnp.zeros((B, *spec.patch_size, spec.in_channels), jnp.bfloat16)
        v = fast_init(model, 0, x, train=False)
        v = device_put_variables(v, jnp.bfloat16)

        if which == "fwd":
            f = jax.jit(lambda t: model.apply(v, t, train=False))
            y = f(x)
            jax.block_until_ready(y)
            print("warm", flush=True)
            with jax.profiler.trace(TRACE_DIR):
                for _ in range(n_iter):
                    y = f(x)
                float(jnp.sum(y.astype(jnp.float32)))  # real device fence
        else:
            from nextou_tpu.infer import make_device_sliding_predictor

            pred = make_device_sliding_predictor(
                lambda t: model.apply(v, t, train=False),
                None, spec.patch_size, spec.num_classes,
                tile_batch=4, fused=True, output="seg",
            )
            vol = np.random.default_rng(0).standard_normal(
                (64, 280, 240, spec.in_channels)).astype(np.float32)
            np.asarray(pred(vol))
            print("warm", flush=True)
            with jax.profiler.trace(TRACE_DIR):
                np.asarray(pred(vol))
    elif which == "train":
        from nextou_tpu.losses import CompoundLossSpec
        from nextou_tpu.losses.deep_supervision import deep_supervision_weights
        from nextou_tpu.train import (
            create_train_state, make_optimizer, make_train_step,
        )
        from nextou_tpu.train.optimizer import poly_lr

        spec = flagship_3d_spec(deep_supervision=True)
        remat = {"1": True, "0": False, "big": "big"}[
            os.environ.get("NEXTOU_BENCH_REMAT", "1")]
        model = NexToU(spec=spec, dtype=jnp.bfloat16, remat=remat,
                       channel_major_logits=True)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (B, *spec.patch_size, spec.in_channels)), jnp.float32)
        seg = jnp.asarray(rng.integers(
            0, spec.num_classes, (B, *spec.patch_size)), jnp.int32)
        opt = make_optimizer(poly_lr(1e-2, 1000, 0.9, steps_per_epoch=250),
                             weight_decay=3e-5, clip_norm=12.0)
        state = jax.device_put(
            create_train_state(model, opt, x[:1], jax.random.PRNGKey(0)))
        jax.block_until_ready(state.params)
        step = make_train_step(
            model, opt,
            CompoundLossSpec(weight_ce=1.0, weight_dice=1.0, weight_ti=0.0,
                             batch_dice=True, smooth=1e-5, do_bg=False),
            deep_supervision_weights(len(spec.decoder)),
        )
        batch = {"data": x, "seg": seg}
        state, m = step(state, batch)
        _ = float(m["loss"])
        print("warm", flush=True)
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(2):
                state, m = step(state, batch)
            _ = float(m["loss"])
    else:
        raise SystemExit(f"unknown mode {which}")

    aggregate(TRACE_DIR, top_n)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fwd",
         int(sys.argv[2]) if len(sys.argv) > 2 else 45)
