"""Train-step A/B of polyphase strided conv (NEXTOU_PHASE_CONV) on TPU.

Forward-only context rejected global polyphase (fusion breakage, PERF.md
r3), but the *gradient* of a strided conv lowers to an input-dilated conv —
historically one of XLA:TPU's worst lowerings — while the polyphase form's
backward is a sum of stride-1 conv gradients (all well-lowered). This
measures the full flagship train step (fwd+bwd+update, remat='big', B=2)
under phase modes: off, targeted pairs (the two pathological strided
lowerings), and global.

Run on TPU: python tools/exp_train_phase.py [mode1:mode2:...]
"""

import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from nextou_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def run_one(mode, remat="big", B=2):
    os.environ["NEXTOU_PHASE_CONV"] = mode
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.losses import CompoundLossSpec
    from nextou_tpu.train import (
        make_train_step, create_train_state, make_optimizer,
    )
    from nextou_tpu.train.optimizer import poly_lr
    from nextou_tpu.losses.deep_supervision import deep_supervision_weights

    spec = flagship_3d_spec(deep_supervision=True)
    model = NexToU(spec=spec, dtype=jnp.bfloat16, remat=remat,
                   channel_major_logits=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, *spec.patch_size, spec.in_channels)),
        jnp.float32,
    )
    opt = make_optimizer(poly_lr(1e-2, 1000, 0.9, steps_per_epoch=250),
                         weight_decay=3e-5, clip_norm=12.0)
    state = create_train_state(model, opt, x[:1], jax.random.PRNGKey(0))
    state = jax.device_put(state)
    jax.block_until_ready(state.params)
    loss_spec = CompoundLossSpec(weight_ce=1.0, weight_dice=1.0,
                                 weight_ti=0.0, batch_dice=True,
                                 smooth=1e-5, do_bg=False)
    step = make_train_step(model, opt, loss_spec,
                           deep_supervision_weights(len(spec.decoder)))
    seg = jnp.asarray(rng.integers(0, 14, (B, *spec.patch_size)), jnp.int32)
    batch = {"data": x, "seg": seg}
    t0 = time.perf_counter()
    state, m = step(state, batch)
    _ = float(m["loss"])
    print(f"  compile+first {time.perf_counter() - t0:.0f}s", flush=True)

    @jax.jit
    def r10(state, batch):
        def body(i, st):
            new_st, _ = step(st, batch)
            return new_st
        return jax.lax.fori_loop(0, 10, body, state)

    s10 = r10(state, batch)
    # host fetch truly drains the stream (tunnel block_until_ready lies)
    _ = float(jax.tree_util.tree_leaves(s10.params)[0].ravel()[0])
    t0 = time.perf_counter()
    s_a, m_a = step(state, batch)
    _ = float(m_a["loss"])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s_b = r10(s_a, batch)
    _ = float(jax.tree_util.tree_leaves(s_b.params)[0].ravel()[0])
    t10 = time.perf_counter() - t0
    dt = (t10 - t1) / 9.0
    return dt * 1e3 / B, B / dt


def main():
    modes = ["0", "33-66,66-132", "1"]
    if len(sys.argv) > 1:
        modes = sys.argv[1].split(":")
    print(f"backend: {jax.default_backend()}", flush=True)
    results = {}
    for mode in modes:
        label = f"phase={mode!r}"
        print(f"[{label}] ...", flush=True)
        try:
            ms_pp, pps = run_one(mode)
            results[label] = f"{ms_pp:.0f} ms/patch -> {pps:.2f} patches/s"
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            kind = (
                "OOM"
                if (
                    "RESOURCE_EXHAUSTED" in msg
                    or "memory" in msg.lower()
                    or ("remote_compile" in msg and "HTTP 500" in msg)
                )
                else "FAIL"
            )
            results[label] = (
                f"{kind}: {msg.splitlines()[0][:140] if msg else type(e).__name__}"
            )
        print(f"[{label}] {results[label]}", flush=True)
        gc.collect()
    print("\n==== summary ====")
    for k, v in results.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
