"""Flagship train-step throughput (fwd+bwd+update, bf16+remat) on TPU."""
import sys
sys.path.insert(0, "/root/repo")
from nextou_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp

def main():
    import os
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.losses import CompoundLossSpec
    from nextou_tpu.train import make_train_step, create_train_state, make_optimizer
    from nextou_tpu.train.optimizer import poly_lr
    from nextou_tpu.losses.deep_supervision import deep_supervision_weights
    from nextou_tpu.utils import fast_init
    from nextou_tpu.utils.timing import device_loop_time
    import time

    spec = flagship_3d_spec(deep_supervision=True)
    if os.environ.get("NEXTOU_BENCH_CONV_ONLY") == "1":
        import dataclasses
        enc = tuple(dataclasses.replace(t, gnn=(), n_conv=t.n_conv + (1 if t.gnn else 0)) for t in spec.encoder)
        dec = tuple(dataclasses.replace(t, gnn=(), n_conv=t.n_conv + (1 if t.gnn else 0)) for t in spec.decoder)
        spec = dataclasses.replace(spec, encoder=enc, decoder=dec)
        print("conv-only variant", flush=True)
    _remat = {"1": True, "0": False, "big": "big"}[
        os.environ.get("NEXTOU_BENCH_REMAT", "big")
    ]
    model = NexToU(spec=spec, dtype=jnp.bfloat16, remat=_remat,
                   channel_major_logits=True)
    print(f"remat={_remat!r}", flush=True)
    import os
    B = int(os.environ.get("NEXTOU_TRAIN_BENCH_BATCH", "1"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, *spec.patch_size, spec.in_channels)), jnp.float32)
    opt = make_optimizer(poly_lr(1e-2, 1000, 0.9, steps_per_epoch=250),
                         weight_decay=3e-5, clip_norm=12.0)
    t0 = time.perf_counter()
    state = create_train_state(model, opt, x[:1], jax.random.PRNGKey(0))
    state = jax.device_put(state); jax.block_until_ready(state.params)
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
    loss_spec = CompoundLossSpec(weight_ce=1.0, weight_dice=1.0, weight_ti=0.0,
                                 batch_dice=True, smooth=1e-5, do_bg=False)
    augment = None
    if os.environ.get("NEXTOU_BENCH_DEVICE_DA", "0") == "1":
        from nextou_tpu.data.augment import AugmentConfig
        augment = AugmentConfig(mirror_axes=(0, 1, 2))
        print("fused device DA on", flush=True)
    step = make_train_step(model, opt, loss_spec,
                           deep_supervision_weights(len(spec.decoder)),
                           augment=augment)
    seg = jnp.asarray(rng.integers(0, 14, (B, *spec.patch_size)), jnp.int32)
    batch = {"data": x, "seg": seg}
    t0 = time.perf_counter()
    state, m = step(state, batch)
    _ = float(m["loss"])  # host fetch: genuinely waits (tunnel block_until_ready does not)
    print(f"compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    # in-device loop: N steps inside one dispatch, so tunneled-dispatch
    # latency cannot inflate the measurement
    def loop(n):
        @jax.jit
        def run(state, batch):
            def body(i, st):
                new_st, _ = step(st, batch)
                return new_st
            st = jax.lax.fori_loop(0, n, body, state)
            return st
        return run
    r10 = loop(10)
    s10 = r10(state, batch)   # compile
    # genuine wait (tunnel block_until_ready may not block; host fetch does)
    _ = float(jax.tree_util.tree_leaves(s10.params)[0].ravel()[0])
    # slope between 1 jitted step and a 10-step in-device loop cancels the
    # per-dispatch (tunnel) latency
    t0 = time.perf_counter(); s_a, m_a = step(state, batch); _ = float(m_a["loss"]); t1 = time.perf_counter() - t0
    # chain off s_a: `step` donated `state`
    t0 = time.perf_counter(); s_b = r10(s_a, batch); _ = float(jax.tree_util.tree_leaves(s_b.params)[0].ravel()[0]); t10 = time.perf_counter() - t0
    dt = (t10 - t1) / 9.0
    print(f"wall: 1-step {t1:.2f}s, 10-step {t10:.2f}s", flush=True)
    loss_val = float(m_a["loss"])
    print(f"final loss {loss_val:.4f}", flush=True)
    print(f"train step: {dt*1e3:.0f} ms ({B} patches) -> {B/dt:.2f} patches/s", flush=True)

if __name__ == "__main__":
    main()