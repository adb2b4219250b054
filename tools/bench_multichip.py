"""Multi-chip scaling artifact (SURVEY.md §2.4, VERDICT r1 #10).

Real multi-chip hardware is not reachable from this box (one tunneled v5e
chip), so the *scaling shape* is measured on the virtual 8-device CPU mesh
(`xla_force_host_platform_device_count`) that also backs the sharding
correctness tests: DP train step (batch = n_devices, gradient/batch-Dice
reductions as XLA collectives) and the mesh-sharded sliding-window tile
pipeline, at mesh sizes 1/2/4/8. CPU wall-clock is NOT TPU wall-clock —
the interesting number is the efficiency column (ideal = flat time as the
batch grows with the mesh: weak scaling). Writes
MULTICHIP_COMPILE_VALIDATION.json — a compile+execute validation artifact,
not a scaling measurement (all virtual devices share one physical core).

The intended v5e-8 deployment this models:
- training: 1-D mesh ('data',), batch sharded, params replicated; the only
  collectives are the gradient psum XLA inserts and the batch-Dice
  tp/fp/fn psum inside the loss (the reference's DDP all-reduce analog).
- serving: tile batch sharded over the mesh; each chip runs whole-tile
  forwards (no intra-model communication), accumulation replicated.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def bench_train(n_dev: int, iters: int = 3) -> float:
    from nextou_tpu.losses import CompoundLossSpec
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import small_3d_spec
    from nextou_tpu.parallel import make_mesh, replicate, shard_batch
    from nextou_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    mesh = make_mesh(n_data=n_dev)
    spec = small_3d_spec(num_classes=3)
    model = NexToU(spec=spec, dtype=jnp.float32, channel_major_logits=True)
    optimizer = make_optimizer(1e-2)
    loss_spec = CompoundLossSpec(weight_ti=0.0, batch_dice=True)
    example = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.float32)
    state = create_train_state(model, optimizer, example, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, loss_spec)
    rng = np.random.default_rng(0)
    batch = {
        "data": rng.standard_normal(
            (n_dev, *spec.patch_size, spec.in_channels)
        ).astype(np.float32),
        "seg": rng.integers(0, 3, (n_dev, *spec.patch_size)).astype(np.int32),
    }
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    state, m = step(state, batch)  # compile
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def bench_sliding(n_dev: int, iters: int = 3) -> float:
    from nextou_tpu.infer import make_device_sliding_predictor
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import small_3d_spec
    from nextou_tpu.parallel import make_mesh
    from nextou_tpu.utils import fast_init

    mesh = make_mesh(n_data=n_dev)
    spec = small_3d_spec(num_classes=3, deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.float32)
    x0 = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.float32)
    v = fast_init(model, 0, x0, train=False)
    pred = make_device_sliding_predictor(
        lambda t: model.apply(v, t, train=False),
        None,
        spec.patch_size,
        spec.num_classes,
        tile_batch=n_dev,
        mesh=mesh,
        output="seg",
    )
    vol = (
        np.random.default_rng(0)
        .standard_normal((24, 168, 144, spec.in_channels))
        .astype(np.float32)
    )  # 8 tiles of (16,112,96)
    np.asarray(pred(vol))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(pred(vol))
    return (time.perf_counter() - t0) / iters


def main():
    out = {"devices": [], "train_step_s": [], "sliding_window_s": []}
    for n in (1, 2, 4, 8):
        t_train = bench_train(n)
        t_sw = bench_sliding(n)
        out["devices"].append(n)
        out["train_step_s"].append(round(t_train, 4))
        out["sliding_window_s"].append(round(t_sw, 4))
        print(
            f"{n} dev: train {t_train:.3f}s (batch {n}, weak scaling), "
            f"sliding-window {t_sw:.3f}s (8 tiles, tile_batch {n})",
            flush=True,
        )
    out["what_this_is"] = (
        "COMPILE+EXECUTE VALIDATION ONLY, NOT a scaling measurement: all "
        "mesh sizes run as virtual devices on ONE physical CPU core, so "
        "wall-times serialize and carry no speedup information. The "
        "artifact proves the sharded train step and tile-sharded sliding "
        "window compile and execute at every mesh size 1/2/4/8; "
        "sharded==single-device numerics are covered by "
        "tests/test_sharding.py and tests/test_trainer_multidevice.py."
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTICHIP_COMPILE_VALIDATION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
