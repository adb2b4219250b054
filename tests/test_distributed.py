"""Multi-host (2-process) initialization + process-local batch sharding.

Exercises the real ``jax.distributed`` path (VERDICT r2 #8) without a pod:
two CPU subprocesses rendezvous at a local coordinator, build one global
mesh (2 processes x 2 local devices = 4 global), each contributes its
process-local half of a global batch via ``parallel.shard_batch``
(``make_array_from_process_local_data``), and a sharded ``jit`` reduces over
the GLOBAL batch — the value proves the cross-process collective saw both
halves. ``replicate`` + a jitted param-broadcast op covers the
replicated-state path the trainer uses.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
sys.path.insert(0, "__REPO__")
import jax
jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores the env

from nextou_tpu.parallel import (
    initialize_distributed, local_share, make_mesh, replicate, shard_batch,
)

pid, n = initialize_distributed()
assert n == 2, n
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import jax.numpy as jnp
import numpy as np

mesh = make_mesh()  # 1-D data mesh over all 4 global devices
GLOBAL_BATCH = 8
bs = local_share(GLOBAL_BATCH)
assert bs == 4, bs
# process p contributes rows p*4 .. p*4+3 of the notional global batch
local = np.arange(bs * 3, dtype=np.float32).reshape(bs, 3) + 100.0 * pid
batch = shard_batch(mesh, {"data": local})
assert batch["data"].shape == (GLOBAL_BATCH, 3)

params = replicate(mesh, {"w": np.full((3,), 2.0, np.float32)})

@jax.jit
def global_stats(batch, params):
    # mean over the GLOBAL batch: only correct if the array really spans
    # both processes' shards
    return jnp.mean(batch["data"] @ params["w"]), jnp.sum(batch["data"])

mean, total = global_stats(batch, params)
g = np.concatenate([
    np.arange(12, dtype=np.float32).reshape(4, 3) + 100.0 * p
    for p in range(2)
])
np.testing.assert_allclose(float(mean), float((g @ np.full(3, 2.0)).mean()),
                           rtol=1e-6)
np.testing.assert_allclose(float(total), float(g.sum()), rtol=1e-6)
print(f"proc {pid} OK mean={float(mean):.3f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_cpu_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = _CHILD.replace("__REPO__", repo)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            NEXTOU_COORDINATOR=f"127.0.0.1:{port}",
            NEXTOU_NUM_PROCESSES="2",
            NEXTOU_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode in (0, 143), f"proc {pid} failed:\n{out}"
    for pid, out in enumerate(outs):
        assert f"proc {pid} OK" in out, f"proc {pid} output:\n{out}"
