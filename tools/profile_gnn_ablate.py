"""In-model GNN ablation profile: attribute the grapher time to parts.

The grapher stack's FLOPs (~0.26 TF/patch) would take ~5 ms/patch at matmul
rates, but profile_breakdown measures ~33 ms/patch — most of the time is in
non-matmul overhead. This tool measures the FULL model forward with one
piece ablated at a time (monkeypatched to a cheap stand-in), so each delta
is fusion-aware (unlike standalone micro-benchmarks).

Run on the real TPU: python tools/profile_gnn_ablate.py
"""

import sys
from contextlib import contextmanager

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def measure(tag):
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.utils import fast_init
    from nextou_tpu.utils.timing import device_loop_time

    spec = flagship_3d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    x = jnp.zeros((2, *spec.patch_size, spec.in_channels), jnp.bfloat16)
    v = jax.device_put(fast_init(model, 0, x, train=False))
    jax.block_until_ready(v)
    dt = device_loop_time(
        lambda x: model.apply(v, x, train=False), x, n_small=1, n_large=9, repeats=2
    )
    print(f"{tag}: {dt*1e3:.1f} ms (2 patches)", flush=True)
    return dt


@contextmanager
def patched(obj, name, fn):
    orig = getattr(obj, name)
    setattr(obj, name, fn)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def main():
    import flax.linen as nn

    import nextou_tpu.nn.graphers as G
    import nextou_tpu.nn.graph_conv as GC
    import nextou_tpu.kernels as K

    which = set(sys.argv[1:]) or {
        "full", "noffn", "nofc", "noknn", "nomr", "nounpool", "nograph"
    }

    if "full" in which:
        measure("full")

    if "noffn" in which:
        # FFN -> identity (removes 4C-hidden MLP pairs + their norms)
        def ffn_id(self, x, *, train):
            return x

        with patched(G.FFN, "__call__", ffn_id):
            measure("ffn=identity")

    if "nofc" in which:
        # fc1/fc2 -> channel-matching slice/pad (removes CxC denses + norms)
        def fc_cheap(self, x, *, train):
            C = x.shape[-1]
            if self.features == C:
                return x
            if self.features < C:
                return x[..., : self.features]
            return jnp.concatenate(
                [x, jnp.zeros((*x.shape[:-1], self.features - C), x.dtype)], -1
            )

        with patched(G._Fc, "__call__", fc_cheap):
            measure("fc1/fc2=cheap")

    if "noknn" in which:
        # Pallas kNN+max kernel -> zeros (keeps MRConv MLP + scatter)
        def knn_zeros(x, k, y=None, relative_pos=None):
            return jnp.zeros_like(x)

        with patched(K, "knn_max_neighbors", knn_zeros):
            measure("knn_max=zeros")

    if "nomr" in which:
        # whole MRConv aggregate -> cheap channel doubling (keeps fc1/fc2,
        # window partition, pool/unpool)
        def agg_cheap(mod, x_nodes, y_nodes, relative_pos, train):
            return jnp.concatenate([x_nodes, x_nodes], -1).astype(
                x_nodes.dtype
            )

        with patched(GC, "_mrconv_aggregate", agg_cheap):
            measure("mrconv_aggregate=cheap")

    if "nounpool" in which:
        # argmax unpool scatter -> nearest upsample (isolates scatter cost)
        def unpool_cheap(values, argmax, pool):
            for ax, p in enumerate(pool):
                values = jnp.repeat(values, p, axis=1 + ax)
            return values

        with patched(GC, "max_unpool_scatter", unpool_cheap):
            measure("unpool=nearest")

    if "nograph" in which:
        # whole grapher blocks -> identity (conv-only reference point)
        def gnn_id(self, x, train):
            return x

        import nextou_tpu.models.nextou as M

        with patched(M._GNNBlocks, "__call__", gnn_id):
            measure("gnn=identity (conv only)")


if __name__ == "__main__":
    main()