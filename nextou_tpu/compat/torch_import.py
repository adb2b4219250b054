"""Convert upstream PyTorch NexToU checkpoints to this framework's format.

A user of the reference (nnU-Net v2 + NexToU overlay) has checkpoints whose
``network_weights`` follow the reference module tree
(``NexToU.py:48-52`` -> ``NexToU_Encoder_Decoder.py:111-146,264-309``):

    encoder.stages.{s}.0[.{0,1,2}]   StackedConvBlocks [, PoolGNNBlocks, SwinGNNBlocks]
    decoder.stages.{s}[.{0,1,2}]     same, without the extra Sequential level
    decoder.transpconvs.{s}          ConvTranspose
    decoder.seg_layers.{s}           1x1 conv

with conv blocks named ``convs.{j}.conv/.norm`` (dynamic_network_architectures
naming), graphers ``blocks.{b}.0.fc1/.graph_conv.gconv.nn/.fc2`` and FFNs
``blocks.{b}.1.fc1/.fc2`` (``NexToU_Encoder_Decoder.py:373-381,565-574``).

This module maps those tensors onto our flax variable tree (template-driven:
every leaf of a freshly initialized model must find its source, or we fail
loudly). Weight-layout transforms:

- Conv: torch ``(O, I, *k)`` -> flax ``(*k, I, O)``.
- Grouped 1x1 conv (BasicConv, groups 4/6) -> our block-diagonal GroupedDense
  ``(g, I/g, O/g)``.
- 1x1 conv (fc1/fc2) -> Dense ``(I, O)``.
- ConvTranspose: torch ``(I, O, *k)`` -> flax ``(*k, I, O)`` with spatial
  axes REVERSED (torch computes the gradient-of-conv; lax.conv_transpose
  correlates, so the kernel must be flipped — verified exact for the
  kernel==stride case nnU-Net uses).
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + mean/var;
  InstanceNorm(affine) weight/bias -> scale/bias.
- ``relative_pos`` buffers are imported into the 'constants' collection when
  the template carries matching entries (the reference stores them negated,
  ``NexToU_Encoder_Decoder.py:742``; ours are built identically, so imported
  and regenerated tables coincide — importing keeps bit-parity exact).
"""

from __future__ import annotations

import re

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    """(O, I, *k) -> (*k, I, O)."""
    nd = w.ndim
    return np.transpose(w, (*range(2, nd), 1, 0))


def _transp_w(w: np.ndarray) -> np.ndarray:
    """(I, O, *k) -> (*k, I, O), spatial axes reversed."""
    nd = w.ndim
    w = np.transpose(w, (*range(2, nd), 0, 1))
    return w[(slice(None, None, -1),) * (nd - 2)]


def _dense_w(w: np.ndarray) -> np.ndarray:
    """1x1 conv (O, I, *1) -> (I, O)."""
    return w.reshape(w.shape[0], w.shape[1]).T


def _grouped_w(w: np.ndarray, groups: int) -> np.ndarray:
    """grouped 1x1 conv (O, I/g, *1) -> (g, I/g, O/g)."""
    o, ig = w.shape[0], w.shape[1]
    w = w.reshape(o, ig)
    return np.transpose(w.reshape(groups, o // groups, ig), (0, 2, 1))


def torch_state_dict_to_variables(state_dict, template, spec):
    """Map a reference ``state_dict`` (torch tensor / ndarray values) onto a
    variable tree shaped like ``template`` (from initializing our ``NexToU``
    with ``spec``). Returns a new variable dict {'params', 'batch_stats'[,
    'constants']}; raises KeyError/ValueError with the offending names on any
    mismatch."""
    sd = {}
    for k, v in state_dict.items():
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    groups = spec.groups

    def ref_stage_prefix(side: str, s: int, hybrid: bool) -> str:
        if side == "enc":
            base = f"encoder.stages.{s}.0"
            return base + ".0" if hybrid else base
        base = f"decoder.stages.{s}"
        return base + ".0" if hybrid else base

    def gnn_prefix(side: str, s: int, i: int) -> str:
        if side == "enc":
            return f"encoder.stages.{s}.0.{1 + i}"
        return f"decoder.stages.{s}.{1 + i}"

    def norm_pair(ref: str, has_stats: bool):
        p = {"scale": sd[ref + ".weight"], "bias": sd[ref + ".bias"]}
        st = (
            {"mean": sd[ref + ".running_mean"], "var": sd[ref + ".running_var"]}
            if has_stats
            else None
        )
        return p, st

    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv_block(ref_prefix, our_path, j):
        ref = f"{ref_prefix}.convs.{j}"
        p = {
            "conv": {
                "kernel": _conv_w(sd[ref + ".conv.weight"]),
                "bias": sd[ref + ".conv.bias"],
            }
        }
        np_, ns = norm_pair(ref + ".norm", has_stats=spec.norm_op == "batch")
        p["norm"] = np_
        put(params, (*our_path, f"block_{j}"), p)
        if ns is not None:
            put(stats, (*our_path, f"block_{j}"), {"norm": ns})

    def fc(ref, our_path, norm_stats: bool):
        put(
            params,
            (*our_path, "dense"),
            {"kernel": _dense_w(sd[ref + ".0.weight"]), "bias": sd[ref + ".0.bias"]},
        )
        np_, ns = norm_pair(ref + ".1", norm_stats)
        put(params, (*our_path, "norm"), np_)
        if ns is not None:
            put(stats, (*our_path, "norm"), ns)

    def grapher(ref, our_path, inner_norm: str):
        fc(ref + ".fc1", (*our_path, "fc1"), spec.norm_op == "batch")
        fc(ref + ".fc2", (*our_path, "fc2"), spec.norm_op == "batch")
        nn_ref = ref + ".graph_conv.gconv.nn"
        put(
            params,
            (*our_path, "graph_conv", "gconv", "nn"),
            {
                "dense_0": {
                    "kernel": _grouped_w(sd[nn_ref + ".0.weight"], groups),
                    "bias": sd[nn_ref + ".0.bias"],
                },
                "norm_0": dict(
                    zip(("scale", "bias"),
                        (sd[nn_ref + ".1.weight"], sd[nn_ref + ".1.bias"]))
                ),
            },
        )
        if inner_norm == "batch":
            put(
                stats,
                (*our_path, "graph_conv", "gconv", "nn"),
                {
                    "norm_0": {
                        "mean": sd[nn_ref + ".1.running_mean"],
                        "var": sd[nn_ref + ".1.running_var"],
                    }
                },
            )

    def ffn(ref, our_path):
        fc(ref + ".fc1", (*our_path, "fc1"), spec.norm_op == "batch")
        fc(ref + ".fc2", (*our_path, "fc2"), spec.norm_op == "batch")

    def do_stage(side, s, n_conv, gnn):
        our = f"{side}_{s}"
        hybrid = bool(gnn)
        pref = ref_stage_prefix(side, s, hybrid)
        for j in range(n_conv):
            conv_block(pref, (our, "convs"), j)
        for i, g in enumerate(gnn):
            gpref = gnn_prefix(side, s, i)
            # blocks_num_list is [1]*n (OptInit): one [Grapher, FFN] pair per
            # builder; our grapher_{i} indexes builders directly
            inner = "batch" if g.kind == "swin" else spec.gnn_norm
            grapher(f"{gpref}.blocks.0.0", (our, "gnn", f"grapher_{i}"), inner)
            ffn(f"{gpref}.blocks.0.1", (our, "gnn", f"ffn_{i}"))

    for s, st in enumerate(spec.encoder):
        do_stage("enc", s, st.n_conv, st.gnn)
    for s, st in enumerate(spec.decoder):
        do_stage("dec", s, st.n_conv, st.gnn)
        put(
            params,
            (f"dec_{s}", "transpconv"),
            {
                "kernel": _transp_w(sd[f"decoder.transpconvs.{s}.weight"]),
                "bias": sd[f"decoder.transpconvs.{s}.bias"],
            },
        )
        put(
            params,
            (f"seg_head_{s}",),
            {
                "kernel": _conv_w(sd[f"decoder.seg_layers.{s}.weight"]),
                "bias": sd[f"decoder.seg_layers.{s}.bias"],
            },
        )

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    if "constants" in template:
        # import the checkpoint's relative_pos tables (stored negated on both
        # sides, `NexToU_Encoder_Decoder.py:742`; torch keeps them (1, N, N'))
        consts: dict = {}
        for side, stages in (("enc", spec.encoder), ("dec", spec.decoder)):
            for s, st in enumerate(stages):
                for i in range(len(st.gnn)):
                    names = (
                        template["constants"]
                        .get(f"{side}_{s}", {})
                        .get("gnn", {})
                        .get(f"grapher_{i}", {})
                    )
                    for name in names:
                        src = gnn_prefix(side, s, i) + ".blocks.0.0.relative_pos"
                        put(
                            consts,
                            (f"{side}_{s}", "gnn", f"grapher_{i}", name),
                            sd[src][0],
                        )
        out["constants"] = consts

    # template-driven validation: every leaf must exist with the right shape
    import jax

    tmpl_flat = {
        "/".join(str(p.key) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            {k: template[k] for k in out}
        )[0]
    }
    got_flat = {
        "/".join(str(p.key) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(out)[0]
    }
    missing = sorted(set(tmpl_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(tmpl_flat))
    if missing or extra:
        raise ValueError(
            f"import mismatch: missing={missing[:8]} extra={extra[:8]} "
            f"({len(missing)} missing / {len(extra)} extra total)"
        )
    for k in tmpl_flat:
        if tuple(tmpl_flat[k].shape) != tuple(got_flat[k].shape):
            raise ValueError(
                f"shape mismatch at {k}: checkpoint "
                f"{tuple(got_flat[k].shape)} vs model {tuple(tmpl_flat[k].shape)}"
            )
    return jax.tree.map(
        lambda t, g: np.asarray(g, dtype=np.asarray(t).dtype),
        {k: template[k] for k in out},
        out,
    )


def extract_network_weights(ckpt) -> dict:
    """Pull the network state_dict out of an nnU-Net checkpoint dict (key
    'network_weights', the substrate's format) or accept a raw state_dict;
    strips DDP's 'module.' and torch.compile's '_orig_mod.' prefixes and the
    duplicated 'all_modules.N' aliases dynamic_network_architectures
    registers next to conv/norm/nonlin."""
    sd = ckpt.get("network_weights", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(module\.|_orig_mod\.)+", "", k)
        if ".all_modules." in k:
            continue
        out[k] = v
    return out
