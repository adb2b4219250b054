"""Checkpoint save/restore.

Stores the full resumable state (step, params, batch stats, constants,
optimizer state, RNG key, epoch, EMA metrics, and the logger history) —
the analog of nnU-Net's ``checkpoint_latest.pth`` / ``checkpoint_best.pth``
(SURVEY.md §5). Format: flax msgpack for the arrays + a pickled header.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np
from flax import serialization

from nextou_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState, extra: dict[str, Any] | None = None):
    host_state = jax.device_get(state)
    payload = {
        "state_bytes": serialization.to_bytes(host_state),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: TrainState) -> tuple[TrainState, dict]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(template, payload["state_bytes"])
    return state, payload.get("extra", {})


def restore_pretrained(state: TrainState, path: str) -> tuple[TrainState, dict]:
    """``nnUNetv2_train -pretrained_weights`` semantics: seed a *fresh*
    training with the network weights of another finished run — params and
    batch stats are copied where the tree path exists in both runs with the
    same shape; optimizer state, RNG, step, and constants stay untouched
    (constants are deterministic tables regenerated from the spec).

    Mismatched leaves (e.g. seg heads for a different label count, extra
    input channels) keep their fresh initialization, like the substrate's
    ``load_pretrained_weights`` which only transfers compatible tensors.

    Returns (new_state, report) with report = {'loaded': [...],
    'skipped_shape': [...], 'missing': [...]}.
    """
    import pickle as _pickle

    from flax import serialization as _ser
    import jax.tree_util as jtu

    with open(path, "rb") as f:
        payload = _pickle.load(f)
    raw = _ser.msgpack_restore(payload["state_bytes"])

    def _flatten(prefix, tree, out):
        if isinstance(tree, dict):
            for k, v in tree.items():
                _flatten(prefix + (str(k),), v, out)
        else:
            out[prefix] = tree
        return out

    report = {"loaded": [], "skipped_shape": [], "missing": []}
    new = {}
    for field in ("params", "batch_stats"):
        have = getattr(state, field)
        if not have:
            new[field] = have
            continue
        src = _flatten((), raw.get(field, {}), {})
        flat, treedef = jtu.tree_flatten_with_path(have)
        out = []
        for p, leaf in flat:
            key = tuple(str(getattr(k, "key", k)) for k in p)
            name = field + "/" + "/".join(key)
            s = src.get(key)
            if s is None:
                report["missing"].append(name)
                out.append(leaf)
            elif tuple(np.shape(s)) != tuple(np.shape(leaf)):
                report["skipped_shape"].append(name)
                out.append(leaf)
            else:
                report["loaded"].append(name)
                out.append(np.asarray(s).astype(np.asarray(leaf).dtype))
        new[field] = jtu.tree_unflatten(treedef, out)
    import dataclasses as _dc

    return _dc.replace(state, **new), report
