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
