"""Trainer registry.

The reference's extension mechanism is 'trainer class selected by name on the
CLI' (``README.md:81-92``); this registry reproduces that public surface with
the same seven names.
"""

from __future__ import annotations

TRAINER_REGISTRY: dict[str, type] = {}


def register_trainer(cls):
    TRAINER_REGISTRY[cls.__name__] = cls
    return cls


def get_trainer_class(name: str):
    if name not in TRAINER_REGISTRY:
        raise KeyError(
            f"unknown trainer '{name}'; available: {sorted(TRAINER_REGISTRY)}"
        )
    return TRAINER_REGISTRY[name]
