"""Dataset folder resolution via nnU-Net's environment variables.

The reference CLI addresses datasets by name ("Dataset111_XXX") resolved
against ``nnUNet_preprocessed`` / ``nnUNet_raw`` / ``nnUNet_results``
(reference ``README.md:64``); the same variables work here, with
NEXTOU_-prefixed synonyms. Explicit paths always win.
"""

from __future__ import annotations

import os


def _resolve(arg: str, *env_names: str) -> str:
    if os.path.exists(arg):
        return arg
    for name in env_names:
        base = os.environ.get(name)
        if base:
            cand = os.path.join(base, arg)
            if os.path.exists(cand):
                return cand
    return arg


def resolve_preprocessed(arg: str) -> str:
    return _resolve(arg, "NEXTOU_PREPROCESSED", "nnUNet_preprocessed")


def resolve_raw(arg: str) -> str:
    return _resolve(arg, "NEXTOU_RAW", "nnUNet_raw")
