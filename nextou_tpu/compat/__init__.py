"""Compatibility with the upstream PyTorch reference: checkpoint import and
(test-only) reference-model instantiation."""

from nextou_tpu.compat.torch_import import torch_state_dict_to_variables

__all__ = ["torch_state_dict_to_variables"]
