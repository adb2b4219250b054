"""Instantiate the upstream reference NexToU (PyTorch) without its missing
dependencies — oracle/testing only.

The reference imports `dynamic_network_architectures`, `timm`, and its own
modules under an `nnunetv2.…` dotted path (`NexToU_Encoder_Decoder.py:7-14`),
none of which are installed here. This module registers minimal stand-ins in
``sys.modules`` that reproduce the *exact parameter naming* of the real
libraries (`StackedConvBlocks.convs.{i}.conv/norm/nonlin` plus the
`all_modules` aliases), then loads the reference's own files from
``/root/reference`` under their expected dotted names.

Used by ``tests/test_torch_import.py`` (full-model forward parity) and as the
name oracle for :mod:`nextou_tpu.compat.torch_import`. Never imported on the
TPU serving path.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types


def _list_of(conv_op, v, torch_nn):
    dim = 2 if conv_op == torch_nn.Conv2d else 3
    return [v] * dim if isinstance(v, int) else list(v)


def _install_dna_stub(nn, torch):
    """dynamic_network_architectures stub with the real library's param
    naming (building_blocks.simple_conv_blocks / helper)."""

    class ConvDropoutNormReLU(nn.Module):
        def __init__(self, conv_op, input_channels, output_channels,
                     kernel_size, stride, conv_bias, norm_op, norm_op_kwargs,
                     dropout_op, dropout_op_kwargs, nonlin, nonlin_kwargs,
                     nonlin_first=False):
            super().__init__()
            kernel_size = _list_of(conv_op, kernel_size, nn)
            stride = _list_of(conv_op, stride, nn)
            ops = []
            self.conv = conv_op(
                input_channels, output_channels, kernel_size, stride,
                padding=[(k - 1) // 2 for k in kernel_size], bias=conv_bias,
            )
            ops.append(self.conv)
            if dropout_op is not None:
                self.dropout = dropout_op(**(dropout_op_kwargs or {}))
                ops.append(self.dropout)
            if norm_op is not None:
                self.norm = norm_op(output_channels, **(norm_op_kwargs or {}))
                ops.append(self.norm)
            if nonlin is not None:
                self.nonlin = nonlin(**(nonlin_kwargs or {}))
                ops.append(self.nonlin)
            if nonlin_first and (norm_op is not None) and (nonlin is not None):
                ops[-1], ops[-2] = ops[-2], ops[-1]
            self.all_modules = nn.Sequential(*ops)

        def forward(self, x):
            return self.all_modules(x)

    class StackedConvBlocks(nn.Module):
        def __init__(self, num_convs, conv_op, input_channels,
                     output_channels, kernel_size, initial_stride, conv_bias,
                     norm_op, norm_op_kwargs, dropout_op, dropout_op_kwargs,
                     nonlin, nonlin_kwargs, nonlin_first=False):
            super().__init__()
            if not isinstance(output_channels, (tuple, list)):
                output_channels = [output_channels] * num_convs
            self.convs = nn.Sequential(
                ConvDropoutNormReLU(
                    conv_op, input_channels, output_channels[0], kernel_size,
                    initial_stride, conv_bias, norm_op, norm_op_kwargs,
                    dropout_op, dropout_op_kwargs, nonlin, nonlin_kwargs,
                    nonlin_first),
                *[
                    ConvDropoutNormReLU(
                        conv_op, output_channels[i - 1], output_channels[i],
                        kernel_size, 1, conv_bias, norm_op, norm_op_kwargs,
                        dropout_op, dropout_op_kwargs, nonlin, nonlin_kwargs,
                        nonlin_first)
                    for i in range(1, num_convs)
                ],
            )
            self.output_channels = output_channels[-1]
            self.initial_stride = _list_of(conv_op, initial_stride, nn)

        def forward(self, x):
            return self.convs(x)

        def compute_conv_feature_map_size(self, input_size):
            return 0

    def get_matching_convtransp(conv_op):
        return {nn.Conv2d: nn.ConvTranspose2d, nn.Conv3d: nn.ConvTranspose3d}[conv_op]

    def get_matching_pool_op(conv_op, adaptive=False, pool_type="max"):
        m = {
            ("max", nn.Conv2d): nn.MaxPool2d, ("max", nn.Conv3d): nn.MaxPool3d,
            ("avg", nn.Conv2d): nn.AvgPool2d, ("avg", nn.Conv3d): nn.AvgPool3d,
        }
        return m[(pool_type, conv_op)]

    def maybe_convert_scalar_to_list(conv_op, scalar):
        return _list_of(conv_op, scalar, nn)

    def convert_conv_op_to_dim(conv_op):
        return 2 if conv_op == nn.Conv2d else 3

    def convert_dim_to_conv_op(dim):
        return nn.Conv2d if dim == 2 else nn.Conv3d

    def get_matching_batchnorm(conv_op):
        return {nn.Conv2d: nn.BatchNorm2d, nn.Conv3d: nn.BatchNorm3d}[conv_op]

    def get_matching_instancenorm(conv_op):
        return {nn.Conv2d: nn.InstanceNorm2d, nn.Conv3d: nn.InstanceNorm3d}[conv_op]

    root = types.ModuleType("dynamic_network_architectures")
    bb = types.ModuleType("dynamic_network_architectures.building_blocks")
    scb = types.ModuleType(
        "dynamic_network_architectures.building_blocks.simple_conv_blocks"
    )
    scb.StackedConvBlocks = StackedConvBlocks
    scb.ConvDropoutNormReLU = ConvDropoutNormReLU
    helper = types.ModuleType("dynamic_network_architectures.building_blocks.helper")
    helper.get_matching_convtransp = get_matching_convtransp
    helper.get_matching_pool_op = get_matching_pool_op
    helper.maybe_convert_scalar_to_list = maybe_convert_scalar_to_list
    helper.convert_conv_op_to_dim = convert_conv_op_to_dim
    helper.convert_dim_to_conv_op = convert_dim_to_conv_op
    helper.get_matching_batchnorm = get_matching_batchnorm
    helper.get_matching_instancenorm = get_matching_instancenorm
    root.building_blocks = bb
    bb.simple_conv_blocks = scb
    bb.helper = helper
    for name, mod in [
        ("dynamic_network_architectures", root),
        ("dynamic_network_architectures.building_blocks", bb),
        ("dynamic_network_architectures.building_blocks.simple_conv_blocks", scb),
        ("dynamic_network_architectures.building_blocks.helper", helper),
    ]:
        sys.modules.setdefault(name, mod)


def _install_timm_stub(nn):
    class DropPath(nn.Module):
        """Identity stand-in: the reference always builds with drop_path=0
        (OptInit, `NexToU_Encoder_Decoder.py:25`), so DropPath is never
        instantiated with p>0; it has no parameters either way."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    timm.models = models
    models.layers = layers
    for name, mod in [
        ("timm", timm), ("timm.models", models), ("timm.models.layers", layers)
    ]:
        sys.modules.setdefault(name, mod)


def _load_under(dotted: str, path: str):
    if dotted in sys.modules:
        return sys.modules[dotted]
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_nextou(reference_dir: str = "/root/reference"):
    """Return the reference's ``NexToU`` torch module class (and its module),
    loading the untrusted-but-read-only upstream sources from
    ``reference_dir`` with stubbed third-party deps. Raises ImportError if
    torch or the reference tree is unavailable."""
    import torch
    from torch import nn

    arch_dir = os.path.join(reference_dir, "network_architecture")
    if not os.path.isdir(arch_dir):
        raise ImportError(f"no reference at {arch_dir}")

    _install_dna_stub(nn, torch)
    _install_timm_stub(nn)

    pkg_path = "nnunetv2.training.nnUNetTrainer.variants.network_architecture"
    # parent packages as empty namespace modules
    parts = pkg_path.split(".")
    for i in range(1, len(parts) + 1):
        name = ".".join(parts[:i])
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    for fname in ("torch_nn", "torch_edge", "pos_embed",
                  "NexToU_Encoder_Decoder", "NexToU"):
        _load_under(f"{pkg_path}.{fname}", os.path.join(arch_dir, fname + ".py"))
    return sys.modules[f"{pkg_path}.NexToU"].NexToU
