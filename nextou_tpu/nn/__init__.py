from nextou_tpu.nn.layers import (
    act,
    ActLayer,
    PReLU,
    InstanceNorm,
    make_norm,
    DropPath,
    GroupedMLP,
    MLP,
)
from nextou_tpu.nn.conv_blocks import ConvNormAct, StackedConvBlocks
from nextou_tpu.nn.graph_conv import MRConv, DyGraphConv, PoolDyGraphConv
from nextou_tpu.nn.graphers import FFN, Grapher, SwinGrapher, PoolGrapher
