"""NexToU-TPU: a TPU-native JAX/XLA/Pallas rebuild of the NexToU segmentation stack.

This package re-implements the full capability surface of NexToU
(PengchengShi1220/NexToU, an nnU-Net v2 overlay) as a standalone, TPU-first
framework:

- ``core``     pure-functional graph primitives (kNN graphs, windowing, pos-embeds)
- ``nn``       flax modules (graph convs, graphers, conv blocks)
- ``models``   the NexToU hybrid conv/GNN U-Net + the plans->spec shape program
- ``losses``   soft Dice / CE / TI / BTI topological losses + deep supervision
- ``plans``    nnU-Net-plans-compatible configuration loading
- ``data``     preprocessing, patch sampling, augmentation, host prefetch
- ``train``    trainer registry (same public names as the reference), train step
- ``infer``    Gaussian-blended sliding-window inference with mirroring TTA
- ``parallel`` device-mesh / sharding utilities
- ``kernels``  Pallas TPU kernels for the hot graph ops
"""

__version__ = "0.1.0"
