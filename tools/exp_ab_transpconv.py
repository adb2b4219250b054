"""A/B the full-model effect of ShuffleConvTranspose vs nn.ConvTranspose.

Same process, same params, same tracer — only the decoder upsample module
differs (param trees are name/shape-identical, so one fast_init serves both).

Run on TPU: python tools/exp_ab_transpconv.py
"""

import sys

sys.path.insert(0, "/root/repo")

from nextou_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import nextou_tpu.models.nextou as nextou_mod
from nextou_tpu.models import NexToU
from nextou_tpu.models.presets import flagship_3d_spec
from nextou_tpu.nn.layers import ShuffleConvTranspose, conv_he_normal
from nextou_tpu.utils import fast_init
from nextou_tpu.utils.timing import device_loop_time

import flax.linen as nn


class PlainConvTranspose(nn.Module):
    """The round-1 upsample: flax nn.ConvTranspose, padding VALID."""

    features: int
    kernel_size: tuple
    strides: tuple
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=conv_he_normal,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="inner",
        )(x)


def main():
    spec = flagship_3d_spec(deep_supervision=False)
    B = 2
    x = jnp.zeros((B, *spec.patch_size, spec.in_channels), jnp.bfloat16)

    model = NexToU(spec=spec, dtype=jnp.bfloat16)
    v = jax.device_put(fast_init(model, 0, x, train=False))
    jax.block_until_ready(v)
    print("init done", flush=True)

    def bench(name):
        dts = [
            device_loop_time(
                lambda x: model.apply(v, x, train=False),
                x,
                n_small=1,
                n_large=6,
                repeats=1,
            )
            for _ in range(3)
        ]
        print(
            f"{name}: " + " ".join(f"{d*1e3:.1f}" for d in dts)
            + f" ms  (min {min(dts)*1e3:.1f})",
            flush=True,
        )

    bench("shuffle")

    # swap in the plain module; flax param trees must align, so wrap via the
    # same name. PlainConvTranspose nests params under 'inner' — instead just
    # monkeypatch DecoderStage's module reference to raw nn.ConvTranspose via
    # a shim with identical param layout.
    class Shim(nn.Module):
        features: int
        kernel_size: tuple
        strides: tuple
        use_bias: bool = True
        dtype: object = None

        @nn.compact
        def __call__(self, x):
            k = tuple(self.kernel_size)
            kernel = self.param(
                "kernel", conv_he_normal, (*k, x.shape[-1], self.features),
                jnp.float32,
            )
            bias = (
                self.param(
                    "bias", nn.initializers.zeros, (self.features,), jnp.float32
                )
                if self.use_bias
                else None
            )
            dt = self.dtype or x.dtype
            nd = len(k)
            letters = "DHW"[-nd:]
            dn = (f"N{letters}C", f"{letters}IO", f"N{letters}C")
            y = jax.lax.conv_transpose(
                x.astype(dt),
                kernel.astype(dt),
                strides=tuple(self.strides),
                padding="VALID",
                dimension_numbers=dn,
            )
            if bias is not None:
                y = y + bias.astype(dt)
            return y

    nextou_mod.ShuffleConvTranspose = Shim
    bench("lax.conv_transpose")
    nextou_mod.ShuffleConvTranspose = ShuffleConvTranspose
    bench("shuffle again")


if __name__ == "__main__":
    main()