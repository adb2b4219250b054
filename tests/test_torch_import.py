"""Torch-checkpoint import (compat/): full-model forward parity against the
upstream reference instantiated in PyTorch (oracle only, loaded from
/root/reference with stubbed third-party deps).

This is the capstone parity test: random reference weights + running stats
-> convert -> our flax NexToU must reproduce the reference's deep-supervision
outputs voxel-for-voxel (fp32 tolerance)."""

import numpy as np
import pytest

from tests.conftest import requires_reference

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nextou_tpu.compat.torch_import import (  # noqa: E402
    extract_network_weights,
    torch_state_dict_to_variables,
)
from nextou_tpu.models import NexToU  # noqa: E402
from nextou_tpu.models.presets import small_3d_spec  # noqa: E402
from nextou_tpu.utils import fast_init  # noqa: E402


def _build_reference_small(spec):
    from nextou_tpu.compat.torch_stubs import load_reference_nextou

    cls = load_reference_nextou()
    from torch import nn

    model = cls(
        input_channels=spec.in_channels,
        patch_size=list(spec.patch_size),
        n_stages=6,
        features_per_stage=[st.features for st in spec.encoder],
        conv_op=nn.Conv3d,
        kernel_sizes=[list(st.kernel_size) for st in spec.encoder],
        strides=[list(st.stride) for st in spec.encoder],
        n_conv_per_stage=[2] * 6,
        num_classes=3,
        n_conv_per_stage_decoder=[2] * 5,
        conv_bias=True,
        norm_op=nn.BatchNorm3d,
        norm_op_kwargs={"eps": 1e-5, "affine": True},
        dropout_op=None,
        dropout_op_kwargs=None,
        nonlin=nn.LeakyReLU,
        nonlin_kwargs={"inplace": True},
        deep_supervision=True,
    )
    return model


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)


@requires_reference
def test_full_model_forward_parity_via_torch_import():
    spec = small_3d_spec(num_classes=3, deep_supervision=True)
    ref = _build_reference_small(spec)
    _randomize(ref)
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 1, *spec.patch_size)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))
    assert isinstance(ref_outs, (list, tuple)) and len(ref_outs) == 5

    model = NexToU(spec=spec, dtype=jnp.float32)
    xl = jnp.asarray(np.moveaxis(x, 1, -1))
    template = fast_init(model, jax.random.PRNGKey(0), xl, train=False)
    variables = torch_state_dict_to_variables(
        extract_network_weights(ref.state_dict()), template, spec
    )
    variables = jax.tree.map(jnp.asarray, variables)
    outs = model.apply(variables, xl, train=False)
    assert isinstance(outs, (list, tuple)) and len(outs) == 5

    for i, (r, o) in enumerate(zip(ref_outs, outs)):
        r = np.moveaxis(r.numpy(), 1, -1)
        o = np.asarray(o)
        assert r.shape == o.shape, (i, r.shape, o.shape)
        np.testing.assert_allclose(
            o, r, atol=2e-3, rtol=1e-3,
            err_msg=f"deep-supervision output {i} diverges",
        )


@requires_reference
def test_extract_network_weights_strips_wrappers():
    sd = {
        "module.encoder.stages.0.0.convs.0.conv.weight": np.zeros((2, 1, 3, 3, 3)),
        "encoder.stages.0.0.convs.0.all_modules.0.weight": np.zeros((2, 1, 3, 3, 3)),
    }
    out = extract_network_weights(sd)
    assert list(out) == ["encoder.stages.0.0.convs.0.conv.weight"]
