"""Sliding-window inference vs full-volume oracle; TTA equivariance."""

import numpy as np
import jax
import jax.numpy as jnp

from nextou_tpu.infer import (
    compute_sliding_window_steps,
    gaussian_importance_map,
    make_tile_predictor,
    sliding_window_predict,
)


def test_steps_cover_volume():
    steps = compute_sliding_window_steps((100, 64), (32, 32), 0.5)
    for axis, (img, patch) in zip(steps, [(100, 32), (64, 32)]):
        assert axis[0] == 0
        assert axis[-1] == img - patch  # ends aligned
        diffs = np.diff(axis)
        assert (diffs <= patch * 0.5 + 1).all()  # >= 50% overlap


def test_gaussian_map_properties():
    g = gaussian_importance_map((16, 24))
    assert g.shape == (16, 24)
    assert g.max() == 1.0
    assert (g > 0).all()
    # peak near center
    assert g[7:9, 11:13].max() == 1.0


def test_sliding_window_equals_oracle_for_linear_model():
    """With a voxelwise (1x1-conv-like) model, blended sliding window must
    reproduce the full-volume prediction exactly."""
    num_classes = 3
    w = jnp.asarray(np.random.default_rng(0).standard_normal((2, num_classes)), jnp.float32)

    def apply_fn(x):  # (B, *sp, 2) -> logits
        return x @ w

    pred = make_tile_predictor(apply_fn, mirror_axes=None)
    data = np.random.default_rng(1).standard_normal((40, 52, 2)).astype(np.float32)
    probs = sliding_window_predict(pred, data, (16, 16), num_classes, tile_batch=3)
    want = np.asarray(jax.nn.softmax(jnp.asarray(data) @ w, axis=-1))
    np.testing.assert_allclose(probs, want, atol=1e-4)


def test_small_volume_padding():
    num_classes = 2
    w = jnp.asarray([[1.0, -1.0]], jnp.float32)

    def apply_fn(x):
        return x @ w

    pred = make_tile_predictor(apply_fn, mirror_axes=None)
    data = np.random.default_rng(2).standard_normal((10, 12, 1)).astype(np.float32)
    probs = sliding_window_predict(pred, data, (16, 16), num_classes)
    assert probs.shape == (10, 12, 2)
    want = np.asarray(jax.nn.softmax(jnp.asarray(data) @ w, axis=-1))
    np.testing.assert_allclose(probs, want, atol=1e-4)


def test_tta_mirror_averaging():
    """For a mirror-equivariant model the TTA average equals the plain
    prediction; for an asymmetric one it must equal the explicit average."""
    num_classes = 2
    rng = np.random.default_rng(3)
    # asymmetric "model": logits depend on position via fixed bias field
    bias = jnp.asarray(rng.standard_normal((8, 8, num_classes)), jnp.float32)

    def apply_fn(x):
        return x @ jnp.ones((1, num_classes)) + bias

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
    pred = make_tile_predictor(apply_fn, mirror_axes=(0, 1))
    got = np.asarray(pred(x))[0]

    total = np.zeros((8, 8, num_classes), np.float32)
    import itertools

    for combo in [(), (0,), (1,), (0, 1)]:
        dims = tuple(a + 1 for a in combo)
        xf = jnp.flip(x, dims) if combo else x
        logits = apply_fn(xf)
        if combo:
            logits = jnp.flip(logits, dims)
        total += np.asarray(jax.nn.softmax(logits, -1))[0]
    np.testing.assert_allclose(got, total / 4, atol=1e-5)


def test_predict_raw_case_geometry_roundtrip():
    """Crop/resample/transpose must be exactly reverted: a predictor that
    segments by thresholding the input recovers the input's blob at the
    original geometry."""
    from nextou_tpu.infer.raw import predict_raw_case

    img = np.zeros((20, 30, 26), np.float32)
    img[4:12, 8:20, 6:18] = 1.0  # blob; outside is zero -> cropped away

    def predictor(x):
        # all-foreground: the output seg must paint exactly the crop bbox,
        # proving resample-back + revert-crop + transpose-back are exact
        fg = np.ones(x.shape[:-1], np.float32)
        return np.stack([1 - fg, fg], axis=-1)

    seg = predict_raw_case(
        predictor,
        img[None],
        spacing=(2.0, 1.0, 1.0),
        target_spacing=(1.0, 1.0, 1.0),  # anisotropic resample up
        normalization_schemes=["ZScoreNormalization"],
        use_mask_for_norm=[False],
        intensity_props=None,
        transpose_forward=[2, 0, 1],
        transpose_backward=[1, 2, 0],
    )
    assert seg.shape == img.shape
    np.testing.assert_array_equal(seg == 1, img > 0)


def test_device_sliding_window_matches_host_path():
    """HBM-resident accumulation must equal the host-side accumulate."""
    from nextou_tpu.infer import (
        make_device_sliding_predictor,
        make_tile_predictor,
        sliding_window_predict,
    )
    from nextou_tpu.models import NexToU
    from nextou_tpu.utils import fast_init
    from tests.test_model import tiny_2d_spec
    import jax
    import jax.numpy as jnp

    spec = tiny_2d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.float32)
    data = np.random.default_rng(9).standard_normal(
        (43, 40, spec.in_channels)
    ).astype(np.float32)  # unaligned + needs padding on one axis
    x0 = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.float32)
    variables = fast_init(model, jax.random.PRNGKey(0), x0, train=False)

    def apply_fn(x):
        return model.apply(variables, x, train=False)

    host = sliding_window_predict(
        make_tile_predictor(apply_fn, (0, 1)),
        data, spec.patch_size, spec.num_classes, tile_batch=3,
    )
    dev = make_device_sliding_predictor(
        apply_fn, (0, 1), spec.patch_size, spec.num_classes, tile_batch=3,
        transfer_dtype=jnp.float32,  # exact parity vs the f32 host path
    )(data)
    np.testing.assert_allclose(np.asarray(dev), host, atol=3e-5)
    # the default transfer dtype is bf16 (halved upload): close in
    # distribution, not voxel-exact (this random-init model has many
    # near-tied logits; trained models are far less sensitive)
    dev16 = np.asarray(
        make_device_sliding_predictor(
            apply_fn, (0, 1), spec.patch_size, spec.num_classes, tile_batch=3
        )(data)
    )
    diff = np.abs(dev16 - host)
    assert diff.mean() < 2e-2 and (diff > 0.25).mean() < 0.01, (
        diff.mean(), (diff > 0.25).mean()
    )


def test_tta_batch_mirrors_matches_sequential(monkeypatch):
    """NEXTOU_TTA_BATCH_MIRRORS='all' (all flip variants in one forward of
    batch 2^|axes|*T) must match the sequential-combo TTA path; the model
    treats batch entries independently, so the only difference is summation
    order in the probs average. '1' is sequential (same as '0')."""
    from nextou_tpu.infer import make_device_sliding_predictor
    from nextou_tpu.models import NexToU
    from nextou_tpu.utils import fast_init
    from tests.test_model import tiny_2d_spec
    import jax
    import jax.numpy as jnp

    spec = tiny_2d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.float32)
    data = np.random.default_rng(7).standard_normal(
        (41, 40, spec.in_channels)
    ).astype(np.float32)
    x0 = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.float32)
    variables = fast_init(model, jax.random.PRNGKey(0), x0, train=False)

    def apply_fn(x):
        return model.apply(variables, x, train=False)

    kw = dict(tile_batch=2, transfer_dtype=jnp.float32)
    # explicit "0": the default became grouped (g=2) after the round-4 A/B
    monkeypatch.setenv("NEXTOU_TTA_BATCH_MIRRORS", "0")
    seq = np.asarray(
        make_device_sliding_predictor(
            apply_fn, (0, 1), spec.patch_size, spec.num_classes, **kw
        )(data)
    )
    # "all" = all 4 combos in one dispatch; "2" = two dispatches of 2;
    # "3" exercises the uneven last group (3 + 1); "1" = sequential
    for g in ("all", "2", "3", "1"):
        monkeypatch.setenv("NEXTOU_TTA_BATCH_MIRRORS", g)
        bat = np.asarray(
            make_device_sliding_predictor(
                apply_fn, (0, 1), spec.patch_size, spec.num_classes, **kw
            )(data)
        )
        np.testing.assert_allclose(bat, seq, atol=3e-5, err_msg=f"g={g}")


def test_device_sliding_window_seg_output():
    """output='seg' must equal argmax of the probs output (device argmax,
    weight division cancelled), uint8 (<=255 classes), spatial-only shape."""
    from nextou_tpu.infer import make_device_sliding_predictor
    from nextou_tpu.models import NexToU
    from nextou_tpu.utils import fast_init
    from tests.test_model import tiny_2d_spec
    import jax
    import jax.numpy as jnp

    spec = tiny_2d_spec(deep_supervision=False)
    model = NexToU(spec=spec, dtype=jnp.float32)
    data = np.random.default_rng(3).standard_normal(
        (41, 44, spec.in_channels)
    ).astype(np.float32)
    x0 = jnp.zeros((1, *spec.patch_size, spec.in_channels), jnp.float32)
    variables = fast_init(model, jax.random.PRNGKey(0), x0, train=False)

    def apply_fn(x):
        return model.apply(variables, x, train=False)

    kw = dict(tile_batch=2)
    probs = make_device_sliding_predictor(
        apply_fn, (0,), spec.patch_size, spec.num_classes, **kw
    )(data)
    seg = make_device_sliding_predictor(
        apply_fn, (0,), spec.patch_size, spec.num_classes, output="seg", **kw
    )(data)
    seg = np.asarray(seg)
    assert seg.dtype == np.uint8 and seg.shape == data.shape[:-1]
    np.testing.assert_array_equal(seg, np.argmax(np.asarray(probs), axis=-1))


def test_step_size_and_disable_tta_cli_knobs(tmp_path):
    """-step_size changes the tile grid (fewer tiles at 1.0); --disable-tta
    drops the mirrored forwards. Both map to nnUNetv2_predict's flags."""
    from nextou_tpu.infer.sliding_window import compute_sliding_window_steps

    dense = compute_sliding_window_steps((64, 96), (32, 32), 0.5)
    sparse = compute_sliding_window_steps((64, 96), (32, 32), 1.0)
    assert len(dense[0]) > len(sparse[0]) or len(dense[1]) > len(sparse[1])
    # ends stay aligned so full coverage is preserved
    assert sparse[0][-1] == 64 - 32 and sparse[1][-1] == 96 - 32


def test_predict_raw_case_cascade_prev_onehot_loader():
    """Cascade raw inference: prev_onehot_loader is called with the
    resampled (preprocessed) grid and its channels reach the predictor
    appended after the image channels."""
    from nextou_tpu.infer.raw import predict_raw_case

    img = np.zeros((10, 12, 14), np.float32)
    img[2:8, 3:10, 4:12] = 1.0
    seen = {}

    def loader(shape):
        seen["shape"] = shape
        hot = np.zeros((2, *shape), np.float32)
        hot[1] = 1.0
        return hot

    def predictor(x):
        seen["in_channels"] = x.shape[-1]
        # the seg must follow the SECOND one-hot channel (all ones)
        fg = np.asarray(x[..., -1])
        return np.stack([1 - fg, fg], axis=-1)

    seg = predict_raw_case(
        predictor,
        img[None],
        spacing=(1.0, 1.0, 1.0),
        target_spacing=(0.5, 1.0, 1.0),
        normalization_schemes=["ZScoreNormalization"],
        use_mask_for_norm=[False],
        intensity_props=None,
        prev_onehot_loader=loader,
    )
    assert seen["in_channels"] == 3  # 1 image + 2 one-hot channels
    assert len(seen["shape"]) == 3 and seen["shape"][0] == 12  # 6 crop * 2
    # prev channel 1 is all-ones -> the whole CROP region is foreground
    assert seg[2:8, 3:10, 4:12].min() == 1
    assert seg[0, 0, 0] == 0  # outside the crop stays background
