"""Golden tests for the shape program (SURVEY.md §2.3 tables)."""

from nextou_tpu.models import build_model_spec, knn_schedule


def _spec_3d_fullres_nextou():
    strides = [
        (1, 1, 1), (1, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2),
    ]
    kernels = [(1, 3, 3)] + [(3, 3, 3)] * 5
    return build_model_spec(
        in_channels=1,
        patch_size=(64, 224, 192),
        n_stages=6,
        features_per_stage=[33, 66, 132, 264, 324, 324],
        kernel_sizes=kernels,
        strides=strides,
        n_conv_per_stage=[2] * 6,
        n_conv_per_stage_decoder=[2] * 5,
        num_classes=14,
        deep_supervision=True,
    )


def test_knn_schedule_3d_fullres_nextou():
    k_list, max_dilation = knn_schedule((4, 7, 6), 6, 3)
    assert k_list == [7, 14, 14, 28, 32, 32]
    assert max_dilation == 168 // 32  # == 5


def test_knn_schedule_2d():
    k_list, max_dilation = knn_schedule((8, 7), 7, 2)
    assert k_list == [7, 14, 14, 28, 32, 32, 32]
    assert max_dilation == 1


def test_3d_fullres_nextou_stage_table():
    spec = _spec_3d_fullres_nextou()
    shapes = [st.img_shape for st in spec.encoder]
    assert shapes == [
        (64, 224, 192), (64, 112, 96), (32, 56, 48),
        (16, 28, 24), (8, 14, 12), (4, 7, 6),
    ]
    # stages 0-1 pure conv, 2-5 hybrid
    assert [len(st.gnn) for st in spec.encoder] == [0, 0, 2, 2, 2, 2]
    # conv counts: hybrid stages drop one conv
    assert [st.n_conv for st in spec.encoder] == [2, 2, 1, 1, 1, 1]

    pool_blocks = [st.gnn[0] for st in spec.encoder if st.gnn]
    swin_blocks = [st.gnn[1] for st in spec.encoder if st.gnn]
    assert all(b.kind == "pool" for b in pool_blocks)
    assert all(b.kind == "swin" for b in swin_blocks)
    # Pool-GNN k per stage = k_list[s]
    assert [b.k for b in pool_blocks] == [14, 28, 32, 32]
    # reduce ratios at stages 2..5
    assert [b.reduce_ratio for b in pool_blocks] == [4, 2, 1, 1]
    # max-pool only where N > 4^3*168 = 10752, i.e. only stage 2 (86016 voxels)
    assert [b.pool_size for b in pool_blocks] == [
        (2, 2, 2), (1, 1, 1), (1, 1, 1), (1, 1, 1),
    ]
    # Swin-GNN k = k_list[s-2]
    assert [b.k for b in swin_blocks] == [7, 14, 14, 28]
    assert all(b.window_size == (4, 7, 6) for b in swin_blocks)
    assert all(b.shift_size == (2, 3, 3) for b in swin_blocks)
    # dilation always 1 here (block index < 4)
    assert all(b.dilation == 1 for b in pool_blocks + swin_blocks)


def test_3d_fullres_nextou_decoder_table():
    spec = _spec_3d_fullres_nextou()
    assert len(spec.decoder) == 5
    # 3 deepest decoder stages hybrid, last 2 pure conv
    assert [len(st.gnn) for st in spec.decoder] == [2, 2, 2, 0, 0]
    assert [st.features for st in spec.decoder] == [324, 264, 132, 66, 33]
    assert [st.img_shape for st in spec.decoder] == [
        (8, 14, 12), (16, 28, 24), (32, 56, 48), (64, 112, 96), (64, 224, 192),
    ]
    # decoder GNN schedule mirrors encoder stages 4,3,2
    pool_k = [st.gnn[0].k for st in spec.decoder if st.gnn]
    assert pool_k == [32, 28, 14]
    pool_r = [st.gnn[0].reduce_ratio for st in spec.decoder if st.gnn]
    assert pool_r == [1, 2, 4]
    swin_k = [st.gnn[1].k for st in spec.decoder if st.gnn]
    assert swin_k == [14, 14, 7]
    # decoder stage at (32,56,48) also max-pools
    assert [st.gnn[0].pool_size for st in spec.decoder if st.gnn] == [
        (1, 1, 1), (1, 1, 1), (2, 2, 2),
    ]


def test_2d_stage_split():
    spec = build_model_spec(
        in_channels=1,
        patch_size=(512, 448),
        n_stages=7,
        features_per_stage=[32, 64, 128, 256, 512, 512, 512],
        kernel_sizes=[(3, 3)] * 7,
        strides=[(1, 1)] + [(2, 2)] * 6,
        n_conv_per_stage=[2] * 7,
        n_conv_per_stage_decoder=[2] * 6,
        num_classes=3,
        deep_supervision=True,
    )
    assert [len(st.gnn) for st in spec.encoder] == [0, 0, 0, 2, 2, 2, 2]
    assert spec.encoder[-1].img_shape == (8, 7)
    pool_blocks = [st.gnn[0] for st in spec.encoder if st.gnn]
    assert [b.pool_size for b in pool_blocks] == [
        (2, 2), (1, 1), (1, 1), (1, 1),
    ]
    assert [b.k for b in pool_blocks] == [28, 32, 32, 32]
    swin_blocks = [st.gnn[1] for st in spec.encoder if st.gnn]
    assert [b.k for b in swin_blocks] == [7, 14, 14, 28]
    assert all(b.window_size == (8, 7) and b.shift_size == (4, 3) for b in swin_blocks)


def test_channel_divisibility_validated():
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        build_model_spec(
            in_channels=1,
            patch_size=(64, 64),
            n_stages=4,
            features_per_stage=[7, 14, 28, 56],  # not divisible by 4
            kernel_sizes=[(3, 3)] * 4,
            strides=[(1, 1)] + [(2, 2)] * 3,
            n_conv_per_stage=[2] * 4,
            n_conv_per_stage_decoder=[2] * 3,
            num_classes=2,
        )
