from nextou_tpu.core.graph import (
    pairwise_sq_dist,
    xy_pairwise_sq_dist,
    dense_knn,
    dilated_knn_graph,
    batched_index_select,
)
from nextou_tpu.core.window import window_partition, window_reverse
from nextou_tpu.core.pos_embed import (
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    get_3d_sincos_pos_embed,
    get_2d_relative_pos_embed,
    get_3d_relative_pos_embed,
    relative_pos_bias,
)
from nextou_tpu.core.resize import bicubic_resize_2d
