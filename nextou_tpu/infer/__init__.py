from nextou_tpu.infer.sliding_window import (
    compute_sliding_window_steps,
    gaussian_importance_map,
    make_device_sliding_predictor,
    make_tile_predictor,
    sliding_window_predict,
)
from nextou_tpu.infer.evaluate import dice_scores, evaluate_cases
