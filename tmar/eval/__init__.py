from tmar.eval.metrics import (
    psnr,
    ssim,
    mae,
    rmse,
    compute_regional_metrics,
    compute_hu_accuracy,
    hu_tolerance_rates,
)
from tmar.eval.inference import full_slice_eval, tiled_eval, make_inference_fn, make_tiled_eval_jit

__all__ = [
    "psnr",
    "ssim",
    "mae",
    "rmse",
    "compute_regional_metrics",
    "compute_hu_accuracy",
    "hu_tolerance_rates",
    "full_slice_eval",
    "tiled_eval",
    "make_inference_fn",
    "make_tiled_eval_jit",
]
