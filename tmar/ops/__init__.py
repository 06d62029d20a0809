from tmar.ops.window import (
    window_partition,
    window_unpartition,
    cyclic_shift,
    pad_to_multiple,
    shift_attn_mask,
)
from tmar.ops.morphology import dilate_mask
from tmar.ops.gradients import image_gradients
from tmar.ops.attention import (
    relative_position_index,
    cosine_window_attention,
)
from tmar.ops.ngram import seq_refl_win_pad, sliding_patches
from tmar.ops.radon import Radon

__all__ = [
    "window_partition",
    "window_unpartition",
    "cyclic_shift",
    "pad_to_multiple",
    "shift_attn_mask",
    "dilate_mask",
    "image_gradients",
    "relative_position_index",
    "cosine_window_attention",
    "seq_refl_win_pad",
    "sliding_patches",
    "Radon",
]
