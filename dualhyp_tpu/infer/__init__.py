from dualhyp_tpu.infer.decode import generate
from dualhyp_tpu.infer.evaluate import (
    word_error_rate,
    edit_distance,
    post_normalize,
    evaluate_predictions,
)

__all__ = [
    "generate",
    "word_error_rate",
    "edit_distance",
    "post_normalize",
    "evaluate_predictions",
]
