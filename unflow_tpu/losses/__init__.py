"""Loss stack (TPU-native rebuild of src/e2eflow/core/losses.py et al.)."""

from unflow_tpu.losses.terms import (
    charbonnier_loss,
    create_border_mask,
    create_outgoing_mask,
    gradient_loss,
    hamming_distance_soft,
    length_sq,
    photometric_loss,
    second_order_loss,
    smoothness_loss,
    ternary_loss,
    ternary_transform,
)
from unflow_tpu.losses.unsupervised import (
    DEFAULT_WEIGHTS,
    LAYER_PATCH_DISTANCES,
    LAYER_WEIGHTS,
    LOSS_KEYS,
    compute_losses,
    unsupervised_loss,
)
from unflow_tpu.losses.supervised import supervised_loss

__all__ = [
    "charbonnier_loss",
    "create_border_mask",
    "create_outgoing_mask",
    "gradient_loss",
    "hamming_distance_soft",
    "length_sq",
    "photometric_loss",
    "second_order_loss",
    "smoothness_loss",
    "ternary_loss",
    "ternary_transform",
    "compute_losses",
    "unsupervised_loss",
    "supervised_loss",
    "DEFAULT_WEIGHTS",
    "LAYER_WEIGHTS",
    "LAYER_PATCH_DISTANCES",
    "LOSS_KEYS",
]
