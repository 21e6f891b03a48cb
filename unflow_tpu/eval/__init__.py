"""Evaluation: metrics, visualization, harness (rebuild of src/eval_gui.py)."""

from unflow_tpu.eval.evaluate import Evaluator
from unflow_tpu.eval.flow_viz import flow_error_image, flow_to_color
from unflow_tpu.eval.metrics import endpoint_error, flow_error_avg, outlier_fraction

__all__ = [
    "Evaluator",
    "flow_error_image",
    "flow_to_color",
    "endpoint_error",
    "flow_error_avg",
    "outlier_fraction",
]
