"""FlowNet model family (TPU-native rebuild of src/e2eflow/core/flownet.py)."""

from unflow_tpu.models.flownet import (
    FLOW_SCALE,
    FlowNetC,
    FlowNetS,
    FlowNetStack,
    full_res_flow,
    param_labels,
)

__all__ = [
    "FLOW_SCALE",
    "FlowNetC",
    "FlowNetS",
    "FlowNetStack",
    "full_res_flow",
    "param_labels",
]
