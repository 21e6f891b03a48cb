"""unflow_tpu — a TPU-native unsupervised optical-flow framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
simonmeister/UnFlow (TF1 + CUDA ops): FlowNet-family models (S, C, stacked
CSS cascades), the bidirectional census / second-order smoothness /
forward-backward-consistency unsupervised loss stack, supervised
fine-tuning, KITTI / Sintel / SYNTHIA / FlyingChairs / Middlebury data
pipelines, training with checkpoint/resume, and AEE/Fl evaluation with
flow visualization.

Design notes (TPU-first, not a port):
  * The reference's four CUDA ops (correlation, backward warp, forward
    warp, flow downsample — reference: src/e2eflow/ops/*.cc, *.cu.cc) are
    pure-function JAX ops here, each with a reference `jnp` implementation
    and a Pallas TPU kernel behind one registry (`unflow_tpu.ops`).
  * The TF1 graph runtime / queue-runner layer is replaced by `jax.jit`
    train steps with donated buffers, GSPMD data parallelism over a
    `jax.sharding.Mesh`, and a host-side prefetching loader.
  * Models are flax.linen modules returning multi-scale flow pyramids;
    stacking/freezing is a functional combinator, not graph surgery.
"""

__version__ = "0.1.0"

from unflow_tpu import ops  # noqa: F401
