"""Core dense-flow ops — the TPU-native rebuild of UnFlow's CUDA ops.

Reference (simonmeister/UnFlow) ships four custom TF ops with CUDA
kernels, loaded by `src/e2eflow/ops.py`:

  * correlation      (src/e2eflow/ops/correlation_op.cc / .cu.cc)
  * backward_warp    (src/e2eflow/ops/backward_warp_op.cc / .cu.cc)
  * forward_warp     (src/e2eflow/ops/forward_warp_op.cc / .cu.cc)
  * downsample       (src/e2eflow/ops/downsample_op.cc / .cu.cc)

Here each op is a pure JAX function with two interchangeable
implementations:

  * ``jnp``    — a straightforward XLA implementation. Always correct,
                 runs on CPU/TPU, differentiable via autodiff. Serves as
                 the golden reference in tests.
  * ``pallas`` — a fused Pallas TPU kernel with a custom VJP, used on
                 TPU for the hot path (correlation is the big one: a
                 441-channel cost volume whose naive form re-reads the
                 second feature map from HBM once per displacement).

`set_default_impl` / the ``impl=`` kwarg select between them; ``auto``
picks Pallas on TPU and jnp elsewhere.
"""

from __future__ import annotations

import jax

_DEFAULT_IMPL = "auto"
_VALID_IMPLS = ("auto", "jnp", "pallas")


def set_default_impl(impl: str) -> None:
    """Set the process-wide default op implementation."""
    global _DEFAULT_IMPL
    if impl not in _VALID_IMPLS:
        raise ValueError(f"impl must be one of {_VALID_IMPLS}, got {impl!r}")
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


def resolve_impl(impl: str | None) -> str:
    """Resolve an ``impl`` kwarg to a concrete backend name."""
    impl = impl or _DEFAULT_IMPL
    if impl not in _VALID_IMPLS:
        raise ValueError(f"impl must be one of {_VALID_IMPLS}, got {impl!r}")
    if impl == "auto":
        try:
            platform = jax.default_backend()
        except Exception:  # pragma: no cover - backend probing never raises in practice
            platform = "cpu"
        return "pallas" if platform == "tpu" else "jnp"
    return impl


from unflow_tpu.ops.correlation import correlation  # noqa: E402,F401
from unflow_tpu.ops.warp import (  # noqa: E402,F401
    backward_warp,
    forward_warp,
    forward_warp_image,
)
from unflow_tpu.ops.downsample import downsample, downsample_flow  # noqa: E402,F401

__all__ = [
    "correlation",
    "backward_warp",
    "forward_warp",
    "forward_warp_image",
    "downsample",
    "downsample_flow",
    "set_default_impl",
    "get_default_impl",
    "resolve_impl",
]
