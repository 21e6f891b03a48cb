"""Train-time image summaries: flow color, warped frame, occlusion mask.

Reference: simonmeister/UnFlow ``src/e2eflow/core/train.py`` logs
tf.summary images at ``display_interval`` — the flow color map, the
flow-warped second frame, and the occlusion mask — the primary debugging
tool for loss-weight parity (SURVEY.md §5 metrics row).

TPU-native shape: one small jitted forward pass (fw + bw flow, warp,
fb-occlusion mask) runs on the current batch at the summary cadence;
the host converts to PNG grids under ``<exp_dir>/summaries/``.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from unflow_tpu.augment import normalize
from unflow_tpu.data.io import write_image
from unflow_tpu.models import full_res_flow
from unflow_tpu.ops import backward_warp
from unflow_tpu.losses.terms import length_sq


def _grid(ims: np.ndarray) -> np.ndarray:
    """(B, H, W, C) -> (B*H, W, C) vertical strip."""
    b, h, w, c = ims.shape
    return ims.reshape(b * h, w, c)


class ImageSummaryWriter:
    """Writes PNG grids (im1, im2, flow_fw/bw color, warped im2,
    brightness error, occlusion mask) for the current train batch."""

    def __init__(
        self, exp_dir, model, normalization, max_examples: int = 2,
        event_writer=None,
    ):
        self._dir = Path(exp_dir) / "summaries"
        self._max = max_examples
        self._tb = event_writer  # optional utils.tensorboard.EventWriter
        mean, stddev = normalization

        @jax.jit
        def forward(params, im1, im2):
            variables = {"params": params}
            n1 = normalize(im1, mean, stddev)
            n2 = normalize(im2, mean, stddev)
            flows_fw = model.apply(variables, n1, n2)[-1]
            flows_bw = model.apply(variables, n2, n1)[-1]
            h, w = im1.shape[1], im1.shape[2]
            flow_fw = full_res_flow(flows_fw, h, w)
            flow_bw = full_res_flow(flows_bw, h, w)
            warped = backward_warp(jnp.concatenate([im2, flow_bw], -1), flow_fw)
            im2_warped, flow_bw_warped = warped[..., :3], warped[..., 3:]
            flow_diff = flow_fw + flow_bw_warped
            occ_thresh = 0.01 * (length_sq(flow_fw) + length_sq(flow_bw_warped)) + 0.5
            occ = (length_sq(flow_diff) > occ_thresh).astype(jnp.float32)
            err = jnp.abs(im1 - im2_warped)
            return flow_fw, flow_bw, im2_warped, err, occ

        self._forward = forward

    def write(self, step: int, params, batch: dict) -> Path:
        # Deferred: unflow_tpu.eval's package __init__ imports the train
        # package (Evaluator), so a top-level import here would be circular.
        from unflow_tpu.eval.flow_viz import flow_to_color

        n = min(self._max, batch["im1"].shape[0])
        # The loaded batch can be any size >= the crop; the pyramid needs
        # /64 extents, so summarize the top-left /64-aligned region.
        h = (batch["im1"].shape[1] // 64) * 64
        w = (batch["im1"].shape[2] // 64) * 64
        im1 = jnp.asarray(batch["im1"][:n, :h, :w])
        im2 = jnp.asarray(batch["im2"][:n, :h, :w])
        if im1.dtype == jnp.uint8:
            # uint8 fast-path loader batches (cli/train.py): the train
            # step converts on-device; the summary forward needs the same
            # exact f32/255 conversion.
            im1 = im1.astype(jnp.float32) / 255.0
            im2 = im2.astype(jnp.float32) / 255.0
        flow_fw, flow_bw, warped, err, occ = jax.device_get(
            self._forward(params, im1, im2)
        )
        out = self._dir / f"step_{step:08d}"
        out.mkdir(parents=True, exist_ok=True)
        grids = {
            "im1": _grid(np.asarray(im1)),
            "im2": _grid(np.asarray(im2)),
            "flow_fw": _grid(np.stack([flow_to_color(f) for f in flow_fw])),
            "flow_bw": _grid(np.stack([flow_to_color(f) for f in flow_bw])),
            "im2_warped": _grid(np.clip(warped, 0.0, 1.0)),
            "error": _grid(np.clip(err, 0.0, 1.0)),
            "occ_mask": _grid(np.repeat(occ, 3, axis=-1)),
        }
        for name, grid in grids.items():
            write_image(out / f"{name}.png", grid)
            if self._tb is not None:
                self._tb.image(name, grid, step)
        if self._tb is not None:
            self._tb.flush()
        return out


__all__ = ["ImageSummaryWriter"]
