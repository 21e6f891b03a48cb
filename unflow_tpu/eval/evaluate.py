"""Evaluation harness: run a checkpointed model over a dataset, compute
AEE / Fl, optionally dump benchmark files and visualizations.

Reference: simonmeister/UnFlow ``src/eval_gui.py`` — restores an
experiment checkpoint, runs the net over an eval variant (kitti_2012,
kitti_2015, sintel_clean, ...), accumulates AEE / outlier percentages,
pages results through a matplotlib GUI, and with ``--output`` writes
``.flo`` / KITTI 16-bit PNG submission files (SURVEY.md §2.2 P18).

Headless by default here; the matplotlib pager lives in
:mod:`unflow_tpu.eval.gui`.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unflow_tpu.augment import normalize
from unflow_tpu.config import Config
from unflow_tpu.data.base import Example, load_example
from unflow_tpu.data.io import pad_to_multiple, write_flo, write_kitti_png_flow, write_image
from unflow_tpu.eval.flow_viz import flow_error_image, flow_to_color
from unflow_tpu.eval.metrics import flow_error_avg, outlier_fraction
from unflow_tpu.models import full_res_flow
from unflow_tpu.train import build_model, restore_params
from unflow_tpu.train.trainer import DEFAULT_NORMALIZATION


class Evaluator:
    def __init__(
        self,
        cfg: Config,
        exp_dir: str | Path,
        normalization=DEFAULT_NORMALIZATION,
        params=None,
    ):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.normalization = normalization
        if params is None:
            params = restore_params(exp_dir)
        self.params = params

        mean, std = self.normalization

        @jax.jit
        def _forward(params, im1, im2):
            stages = self.model.apply(
                {"params": params}, normalize(im1, mean, std), normalize(im2, mean, std)
            )
            h, w = im1.shape[1:3]
            return full_res_flow(stages[-1], h, w)

        self._forward = _forward

    def predict(self, im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        """Single unbatched pair (H, W, 3) -> (H, W, 2) flow; pads to /64."""
        return self.predict_batch(im1[None], im2[None])[0]

    def predict_batch(self, ims1: np.ndarray, ims2: np.ndarray) -> np.ndarray:
        """Same-shape pairs (B, H, W, 3) -> (B, H, W, 2); pads to /64."""
        b, h, w, _ = ims1.shape
        hp = -(-h // 64) * 64
        wp = -(-w // 64) * 64
        pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        p1 = np.pad(ims1, pad)
        p2 = np.pad(ims2, pad)
        flow = self._forward(self.params, jnp.asarray(p1), jnp.asarray(p2))
        return np.asarray(flow)[:, :h, :w]

    def run(
        self,
        examples: Sequence[Example],
        max_examples: int | None = None,
        output_dir: str | Path | None = None,
        output_format: str = "flo",  # flo | kitti_png | viz
        collect: int = 0,
        eval_batch: int = 1,
    ) -> dict:
        """Returns {'aee': ..., 'fl': ..., 'n': ...} over valid pixels.

        ``collect``: additionally return the first K predictions under
        ``'entries'`` ({'im1', 'flow'[, 'gt', 'mask']}) for the GUI pager
        — avoids re-decoding and re-predicting them afterwards.

        ``eval_batch``: run up to this many SAME-SHAPE pairs per forward
        (benchmark frames are near-uniform in size, so this batches the
        whole eval; per-example metrics are unchanged — the batch axis
        is independent).

        When examples carry a non-occluded-region source (KITTI flow_noc
        validity / Sintel occlusion masks — ``Example.noc``), also returns
        the reference eval_gui's breakdowns: ``aee_noc`` / ``fl_noc``
        (valid & non-occluded) and ``aee_occ`` (valid & occluded); each is
        a per-image mean over the images where that region is non-empty.
        """
        out_dir = Path(output_dir) if output_dir else None
        if out_dir:
            out_dir.mkdir(parents=True, exist_ok=True)
        aee_sum = fl_sum = 0.0
        noc_sums = {"aee_noc": 0.0, "fl_noc": 0.0, "aee_occ": 0.0}
        noc_counts = {"aee_noc": 0, "fl_noc": 0, "aee_occ": 0}
        n = n_gt = 0
        entries = []

        def consume(i, ex, item, flow):
            nonlocal aee_sum, fl_sum, n, n_gt
            if collect and i < collect:
                entry = {"im1": item["im1"], "flow": flow}
                if "flow" in item:
                    entry["gt"], entry["mask"] = item["flow"], item["mask"]
                entries.append((i, entry))
            if ex.flow is not None:
                n_gt += 1
                gt = jnp.asarray(item["flow"][None])
                mask = jnp.asarray(item["mask"][None])
                pred = jnp.asarray(flow[None])
                aee_sum += float(flow_error_avg(pred, gt, mask))
                fl_sum += float(outlier_fraction(pred, gt, mask))
                if "noc_mask" in item:
                    noc = jnp.asarray(item["noc_mask"][None])
                    occ = mask * (1.0 - noc)
                    for key, m, fn in (
                        ("aee_noc", noc, flow_error_avg),
                        ("fl_noc", noc, outlier_fraction),
                        ("aee_occ", occ, flow_error_avg),
                    ):
                        if float(jnp.sum(m)) > 0:
                            noc_sums[key] += float(fn(pred, gt, m))
                            noc_counts[key] += 1
            n += 1
            if out_dir:
                # "id" must be pair-unique; it may contain a subdir
                # (Sintel's <scene>/frame_xxxx benchmark layout).
                stem = ex.meta.get("id") or f"{i:06d}"
                (out_dir / stem).parent.mkdir(parents=True, exist_ok=True)
                if output_format == "flo":
                    write_flo(out_dir / f"{stem}.flo", flow)
                elif output_format == "kitti_png":
                    write_kitti_png_flow(out_dir / f"{stem}_10.png", flow)
                elif output_format == "viz":
                    write_image(out_dir / f"{stem}_flow.png", flow_to_color(flow))
                    if ex.flow is not None:
                        write_image(
                            out_dir / f"{stem}_err.png",
                            flow_error_image(flow, item["flow"], item["mask"]),
                        )
                else:
                    raise ValueError(f"unknown output format {output_format!r}")

        pending: dict[tuple, list] = {}

        def flush(shape_key):
            group = pending.pop(shape_key)
            flows = self.predict_batch(
                np.stack([it["im1"] for _, _, it in group]),
                np.stack([it["im2"] for _, _, it in group]),
            )
            for (i, ex, item), flow in zip(group, flows):
                consume(i, ex, item, flow)

        for i, ex in enumerate(examples):
            if max_examples is not None and i >= max_examples:
                break
            item = load_example(ex, target_hw=None, supervised=ex.flow is not None)
            key = item["im1"].shape
            pending.setdefault(key, []).append((i, ex, item))
            if len(pending[key]) >= eval_batch:
                flush(key)
        for key in list(pending):
            flush(key)
        if n == 0:
            raise ValueError("no examples evaluated")
        # Metrics average over the examples that HAVE ground truth —
        # dividing by all of n would silently dilute AEE/Fl on datasets
        # with partial GT (e.g. Middlebury's GT-less scenes).
        result = {
            "aee": aee_sum / n_gt if n_gt else float("nan"),
            "fl": fl_sum / n_gt if n_gt else float("nan"),
            "n": n,
            "n_gt": n_gt,
        }
        for key, count in noc_counts.items():
            if count:
                result[key] = noc_sums[key] / count
        if collect:
            # same-shape batching can flush out of original order
            result["entries"] = [
                e for _, e in sorted(entries, key=lambda t: t[0])
            ]
        return result
