"""Training entry point.

Reference: simonmeister/UnFlow ``src/run.py`` — parses ``--ex``
(experiment name) + overrides, creates/reuses ``<log>/ex/<name>/``,
copies config.ini into the experiment dir (the snapshot governs
resumes), dispatches dataset -> input pipeline, and runs the Trainer
(SURVEY.md §2.2 P17).

Usage:
  python -m unflow_tpu.cli.train --config config.ini --ex my_experiment
  python -m unflow_tpu.cli.train --ex smoke --set dataset=synthetic \
      --set num_iters=20 --set height=64 --set width=128
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

from unflow_tpu.config import Config, _coerce, _FIELD_TYPES, load_config, prepare_experiment_dir
from unflow_tpu.data import get_dataset
from unflow_tpu.data.base import Loader
from unflow_tpu.data.synthetic import batch_iterator as synthetic_batches
from unflow_tpu.train import Trainer
from unflow_tpu.train.trainer import DEFAULT_NORMALIZATION


def build_batches_and_norm(cfg: Config, start_batch: int = 0):
    """start_batch: the resume step — both streams are step-indexed, so
    a restarted run consumes exactly the batches an uninterrupted run
    would have (SURVEY §5: deterministic resume)."""
    from unflow_tpu.parallel import per_process_batch_size, process_shard

    t = cfg.train
    # Multi-host: batch_size stays the GLOBAL batch; each process loads
    # its contiguous slice (parallel.distributed + Loader shard).
    shard = process_shard()
    local_bs = per_process_batch_size(t.batch_size)
    if t.dataset == "synthetic":
        return (
            synthetic_batches(
                local_bs, t.height, t.width,
                seed=t.seed + shard[0], supervised=t.supervised,
                start_batch=start_batch,
            ),
            DEFAULT_NORMALIZATION,
        )
    ds_kwargs = {}
    if t.dataset == "kitti_raw" and t.max_frame_gap > 1:
        ds_kwargs["max_frame_gap"] = t.max_frame_gap
    dataset = get_dataset(t.dataset, cfg.dirs.data, **ds_kwargs)
    if t.packed_dir:
        # Pre-decoded memmap blob (cli.pack): batches are a fancy-indexed
        # memcpy instead of per-step PNG decode — the input path keeps up
        # with the chip on a single host core (scripts/bench_e2e.py).
        from unflow_tpu.data.packed import PackedExamples

        examples = PackedExamples(t.packed_dir)
    else:
        examples = dataset.train_examples()
    loader = Loader(
        examples,
        batch_size=local_bs,
        load_hw=(t.height, t.width),
        supervised=t.supervised,
        seed=t.seed,
        num_threads=t.num_threads,
        mode=t.input_mode,
        shard=shard,
        start_batch=start_batch,
        # uint8 frames to the device; the jitted step converts f32/255
        # (exact) — quarter the decode-side work and transfer bytes.
        image_dtype="uint8" if t.input_mode == "crop_pad" else "float32",
    )
    return iter(loader), dataset.normalization


def build_eval_fn(cfg: Config, normalization):
    """Periodic held-out AEE during training (reference: in-training eval
    summaries, core/train.py). Synthetic data evaluates against its own
    known GT; real datasets use their eval split when one exists."""
    t = cfg.train
    if not t.eval_interval:
        return None
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unflow_tpu.augment import normalize
    from unflow_tpu.data.base import load_example
    from unflow_tpu.eval.metrics import flow_error_avg
    from unflow_tpu.models import full_res_flow
    from unflow_tpu.train import build_model

    model = build_model(cfg)
    mean, std = normalization

    if t.dataset == "synthetic":
        from unflow_tpu.data.synthetic import batch_iterator

        batch = next(
            batch_iterator(4, t.height, t.width, seed=t.seed + 999, supervised=True)
        )
        ims = (jnp.asarray(batch["im1"]), jnp.asarray(batch["im2"]))
        gt = jnp.asarray(batch["flow"])
        mask = jnp.asarray(batch["mask"])
    else:
        try:
            dataset = get_dataset(t.dataset, cfg.dirs.data)
            examples = dataset.eval_examples()[:4]
        except (ValueError, FileNotFoundError):
            return None
        items = [
            load_example(ex, (t.height, t.width), supervised=True) for ex in examples
        ]
        ims = (
            jnp.asarray(np.stack([it["im1"] for it in items])),
            jnp.asarray(np.stack([it["im2"] for it in items])),
        )
        gt = jnp.asarray(np.stack([it["flow"] for it in items]))
        mask = jnp.asarray(np.stack([it["mask"] for it in items]))

    @jax.jit
    def _eval(params):
        stages = model.apply(
            {"params": params},
            normalize(ims[0], mean, std),
            normalize(ims[1], mean, std),
        )
        flow = full_res_flow(stages[-1], t.height, t.width)
        return flow_error_avg(flow, gt, mask)

    return lambda params: {"aee": float(_eval(params))}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="config.ini path")
    ap.add_argument("--ex", required=True, help="experiment name")
    ap.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override a [train] config key",
    )
    ap.add_argument("--debug", action="store_true", help="tiny smoke run")
    args = ap.parse_args(argv)

    # Multi-host TPU pods: wires the coordination service when a
    # coordinator address is configured; no-op on single hosts.
    from unflow_tpu.parallel import init_distributed

    init_distributed()

    cfg = load_config(args.config) if args.config else Config()
    for kv in args.set:
        key, _, value = kv.partition("=")
        if key not in _FIELD_TYPES:
            raise SystemExit(f"unknown config key {key!r}")
        setattr(cfg.train, key, _coerce(value, _FIELD_TYPES[key]))
    ex_dir = cfg.experiment_dir(args.ex)
    snapshot = ex_dir / "config.ini"
    # Multi-host: decide fresh-vs-resume BEFORE anyone writes (barrier
    # after the exists() check), then only the lead writes the snapshot
    # (atomically) and the others read it back after a second barrier —
    # otherwise a process could see a half-written snapshot and silently
    # train with default hyperparameters.
    from unflow_tpu.parallel import is_lead_process, process_shard

    multi = process_shard()[1] > 1
    existed = snapshot.exists()
    if multi:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("unflow:snapshot-check")
    if existed:
        # Resume: the snapshot ALWAYS governs (reference src/run.py
        # semantics — the copied config.ini is reloaded), so a resumed
        # experiment can never silently train with different
        # hyperparameters than its first segment.
        if args.config is not None or args.set:
            print(
                f"resuming {args.ex}: snapshot {snapshot} governs; "
                "ignoring --config/--set overrides"
            )
        cfg = load_config(snapshot)
    else:
        if is_lead_process():
            prepare_experiment_dir(cfg, args.ex)
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("unflow:snapshot-written")
            cfg = load_config(snapshot)  # every host trains the snapshot
    if args.debug:
        # Run-mode clamp only — applied after snapshotting so a --debug
        # first run doesn't bake tiny iteration counts into the snapshot.
        cfg.train.num_iters = min(cfg.train.num_iters, 10)
        cfg.train.display_interval = 1
        cfg.train.save_interval = 10

    # Resume point BEFORE building the loader: the stream skips to the
    # checkpointed step so resumed training sees the same batches an
    # uninterrupted run would.
    from unflow_tpu.train.checkpoint import CheckpointManager

    ckpt_probe = CheckpointManager(ex_dir)
    resume_step = ckpt_probe.latest_step() or 0
    ckpt_probe.close()

    batches, norm = build_batches_and_norm(cfg, start_batch=resume_step)
    trainer = Trainer(
        cfg, ex_dir, batches, normalization=norm,
        eval_fn=build_eval_fn(cfg, norm),
    )
    print(f"experiment {args.ex}: step {trainer.step} -> {cfg.train.num_iters}")
    logs = trainer.run()
    if "loss" in logs:
        print(f"done at step {trainer.step}: loss={logs['loss']:.5g}")
    else:
        print(f"already complete at step {trainer.step}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
