"""Evaluation entry point (headless; --gui pages results).

Reference: simonmeister/UnFlow ``src/eval_gui.py`` — restores an
experiment checkpoint, evaluates a dataset variant, prints AEE/Fl, and
optionally dumps benchmark submission files (SURVEY.md §2.2 P18).

Usage:
  python -m unflow_tpu.cli.eval --ex my_experiment --dataset kitti_2012
  python -m unflow_tpu.cli.eval --ex my_experiment --dataset sintel \
      --variant clean --output out/ --format viz
"""

from __future__ import annotations

import argparse

from unflow_tpu.config import Config, load_config
from unflow_tpu.data import get_dataset
from unflow_tpu.eval import Evaluator
from unflow_tpu.train.trainer import DEFAULT_NORMALIZATION


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ex", required=True, help="experiment name")
    ap.add_argument("--config", default=None)
    ap.add_argument("--dataset", required=True,
                    help="kitti_2012 | kitti_2015 | sintel | chairs | middlebury")
    ap.add_argument("--variant", default=None,
                    help="dataset variant (kitti: occ|noc, sintel: clean|final)")
    ap.add_argument("--num", type=int, default=None, help="max examples")
    ap.add_argument("--batch", type=int, default=8,
                    help="same-shape pairs per forward pass")
    ap.add_argument("--output", default=None, help="dump directory")
    ap.add_argument("--format", default="flo", choices=("flo", "kitti_png", "viz"))
    ap.add_argument("--gui", action="store_true", help="matplotlib pager")
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else Config()
    ex_dir = cfg.experiment_dir(args.ex)
    snapshot = ex_dir / "config.ini"
    if args.config is None and snapshot.exists():
        # An EXPLICIT --config wins (e.g. checkpoint copied to a machine
        # where the snapshot's dirs no longer resolve).
        cfg = load_config(snapshot)

    if args.dataset == "sintel":
        dataset = get_dataset("sintel", cfg.dirs.data,
                              render_pass=args.variant or "clean")
        examples = dataset.eval_examples()
    else:
        dataset = get_dataset(args.dataset, cfg.dirs.data)
        examples = dataset.eval_examples(args.variant)

    # Normalize with the constants the checkpoint was TRAINED with (the
    # snapshot records the training dataset) — evaluating a chairs-
    # trained net on KITTI with KITTI constants would silently shift
    # every input channel. Falls back to the eval dataset's constants
    # for synthetic/unknown training sets.
    from unflow_tpu.data import dataset_normalization

    norm = dataset_normalization(cfg.train.dataset) or dataset.normalization
    evaluator = Evaluator(cfg, ex_dir, normalization=norm)
    metrics = evaluator.run(
        examples, max_examples=args.num,
        output_dir=args.output, output_format=args.format,
        collect=(args.num or 8) if args.gui else 0,
        eval_batch=args.batch,
    )
    line = (
        f"{args.dataset}{'/' + args.variant if args.variant else ''}: "
        f"AEE={metrics['aee']:.4f} Fl={metrics['fl'] * 100:.2f}% (n={metrics['n']})"
    )
    if "aee_noc" in metrics:  # occ/noc breakdown (flow_noc / occlusion masks)
        line += (
            f" | noc: AEE={metrics['aee_noc']:.4f} Fl={metrics['fl_noc'] * 100:.2f}%"
        )
    if "aee_occ" in metrics:
        line += f" | occ-only: AEE={metrics['aee_occ']:.4f}"
    print(line)

    if args.gui:
        from unflow_tpu.eval.gui import display

        # Predictions were collected during run() — no re-decode/re-predict.
        display(metrics["entries"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
