"""Dataset bootstrap CLI: download + extract a dataset into dirs.data.

Reference: simonmeister/UnFlow ``src/e2eflow/core/data.py::Data``
downloads archives automatically on first use (SURVEY.md §2.2 P9,
§3.5). This rebuild makes the step explicit — training environments
are often air-gapped, so surprise multi-GB downloads inside the train
entry point are a misfeature; run this once instead:

  python -m unflow_tpu.cli.download kitti_2015 --data-dir data
  python -m unflow_tpu.cli.download all --data-dir data

Mirrors and custom drive lists: see
``unflow_tpu.data.bootstrap.override_manifest``.
"""

from __future__ import annotations

import argparse
import sys

from unflow_tpu.data.bootstrap import MANIFESTS, ensure_dataset


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "dataset",
        choices=sorted(MANIFESTS) + ["all"],
        help="dataset to fetch ('all' = every dataset with a direct URL)",
    )
    ap.add_argument("--data-dir", default="data")
    args = ap.parse_args(argv)

    names = (
        [n for n, m in sorted(MANIFESTS.items()) if m.archives]
        if args.dataset == "all"
        else [args.dataset]
    )
    rc = 0
    for name in names:
        try:
            root = ensure_dataset(name, args.data_dir, download=True)
            print(f"{name}: ready at {root}")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: FAILED — {e}", file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
