"""Eval throughput: serial vs same-shape-batched forward passes.

Generates a KITTI-sized synthetic eval set on disk, then times
``Evaluator.run`` at eval_batch 1 vs N on the real chip (decode included
— this is the end-to-end eval path a user sees).

  python scripts/bench_eval.py [--pairs 24] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _synth import photo_like


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=375)
    ap.add_argument("--width", type=int, default=1242)
    args = ap.parse_args()

    import jax

    from unflow_tpu.config import Config
    from unflow_tpu.data.base import Example
    from unflow_tpu.data.io import write_image
    from unflow_tpu.eval import Evaluator
    from unflow_tpu.train import build_model

    cfg = Config()
    t = cfg.train
    t.flownet = "C"
    t.height, t.width = args.height, args.width
    t.compute_dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    model = build_model(cfg)
    sample = np.zeros((1, 64, 64, 3), np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), sample, sample
    )["params"]
    evaluator = Evaluator(cfg, ".", params=params)

    tmp = tempfile.mkdtemp(prefix="unflow_eval_bench_")
    try:
        rng = np.random.RandomState(0)
        paths = []
        for i in range(args.pairs + 1):
            p = os.path.join(tmp, f"{i:06d}.png")
            write_image(p, photo_like(rng, args.height, args.width))
            paths.append(p)
        examples = [
            Example(im1=paths[i], im2=paths[i + 1]) for i in range(args.pairs)
        ]

        results = {}
        for eval_batch in (1, args.batch):
            evaluator.run(examples[:eval_batch], eval_batch=eval_batch)  # warm/compile
            t0 = time.perf_counter()
            m = evaluator.run(examples, eval_batch=eval_batch)
            dt = time.perf_counter() - t0
            results[f"batch_{eval_batch}"] = round(m["n"] / dt, 2)
        summary = {
            "metric": "eval_pairs_per_sec_kitti_375x1242",
            "unit": "pairs/sec",
            "pairs": args.pairs,
            "backend": jax.default_backend(),
            **results,
            "speedup": round(
                results[f"batch_{args.batch}"] / results["batch_1"], 2
            ),
        }
        # Committed artifact (VERDICT r3 item 8) — same discipline as the
        # other bench scripts.
        bench_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks",
        )
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "eval_throughput.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
