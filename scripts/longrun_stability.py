"""Long-horizon training stability smoke (VERDICT round-2 item 7).

Runs a >=50k-step unsupervised training on the real chip over a
synthetic stream, crossing two LR-decay boundaries, with one mid-run
kill/resume — then asserts from metrics.jsonl:

  * every logged loss/grad_norm is finite (bf16 long-horizon drift)
  * the piecewise-halved LR actually halves at decay_after and again at
    decay_after + decay_interval
  * the resume stitched the step sequence without gap or overlap

Geometry is kept small (128x256, batch 4) so 50k steps fit in well under
an hour of chip time; the numerics exercised (bf16 towers, census loss,
Adam, schedule crossings) are the production ones.

  python scripts/longrun_stability.py [--steps 50000] [--split 30000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--split", type=int, default=30_000,
                    help="kill/resume boundary step")
    ap.add_argument("--exp", default="log/ex/longrun_stability")
    args = ap.parse_args()

    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.parallel import create_mesh
    from unflow_tpu.train import Trainer

    cfg = Config()
    t = cfg.train
    t.flownet = "C"
    t.height, t.width = 128, 256
    t.batch_size = 4
    t.num_iters = args.steps
    t.learning_rate = 1e-4
    t.decay_after = args.steps * 2 // 5      # e.g. 20k for 50k steps
    t.decay_interval = args.steps // 5       # next halving at 30k
    t.display_interval = 250
    t.save_interval = 10_000
    t.eval_interval = 10_000
    t.image_summary_interval = -1
    t.compute_dtype = "bfloat16"

    exp = Path(args.exp)
    # Fresh run every time: a leftover experiment would resume from its
    # checkpoints, no-op the first segment (tripping the step asserts),
    # and mix two runs' rows in the metrics audit.
    if exp.exists():
        import shutil

        shutil.rmtree(exp)
    exp.mkdir(parents=True, exist_ok=True)
    mesh = create_mesh(1)

    t0 = time.perf_counter()
    # Segment 1: train to the split point, then drop the Trainer (as a
    # crash would) and resume from its last checkpoint.
    tr1 = Trainer(cfg, exp, batch_iterator(4, 128, 256, seed=0), mesh=mesh)
    tr1.run(max_iters=args.split)
    assert tr1.step == args.split, tr1.step
    tr1.ckpt.close()
    print(f"segment 1 done at step {tr1.step} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    tr2 = Trainer(cfg, exp, batch_iterator(4, 128, 256, seed=1), mesh=mesh)
    assert tr2.step == args.split, f"resume landed at {tr2.step}"
    logs = tr2.run()
    assert tr2.step == args.steps, tr2.step
    tr2.ckpt.close()
    wall = time.perf_counter() - t0
    print(f"segment 2 done at step {tr2.step} ({wall:.0f}s)", flush=True)

    # ---- audit metrics.jsonl -------------------------------------------
    rows = [
        json.loads(line)
        for line in (exp / "metrics.jsonl").read_text().splitlines()
    ]
    by_step = {}
    for r in rows:
        if "loss" in r:
            by_step[r["step"]] = r
    steps = sorted(by_step)
    assert steps, "no loss rows logged"
    bad = [s for s in steps
           if not np.isfinite(by_step[s]["loss"])
           or not np.isfinite(by_step[s].get("grad_norm", 0.0))]
    assert not bad, f"non-finite loss/grad at steps {bad[:5]}"

    lr0 = by_step[steps[0]]["lr"]
    lr_at = lambda s: by_step[min(by_step, key=lambda x: abs(x - s))]["lr"]
    first_cross = t.decay_after + t.display_interval
    second_cross = t.decay_after + t.decay_interval + t.display_interval
    assert abs(lr_at(first_cross) - lr0 / 2) < lr0 * 1e-6, (
        lr0, lr_at(first_cross))
    assert abs(lr_at(second_cross) - lr0 / 4) < lr0 * 1e-6, (
        lr0, lr_at(second_cross))

    # display cadence never skipped across the resume boundary
    diffs = set(np.diff(steps))
    assert diffs == {t.display_interval}, f"step gaps: {sorted(diffs)[:5]}"

    losses = [by_step[s]["loss"] for s in steps]
    grad_norms = [by_step[s].get("grad_norm", 0.0) for s in steps]
    step_ms = [by_step[s]["step_ms"] for s in steps if "step_ms" in by_step[s]]
    summary = {
        "steps": args.steps,
        "geometry": "128x256 batch 4 bf16, FlowNetC unsupervised",
        "resume_at": args.split,
        "wall_s": round(wall, 1),
        "pairs_per_sec": round(args.steps * 4 / wall, 1),
        "step_ms_p50": round(float(np.percentile(step_ms, 50)), 2) if step_ms else None,
        "step_ms_p95": round(float(np.percentile(step_ms, 95)), 2) if step_ms else None,
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "loss_min": min(losses),
        "loss_max": max(losses),
        "grad_norm_min": min(grad_norms),
        "grad_norm_max": max(grad_norms),
        "logged_points": len(steps),
        "all_finite": True,
        "lr_crossings": {
            "initial": lr0,
            f"step_{first_cross}": lr_at(first_cross),
            f"step_{second_cross}": lr_at(second_cross),
        },
        "ok": True,
    }
    (exp / "stability_summary.json").write_text(json.dumps(summary))
    # Committed artifact (VERDICT r3 item 2): log/ is gitignored; the
    # benchmarks/ copy is the reviewer-visible record of the run.
    bench_dir = Path(__file__).resolve().parent.parent / "benchmarks"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "longrun_50k.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
