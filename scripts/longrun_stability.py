"""Long-horizon training stability smoke (VERDICT round-2 item 7).

Runs a >=50k-step unsupervised training on the real chip over a
synthetic stream, crossing two LR-decay boundaries, with mid-run
kill/resume — then asserts from metrics.jsonl:

  * every logged loss/grad_norm is finite (bf16 long-horizon drift)
  * the piecewise-halved LR actually halves at decay_after and again at
    decay_after + decay_interval
  * the resumes stitched the step sequence without gap or overlap

The run is split into SEGMENTS, each a fresh subprocess that resumes
from the previous segment's checkpoint (the step-indexed stream makes
the continuation bit-faithful — tests/test_data.py / test_crash_resume).
Segmentation is not a convenience: this dev environment's axon-tunneled
PJRT client leaks every host->device transfer's staging buffer
(measured: 3.0 MB/step at this geometry, linear, immune to gc /
delete() / clear_caches), so a single 50k-step process reaches ~150 GB
RSS and is OOM-killed near step 37k. Recycling the process every
segment bounds the leak; each boundary doubles as a real kill/resume
check. On real TPU hosts (no tunnel) the leak does not apply, but
process-recycling via rerun-resume is the operational answer to any
leaky transport and costs only a recompile.

Geometry is kept small (128x256, batch 4) so 50k steps fit in about an
hour of chip time; the numerics exercised (bf16 towers, census loss,
Adam, schedule crossings) are the production ones.

  python scripts/longrun_stability.py [--steps 50000] [--segments 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, BATCH = 128, 256, 4
DISPLAY = 250


def make_config(steps: int):
    from unflow_tpu.config import Config

    cfg = Config()
    t = cfg.train
    t.flownet = "C"
    t.height, t.width = H, W
    t.batch_size = BATCH
    t.num_iters = steps
    t.learning_rate = 1e-4
    t.decay_after = steps * 2 // 5      # e.g. 20k for 50k steps
    t.decay_interval = steps // 5       # next halving at 30k
    t.display_interval = DISPLAY
    t.save_interval = 10_000
    t.eval_interval = 10_000
    t.image_summary_interval = -1
    t.compute_dtype = "bfloat16"
    return cfg


def run_segment(exp: str, steps: int, start: int, until: int) -> int:
    """Child mode: resume at ``start``, train to ``until``, checkpoint, exit."""
    import jax

    # Persistent compile cache: if the backend supports executable
    # serialization this turns segments 2..N's ~5-min train-step compile
    # into a load; harmless no-op otherwise.
    cache = Path(__file__).resolve().parent.parent / ".cache" / "jax"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.parallel import create_mesh
    from unflow_tpu.train import Trainer

    cfg = make_config(steps)
    # Bit-faithful continuation: same stream seed, fast-forwarded to the
    # resume step (exactly what cli/train.py does on rerun).
    it = batch_iterator(BATCH, H, W, seed=0, start_batch=start)
    tr = Trainer(cfg, Path(exp), it, mesh=create_mesh(1))
    assert tr.step == start, f"segment resume landed at {tr.step}, wanted {start}"
    tr.run(max_iters=until)
    assert tr.step == until, tr.step
    tr.ckpt.close()
    print(f"segment [{start}, {until}) done", flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--segments", type=int, default=4,
                    help="process-recycling boundaries (each is a kill/resume)")
    ap.add_argument("--exp", default="log/ex/longrun_stability")
    ap.add_argument("--run-segment", nargs=2, type=int, metavar=("START", "UNTIL"),
                    help=argparse.SUPPRESS)  # internal child mode
    args = ap.parse_args()

    if args.run_segment:
        return run_segment(args.exp, args.steps, *args.run_segment)

    exp = Path(args.exp)
    # Fresh run every time: a leftover experiment would resume from its
    # checkpoints, no-op the first segment (tripping the step asserts),
    # and mix two runs' rows in the metrics audit.
    if exp.exists():
        import shutil

        shutil.rmtree(exp)
    exp.mkdir(parents=True, exist_ok=True)

    bounds = [args.steps * i // args.segments for i in range(args.segments + 1)]
    t0 = time.perf_counter()
    for start, until in zip(bounds, bounds[1:]):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--steps", str(args.steps), "--exp", str(exp),
               "--run-segment", str(start), str(until)]
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            print(f"segment [{start}, {until}) failed rc={rc}", file=sys.stderr)
            return rc
        print(f"[{time.perf_counter() - t0:.0f}s] completed segment "
              f"[{start}, {until})", flush=True)
    wall = time.perf_counter() - t0

    cfg = make_config(args.steps)
    t = cfg.train

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

    # display cadence never skipped across any resume boundary
    diffs = set(np.diff(steps))
    assert diffs == {t.display_interval}, f"step gaps: {sorted(diffs)[:5]}"

    losses = [by_step[s]["loss"] for s in steps]
    grad_norms = [by_step[s].get("grad_norm", 0.0) for s in steps]
    # Steady-state step time from the metrics rows themselves, EXCLUDING
    # each segment's first display window: that window absorbs the
    # (possibly cold-cache, ~5 min) train-step compile plus process
    # startup, which are restart costs, not step costs (ADVICE r4). The
    # first window of each segment is identified by its step number:
    # segment boundaries are known, and the first logged row after each
    # boundary covers (boundary, boundary + display_interval].
    segment_firsts = {b + t.display_interval for b in bounds[:-1]}
    step_ms = [by_step[s]["step_ms"] for s in steps
               if "step_ms" in by_step[s] and s not in segment_firsts]
    steady_pairs_per_sec = (
        round(1e3 * BATCH / float(np.median(step_ms)), 1) if step_ms else None
    )
    summary = {
        "steps": args.steps,
        "geometry": "128x256 batch 4 bf16, FlowNetC unsupervised",
        "resume_boundaries": bounds[1:-1],
        "wall_s": round(wall, 1),
        # End-to-end rate including N process startups and compiles (the
        # operational number for a segmented run); see pairs_per_sec_steady
        # for the step rate itself.
        "pairs_per_sec_incl_restarts": round(args.steps * BATCH / wall, 1),
        "pairs_per_sec_steady": steady_pairs_per_sec,
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
        "note": ("run as process-recycled segments: the dev environment's "
                 "tunneled PJRT client leaks every H2D staging buffer "
                 "(~3 MB/step here); each boundary is a full process "
                 "kill + checkpoint resume on the step-indexed stream. "
                 "step_ms percentiles and pairs_per_sec_steady exclude "
                 "each segment's first display window (it absorbs process "
                 "startup and the train-step compile, which on a cold "
                 "compile cache is ~5 min/segment)"),
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
