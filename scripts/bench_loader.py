"""Host input-pipeline bench: can decode keep up with device demand?

Synthesizes KITTI-raw-sized PNGs (375x1242 RGB, photo-like low-frequency
content + mild noise so zlib decode cost is realistic — pure random
noise makes PNGs pathologically slow to inflate), then measures Loader
batch throughput (decode -> crop/pad -> stack) at the production load
geometry for several thread counts and both image dtypes. Compare the
pairs/s here against the device step rate from bench.py: host >= device
means the input pipeline is not the bottleneck (VERDICT r1 item 4 /
r2 item 3).

  python scripts/bench_loader.py [--n-images 48] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import shutil
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _synth import photo_like


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=1152)
    ap.add_argument("--batches", type=int, default=12)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="unflow_loader_bench_")
    try:
        _run(args, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _run(args, tmp: str) -> None:
    from unflow_tpu.data.base import Example, Loader
    from unflow_tpu.data.io import write_image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(args.n_images):
        p = os.path.join(tmp, f"{i:06d}.png")
        write_image(p, photo_like(rng, 375, 1242))
        paths.append(p)
    examples = [
        Example(im1=paths[i], im2=paths[i + 1]) for i in range(len(paths) - 1)
    ]

    results = {}
    for image_dtype in ("float32", "uint8"):
        for n_threads in (1, 2, 4):
            loader = Loader(
                examples,
                batch_size=args.batch,
                load_hw=(args.height, args.width),
                num_threads=n_threads,
                prefetch=2,
                seed=0,
                image_dtype=image_dtype,
            )
            it = iter(loader)
            next(it)  # warm the pool
            t0 = time.perf_counter()
            for _ in range(args.batches):
                next(it)
            dt = time.perf_counter() - t0
            results[f"{image_dtype}_threads_{n_threads}"] = round(
                args.batch * args.batches / dt, 2
            )
            it.close()

    print(
        json.dumps(
            {
                "metric": "loader_pairs_per_sec_kitti_375x1242_decode",
                "unit": "pairs/sec",
                **results,
                "host_cores": os.cpu_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
