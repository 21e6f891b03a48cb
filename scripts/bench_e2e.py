"""End-to-end training throughput: real Loader -> device step (VERDICT
round-2 item 3 — prove the input path feeds the chip at rate).

Synthesizes a KITTI-raw-layout PNG dataset on disk (photo-like content,
so zlib decode cost is realistic), then measures Trainer-loop pairs/s
at the production crop for three input paths:

  * decode:  threaded PNG Loader, uint8 fast path (cli.train default)
  * packed:  memmap blob (cli.pack one-time prep), uint8
  * device:  resident synthetic batch (bench.py contract) = ceiling

Run on the real chip:  python scripts/bench_e2e.py
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


from _synth import photo_like  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=1152)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--spec", default="C")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unflow_tpu.config import Config
    from unflow_tpu.data.base import Example, Loader
    from unflow_tpu.data.io import write_image
    from unflow_tpu.data.packed import PackedExamples, pack_examples
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.train import (
        TrainState,
        build_model,
        build_optimizer,
        make_train_step,
    )

    cfg = Config()
    t = cfg.train
    t.flownet = args.spec
    t.height, t.width = args.height, args.width
    t.batch_size = args.batch
    t.compute_dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    model = build_model(cfg)
    sample = jnp.zeros((1, t.height, t.width, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
    tx = build_optimizer(cfg, params)
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    rng_key = jax.random.PRNGKey(0)

    def fresh_state():
        # step donates its state: copy params so each measured loop gets
        # its own buffers (donation deletes the originals).
        p = jax.tree.map(jnp.copy, params)
        return TrainState(jnp.zeros((), jnp.int32), p, tx.init(p))

    def run_loop(batches, iters: int) -> float:
        """pairs/s over `iters` steps fed from `batches` (host iterator)."""
        state = fresh_state()
        for _ in range(3):  # warmup: compile + loader spin-up
            b = {k: jnp.asarray(v) for k, v in next(batches).items()}
            state, logs = step(state, b, rng_key)
        float(logs["loss"])  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            b = {k: jnp.asarray(v) for k, v in next(batches).items()}
            state, logs = step(state, b, rng_key)
        loss = float(logs["loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(loss), loss
        return args.batch * iters / dt

    tmp = tempfile.mkdtemp(prefix="unflow_e2e_")
    results = {}
    try:
        # KITTI-raw-sized source PNGs
        rng = np.random.RandomState(0)
        print("writing source PNGs...", file=sys.stderr)
        paths = []
        for i in range(args.n_images):
            p = os.path.join(tmp, f"{i:06d}.png")
            write_image(p, photo_like(rng, 375, 1242))
            paths.append(p)
        examples = [
            Example(im1=paths[i], im2=paths[i + 1])
            for i in range(len(paths) - 1)
        ]
        hw = (args.height, args.width)

        # ceiling: resident synthetic batch, no host work and no host->
        # device transfer (bench.py contract). Feeding fresh host batches
        # here would measure the dev-environment tunnel (~100 MB/s), not
        # the step: jnp.asarray on already-device arrays is a no-op.
        import itertools

        resident = {
            k: jnp.asarray(v)
            for k, v in next(batch_iterator(args.batch, *hw, seed=0)).items()
        }
        results["device_only"] = round(
            run_loop(itertools.repeat(resident), args.iters), 2
        )

        # threaded decode loader (uint8 fast path)
        loader = Loader(
            examples, batch_size=args.batch, load_hw=hw,
            num_threads=t.num_threads, image_dtype="uint8",
        )
        results["decode_uint8"] = round(run_loop(iter(loader), args.iters), 2)

        # packed memmap path
        print("packing...", file=sys.stderr)
        tpack = time.perf_counter()
        pdir = pack_examples(examples, os.path.join(tmp, "packed"), hw)
        results["pack_prep_s"] = round(time.perf_counter() - tpack, 2)
        ploader = Loader(
            PackedExamples(pdir), batch_size=args.batch, load_hw=hw,
            image_dtype="uint8",
        )
        results["packed_uint8"] = round(run_loop(iter(ploader), args.iters), 2)

        # Host-serve-only rate of the packed path (no device): how fast
        # the input pipeline COULD feed a chip with a real PCIe/DMA link.
        hit = iter(
            Loader(
                PackedExamples(pdir), batch_size=args.batch, load_hw=hw,
                image_dtype="uint8",
            )
        )
        next(hit)
        t0 = time.perf_counter()
        nb = 30
        for _ in range(nb):
            next(hit)
        results["packed_host_serve"] = round(
            args.batch * nb / (time.perf_counter() - t0), 1
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    results["e2e_over_device_pct"] = round(
        100.0 * results["packed_uint8"] / results["device_only"], 1
    )
    print(
        json.dumps(
            {
                "metric": f"e2e_train_pairs_per_sec_{args.spec}_{args.height}x{args.width}",
                "unit": "pairs/sec/chip",
                "batch": args.batch,
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
