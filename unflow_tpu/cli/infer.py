"""Single-pair inference: two frames in, optical flow out.

Reference: simonmeister/UnFlow's minimal use case (``src/eval_gui.py``
restoring a checkpoint and running ``flownet(im1, im2, spec)`` on one
pair — BASELINE config 1). This is the smallest end-to-end surface of
the framework: it restores an experiment's params (or runs a freshly
initialized net with ``--random-init`` for smoke tests), pads the pair
to the /64 pyramid size, and writes the flow as ``.flo``, KITTI 16-bit
PNG, and/or a color visualization.

  python -m unflow_tpu.cli.infer --ex kitti_c --im1 f1.png --im2 f2.png \
      --out flow.flo --viz flow.png
"""

from __future__ import annotations

import argparse
from pathlib import Path

from unflow_tpu.config import Config, load_config
from unflow_tpu.data.io import read_image, write_flo, write_image, write_kitti_png_flow
from unflow_tpu.eval.evaluate import Evaluator
from unflow_tpu.eval.flow_viz import flow_to_color


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ex", default=None, help="experiment name under <log>/ex/")
    ap.add_argument("--config", default=None, help="config.ini (defaults to the experiment snapshot)")
    ap.add_argument("--im1", required=True)
    ap.add_argument("--im2", required=True)
    ap.add_argument("--out", default=None, help=".flo or .png (KITTI 16-bit) output path")
    ap.add_argument("--viz", default=None, help="flow color-wheel PNG output path")
    ap.add_argument(
        "--random-init", action="store_true",
        help="skip checkpoint restore (structural smoke run)",
    )
    args = ap.parse_args(argv)
    if not (args.out or args.viz):
        ap.error("nothing to do: pass --out and/or --viz")
    if not args.random_init and args.ex is None:
        ap.error("--ex is required unless --random-init")

    # --config applies with or without --ex (a --random-init run still
    # needs it for the net spec and dataset normalization).
    cfg = load_config(args.config) if args.config else Config()
    exp_dir = None
    if args.ex is not None:
        exp_dir = cfg.experiment_dir(args.ex)
        snapshot = exp_dir / "config.ini"
        if args.config is None and snapshot.exists():
            cfg = load_config(snapshot)  # the snapshot knows the net spec

    # The checkpoint was trained with ITS dataset's normalization (the
    # snapshot records the dataset); inferring with different constants
    # silently degrades the flow (cli/eval.py passes it the same way).
    from unflow_tpu.data import dataset_normalization
    from unflow_tpu.train.trainer import DEFAULT_NORMALIZATION

    norm = dataset_normalization(cfg.train.dataset) or DEFAULT_NORMALIZATION

    if args.random_init:
        import jax

        from unflow_tpu.train import build_model

        model = build_model(cfg)
        import jax.numpy as jnp

        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
        ev = Evaluator(cfg, exp_dir or ".", params=params, normalization=norm)
    else:
        ev = Evaluator(cfg, exp_dir, normalization=norm)

    im1 = read_image(args.im1)
    im2 = read_image(args.im2)
    if im1.shape != im2.shape:
        raise SystemExit(f"frame shapes differ: {im1.shape} vs {im2.shape}")
    flow = ev.predict(im1, im2)

    if args.out:
        out = Path(args.out)
        if out.suffix == ".flo":
            write_flo(out, flow)
        elif out.suffix == ".png":
            write_kitti_png_flow(out, flow)
        else:
            raise SystemExit(f"unknown output extension {out.suffix!r} (use .flo or .png)")
        print(f"wrote {out}")
    if args.viz:
        write_image(Path(args.viz), flow_to_color(flow))
        print(f"wrote {args.viz}")
    u, v = flow[..., 0], flow[..., 1]
    mag = ((u**2 + v**2) ** 0.5).mean()
    print(
        f"flow {flow.shape[1]}x{flow.shape[0]}: |f| mean {float(mag):.3f} "
        f"u [{float(u.min()):.2f}, {float(u.max()):.2f}] "
        f"v [{float(v.min()):.2f}, {float(v.max()):.2f}]"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
