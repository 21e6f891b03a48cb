"""Count collectives in the compiled 8-device train step HLO.

A data-parallel ConvNet step should lower to (essentially) one fused
gradient all-reduce. Any `all-to-all` / `collective-permute` means GSPMD
had to reshard an intermediate — wasted ICI bandwidth on real multi-chip
hardware and rendezvous-flakiness exposure on the virtual CPU mesh
(VERDICT r2 items 1-2). Run me to print the counts; the same logic is
asserted by tests/test_sharding.py via unflow_tpu.utils.hlo.

Usage: python scripts/hlo_collectives.py [n_devices] [--spec CS] [--occ fb]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_devices", nargs="?", type=int, default=8)
    ap.add_argument("--spec", default="CS")
    ap.add_argument("--occ", default="fb")
    args = ap.parse_args()

    # The requested count must land in XLA_FLAGS before backend init —
    # REPLACING any existing value (a substring check would silently cap
    # the run at a pre-existing smaller count). sitecustomize imports
    # jax at interpreter startup (axon plugin), so the env var alone is
    # too late for the platform — override via jax.config, the same
    # pattern as tests/conftest.py.
    flag_re = r"--xla_force_host_platform_device_count=\d+"
    new_flag = f"--xla_force_host_platform_device_count={args.n_devices}"
    flags = os.environ.get("XLA_FLAGS", "")
    if re.search(flag_re, flags):
        flags = re.sub(flag_re, new_flag, flags)
    else:
        flags = (flags + " " + new_flag).strip()
    os.environ["XLA_FLAGS"] = flags

    import jax

    jax.config.update("jax_platforms", "cpu")

    from unflow_tpu.utils.hlo import (
        RESHARDING_OPS,
        collective_counts,
        lower_train_step,
    )

    compiled = lower_train_step(args.n_devices, args.spec, args.occ)
    counts = collective_counts(compiled.as_text())
    print(f"spec={args.spec} occ={args.occ} n={args.n_devices}: {counts}")
    bad = {k: v for k, v in counts.items() if k in RESHARDING_OPS}
    if bad:
        print(f"RESHARDING PRESENT: {bad}")
        sys.exit(1)
    print("clean: all-reduce-only data-parallel step")


if __name__ == "__main__":
    main()
