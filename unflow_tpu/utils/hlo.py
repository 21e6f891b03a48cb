"""HLO inspection helpers: collective-op counting for sharding hygiene.

A data-parallel ConvNet train step should lower to (essentially) one
fused gradient all-reduce. Any ``all-to-all`` / ``collective-permute``
means GSPMD had to reshard an intermediate — wasted ICI bandwidth on
real multi-chip hardware, and rendezvous-flakiness exposure on virtual
CPU meshes. Used by ``scripts/hlo_collectives.py`` and the default-suite
regression tests in ``tests/test_sharding.py``.

(Reference analog: none — the TF1 upstream has no compiled-program
hygiene checks; this is rebuild-specific infrastructure per SURVEY.md
§2.3's "declare shardings, let XLA insert collectives" plan, which
presumes the traced program is reshard-free.)
"""

from __future__ import annotations

import collections
import re

# Match instruction call sites, e.g. ``all-reduce(%p)`` / ``all-to-all-start(``.
# Operand references look like ``%all-reduce.154`` (no following paren), so
# each instruction is counted exactly once at its definition. Tuple-typed defs
# put the op name left of ``=`` only as ``%name.N`` — the call site is still
# the canonical ``opname(`` occurrence.
COLLECTIVE_RE = re.compile(
    r"\b(all-to-all|collective-permute|all-reduce|all-gather|reduce-scatter)"
    r"(?:-start)?\("
)

#: Collectives that indicate GSPMD resharding (vs. expected gradient sync).
RESHARDING_OPS = ("all-to-all", "collective-permute")


def collective_counts(hlo_text: str) -> dict[str, int]:
    """Count collective instructions by op name in compiled HLO text."""
    counts: dict[str, int] = collections.Counter()
    for op in COLLECTIVE_RE.findall(hlo_text):
        counts[op] += 1
    return dict(counts)


def lower_train_step(
    n_devices: int,
    spec: str = "CS",
    mask_occlusion: str = "fb",
    height: int = 64,
    width: int = 64,
    deconv_impl: str = "native",
    conv_impl: str = "native",
):
    """Compile the full train step over an n-device data mesh (abstractly).

    Uses ``jax.eval_shape`` + ``ShapeDtypeStruct`` inputs so no real
    arrays are materialized — only trace + XLA compile. Returns the
    compiled executable; call ``.as_text()`` for the post-SPMD HLO.
    """
    import jax
    import jax.numpy as jnp

    from unflow_tpu.config import Config
    from unflow_tpu.parallel import batch_sharding, create_mesh, replicated
    from unflow_tpu.train import (
        TrainState,
        build_model,
        build_optimizer,
        make_train_step,
    )

    cfg = Config()
    t = cfg.train
    t.flownet = spec
    t.height, t.width = height, width
    t.max_displacement = 4
    t.batch_size = n_devices
    t.compute_dtype = "float32"
    t.mask_occlusion = mask_occlusion
    t.deconv_impl = deconv_impl
    t.conv_impl = conv_impl

    mesh = create_mesh(n_devices)
    model = build_model(cfg)
    sample = jnp.zeros((1, t.height, t.width, 3), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, sample)[
        "params"
    ]
    tx = build_optimizer(cfg, params)
    opt_state = jax.eval_shape(tx.init, params)

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def shaped(tree, sh):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh), tree
        )

    state = TrainState(
        jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
        shaped(params, rep),
        shaped(opt_state, rep),
    )
    batch = {
        "im1": jax.ShapeDtypeStruct(
            (t.batch_size, t.height, t.width, 3), jnp.float32, sharding=bsh
        ),
        "im2": jax.ShapeDtypeStruct(
            (t.batch_size, t.height, t.width, 3), jnp.float32, sharding=bsh
        ),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)

    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    return step.lower(state, batch, rng).compile()
