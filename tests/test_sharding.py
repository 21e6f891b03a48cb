"""GSPMD sharding tests beyond plain data parallelism (SURVEY.md §2.3).

The spatial mesh axis shards image width across devices; XLA inserts
conv halo exchanges automatically — the TPU analog of context/sequence
parallelism for this ConvNet domain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unflow_tpu.models import FlowNetS
from unflow_tpu.parallel import batch_sharding, create_mesh, replicated


def test_spatial_sharding_matches_replicated(rng):
    assert jax.device_count() >= 8
    mesh = create_mesh(8, spatial=4)  # 2-way data x 4-way spatial
    assert mesh.shape == {"data": 2, "spatial": 4}

    model = FlowNetS()
    x = jnp.asarray(rng.randn(2, 64, 256, 6).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    flows_ref = jax.jit(model.apply)(params, x)[0]

    params_sh = jax.device_put(params, replicated(mesh))
    x_sh = jax.device_put(x, batch_sharding(mesh, spatial_axis=2))
    flows_sh = jax.jit(model.apply)(params_sh, x_sh)[0]

    np.testing.assert_allclose(
        np.asarray(flows_sh), np.asarray(flows_ref), atol=2e-5
    )


@pytest.mark.slow
def test_spatial_sharded_train_step_matches_replicated(tmp_path):
    """The FULL train step (in-step dynamic_slice crop + flip + losses +
    Adam) under a (data, spatial) mesh must match the replicated step —
    validates the layout/communication path the Trainer enables with
    spatial_shards > 1."""
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.train import (
        TrainState,
        build_model,
        build_optimizer,
        make_train_step,
    )

    cfg = Config()
    t = cfg.train
    t.flownet = "S"
    t.height, t.width = 64, 128
    t.batch_size = 2
    t.compute_dtype = "float32"
    t.image_summary_interval = -1

    model = build_model(cfg)
    sample = jnp.zeros((1, 64, 128, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    batch = {
        k: jnp.asarray(v) for k, v in next(batch_iterator(2, 64, 128, seed=0)).items()
    }
    rng_key = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(model, tx, cfg))

    ref_state, ref_logs = step(state, batch, rng_key)

    mesh = create_mesh(4, spatial=2)  # 2-way data x 2-way spatial
    state_sh = jax.device_put(state, replicated(mesh))
    batch_sh = {
        k: jax.device_put(v, batch_sharding(mesh, spatial_axis=2))
        for k, v in batch.items()
    }
    sh_state, sh_logs = step(state_sh, batch_sh, rng_key)

    np.testing.assert_allclose(
        float(sh_logs["loss"]), float(ref_logs["loss"]), rtol=1e-5
    )
    # Adam's first step is ~lr*sign(g): cross-device reduction-order
    # noise on near-zero grads can flip signs -> up to 2*lr on those
    # entries (same tolerance rationale as the data-parallel test).
    lr = t.learning_rate
    ref_flat = jax.tree_util.tree_leaves(ref_state.params)
    sh_flat = jax.tree_util.tree_leaves(sh_state.params)
    for a, b in zip(ref_flat, sh_flat):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2.5 * lr)


def test_train_step_hlo_is_collective_clean():
    """The compiled 8-device DP train step must contain ZERO resharding
    collectives (all-to-all / collective-permute) and only a couple of
    gradient all-reduces.

    Regression guard for two shipped bugs (VERDICT r2 items 1-2, 5):
    (a) batching fw/bw passes via ``concatenate([n1, n2], axis=0)`` along
    the SHARDED batch axis lowered to 40 all-to-alls + 618
    collective-permutes — fixed by the shard-local (B, 2) interleave in
    train/trainer.py; (b) forward_warp's ``jnp.arange(b)``-indexed
    scatter lowered to 32 all-reduces + an all-gather under a sharded
    batch — fixed by the vmapped per-example scatter in ops/warp.py.
    Beyond correctness-of-intent, the resharding volume was the direct
    cause of AllToAll rendezvous timeouts on loaded hosts.

    One COMBINED program covers every historically-regressed path in a
    single ~40s XLA compile (suite-time budget, VERDICT r3 item 1): the
    CS cascade (correlation + fw/bw interleave — both flow directions
    are computed in every occlusion mode), disocc's forward-warp
    scatter, the phase-decomposed deconv's H/W slice/interleave, and
    the phase-decomposed stride-2 conv data gradient (ops/conv2d.py —
    also H/W-only slicing, batch axis untouched).
    Per-variant programs stay available behind ``--runslow``.
    """
    from unflow_tpu.utils.hlo import (
        RESHARDING_OPS,
        collective_counts,
        lower_train_step,
    )

    compiled = lower_train_step(8, spec="CS", mask_occlusion="disocc",
                                deconv_impl="phase", conv_impl="phase")
    counts = collective_counts(compiled.as_text())
    bad = {k: v for k, v in counts.items() if k in RESHARDING_OPS}
    assert not bad, f"GSPMD resharding in combined train step: {counts}"
    # Gradient sync fuses into ~1 tuple all-reduce; allow a little slack
    # for XLA version drift but catch per-op scatter/loss all-reduces.
    assert counts.get("all-reduce", 0) <= 4, counts
    assert counts.get("all-gather", 0) == 0, counts


@pytest.mark.slow
@pytest.mark.parametrize(
    "spec,occ",
    [
        ("CS", "fb"),  # flagship cascade path, paper-default masking
        ("S", "disocc"),  # forward-warp scatter path in isolation
    ],
)
def test_train_step_hlo_variants_collective_clean(spec, occ):
    """Per-variant versions of the combined default-suite HLO guard."""
    from unflow_tpu.utils.hlo import (
        RESHARDING_OPS,
        collective_counts,
        lower_train_step,
    )

    compiled = lower_train_step(8, spec=spec, mask_occlusion=occ)
    counts = collective_counts(compiled.as_text())
    bad = {k: v for k, v in counts.items() if k in RESHARDING_OPS}
    assert not bad, f"GSPMD resharding in {spec}/{occ} train step: {counts}"
    assert counts.get("all-reduce", 0) <= 4, counts
    assert counts.get("all-gather", 0) == 0, counts


def test_mesh_validation():
    with pytest.raises(ValueError):
        create_mesh(8, spatial=3)  # 8 % 3 != 0


def test_local_batch_size():
    from unflow_tpu.parallel import local_batch_size

    mesh = create_mesh(8)
    assert local_batch_size(16, mesh) == 2
    import pytest

    with pytest.raises(ValueError):
        local_batch_size(10, mesh)


@pytest.mark.slow
def test_phase_deconv_hlo_is_collective_clean():
    """deconv_impl=phase slices/interleaves along H and W only; the
    sharded batch axis is untouched, so the 8-device step must stay as
    resharding-free as the native path. (Default-suite coverage: the
    combined guard above compiles with deconv_impl='phase'.)"""
    from unflow_tpu.utils.hlo import (
        RESHARDING_OPS,
        collective_counts,
        lower_train_step,
    )

    compiled = lower_train_step(8, spec="S", deconv_impl="phase")
    counts = collective_counts(compiled.as_text())
    bad = {k: v for k, v in counts.items() if k in RESHARDING_OPS}
    assert not bad, f"GSPMD resharding in phase-deconv step: {counts}"
    assert counts.get("all-reduce", 0) <= 4, counts
    assert counts.get("all-gather", 0) == 0, counts


def test_chunked_gather_hlo_is_collective_clean(monkeypatch):
    """Gather-cliff chunking (ops/warp.py) must be disabled under a
    sharded batch axis: GSPMD retiles every batch slice over the full
    mesh even when chunk boundaries land on shard boundaries (measured:
    42 all-to-alls + 708 collective-permutes in the warp VJP at 8
    aligned chunks x 8 devices). With the shard granularity declared,
    the warp must lower collective-clean even when the byte target says
    'chunk'."""
    import re

    import jax

    from unflow_tpu.ops import warp
    from unflow_tpu.parallel import batch_sharding
    from unflow_tpu.utils.hlo import RESHARDING_OPS

    monkeypatch.setattr(warp, "_GATHER_CHUNK_BYTES", 1024)  # force chunking
    mesh = create_mesh(8)
    sh = batch_sharding(mesh)
    rng = np.random.RandomState(0)
    im = jax.device_put(jnp.asarray(rng.rand(16, 32, 64, 3).astype(np.float32)), sh)
    fl = jax.device_put(jnp.asarray(rng.randn(16, 32, 64, 2).astype(np.float32)), sh)

    def loss_grads(a, b):
        return jax.grad(
            lambda x, y: jnp.sum(warp.backward_warp_packed(x, y) ** 2),
            argnums=(0, 1),
        )(a, b)

    with warp.gather_shard_granularity(8):
        txt = jax.jit(loss_grads).lower(im, fl).compile().as_text()
    counts = {k: len(re.findall(k, txt)) for k in RESHARDING_OPS}
    assert not any(counts.values()), f"resharding in chunked warp: {counts}"


def test_gather_chunk_selection():
    from unflow_tpu.ops import warp

    # unsharded: smallest divisor of b covering the byte target
    # (equal chunks only — uneven ceil-splits pessimize layouts)
    assert warp._pick_n_chunks(16, 1) == 1
    with warp.gather_shard_granularity(1):
        assert warp._pick_n_chunks(16, warp._GATHER_CHUNK_BYTES * 2) == 2
        assert warp._pick_n_chunks(12, warp._GATHER_CHUNK_BYTES * 5) == 6
    # sharded batch: chunking off entirely (any slice reshards; the
    # cliff is per-device and each device already holds bytes/g)
    with warp.gather_shard_granularity(8):
        assert warp._pick_n_chunks(16, warp._GATHER_CHUNK_BYTES * 2) == 1
        assert warp._pick_n_chunks(16, warp._GATHER_CHUNK_BYTES * 17) == 1
    # the declaration is scoped: nothing leaks past the with-block
    assert warp._GATHER_SHARD_GRANULARITY.get() == 1
    with pytest.raises(ValueError):
        with warp.gather_shard_granularity(0):
            pass
