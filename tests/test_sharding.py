"""GSPMD sharding tests beyond plain data parallelism (SURVEY.md §2.3).

The spatial mesh axis shards image width across devices; XLA inserts
conv halo exchanges automatically — the TPU analog of context/sequence
parallelism for this ConvNet domain.
"""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_mesh_validation():
    import pytest

    with pytest.raises(ValueError):
        create_mesh(8, spatial=3)  # 8 % 3 != 0


def test_local_batch_size():
    from unflow_tpu.parallel import local_batch_size

    mesh = create_mesh(8)
    assert local_batch_size(16, mesh) == 2
    import pytest

    with pytest.raises(ValueError):
        local_batch_size(10, mesh)
