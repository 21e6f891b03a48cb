"""Finite-difference gradient checking (jax.test_util was removed in 0.9)."""

import jax
import jax.numpy as jnp
import numpy as np


def check_grads_fd(f, args, atol=5e-2, rtol=5e-2, eps=1e-3, seed=0):
    """Compare reverse-mode grads of ``sum(f(*args))`` against central
    finite differences along a random direction, per argument."""
    rng = np.random.RandomState(seed)

    def scalar_f(*a):
        return jnp.sum(f(*a))

    grads = jax.grad(scalar_f, argnums=tuple(range(len(args))))(*args)
    for i, (arg, g) in enumerate(zip(args, grads)):
        direction = rng.randn(*arg.shape).astype(np.float64)
        direction /= np.linalg.norm(direction)
        d = jnp.asarray(direction.astype(np.asarray(arg).dtype))
        plus = [a if j != i else a + eps * d for j, a in enumerate(args)]
        minus = [a if j != i else a - eps * d for j, a in enumerate(args)]
        fd = (float(scalar_f(*plus)) - float(scalar_f(*minus))) / (2 * eps)
        analytic = float(jnp.vdot(g, d))
        np.testing.assert_allclose(
            analytic, fd, atol=atol, rtol=rtol,
            err_msg=f"grad mismatch for arg {i}: analytic={analytic} fd={fd}",
        )
