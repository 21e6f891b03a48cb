"""Learning-rate schedule: piecewise halving.

Reference: simonmeister/UnFlow ``src/e2eflow/core/train.py`` — Adam at a
constant learning rate until ``decay_after`` iterations, then halved
every ``decay_interval`` iterations (SURVEY.md §2.2 P7, [MED] on exact
key names).
"""

from __future__ import annotations

import jax.numpy as jnp


def piecewise_halving(learning_rate: float, decay_after: int, decay_interval: int):
    """optax-compatible schedule: lr * 0.5^halvings(step)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        halvings = jnp.maximum(0, (step - decay_after) // decay_interval + 1)
        return learning_rate * (0.5 ** halvings.astype(jnp.float32))

    return schedule
