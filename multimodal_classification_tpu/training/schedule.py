"""Learning-rate schedules.

Warmup-linear: linear 0→lr over ``warmup_steps``, then linear decay to 0 at
``total_steps`` (reference: nodes.py:699-709 hand-rolled LambdaLR). With
``use_linear_decay=False`` the rate stays constant after warmup.
"""

from __future__ import annotations

import optax


def warmup_linear_schedule(
    learning_rate: float,
    warmup_steps: int,
    total_steps: int,
    use_linear_decay: bool = True,
) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        warmup_factor = jnp.minimum(step / warm, 1.0)
        if not use_linear_decay:
            return learning_rate * warmup_factor
        denom = jnp.maximum(total_steps - warmup_steps, 1)
        decay_factor = jnp.clip((total_steps - step) / denom, 0.0, 1.0)
        return learning_rate * jnp.where(step < warmup_steps, warmup_factor, decay_factor)

    return schedule
