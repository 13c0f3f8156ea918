"""Training schedules — exact formulas from the reference runner.

  * learning rate (`/root/reference/exp_runner.py:320-332`): linear warm-up to
    ``warm_up_end`` then cosine decay to an ``alpha`` floor:
    ``lf = (cos(pi*progress)+1)/2*(1-alpha)+alpha``. The schedule is stateless
    in the step count, which keeps resume trivial (SURVEY.md §5 checkpointing).
  * cos-anneal ratio (`exp_runner.py:313-317`): ``min(1, step/anneal_end)``;
    1.0 when ``anneal_end == 0``.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_lr_schedule(learning_rate: float, warm_up_end: float,
                     end_iter: int, alpha: float):
    """Returns an optax-compatible schedule fn(step)->lr replicating
    `exp_runner.py:320-332` with iter_step == update count."""
    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if warm_up_end > 0:
            warm_factor = count / warm_up_end
        else:
            warm_factor = jnp.ones_like(count)
        progress = (count - warm_up_end) / max(end_iter - warm_up_end, 1e-8)
        cos_factor = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        factor = jnp.where(count < warm_up_end, warm_factor, cos_factor)
        return learning_rate * factor
    return schedule


def cos_anneal_ratio(step, anneal_end: float):
    """`exp_runner.py:313-317`. Works on traced or python scalars."""
    if anneal_end == 0.0:
        return 1.0
    return jnp.minimum(1.0, jnp.asarray(step, jnp.float32) / anneal_end)
