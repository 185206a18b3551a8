"""Shared lockstep autoreset for the native vector envs.

The reference vectorizes by running N OS processes (Gymnasium
AsyncVectorEnv / SB3 SubprocVecEnv) whose workers each reseed their own
embedded Julia sim at episode end; here the N lockstep envs live in one
array program, so episode resets are a masked in-place swap of the field
pytree. Used by both RBC2DVectorEnv and RBC3DVectorEnv — the logic (and
in particular the RNG discipline) must stay identical between them.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def autoreset_step(
    fields,
    key: jax.Array,
    truncated: jax.Array,
    final_obs: jax.Array,
    init_fields: Callable,
    observe: Callable,
) -> Tuple[object, jax.Array, jax.Array]:
    """Masked per-env autoreset: returns (fields, key, obs).

    Each autoreset SPLITS the per-env key: one half becomes the new carried
    stream, the other seeds the fresh IC. This guarantees a different
    initial condition (and checkpoint-bank index) every episode — folding a
    constant into a never-advanced key would replay the same IC forever
    (the round-1 autoreset bug). lax.cond skips the fresh-IC generation
    (and its HBM traffic) entirely on the non-truncating steps.

    ``fields`` is any pytree with a leading env axis; ``init_fields(key)``
    builds ONE env's fresh fields; ``observe(fields)`` maps the batched
    pytree to the batched observation.
    """

    def _with_autoreset(operand):
        flds, k = operand
        ks = jax.vmap(jax.random.split)(k)  # (E, 2, key)
        carry, init_keys = ks[:, 0], ks[:, 1]
        fresh = jax.vmap(init_fields)(init_keys)

        def pick(new, old):
            m = truncated.reshape(truncated.shape + (1,) * (old.ndim - 1))
            return jnp.where(m, new, old)

        new_fields = jax.tree_util.tree_map(pick, fresh, flds)
        kmask = truncated.reshape(truncated.shape + (1,) * (k.ndim - 1))
        new_key = jnp.where(kmask, carry, k)
        return new_fields, new_key, observe(new_fields)

    def _no_autoreset(operand):
        flds, k = operand
        return flds, k, final_obs

    return jax.lax.cond(
        jnp.any(truncated), _with_autoreset, _no_autoreset, (fields, key)
    )
