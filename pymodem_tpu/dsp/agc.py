"""Automatic gain control as a `lax.scan` recurrence.

Behavioural contract (agc.py:26-80 in the reference):

* A *non-causal* pre-pass computes ``normal = max(buffer)`` (signed max over
  the whole buffer, agc.py:67) which scales the attack/decay steps.  Under
  time-block sharding this becomes a global collective max before the scan.
* Per sample, an envelope follower with attack / sustain / decay phases:
    - if |x| > env:  env += attack*normal, clipped up to |x|; sustain resets
    - if sustain >= sustain_time: env -= decay*normal, clipped at 0
    - sustain += 1/fs
* Output: target * x / env when env != 0, else x passed through unchanged.

The recurrence is sequential per chain; throughput comes from vmapping the
scan across a bank of chains so each step is a wide VPU op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("unroll",))
def agc_apply(x: jax.Array, scaled_attack: jax.Array, scaled_decay: jax.Array,
              sustain_time: jax.Array, sustain_increment: jax.Array,
              target_amplitude: jax.Array, unroll: int = 8,
              normal: jax.Array | None = None) -> jax.Array:
    """Apply AGC to a 1-D buffer; returns the scaled buffer.

    ``scaled_attack``/``scaled_decay`` are the per-sample rates
    (attack_rate / sample_rate etc., agc.py:15-16).  ``normal`` is the
    whole-recording signed max (agc.py:67); pass it explicitly under
    time-block sharding (a global collective max), else it is computed
    over ``x``.
    """
    dtype = x.dtype
    if normal is None:
        normal = jnp.max(x)  # signed max, matching agc.py:67
    attack_step = scaled_attack * normal
    decay_step = scaled_decay * normal

    def step(carry, sample):
        env, sustain = carry
        cv = jnp.abs(sample)
        rising = cv > env
        env_att = jnp.minimum(env + attack_step, cv)
        env = jnp.where(rising, env_att, env)
        sustain = jnp.where(rising, jnp.zeros_like(sustain), sustain)
        decaying = sustain >= sustain_time
        env_dec = jnp.maximum(env - decay_step, jnp.zeros_like(env))
        env = jnp.where(decaying, env_dec, env)
        sustain = sustain + sustain_increment
        out = jnp.where(env != 0, target_amplitude * sample / env, sample)
        return (env, sustain), out

    init = (jnp.zeros((), dtype), jnp.zeros((), dtype))
    _, out = jax.lax.scan(step, init, x, unroll=unroll)
    return out
