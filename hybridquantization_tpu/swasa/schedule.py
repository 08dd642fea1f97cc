"""SWASA (simulated annealing with adaptive step width) schedule math.

Pure scalar/batched functions of (iteration, key) reproducing SWASA.java
exactly, but with explicit `jax.random` keys — the reference used a global
unseeded RNG (icy.util.Random) and was therefore non-reproducible
(SWASA.java:46-48,56,61,96-98); here every draw is keyed.

Formulas (see SURVEY.md section 2b):
  - temperature: T <- T*alpha when ite % iTc == 0, from T0 (SWASA.java:84-89)
  - adaptive max step width: s(i) = 2*s0 / (1 + exp(beta*i/imax))
    (SWASA.java:69-72), applied in [0,1] RGB space as s(i)/256 (SWASA.java:92)
  - proposal: per-channel perturbation U(-1,1)*s(i)/256, clamped to [0,1]
    (SWASA.java:91-106)
  - acceptance: dE <= 0 or exp(-dE/T) > U(0,1) (SWASA.java:54-67)
  - population convergence keep-probability:
    -tanh((i - convDelay*imax)/(convSpread*imax))/2 + 0.5 (SWASA.java:59-62)
  - unused-color penalty: delta per never-used palette entry (SWASA.java:74-82)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_step_width(iteration, s0, beta, imax):
    """Adaptive maximum step width s(i) (SWASA.java:69-72)."""
    return 2.0 * s0 / (1.0 + jnp.exp(beta * iteration / imax))


def cool_temperature(temperature, iteration, i_tc, alpha):
    """Geometric cooling every i_tc iterations (SWASA.java:84-89)."""
    return jnp.where(iteration % i_tc == 0, temperature * alpha, temperature)


def propose(key, colors, iteration, s0, beta, imax):
    """Perturb every channel of every palette color (SWASA.java:91-101).

    colors: (..., K, 3) in [0, 1].
    """
    step = max_step_width(iteration, s0, beta, imax) / 256.0
    noise = jax.random.uniform(key, colors.shape, colors.dtype, -1.0, 1.0)
    return jnp.clip(colors + noise * step, 0.0, 1.0)


def random_palette(key, num_colors, dtype=jnp.float32):
    """Uniform random initial palette (SWASA.java:40-52)."""
    return jax.random.uniform(key, (num_colors, 3), dtype)


def accept(key, delta_error, temperature):
    """Metropolis acceptance (SWASA.java:54-57). delta_error: (...,)."""
    u = jax.random.uniform(key, jnp.shape(delta_error))
    return (delta_error <= 0.0) | (jnp.exp(-delta_error / temperature) > u)


def keep_probability(iteration, conv_delay, conv_spread, imax):
    """Probability a population member keeps its own state (SWASA.java:59-62)."""
    return (
        -jnp.tanh((iteration - conv_delay * imax) / (conv_spread * imax)) / 2.0 + 0.5
    )


def keeps_values(key, iteration, conv_delay, conv_spread, imax, shape):
    """Batched convergence gate draw for a population."""
    u = jax.random.uniform(key, shape)
    return keep_probability(iteration, conv_delay, conv_spread, imax) > u


def unused_penalty(usage, delta):
    """delta per palette entry never chosen by any pixel (SWASA.java:74-82).

    usage: (K,) bool.
    """
    return delta * jnp.sum(~usage).astype(jnp.float32)
