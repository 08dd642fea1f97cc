"""Population-axis (EP-analog) sharding of the SWASA fitness.

SURVEY.md section 2f: "the population axis can also shard (a form of EP)".
The reference pipelines its population members through one OpenCL queue
(ImageManipulation.java:620-727); here extra chips beyond the data x pixel
grid each evaluate a SLICE of the candidate palettes and one all_gather
recombines the (errors, usage) pair — the annealing state itself stays
replicated (proposals/acceptance are identical scalar math on every
device, so the gather is the only added communication: pop floats +
pop x K bools per evaluation).

Matters when pop x images < devices: e.g. 1 image, pop 4, 8 chips — pixel
sharding alone must absorb all 8; with a pop axis the mesh can be
(pop=4, pixel=2), halving every kernel's pixel load.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def shard_population(pop_fitness, pop: int, n_pop: int, axis_name: str):
    """Wrap a population fitness ((pop, K, 3) -> ((pop,), (pop, K))) so each
    `axis_name` shard evaluates pop/n_pop members.

    Recombination is a psum of slice-into-zeros placements (an all_gather
    in psum clothing): x + 0 is exact in f32, so results are BIT-EQUAL to
    the local-population path (tests/test_sharding.py), and psum — unlike
    all_gather — is replication-producing under shard_map's vma checking,
    so the wrapper works inside check_vma=True engines too.
    """
    if n_pop == 1:
        return pop_fitness
    if pop % n_pop:
        raise ValueError(
            f"population {pop} not divisible by pop-axis size {n_pop}"
        )
    local = pop // n_pop

    def wrapped(palettes):
        j = lax.axis_index(axis_name)
        pal_local = lax.dynamic_slice_in_dim(palettes, j * local, local, 0)
        errs, usage = pop_fitness(pal_local)
        K = usage.shape[-1]
        err_full = lax.dynamic_update_slice_in_dim(
            jnp.zeros((pop,), errs.dtype), errs, j * local, 0
        )
        use_full = lax.dynamic_update_slice_in_dim(
            jnp.zeros((pop, K), jnp.int32), usage.astype(jnp.int32),
            j * local, 0,
        )
        err_full, use_full = lax.psum((err_full, use_full), axis_name)
        return err_full, use_full > 0

    wrapped.is_population = True
    return wrapped
