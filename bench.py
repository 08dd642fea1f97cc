"""Benchmark harness — prints ONE JSON line with the primary metric.

Primary metric (BASELINE.json): Mpix/s/chip palette assignment at K=256,
measured on a 4K (3840x2160) image on one chip.

vs_baseline normalization: the reference publishes no numbers
(BASELINE.json "published": {}), so the baseline is derived from the
north-star target — "<= 10 s to quantize 4K to K=256" with the reference
default schedule (imax=5000, population=4, HybridQuantization.java:197-199):
4 * 5000 evaluations * 8.29 Mpix / 10 s = 16,589 Mpix/s of palette-assignment
throughput. vs_baseline = measured / 16589 (>= 1.0 means the hardest reading
of the north star is met on one chip).

Extra context metrics ride inside the JSON object under "extra".
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_ASSIGN_MPIX_S = 4 * 5000 * (3840 * 2160 / 1e6) / 10.0  # 16589 Mpix/s


def _median_time(fn, *args, warmup=2, iters=5):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hybridquantization_tpu import QuantizationConfig, SWASAConfig
    from hybridquantization_tpu.ops import assign as assign_ops
    from hybridquantization_tpu.pipeline import (
        HybridQuantizer,
        _make_context,
        make_fitness,
    )

    H, W, K = 2160, 3840, 256
    npix = H * W
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    palette = jnp.asarray(rng.random((K, 3), dtype=np.float32))
    pixels = image.reshape(-1, 3)

    # -- primary: fused nearest-palette assignment @ K=256 -------------------
    assign_fn = jax.jit(
        lambda px, pal: assign_ops.nearest_palette(px, pal, block_size=1 << 20)
    )
    t_assign = _median_time(assign_fn, pixels, palette)
    assign_mpix_s = npix / t_assign / 1e6

    # -- context: one full fitness evaluation (assign + S-CIELAB + deltaE) ---
    cfg = QuantizationConfig(swasa=SWASAConfig(num_colors=K, population=1))
    engine = HybridQuantizer(cfg)
    ctx = _make_context(image, engine.filters, cfg)
    half = engine.filters.half_width

    @jax.jit
    def fitness(ctx, pal):
        # ctx passed as an argument: closing over it would inline the 4K
        # image as MLIR constants (hundreds of MB -> pathological compiles).
        return make_fitness(ctx, cfg, half)(pal)[0]

    t_fitness = _median_time(fitness, ctx, palette, warmup=1, iters=3)

    # -- context: SWASA iterations/s (pop=4, one scan step) ------------------
    from hybridquantization_tpu.pipeline import _chunk_jit, _init_jit

    cfg4 = QuantizationConfig(swasa=SWASAConfig(num_colors=K, population=4, imax=100))
    engine4 = HybridQuantizer(cfg4)
    ctx4 = _make_context(image, engine4.filters, cfg4)
    state = _init_jit(jax.random.PRNGKey(0), ctx4, cfg4, half)
    jax.block_until_ready(state.best_error)

    def ten_iters(state):
        s, _ = _chunk_jit(state, ctx4, cfg4, 10, half)
        return s

    t_ten = _median_time(ten_iters, state, warmup=1, iters=3)
    iters_per_s = 10.0 / t_ten

    value = round(assign_mpix_s, 1)
    print(
        json.dumps(
            {
                "metric": "palette_assignment_mpix_per_s_per_chip_k256_4k",
                "value": value,
                "unit": "Mpix/s",
                "vs_baseline": round(assign_mpix_s / BASELINE_ASSIGN_MPIX_S, 4),
                "extra": {
                    "fitness_eval_seconds_4k_k256": round(t_fitness, 4),
                    "fitness_eval_mpix_per_s": round(npix / t_fitness / 1e6, 1),
                    "swasa_iters_per_s_pop4_4k_k256": round(iters_per_s, 3),
                    "est_seconds_imax5000_pop4_4k": round(5000 / iters_per_s, 1),
                    "device": str(jax.devices()[0]),
                    "baseline_derivation": "4*5000 evals * 8.29 Mpix / 10 s (north star, reference default schedule)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
