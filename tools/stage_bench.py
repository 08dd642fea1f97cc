"""Per-stage timing of the SWASA iteration at 4K/K256/pop4 on the real chip.

Breaks one iteration into its device stages and times each in isolation
(fresh inputs + device_get per rep; docs/PERFORMANCE.md measurement rules):

  assign    pallas_assign.assign_opp_usage_pop        (per precision)
  pad       the per-eval symmetric guard pad (opp -> q2)
  fused     fused_fitness.fused_scielab_err_sums      (per precision)
  fitness   the full population fitness (all of the above, one jit)
  iter      one SWASA iteration inside a 10-iter scan chunk

Run: python tools/stage_bench.py [--precisions f32x3,bf16,highest]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W, K, POP = 2160, 3840, 256, 4


def _sync(out):
    # Slice to a scalar ON DEVICE before device_get — np.asarray here would
    # pull whole image-sized outputs through the relay (~20 s for 400 MB).
    jax.device_get(jax.tree.map(lambda a: a.ravel()[0], out))


def bench(fn, make_args, iters=5):
    out = fn(*make_args(0))
    _sync(out)
    ts = []
    for i in range(1, iters + 1):
        args = make_args(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precisions", default="f32x3")
    ap.add_argument("--tie-modes", default="first")
    ap.add_argument("--skip-iter", action="store_true")
    args = ap.parse_args()
    precisions = args.precisions.split(",")
    tie_modes = args.tie_modes.split(",")

    import dataclasses

    from hybridquantization_tpu import QuantizationConfig, SWASAConfig
    from hybridquantization_tpu.ops import pallas_assign as pa
    from hybridquantization_tpu.ops import fused_fitness as ff
    from hybridquantization_tpu.ops.band_conv import BLOCK, padded_plan
    from hybridquantization_tpu import colorspace as cs
    from hybridquantization_tpu.pipeline import (
        HybridQuantizer, _chunk_jit, _init_jit, _make_context,
        make_population_fitness,
    )

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    base_cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=K, population=POP, imax=100)
    )
    engine = HybridQuantizer(base_cfg)
    half = engine.filters.half_width
    Hp, Wp, _ = padded_plan(H, W, half)
    image = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    ctx = _make_context(image, engine.filters, base_cfg)
    jax.device_get(ctx["target_lab"][0, 0])
    palettes_np = [rng.random((POP, K, 3)).astype(np.float32) for _ in range(8)]
    wp_tuple = tuple(cs.WHITEPOINTS["D65"].tolist())

    # a representative padded opponent image for pad/fused stages
    opp_np = [
        rng.standard_normal((POP, 3, Hp, Wp)).astype(np.float32) * 0.1
        for _ in range(4)
    ]

    # -- assign ---------------------------------------------------------------
    # NB: image-sized arrays must be ARGUMENTS of the jitted fn, never
    # closures (closure capture turns them into MLIR constants;
    # docs/PERFORMANCE.md finding 4).
    for prec in precisions:
        for tie in tie_modes:

            @functools.partial(jax.jit, static_argnames=("_prec", "_tie"))
            def assign_fn(x4, px, ps, _prec=prec, _tie=tie):
                return pa.assign_opp_usage_pop(
                    px, ps, ps, x4=x4,
                    num_pixels=Hp * Wp, precision=_prec, tie_mode=_tie,
                )[0]

            t = bench(
                assign_fn,
                lambda i: (
                    ctx["x4"], ctx["assign_pixels"],
                    jnp.asarray(palettes_np[i % 8]),
                ),
            )
            print(
                f"assign  prec={prec:8s} tie={tie:8s} {t*1e3:7.1f} ms "
                f"({POP*Hp*Wp/t/1e6:7.0f} Mpix/s)", flush=True,
            )

    # -- fused S-CIELAB + deltaE kernel (guard-free: takes q directly) -------
    for prec in precisions:
        @functools.partial(jax.jit, static_argnames=("_prec",))
        def fused_fn(q, tgt, mh, mv, _prec=prec):
            return ff.fused_scielab_err_sums(
                q, tgt, mh, mv,
                wp_tuple, H=H, W=W, deltaE="CIE76", precision=_prec,
            )

        t = bench(
            fused_fn,
            lambda i: (
                jnp.asarray(opp_np[i % 4]), ctx["target_planar"],
                ctx["mats_h"], ctx["mats_v"],
            ),
        )
        print(f"fused   prec={prec:8s}              {t*1e3:7.1f} ms", flush=True)

    # -- full population fitness + full iteration ----------------------------
    for prec in precisions:
        cfg = dataclasses.replace(base_cfg, precision=prec)
        ctx_p = _make_context(image, engine.filters, cfg)

        @jax.jit
        def fitness_fn(c, ps, _cfg=cfg):
            errors, _ = make_population_fitness(c, _cfg, half)(ps)
            return errors

        t = bench(
            fitness_fn, lambda i: (ctx_p, jnp.asarray(palettes_np[i % 8])),
            iters=3,
        )
        print(f"fitness prec={prec:8s}              {t*1e3:7.1f} ms", flush=True)

        if not args.skip_iter:
            state = _init_jit(jax.random.PRNGKey(0), ctx_p, cfg, half)
            jax.device_get(state.best_error)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                state, _ = _chunk_jit(state, ctx_p, cfg, 10, half)
                jax.device_get(state.best_error)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            t = ts[len(ts) // 2] / 10
            print(
                f"iter    prec={prec:8s}              {t*1e3:7.1f} ms "
                f"({1/t:5.2f} iters/s)", flush=True,
            )


if __name__ == "__main__":
    main()
