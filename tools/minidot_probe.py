"""Mini-dot cost probe: per-tile candidate dots vs one dense scores dot.

Round-4 pruning investigation (docs/PERFORMANCE.md): candidate statistics
on natural content say 128-px raster runs have small exact candidate sets
(median 53 at K=256, sampled palettes), and the dense kernel's cost is
measured LINEAR in K (25.36/13.17/7.07 ms at K=256/128/64, pop4, 4K) —
so a pruned kernel paying ~t(K'=64) would give ~2x iters/s. The ONLY
MXU formulation that gives each 128-px run its own candidate palette is
a chain of small dots ((K', 12) @ (12, 128) per run). This probe measures
whether Mosaic's small-dot issue/fill overhead eats the win:

  dense  one (12, K=256)^T @ (12, 8192) dot per (block, member) + row max
  mini   64 per-run dots (K'=64) per (block, member) + row max
  mini128  32 per-run dots (K'=64, 256-px runs)

Same f32x3-style stacked-split contraction as the production kernel.
Pure timing probe: candidate values are random, no pruning correctness.

Run: python tools/minidot_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, K, POP = 2160, 3840, 256, 4
BLOCK = 8192
KC = 64  # candidates per run


def _split12(c):
    hi = c.astype(jnp.bfloat16)
    lo = (c - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dense_kernel(x_ref, c_ref, out_ref):
    x = x_ref[:, :]
    xh, xl = _split12(x)
    x12 = jnp.concatenate([xh, xl, xh], axis=0)
    for p in range(POP):
        c = c_ref[p]
        ch, cl = _split12(c)
        c12 = jnp.concatenate([ch, ch, cl], axis=0)
        s = jax.lax.dot_general(
            c12, x12, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        out_ref[p, :] = jnp.max(s, axis=0)


def _mini_kernel(x_ref, c_ref, out_ref, *, run: int):
    n_runs = BLOCK // run
    x = x_ref[:, :]
    xh, xl = _split12(x)
    x12 = jnp.concatenate([xh, xl, xh], axis=0)  # (12, BLOCK)
    for p in range(POP):
        for t in range(n_runs):
            c = c_ref[p, t]  # (4, KC)
            ch, cl = _split12(c)
            c12 = jnp.concatenate([ch, ch, cl], axis=0)  # (12, KC)
            s = jax.lax.dot_general(
                c12, x12[:, t * run:(t + 1) * run],
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (KC, run)
            out_ref[p, t * run:(t + 1) * run] = jnp.max(s, axis=0)


def _mini_full_kernel(x_ref, c_ref, o_ref, opp_ref, use_ref, *, run: int):
    """Timing-representative FULL pruned pipeline per 128-px run: scores
    mini-dot + first-index chain + bf16 one-hot winner gather + usage
    accumulation. (Candidates are random — correctness is not the point;
    the real kernel adds only index bookkeeping of the same shape.)"""
    n_runs = BLOCK // run
    i = pl.program_id(0)
    x = x_ref[:, :]
    xh, xl = _split12(x)
    x12 = jnp.concatenate([xh, xl, xh], axis=0)
    for p in range(POP):
        acc = jnp.zeros((KC, run), jnp.float32)
        for t in range(n_runs):
            c = c_ref[p, t]
            ch, cl = _split12(c)
            c12 = jnp.concatenate([ch, ch, cl], axis=0)
            s = jax.lax.dot_general(
                c12, x12[:, t * run:(t + 1) * run],
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (KC, run)
            m = jnp.max(s, axis=0)
            hit = s == m[None, :]
            iota_k = jax.lax.broadcasted_iota(jnp.int32, (KC, run), 0)
            tt = jnp.where(hit, iota_k, KC)
            idx = jnp.min(tt, axis=0)
            onehot = jnp.where(tt == idx[None, :], 1.0, 0.0)
            onehot_bf = onehot.astype(jnp.bfloat16)
            o = o_ref[p, t]  # (4, KC)
            oh = o.astype(jnp.bfloat16)
            ol = (o - oh.astype(jnp.float32)).astype(jnp.bfloat16)
            o8 = jnp.concatenate([oh, ol], axis=0)  # (8, KC)
            out = jax.lax.dot_general(
                o8, onehot_bf, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (8, run)
            opp_ref[p, :, t * run:(t + 1) * run] = out[0:3] + out[4:7]
            acc = acc + onehot
        @pl.when(i == 0)
        def _():
            use_ref[p, :, :] = acc[:, :128]

        @pl.when(i > 0)
        def _():
            use_ref[p, :, :] = use_ref[p, :, :] + acc[:, :128]


def _mini_full2_kernel(x_ref, c_ref, o_ref, opp_ref, use_ref, s_ref, *, run: int):
    """Batched-chain variant: per-run mini-dots fill a (KC, BLOCK) scores
    scratch; the first-index chain/one-hot/counts run ONCE block-wide
    (column-local ops — candidate-set identity of each 128-px segment is
    irrelevant); only the winner gather stays per-run (its lhs varies)."""
    n_runs = BLOCK // run
    i = pl.program_id(0)
    x = x_ref[:, :]
    xh, xl = _split12(x)
    x12 = jnp.concatenate([xh, xl, xh], axis=0)
    for p in range(POP):
        for t in range(n_runs):
            c = c_ref[p, t]
            ch, cl = _split12(c)
            c12 = jnp.concatenate([ch, ch, cl], axis=0)
            s_ref[:, t * run:(t + 1) * run] = jax.lax.dot_general(
                c12, x12[:, t * run:(t + 1) * run],
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
        s = s_ref[:, :]
        m = jnp.max(s, axis=0)
        hit = s == m[None, :]
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (KC, BLOCK), 0)
        tt = jnp.where(hit, iota_k, KC)
        idx = jnp.min(tt, axis=0)
        onehot = jnp.where(tt == idx[None, :], 1.0, 0.0)
        onehot_bf = onehot.astype(jnp.bfloat16)
        for t in range(n_runs):
            o = o_ref[p, t]
            oh = o.astype(jnp.bfloat16)
            ol = (o - oh.astype(jnp.float32)).astype(jnp.bfloat16)
            o8 = jnp.concatenate([oh, ol], axis=0)
            out = jax.lax.dot_general(
                o8, onehot_bf[:, t * run:(t + 1) * run],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            opp_ref[p, :, t * run:(t + 1) * run] = out[0:3] + out[4:7]
        acc = onehot[:, :128]
        w = BLOCK
        v = onehot
        while w > 128:
            w //= 2
            v = v[:, :w] + v[:, w:2 * w]
        acc = v

        @pl.when(i == 0)
        def _():
            use_ref[p, :, :] = acc

        @pl.when(i > 0)
        def _():
            use_ref[p, :, :] = use_ref[p, :, :] + acc


def main():
    rng = np.random.default_rng(0)
    Hp, Wp = 2176, 4096
    P = Hp * Wp
    x4 = jnp.asarray(rng.random((4, P), dtype=np.float32))
    cd = jnp.asarray(rng.random((8, POP, 4, K), dtype=np.float32))
    n_runs = BLOCK // 128
    cm = jnp.asarray(rng.random((8, POP, n_runs, 4, KC), dtype=np.float32))
    cm256 = jnp.asarray(
        rng.random((8, POP, n_runs // 2, 4, KC), dtype=np.float32)
    )
    grid = (P // BLOCK,)

    def dense_call(x, c):
        return pl.pallas_call(
            _dense_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, BLOCK), lambda i: (0, i)),
                pl.BlockSpec((POP, 4, K), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((POP, BLOCK), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((POP, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, c)

    def mini_call(x, c, run):
        nr = BLOCK // run
        return pl.pallas_call(
            functools.partial(_mini_kernel, run=run),
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, BLOCK), lambda i: (0, i)),
                pl.BlockSpec((POP, nr, 4, KC), lambda i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((POP, BLOCK), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((POP, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, c)

    def bench(name, fn, args_for):
        @jax.jit
        def loop(x4, cs):
            def body(it, acc):
                out = fn(x4, cs[it % 8])
                return acc + out[0, 0]
            return jax.lax.fori_loop(0, 24, body, jnp.float32(0.0))

        cs = args_for
        jax.device_get(loop(x4, cs))
        t0 = time.perf_counter()
        jax.device_get(loop(x4, cs))
        dt = (time.perf_counter() - t0) / 24 * 1e3
        print(f"{name}: {dt:7.2f} ms", flush=True)
        return dt

    def mini_full_call(x, c, run):
        nr = BLOCK // run
        return pl.pallas_call(
            functools.partial(_mini_full_kernel, run=run),
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, BLOCK), lambda i: (0, i)),
                pl.BlockSpec((POP, nr, 4, KC), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((POP, nr, 4, KC), lambda i: (0, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((POP, 3, BLOCK), lambda i: (0, 0, i)),
                pl.BlockSpec((POP, KC, 128), lambda i: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((POP, 3, P), jnp.float32),
                jax.ShapeDtypeStruct((POP, KC, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, c, c)

    def bench2(name, fn, cs):
        @jax.jit
        def loop(x4, cs):
            def body(it, acc):
                opp, use = fn(x4, cs[it % 8])
                return acc + opp[0, 0, 0] + use[0, 0, 0]
            return jax.lax.fori_loop(0, 24, body, jnp.float32(0.0))

        jax.device_get(loop(x4, cs))
        t0 = time.perf_counter()
        jax.device_get(loop(x4, cs))
        print(f"{name}: {(time.perf_counter() - t0) / 24 * 1e3:7.2f} ms",
              flush=True)

    which = sys.argv[1:] or ["dense", "mini128", "mini256"]
    if "dense" in which:
        bench("dense K=256 dot+max", dense_call, cd)
    if "mini128" in which:
        bench(
            f"mini {n_runs}x(K'={KC}) 128-px runs",
            lambda x, c: mini_call(x, c, 128), cm,
        )
    if "mini256" in which:
        bench(
            f"mini {n_runs // 2}x(K'={KC}) 256-px runs",
            lambda x, c: mini_call(x, c, 256), cm256,
        )
    def mini_full2_call(x, c, run):
        nr = BLOCK // run
        return pl.pallas_call(
            functools.partial(_mini_full2_kernel, run=run),
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, BLOCK), lambda i: (0, i)),
                pl.BlockSpec((POP, nr, 4, KC), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((POP, nr, 4, KC), lambda i: (0, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((POP, 3, BLOCK), lambda i: (0, 0, i)),
                pl.BlockSpec((POP, KC, 128), lambda i: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((POP, 3, P), jnp.float32),
                jax.ShapeDtypeStruct((POP, KC, 128), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((KC, BLOCK), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(x, c, c)

    if "minifull2_128" in which:
        bench2(
            f"mini-FULL2 {n_runs}x(K'={KC}) 128-px runs",
            lambda x, c: mini_full2_call(x, c, 128), cm,
        )
    if "minifull2_256" in which:
        bench2(
            f"mini-FULL2 {n_runs // 2}x(K'={KC}) 256-px runs",
            lambda x, c: mini_full2_call(x, c, 256), cm256,
        )
    if "minifull128" in which:
        bench2(
            f"mini-FULL {n_runs}x(K'={KC}) 128-px runs",
            lambda x, c: mini_full_call(x, c, 128), cm,
        )
    if "minifull256" in which:
        bench2(
            f"mini-FULL {n_runs // 2}x(K'={KC}) 256-px runs",
            lambda x, c: mini_full_call(x, c, 256), cm256,
        )


if __name__ == "__main__":
    main()
