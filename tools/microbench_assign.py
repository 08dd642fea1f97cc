"""Microbenchmark of the fused population assignment kernel (4K/K256/pop4).

Sweeps block size x scores precision on the real chip and cross-checks the
reduced-precision modes against "highest" (flips must be rare near-ties).

History (v5e, via axon relay), which motivated the current kernel design:
the original (8-row packing, grid (pop, blocks), jnp.argmax) kernel measured
  mm_only 111.8 ms | mm_bf16 53.4 ms | max_only 112.3 | argmax-full 135.2
=> the cost was (a) the HIGHEST 6-pass scores matmul with its contraction
dim padded 8->128 by Mosaic, (b) ~2 us/grid-step overhead (16864 steps),
NOT the VPU argmax chain (+23 ms only). Hence: pop loop unrolled in-kernel,
4-row packing, larger blocks, selectable scores precision.

Run: python tools/microbench_assign.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hybridquantization_tpu.ops import pallas_assign as pa

H, W, K, POP = 2160, 3840, 256, 4


def bench(fn, make_args, iters=5):
    out = fn(*make_args(0))
    jax.device_get(jax.tree.map(lambda a: a.ravel()[0], out))
    ts = []
    for i in range(1, iters + 1):
        args = make_args(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.map(lambda a: a.ravel()[0], out))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from hybridquantization_tpu.ops.band_conv import padded_size

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    half = 10
    Hp, Wp = padded_size(H, half), padded_size(W, half)
    pp = Hp * Wp
    print(f"padded {Hp}x{Wp} = {pp/1e6:.2f} Mpix")

    feats = jnp.asarray(rng.random((pp, 3), dtype=np.float32))
    pals = [rng.random((POP, K, 3)).astype(np.float32) for _ in range(8)]

    packed = {}
    for block in (2048, 4096, 8192):
        packed[block] = jax.block_until_ready(pa.pack_pixels(feats, block))

    def make_args(i, block):
        p = jnp.asarray(pals[i % 8])
        c4, o4 = jax.vmap(pa.pack_palette)(p, p)
        n = jnp.int32(pp)
        return packed[block], c4, o4, n

    ref = None
    for block in (2048, 4096, 8192):
        for precision in ("highest", "f32x3", "bf16"):
            fn = functools.partial(
                pa.assign_opp_pop, block=block, precision=precision
            )
            try:
                t = bench(fn, lambda i: make_args(i, block))
            except Exception as e:  # VMEM overflow etc.
                print(f"block {block:5d} {precision:8s}  FAILED: {type(e).__name__}")
                continue
            print(
                f"block {block:5d} {precision:8s} {t*1e3:7.1f} ms  "
                f"{POP * pp / t / 1e6:7.0f} Mpix/s"
            )
            if block == 4096:
                opp, usage = fn(*make_args(0, block))
                if precision == "highest":
                    ref = np.asarray(opp)
                elif ref is not None:
                    flips = int(
                        ((np.asarray(opp) != ref).any(axis=1)).sum()
                    )
                    print(
                        f"    {precision} vs highest: {flips} flipped pixels "
                        f"({flips / (POP * pp):.2e})"
                    )


if __name__ == "__main__":
    main()
