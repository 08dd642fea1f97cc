"""Round-3 assignment-kernel experiment: VPU k-loop vs MXU scores dot.

The shipped kernel's scores matmul is MXU-TILE-bound: (K/128)*(BP/128)
output tiles at ~128 cycles each regardless of the 4-deep contraction
(docs/PERFORMANCE.md round-2 bisect: dot+max 13.26 ms of the 25.2 ms
kernel at 4K/K256/pop4). But the materialized (K, BP) score matrix is
never needed — only the per-pixel running first-index max. This experiment
computes it directly on the VPU:

  pixels tiled (8, L) on sublanes x lanes (full VREG utilization);
  fori_loop over k: s = x.c_k + b_k (scalar-broadcast FMAs from SMEM),
  strict s > best keeps the FIRST index on ties (the reference's
  strict-less scan, OptimizedConvolution.cl:158-167), winner color
  tracked by selects; usage via 8 rank-2 compares of the idx rows
  against a (K, L) iota.

Estimated ~10 VPU ops/k/pixel ~= 88 G element-ops at 4K/K256/pop4
~= 7 ms at the measured ~12.7 T elem-ops/s VPU rate, vs 20+ ms for
dot+chain+gather. Also: true f32 FMA scores (better than f32x3) and a
bit-exact winner color for free.

Run: python tools/vpu_assign_exp.py [variants] [blocks]
  variants: comma list of cur,vpu,vpu_u4,vpu_u16,vpu_fused (default all)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hybridquantization_tpu.ops import pallas_assign as pa

H, W, K, POP = 2160, 3840, 256, 4
LANE = 128


def make_vpu_kernel(K: int, pop: int, unroll: int, fused: bool):
    def kernel(n_ref, cs_ref, os_ref, x_ref, opp_ref, usage_ref):
        i = pl.program_id(0)
        L = x_ref.shape[-1]
        x0 = x_ref[0, 0]
        x1 = x_ref[1, 0]
        x2 = x_ref[2, 0]  # (8, L)
        bp = 8 * L
        pix = i * bp + (
            jax.lax.broadcasted_iota(jnp.int32, (8, L), 0) * L
            + jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
        )
        valid = pix < n_ref[0]
        kp = usage_ref.shape[1]
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (kp, L), 0)

        neg = jnp.full((8, L), -1e30, jnp.float32)
        zero = jnp.zeros((8, L), jnp.float32)
        idx0 = jnp.full((8, L), -1, jnp.int32)

        def member_body(p):
            # Manual partial unroll: Mosaic's fori_loop lowering supports
            # only unroll=1 or full unroll, so the body runs `unroll`
            # static sub-steps per loop iteration.
            def body(kk, carry):
                for j in range(unroll):
                    k = kk * unroll + j
                    best, b0, b1, b2, idx = carry
                    c0 = cs_ref[p * 4 + 0, k]
                    c1 = cs_ref[p * 4 + 1, k]
                    c2 = cs_ref[p * 4 + 2, k]
                    cb = cs_ref[p * 4 + 3, k]
                    s = (x0 * c0 + x1 * c1) + (x2 * c2 + cb)
                    m = s > best
                    best = jnp.where(m, s, best)
                    b0 = jnp.where(m, os_ref[p * 4 + 0, k], b0)
                    b1 = jnp.where(m, os_ref[p * 4 + 1, k], b1)
                    b2 = jnp.where(m, os_ref[p * 4 + 2, k], b2)
                    idx = jnp.where(m, k, idx)
                    carry = (best, b0, b1, b2, idx)
                return carry

            return body

        def finish(p, best, b0, b1, b2, idx):
            opp_ref[p, 0, 0] = b0
            opp_ref[p, 1, 0] = b1
            opp_ref[p, 2, 0] = b2
            idx = jnp.where(valid, idx, -1)
            u = jnp.zeros((kp, L), jnp.float32)
            for j in range(8):
                u = u + jnp.where(idx[j : j + 1, :] == iota_k, 1.0, 0.0)
            w = L
            while w > LANE:
                w //= 2
                u = u[:, :w] + u[:, w : 2 * w]

            @pl.when(i == 0)
            def _():
                usage_ref[p, :, :] = u

            @pl.when(i > 0)
            def _():
                usage_ref[p, :, :] = usage_ref[p, :, :] + u

        if not fused:
            for p in range(pop):
                best, b0, b1, b2, idx = jax.lax.fori_loop(
                    0, K // unroll, member_body(p),
                    (neg, zero, zero, zero, idx0),
                )
                finish(p, best, b0, b1, b2, idx)
        else:
            def body_all(k, carry):
                out = []
                for p in range(pop):
                    out.append(member_body(p)(k, carry[p]))
                return tuple(out)

            init = tuple((neg, zero, zero, zero, idx0) for _ in range(pop))
            carry = jax.lax.fori_loop(0, K // unroll, body_all, init)
            for p in range(pop):
                finish(p, *carry[p])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("variant", "block", "unroll", "fused")
)
def run_vpu(x4t, cs, os_, n, variant, block=8192, unroll=8, fused=False):
    pop = POP
    kp = cs.shape[-1]
    nb = x4t.shape[1]
    L = block // 8

    def call(c, o):
        return pl.pallas_call(
            make_vpu_kernel(K, pop, unroll, fused),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((4, 1, 8, L), lambda i, n, c, o: (0, i, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (pop, 3, 1, 8, L), lambda i, n, c, o: (0, 0, i, 0, 0)
                    ),
                    pl.BlockSpec(
                        (pop, kp, LANE), lambda i, n, c, o: (0, 0, 0)
                    ),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((pop, 3, nb, 8, L), jnp.float32),
                jax.ShapeDtypeStruct((pop, kp, LANE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(n, c, o, x4t)

    def body(it, acc):
        opp, usage = call(cs[it % 8], os_[it % 8])
        return acc + opp[0, 0, 0, 0, 0] + usage[0, 0, 0]

    reps = 24
    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0)), reps


@functools.partial(jax.jit, static_argnames=("block",))
def run_current(x4, c4s, o4s, n, block=8192):
    def body(it, acc):
        opp, usage = pa.assign_opp_pop(
            x4, c4s[it % 8], o4s[it % 8], n[0], block=block,
            precision="f32x3", tie_mode="first",
        )
        return acc + opp[0, 0, 0] + usage[0, 0, 0]

    reps = 24
    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0)), reps


def check_correctness(block=8192):
    """VPU kernel vs the shipped kernel on small data (exact idx compare
    is done in the test suite; here compare opp/usage)."""
    rng = np.random.default_rng(1)
    pp = block * 2
    feats = jnp.asarray(rng.random((pp, 3), dtype=np.float32))
    pals = jnp.asarray(rng.random((POP, K, 3)).astype(np.float32))
    c4, o4 = jax.vmap(pa.pack_palette)(pals, pals)
    kp = c4.shape[-1]
    n = jnp.full((1,), pp - 77, jnp.int32)  # some invalid tail pixels

    x4 = pa.pack_pixels(feats, block)
    opp_ref, usage_ref = pa.assign_opp_pop(
        x4, c4, o4, n[0], block=block, precision="highest"
    )
    usage_ref = jnp.sum(usage_ref, axis=2)

    L = block // 8
    x4t = x4.reshape(4, -1, 8, L)
    cs = c4.reshape(POP * 4, kp)
    os_ = o4.reshape(POP * 4, kp)
    nb = x4t.shape[1]

    opp_v, usage_v = pl.pallas_call(
        make_vpu_kernel(K, POP, 8, False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((4, 1, 8, L), lambda i, n, c, o: (0, i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(
                    (POP, 3, 1, 8, L), lambda i, n, c, o: (0, 0, i, 0, 0)
                ),
                pl.BlockSpec((POP, kp, LANE), lambda i, n, c, o: (0, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((POP, 3, nb, 8, L), jnp.float32),
            jax.ShapeDtypeStruct((POP, kp, LANE), jnp.float32),
        ],
    )(n, cs, os_, x4t)
    opp_v = opp_v.reshape(POP, 3, pp)
    usage_v = jnp.sum(usage_v, axis=2)

    d_opp = np.max(np.abs(np.asarray(opp_v - opp_ref)))
    d_use = np.max(np.abs(np.asarray(usage_v - usage_ref)))
    print(f"correctness: max|opp diff|={d_opp}, max|usage diff|={d_use}")


def main():
    from hybridquantization_tpu.ops.band_conv import padded_plan

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    Hp, Wp, _ = padded_plan(H, W, 10)
    pp = Hp * Wp
    print(f"padded {Hp}x{Wp} = {pp/1e6:.2f} Mpix, K={K}, pop={POP}")

    check_correctness()

    feats = jnp.asarray(rng.random((pp, 3), dtype=np.float32))
    pals = jnp.asarray(rng.random((8, POP, K, 3)).astype(np.float32))
    c4s, o4s = jax.vmap(jax.vmap(pa.pack_palette))(pals, pals)
    kp = c4s.shape[-1]
    cs = c4s.reshape(8, POP * 4, kp)
    os_ = o4s.reshape(8, POP * 4, kp)
    c4s, o4s, cs, os_ = jax.block_until_ready((c4s, o4s, cs, os_))
    n = jnp.full((1,), pp, jnp.int32)

    variants = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else ["cur", "vpu", "vpu_u4", "vpu_u16", "vpu_fused"]
    )
    blocks = [
        int(b) for b in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["8192"])
    ]
    for block in blocks:
        x4 = jax.block_until_ready(pa.pack_pixels(feats, block))
        L = block // 8
        x4t = jax.block_until_ready(x4.reshape(4, -1, 8, L))
        for v in variants:
            t_compile = time.perf_counter()
            if v == "cur":
                out, reps = run_current(x4, c4s, o4s, n, block)
            else:
                unroll = {"vpu": 8, "vpu_u4": 4, "vpu_u16": 16}.get(v, 8)
                fused = v == "vpu_fused"
                out, reps = run_vpu(
                    x4t, cs, os_, n, v, block, unroll, fused
                )
            jax.device_get(out)
            t_compile = time.perf_counter() - t_compile
            t0 = time.perf_counter()
            if v == "cur":
                out, _ = run_current(x4, c4s, o4s, n, block)
            else:
                out, _ = run_vpu(x4t, cs, os_, n, v, block, unroll, fused)
            jax.device_get(out)
            dt = (time.perf_counter() - t0) / reps
            print(
                f"block {block:5d} {v:10s} {dt*1e3:7.2f} ms/call  "
                f"{POP * pp / dt / 1e6:7.0f} Mpix/s  (compile {t_compile:.0f}s)"
            )


if __name__ == "__main__":
    main()
