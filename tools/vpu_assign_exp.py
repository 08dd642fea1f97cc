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


def make_grp8_kernel(K: int, pop: int, sub: int, unroll: int = 1):
    """8-entries-per-step slotted VPU argmax.

    Pixels ride LANES ((1, bp) rows of the packed x4 — lane-replicated
    operands are free in Mosaic, measured via the m[None, :] chain ops);
    palette entries ride SUBLANES: (8, 1) column slices of a (K, 4)
    transposed palette, so one (8,1)x(1,bp) broadcast multiply scores 8
    entries at once and the k-loop needs ONE vector load per 8 entries
    instead of 7 scalar loads per entry (the scalar unit was the 23 ms
    bottleneck of the scalar variant). Each sublane slot j tracks the
    running first-index best of entries {g*8+j}; slots merge at the end
    with an explicit min-index tie-break -> exact reference tie semantics.
    """

    def kernel(n_ref, x_ref, ct_ref, ot_ref, opp_ref, usage_ref):
        i = pl.program_id(0)
        bp = x_ref.shape[1]
        sp = bp // sub
        kp = usage_ref.shape[1]
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        for p in range(pop):
            for s_i in range(sub):
                lo = s_i * sp
                x0 = x_ref[0:1, lo:lo + sp]
                x1 = x_ref[1:2, lo:lo + sp]
                x2 = x_ref[2:3, lo:lo + sp]

                def body(gg, carry):
                    for jj in range(unroll):
                        g = gg * unroll + jj
                        best, b0, b1, b2, idx = carry
                        c = ct_ref[p, pl.ds(g * 8, 8), :]   # (8, 4)
                        o = ot_ref[p, pl.ds(g * 8, 8), :]
                        s = (c[:, 0:1] * x0 + c[:, 1:2] * x1) + (
                            c[:, 2:3] * x2 + c[:, 3:4]
                        )
                        m = s > best
                        best = jnp.where(m, s, best)
                        b0 = jnp.where(m, o[:, 0:1], b0)
                        b1 = jnp.where(m, o[:, 1:2], b1)
                        b2 = jnp.where(m, o[:, 2:3], b2)
                        idx = jnp.where(m, g * 8 + iota8, idx)
                        carry = (best, b0, b1, b2, idx)
                    return carry

                neg = jnp.full((8, sp), -1e30, jnp.float32)
                zero = jnp.zeros((8, sp), jnp.float32)
                best, b0, b1, b2, idx = jax.lax.fori_loop(
                    0, K // 8 // unroll, body,
                    (neg, zero, zero, zero, jnp.full((8, sp), -1, jnp.int32)),
                )

                # merge the 8 slots: max score, min idx among score-ties
                m8 = jnp.max(best, axis=0, keepdims=True)      # (1, sp)
                t = jnp.where(best == m8, idx, kp)
                idx_f = jnp.min(t, axis=0, keepdims=True)       # (1, sp)
                sel = t == idx_f                                 # unique slot
                b0f = jnp.sum(jnp.where(sel, b0, 0.0), axis=0, keepdims=True)
                b1f = jnp.sum(jnp.where(sel, b1, 0.0), axis=0, keepdims=True)
                b2f = jnp.sum(jnp.where(sel, b2, 0.0), axis=0, keepdims=True)

                opp_ref[p, 0, lo:lo + sp] = b0f[0]
                opp_ref[p, 1, lo:lo + sp] = b1f[0]
                opp_ref[p, 2, lo:lo + sp] = b2f[0]

                pix = i * bp + lo + jax.lax.broadcasted_iota(
                    jnp.int32, (1, sp), 1
                )
                idx_f = jnp.where(pix < n_ref[0], idx_f, -1)
                iota_k = jax.lax.broadcasted_iota(jnp.int32, (kp, sp), 0)
                u = jnp.where(idx_f == iota_k, 1.0, 0.0)
                w = sp
                while w > LANE:
                    w //= 2
                    u = u[:, :w] + u[:, w:2 * w]

                if s_i == 0:
                    @pl.when(i == 0)
                    def _():
                        usage_ref[p, :, :] = u

                    @pl.when(i > 0)
                    def _():
                        usage_ref[p, :, :] = usage_ref[p, :, :] + u
                else:
                    usage_ref[p, :, :] = usage_ref[p, :, :] + u

    return kernel


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


def _grp8_call(x4, ct, ot, n, block, sub, unroll=1):
    pp = x4.shape[1]
    kp = ct.shape[1]
    return pl.pallas_call(
        make_grp8_kernel(K, POP, sub, unroll),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pp // block,),
            in_specs=[
                pl.BlockSpec((4, block), lambda i, n: (0, i)),
                pl.BlockSpec((POP, kp, 4), lambda i, n: (0, 0, 0)),
                pl.BlockSpec((POP, kp, 4), lambda i, n: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((POP, 3, block), lambda i, n: (0, 0, i)),
                pl.BlockSpec((POP, kp, LANE), lambda i, n: (0, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((POP, 3, pp), jnp.float32),
            jax.ShapeDtypeStruct((POP, kp, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(n, x4, ct, ot)


@functools.partial(jax.jit, static_argnames=("block", "sub", "unroll"))
def run_grp8(x4, cts, ots, n, block=8192, sub=2, unroll=1):
    def body(it, acc):
        opp, usage = _grp8_call(
            x4, cts[it % 8], ots[it % 8], n, block, sub, unroll
        )
        return acc + opp[0, 0, 0] + usage[0, 0, 0]

    reps = 24
    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0)), reps


def make_dotprobe_kernel(out_bf16: bool):
    """Scores dot + max only, f32 vs bf16 MXU OUTPUT — isolates whether the
    dot is bound by its (K, BP) output traffic (bf16 out would halve it)
    or by MXU issue at the 4-deep contraction (no change)."""

    def kernel(n_ref, x_ref, c_ref, mx_ref):
        pop = c_ref.shape[0]
        x = x_ref[:, :]
        xh, xl = pa._split_bf16(x)
        outs = []
        for p in range(pop):
            ch, cl = pa._split_bf16(c_ref[p])
            c12 = jnp.concatenate([ch, ch, cl], axis=0)
            x12 = jnp.concatenate([xh, xl, xh], axis=0)
            s = jax.lax.dot_general(
                c12, x12, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=(
                    jnp.bfloat16 if out_bf16 else jnp.float32
                ),
            )
            outs.append(jnp.max(s.astype(jnp.float32), axis=0))
        mx_ref[:, :] = jnp.stack(outs, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "out_bf16"))
def run_dotprobe(x4, c4s, n, block=8192, out_bf16=False):
    pp = x4.shape[1]
    kp = c4s.shape[-1]

    def call(c4):
        return pl.pallas_call(
            make_dotprobe_kernel(out_bf16),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(pp // block,),
                in_specs=[
                    pl.BlockSpec((4, block), lambda i, n: (0, i)),
                    pl.BlockSpec((POP, 4, kp), lambda i, n: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (POP, block), lambda i, n: (0, i)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((POP, pp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(n, x4, c4)

    def body(it, acc):
        mx = call(c4s[it % 8])
        return acc + mx[0, 0]

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


def check_correctness(block=8192, variants=("grp8",)):
    """VPU kernels vs the shipped kernel on small data (exact idx compare
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

    def report(name, opp, usage):
        mism = int(
            np.sum(np.any(np.asarray(opp) != np.asarray(opp_ref), axis=1))
        )
        d_use = np.max(np.abs(np.asarray(usage) - np.asarray(usage_ref)))
        print(
            f"correctness[{name}]: {mism}/{POP * pp} pixels differ from "
            f"highest, max|usage diff|={d_use}",
            flush=True,
        )

    if any(v.startswith("grp8") for v in variants):
        opp_g, usage_g = _grp8_call(
            x4, jnp.transpose(c4, (0, 2, 1)), jnp.transpose(o4, (0, 2, 1)),
            n, block, 2,
        )
        report("grp8", opp_g, jnp.sum(usage_g, axis=2))

    if any(v.startswith("vpu") for v in variants):
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
                    pl.BlockSpec(
                        (4, 1, 8, L), lambda i, n, c, o: (0, i, 0, 0)
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (POP, 3, 1, 8, L), lambda i, n, c, o: (0, 0, i, 0, 0)
                    ),
                    pl.BlockSpec(
                        (POP, kp, LANE), lambda i, n, c, o: (0, 0, 0)
                    ),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((POP, 3, nb, 8, L), jnp.float32),
                jax.ShapeDtypeStruct((POP, kp, LANE), jnp.float32),
            ],
        )(n, cs, os_, x4t)
        report(
            "vpu", opp_v.reshape(POP, 3, pp), jnp.sum(usage_v, axis=2)
        )


def main():
    from hybridquantization_tpu.ops.band_conv import padded_plan

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    Hp, Wp, _ = padded_plan(H, W, 10)
    pp = Hp * Wp
    print(f"padded {Hp}x{Wp} = {pp/1e6:.2f} Mpix, K={K}, pop={POP}")
    variants = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else ["cur", "grp8"]
    )
    check_correctness(variants=variants)

    feats = jnp.asarray(rng.random((pp, 3), dtype=np.float32))
    pals = jnp.asarray(rng.random((8, POP, K, 3)).astype(np.float32))
    c4s, o4s = jax.vmap(jax.vmap(pa.pack_palette))(pals, pals)
    kp = c4s.shape[-1]
    cs = c4s.reshape(8, POP * 4, kp)
    os_ = o4s.reshape(8, POP * 4, kp)
    c4s, o4s, cs, os_ = jax.block_until_ready((c4s, o4s, cs, os_))
    n = jnp.full((1,), pp, jnp.int32)


    blocks = [
        int(b) for b in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["8192"])
    ]
    for block in blocks:
        x4 = jax.block_until_ready(pa.pack_pixels(feats, block))
        L = block // 8
        x4t = jax.block_until_ready(x4.reshape(4, -1, 8, L))
        cts = jnp.transpose(c4s, (0, 1, 3, 2))
        ots = jnp.transpose(o4s, (0, 1, 3, 2))
        for v in variants:
            def run(v=v):
                if v == "cur":
                    return run_current(x4, c4s, o4s, n, block)
                if v == "dotf32":
                    return run_dotprobe(x4, c4s, n, block, False)
                if v == "dotbf16":
                    return run_dotprobe(x4, c4s, n, block, True)
                if v.startswith("grp8"):
                    # grp8 | grp8s<sub> | grp8s<sub>u<unroll>
                    sub, unroll = 2, 1
                    rest = v[4:]
                    if rest.startswith("s"):
                        parts = rest[1:].split("u")
                        sub = int(parts[0])
                        if len(parts) > 1:
                            unroll = int(parts[1])
                    return run_grp8(x4, cts, ots, n, block, sub, unroll)
                unroll = {"vpu": 8, "vpu_u4": 4, "vpu_u16": 16}.get(v, 8)
                return run_vpu(
                    x4t, cs, os_, n, v, block, unroll, v == "vpu_fused"
                )

            t_compile = time.perf_counter()
            out, reps = run()
            jax.device_get(out)
            t_compile = time.perf_counter() - t_compile
            t0 = time.perf_counter()
            out, _ = run()
            jax.device_get(out)
            dt = (time.perf_counter() - t0) / reps
            print(
                f"block {block:5d} {v:10s} {dt*1e3:7.2f} ms/call  "
                f"{POP * pp / dt / 1e6:7.0f} Mpix/s  (compile {t_compile:.0f}s)"
            )


if __name__ == "__main__":
    main()
