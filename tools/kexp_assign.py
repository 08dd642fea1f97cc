"""Assignment-kernel scheduling experiments (round 2).

Round-1 bisect (docs/PERFORMANCE.md): at 4K/K256/pop4 the kernel is
scores-dot 24 ms real + first-index chain ~12 ms + gathers/counts ~10 ms,
serialized. The scores dot is MXU-tile-bound (floor), the chain is VPU —
IF Mosaic can run MXU and VPU concurrently, interleaving member p+1's dot
with member p's chain should hide most of the VPU time.

Variants:
  current     the shipped kernel (dot -> chain -> gather per member, in order)
  dotmax      scores dot + max only (MXU floor + 1 VPU pass)
  interleave  all member dots issued first, then all chains/gathers
  pairskew    dot(p+1) issued between chain(p) and gather(p)

Timing: in-device lax.fori_loop over 8 pre-packed palette sets, device_get
of a reduced scalar (fresh-inputs rule, CLAUDE.md).

Run: python tools/kexp_assign.py [reps]
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


def _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid):
    """(scores,) -> (onehot_bf, opp, counts) split into stages for reordering."""
    scores = pa._scores(c_ref[p], x, xsplit, precision)
    return scores


def _chain(scores, valid):
    return pa._first_max_onehot(scores, valid)


def _gather(onehot_bf, o_ref, p, ones_bf):
    oh, om, ol = pa._split_bf16_3(o_ref[p])
    o12 = jnp.concatenate([oh, om, ol], axis=0)
    d = jax.lax.Precision.DEFAULT
    out = jax.lax.dot_general(
        o12, onehot_bf, (((1,), (0,)), ((), ())),
        precision=d, preferred_element_type=jnp.float32,
    )
    opp = (out[0:4] + out[4:8]) + out[8:12]
    counts = jax.lax.dot_general(
        ones_bf, onehot_bf, (((1,), (1,)), ((), ())),
        precision=d, preferred_element_type=jnp.float32,
    )
    return opp[0:3], counts


def make_kernel(variant: str, precision: str = "f32x3"):
    def kernel(n_ref, x_ref, c_ref, o_ref, opp_ref, usage_ref):
        i = pl.program_id(0)
        bp = x_ref.shape[1]
        pop = c_ref.shape[0]
        x = x_ref[:, :]
        xsplit = pa._split_bf16(x) if precision == "f32x3" else None
        valid = (
            i * bp + jax.lax.broadcasted_iota(jnp.int32, (1, bp), 1)
        ) < n_ref[0]
        ones_bf = jnp.ones((1, bp), jnp.bfloat16)

        def store(p, opp, counts):
            opp_ref[p, :, :] = opp

            @pl.when(i == 0)
            def _():
                usage_ref[p, :, :] = counts

            @pl.when(i > 0)
            def _():
                usage_ref[p, :, :] = usage_ref[p, :, :] + counts

        if variant == "current":
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                oh = _chain(s, valid)
                opp, counts = _gather(oh, o_ref, p, ones_bf)
                store(p, opp, counts)
        elif variant == "avg":
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                oh = pa._hit_mask(s, valid)
                opp, counts = _gather(oh, o_ref, p, ones_bf)
                store(p, opp, counts)
        elif variant == "nogather":
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                oh = _chain(s, valid)
                opp_ref[p, :, :] = oh[0:3].astype(jnp.float32)
                usage_ref[p, :, :] = jnp.zeros_like(usage_ref[p])
        elif variant == "nocounts":
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                oh = _chain(s, valid)
                oh3, om, ol = pa._split_bf16_3(o_ref[p])
                o12 = jnp.concatenate([oh3, om, ol], axis=0)
                out = jax.lax.dot_general(
                    o12, oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )
                opp = (out[0:4] + out[4:8]) + out[8:12]
                opp_ref[p, :, :] = opp[0:3]
                usage_ref[p, :, :] = jnp.zeros_like(usage_ref[p])
        elif variant == "dotmax":
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                m = jnp.max(s, axis=0)
                opp_ref[p, :, :] = jnp.broadcast_to(m[None, :], (3, bp))
                usage_ref[p, :, :] = jnp.zeros_like(usage_ref[p])
        elif variant == "interleave":
            ss = [
                _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                for p in range(pop)
            ]
            for p in range(pop):
                oh = _chain(ss[p], valid)
                opp, counts = _gather(oh, o_ref, p, ones_bf)
                store(p, opp, counts)
        elif variant == "pairskew":
            s_next = _member_parts(x, xsplit, c_ref, o_ref, 0, precision, valid)
            for p in range(pop):
                s = s_next
                if p + 1 < pop:
                    s_next = _member_parts(
                        x, xsplit, c_ref, o_ref, p + 1, precision, valid
                    )
                oh = _chain(s, valid)
                opp, counts = _gather(oh, o_ref, p, ones_bf)
                store(p, opp, counts)
        elif variant == "rowmax":
            # usage as a VPU lane-max of the one-hot (usage is only ever a
            # bool OR; the counts themselves are never consumed). Output
            # orientation (kp, 1): no transpose needed.
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                kp_, bp_ = s.shape
                m = jnp.max(s, axis=0)
                hit = s == m[None, :]
                iota_k = jax.lax.broadcasted_iota(jnp.int32, (kp_, bp_), 0)
                t = jnp.where(hit, iota_k, kp_)
                idx = jnp.min(t, axis=0)
                idx = jnp.where(valid[0] & (idx < kp_), idx, -1)
                oh_f = jnp.where(t == idx[None, :], 1.0, 0.0)
                oh = oh_f.astype(jnp.bfloat16)
                o3, om, ol = pa._split_bf16_3(o_ref[p])
                o12 = jnp.concatenate([o3, om, ol], axis=0)
                out = jax.lax.dot_general(
                    o12, oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )
                opp = (out[0:4] + out[4:8]) + out[8:12]
                opp_ref[p, :, :] = opp[0:3]
                u = jnp.max(oh_f, axis=1, keepdims=True)  # (kp, 1)

                @pl.when(i == 0)
                def _():
                    usage_ref[p, :, :] = u

                @pl.when(i > 0)
                def _():
                    usage_ref[p, :, :] = jnp.maximum(usage_ref[p, :, :], u)
        elif variant == "counts16":
            # all 4 members' counts in ONE stacked dot (1, 4*kp)
            ohs = []
            opps = []
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                oh = _chain(s, valid)
                o3, om, ol = pa._split_bf16_3(o_ref[p])
                o12 = jnp.concatenate([o3, om, ol], axis=0)
                out = jax.lax.dot_general(
                    o12, oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )
                opp = (out[0:4] + out[4:8]) + out[8:12]
                opps.append(opp[0:3])
                ohs.append(oh)
            stack = jnp.concatenate(ohs, axis=0)  # (pop*kp, bp)
            counts_all = jax.lax.dot_general(
                ones_bf, stack, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (1, pop*kp)
            kp_ = stack.shape[0] // pop
            for p in range(pop):
                store(p, opps[p], counts_all[:, p * kp_:(p + 1) * kp_])
        elif variant == "foldusage":
            # usage/counts as a lane-folded f32 accumulation of the one-hot
            # (exact: 0/1 sums < 2^24) — replaces the 6.6 ms skinny counts
            # dot with ~1 VPU pass; the (kp, 128) accumulator reduces to
            # (kp,) OUTSIDE the kernel (tiny).
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                kp_, bp_ = s.shape
                m = jnp.max(s, axis=0)
                hit = s == m[None, :]
                iota_k = jax.lax.broadcasted_iota(jnp.int32, (kp_, bp_), 0)
                t = jnp.where(hit, iota_k, kp_)
                idx = jnp.min(t, axis=0)
                idx = jnp.where(valid[0] & (idx < kp_), idx, -1)
                oh_f = jnp.where(t == idx[None, :], 1.0, 0.0)
                oh = oh_f.astype(jnp.bfloat16)
                o3, om, ol = pa._split_bf16_3(o_ref[p])
                o12 = jnp.concatenate([o3, om, ol], axis=0)
                out = jax.lax.dot_general(
                    o12, oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )
                opp = (out[0:4] + out[4:8]) + out[8:12]
                opp_ref[p, :, :] = opp[0:3]
                v, w = oh_f, bp_
                while w > 128:
                    w //= 2
                    v = v[:, :w] + v[:, w:2 * w]

                @pl.when(i == 0)
                def _():
                    usage_ref[p, :, :] = v

                @pl.when(i > 0)
                def _():
                    usage_ref[p, :, :] = usage_ref[p, :, :] + v
        elif variant == "nowhen":
            # counts dot kept, but unconditional overwrite (bisects the
            # pl.when-accumulate cost out of the counts path)
            for p in range(pop):
                s = _member_parts(x, xsplit, c_ref, o_ref, p, precision, valid)
                oh = _chain(s, valid)
                opp, counts = _gather(oh, o_ref, p, ones_bf)
                opp_ref[p, :, :] = opp
                usage_ref[p, :, :] = counts
        else:
            raise ValueError(variant)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "block", "precision"))
def run_variant(x4, c4s, o4s, n, variant, block=4096, precision="f32x3"):
    """fori_loop over the stacked palette sets; returns a reduced scalar."""
    pop, kp = c4s.shape[1], c4s.shape[3]
    pp = x4.shape[1]
    grid = (pp // block,)

    ushape = {
        "rowmax": (pop, kp, 1), "foldusage": (pop, kp, 128)
    }.get(variant, (pop, 1, kp))

    def call(c4, o4):
        return pl.pallas_call(
            make_kernel(variant, precision),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((4, block), lambda i, n: (0, i)),
                    pl.BlockSpec((pop, 4, kp), lambda i, n: (0, 0, 0)),
                    pl.BlockSpec((pop, 4, kp), lambda i, n: (0, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((pop, 3, block), lambda i, n: (0, 0, i)),
                    pl.BlockSpec(ushape, lambda i, n: (0, 0, 0)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((pop, 3, pp), jnp.float32),
                jax.ShapeDtypeStruct(ushape, jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(n, x4, c4, o4)

    def body(it, acc):
        opp, usage = call(c4s[it % 8], o4s[it % 8])
        return acc + opp[0, 0, 0] + usage[0, 0, 0]

    reps = 24
    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0)), reps


def main():
    from hybridquantization_tpu.ops.band_conv import padded_size

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    half = 10
    Hp, Wp = padded_size(H, half), padded_size(W, half)
    pp = Hp * Wp
    print(f"padded {Hp}x{Wp} = {pp/1e6:.2f} Mpix, K={K}, pop={POP}")

    feats = jnp.asarray(rng.random((pp, 3), dtype=np.float32))
    pals = jnp.asarray(rng.random((8, POP, K, 3)).astype(np.float32))
    c4s, o4s = jax.vmap(jax.vmap(pa.pack_palette))(pals, pals)
    c4s, o4s = jax.block_until_ready((c4s, o4s))
    n = jnp.full((1,), pp, jnp.int32)

    variants = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "current", "dotmax", "interleave", "pairskew"
    ]
    blocks = [int(b) for b in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["4096"])]
    for block in blocks:
        x4 = jax.block_until_ready(pa.pack_pixels(feats, block))
        for v in variants:
            # compile
            out, reps = run_variant(x4, c4s, o4s, n, v, block)
            jax.device_get(out)
            t0 = time.perf_counter()
            out, _ = run_variant(x4, c4s, o4s, n, v, block)
            jax.device_get(out)
            dt = (time.perf_counter() - t0) / reps
            print(
                f"block {block:5d} {v:11s} {dt*1e3:7.2f} ms/call  "
                f"{POP * pp / dt / 1e6:7.0f} Mpix/s"
            )


if __name__ == "__main__":
    main()
