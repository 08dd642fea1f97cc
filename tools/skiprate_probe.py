"""Block-skip opportunity study for Hamerly-style exact assignment.

docs/PERFORMANCE.md (round-4 pruning verdict) leaves ONE reopener for
the 25.4 ms dense assignment kernel: incremental-bounds block skipping —
keep, per 8192-px kernel block, the minimum margin between each pixel's
best and second-best palette distance; a block provably keeps every
winner (and can skip its score dot entirely) while the accumulated
palette drift since its last full pass stays under margin/2. This probe
measures the opportunity on real content BEFORE any kernel work:

  1. per-pixel best/second-best sRGB distances at 4K / K=256 (chunked
     MXU matmuls on the TPU),
  2. per-block minimum margins,
  3. implied skippable-block fraction at each SWASA anneal phase, where
     the per-iteration palette drift bound is 2*sqrt(3)*s(i)/256
     (SWASA.java:69-72,91-101 — every channel moves at most s(i)/256).

Palette models: kmeans-converged (the late-anneal state that dominates
iteration count) and uniform-random (the early anneal).

Run: python tools/skiprate_probe.py [--size-h 2160 --size-w 3840 -k 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-h", type=int, default=2160)
    ap.add_argument("--size-w", type=int, default=3840)
    ap.add_argument("--colors", "-k", type=int, default=256)
    ap.add_argument("--block", type=int, default=8192)
    ap.add_argument("--imax", type=int, default=5000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hybridquantization_tpu import synth
    from hybridquantization_tpu.ops.kmeans import kmeans_init_palettes

    rng = np.random.default_rng(7)
    img = synth.natural_image(args.size_h, args.size_w, seed=7)
    pix = jnp.asarray(img.reshape(-1, 3))
    P = pix.shape[0]
    K = args.colors

    pal_km = np.asarray(
        kmeans_init_palettes(jax.random.PRNGKey(0), pix, K, 1)[0]
    )
    palettes = {
        "kmeans": pal_km,
        "random": rng.random((K, 3), dtype=np.float32),
    }

    @jax.jit
    def margins_chunk(px, pal):
        d = (
            jnp.sum(px * px, axis=1, keepdims=True)
            - 2.0 * px @ pal.T
            + jnp.sum(pal * pal, axis=1)[None, :]
        )  # (chunk, K) squared distances
        d = jnp.maximum(d, 0.0)
        d1 = jnp.min(d, axis=1)
        am = jnp.argmin(d, axis=1)
        d2 = jnp.min(
            jnp.where(jnp.arange(K)[None, :] == am[:, None], jnp.inf, d),
            axis=1,
        )
        return jnp.sqrt(d2) - jnp.sqrt(d1)  # per-pixel margin

    out = {}
    chunk = 1 << 20
    for name, pal in palettes.items():
        palj = jnp.asarray(pal, jnp.float32)
        parts = []
        for lo in range(0, P, chunk):
            parts.append(np.asarray(
                margins_chunk(pix[lo:lo + chunk], palj)
            ))
        marg = np.concatenate(parts)
        nb = P // args.block
        bmin = marg[: nb * args.block].reshape(nb, args.block).min(axis=1)

        # SWASA drift bound per iteration at phase i of the reference
        # imax=5000 schedule (per-channel step <= s(i)/256)
        phases = [0, 500, 1500, 2500, 5000]
        skip = {}
        for i in phases:
            s = 2.0 * 100.0 / (1.0 + np.exp(5.3 * i / args.imax)) / 256.0
            drift = 2.0 * np.sqrt(3.0) * s  # both entries move toward px
            frac = float((bmin > drift).mean())
            # iterations a block survives before recompute (bound decay)
            horizon = np.maximum(bmin, 0) / max(drift, 1e-12)
            skip[f"iter{i}"] = {
                "per_iter_drift": round(float(drift), 5),
                "blocks_skippable_1iter": round(frac, 3),
                "median_skip_horizon_iters": round(
                    float(np.median(horizon)), 1
                ),
            }
        out[name] = {
            "block_margin_median": round(float(np.median(bmin)), 5),
            "block_margin_p10": round(float(np.percentile(bmin, 10)), 5),
            "phases": skip,
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
