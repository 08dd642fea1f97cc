"""Candidate-set statistics for spatial-tile assignment pruning.

Round-3 VERDICT Next #4 asks whether spatial-tile candidate pruning can
beat the dense MXU assignment kernel ON NATURAL CONTENT (the round-3
analysis proved it cannot on the uniform-random bench image). This tool
measures the decisive quantity BEFORE any kernel is built: for a given
tile shape, how many palette entries can EXACTLY win at least one pixel
of the tile, under the provable triangle-inequality criterion

    k is a candidate for tile t  iff  d(c_t, k) <= d(c_t, k*_t) + 2 r_t

with c_t the tile's mean color, r_t = max_p d(p, c_t) (the tile radius),
and k*_t the nearest entry to c_t. Any entry outside that ball provably
loses every pixel of the tile, so a kernel restricted to the candidates
is exact with no fallback. The MXU scores dot is output-tile-bound
(docs/PERFORMANCE.md): its cost scales with ceil(K'/128), so the win
requires the candidate count K' (padded to a lane multiple) to be well
under K on most tiles.

Palette models:
  random   uniform palettes — the bench's assignment-metric distribution
  sampled  256 pixels sampled from the image — a stand-in for the
           anneal-converged / kmeans-seeded palette distribution (entries
           ride the image's color manifold, spacing ~ its density)

Usage:
  python tools/prune_stats.py [--size-h 2160 --size-w 3840 --colors 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from hybridquantization_tpu import synth  # noqa: E402


def tile_stats(img: np.ndarray, th: int, tw: int):
    """(means (T, 3), radii (T,)) for non-overlapping (th, tw) tiles."""
    H, W, _ = img.shape
    Ht, Wt = H // th * th, W // tw * tw
    x = img[:Ht, :Wt].reshape(Ht // th, th, Wt // tw, tw, 3)
    x = x.transpose(0, 2, 1, 3, 4).reshape(-1, th * tw, 3)
    means = x.mean(axis=1)
    radii = np.sqrt(((x - means[:, None]) ** 2).sum(-1)).max(axis=1)
    return means.astype(np.float64), radii.astype(np.float64)


def candidate_counts(means, radii, palette):
    """(T,) exact candidate-set sizes under the triangle criterion."""
    d = np.sqrt(
        ((means[:, None, :] - palette[None, :, :]) ** 2).sum(-1)
    )  # (T, K)
    bound = d.min(axis=1) + 2.0 * radii  # (T,)
    return (d <= bound[:, None]).sum(axis=1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-h", type=int, default=2160)
    ap.add_argument("--size-w", type=int, default=3840)
    ap.add_argument("--colors", "-k", type=int, default=256)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)

    images = {
        "natural": synth.natural_image(args.size_h, args.size_w, seed=args.seed),
        "uniform_random": rng.random(
            (args.size_h, args.size_w, 3), dtype=np.float32
        ),
    }
    tile_shapes = [
        # TPU-layout-compatible geometries (contiguous raster runs /
        # whole raster blocks — no relayout needed)
        (1, 128), (1, 256), (1, 1024), (2, 3840),
        # layout-hostile compact tiles (need in-kernel relayouts or
        # per-run mini-dots — see docs/PERFORMANCE.md round-4 section)
        (4, 128), (8, 128), (16, 128), (8, 1024), (16, 16), (32, 32),
    ]

    out = {}
    for name, img in images.items():
        img64 = img.astype(np.float64)
        pix = img64.reshape(-1, 3)
        palettes = {
            "random": rng.random((args.colors, 3)),
            "sampled": pix[
                rng.integers(0, len(pix), size=args.colors)
            ],
        }
        for (th, tw) in tile_shapes:
            means, radii = tile_stats(img64, th, tw)
            for pname, pal in palettes.items():
                counts = candidate_counts(means, radii, pal)
                key = f"{name}/{th}x{tw}/{pname}"
                out[key] = {
                    "tiles": int(len(counts)),
                    "cand_mean": round(float(counts.mean()), 1),
                    "cand_median": int(np.median(counts)),
                    "cand_p90": int(np.percentile(counts, 90)),
                    "cand_max": int(counts.max()),
                    "radius_median": round(float(np.median(radii)), 4),
                    # fraction of tiles whose candidates fit one 128-lane
                    # score tile (the MXU cost quantum)
                    "frac_le_128": round(float((counts <= 128).mean()), 3),
                    "frac_le_64": round(float((counts <= 64).mean()), 3),
                }
                print(f"{key}: {out[key]}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
