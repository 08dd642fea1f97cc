"""Run engine (TPU) SWASA seeds to a resumable JSONL file.

Mirror of tools/oracle_run.py for the engine side of the config-2-scale
distributional parity check: each seed runs the full
`HybridQuantizer.find_palette` anneal on the TPU and is judged by the
same f64 oracle judge (mean S-CIELAB ΔE76 + sRGB MSE of the final
first-minimum quantization) used for the oracle seeds, so the two JSONL
files are directly comparable. Engine seeds cost ~10 s each (vs ~1 h
per oracle seed on 2 CPU cores), so run MORE engine seeds to shrink the
engine-side SEM below the oracle-side noise floor.

Usage:
  python tools/engine_run.py --size 1024 --colors 64 --imax 1500 \
      --seeds 0-23 --out /tmp/engine_c2.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from parity_check import content_image  # noqa: E402


def parse_seeds(spec: str):
    out = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        elif part:
            out.append(int(part))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--content", default="smooth", choices=["smooth", "natural"])
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--colors", "-k", type=int, default=64)
    ap.add_argument("--imax", type=int, default=1500)
    ap.add_argument("--population", type=int, default=4)
    ap.add_argument("--seeds", default="0-23", help="e.g. 0-23 or 3,5,7")
    ap.add_argument("--precision", default="f32x3",
                    choices=["highest", "f32x3", "bf16"])
    ap.add_argument("--assignment-space", default="srgb",
                    choices=["srgb", "lab"],
                    help="srgb = reference parity mode; lab = the BASELINE "
                    "north-star Delta-E assignment kernel (recorded in the "
                    "JSONL as assignment_space)")
    ap.add_argument("--conv-precision", default="",
                    choices=["", "highest", "f32x3", "bf16"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    seeds = parse_seeds(args.seeds)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["seed"])
                except (ValueError, KeyError):
                    pass
    todo = [s for s in seeds if s not in done]
    print(f"seeds todo {todo} (already done: {sorted(done)})", flush=True)
    if not todo:
        return 0

    from tests import oracle

    img = content_image(args.content, args.size)
    ofilters, abs_k3, _ = oracle.build_filters(72, 45.0)
    target64 = oracle.srgb_to_scielab(img.astype(np.float64), ofilters, abs_k3)

    import jax

    from hybridquantization_tpu import (
        HybridQuantizer,
        QuantizationConfig,
        SWASAConfig,
    )
    from hybridquantization_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()
    cfg = QuantizationConfig(
        swasa=SWASAConfig(
            num_colors=args.colors, population=args.population,
            imax=args.imax,
        ),
        precision=args.precision,
        conv_precision=args.conv_precision,
        assignment_space=args.assignment_space,
    )
    engine = HybridQuantizer(cfg)

    for i, s in enumerate(todo):
        t0 = time.time()
        pal, _info = engine.find_palette(
            img, key=jax.random.PRNGKey(s), chunk_size=args.imax
        )
        t_anneal = time.time() - t0
        palette = np.asarray(pal, np.float64)
        if args.assignment_space == "lab":
            # The lab mode's final quantize assigns in CIELAB. Do it in
            # f64 NumPy on the host — the srgb branch below judges an f64
            # re-assignment, and judging the engine's f32 device quantize
            # here instead would mix final-pass precisions across the
            # lab-vs-srgb comparison (boundary-pixel flips differ;
            # round-4 advisor finding).
            px_lab = oracle.xyz_to_lab(
                oracle.srgb_to_xyz(img.astype(np.float64).reshape(-1, 3))
            )
            pal_lab = oracle.xyz_to_lab(oracle.srgb_to_xyz(palette))
            idx = oracle.nearest_palette(px_lab, pal_lab)
            q = palette[idx].reshape(img.shape)
        else:
            idx = oracle.nearest_palette(
                img.reshape(-1, 3).astype(np.float64), palette
            )
            q = palette[idx].reshape(img.shape)
        q_lab = oracle.srgb_to_scielab(q, ofilters, abs_k3)
        rec = {
            "seed": s,
            "deltaE": float(oracle.delta_e76(target64, q_lab).mean()),
            "mse": float(((q - img) ** 2).mean()),
            "precision": args.precision,
            "size": args.size, "colors": args.colors,
            "imax": args.imax, "population": args.population,
            "content": args.content,
            "assignment_space": args.assignment_space,
            "anneal_seconds": round(t_anneal, 1),
        }
        if i == 0:
            # the first seed of a process pays the remote jit compile
            # (minutes through the axon relay) — flag it so nobody
            # aggregates a 400x timing outlier (round-3 VERDICT Weak #6)
            rec["compile_inclusive"] = True
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        print(f"[engine done] {rec}", flush=True)
    print("all requested seeds done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
