"""Combine engine_run/oracle_run JSONLs into the layer-3 parity verdict.

Reads the per-seed quality records produced by tools/engine_run.py (TPU
side) and tools/oracle_run.py (NumPy side) — both judged by the same f64
oracle judge — and reports the relative gap of the mean ΔE and MSE with
its 1σ seed-noise, so the PASS statement is explicit about what the seed
budget can and cannot resolve (docs/PARITY.md layer 3).

Usage:
  python tools/parity_report.py --engine engine.jsonl --oracle oracle.jsonl
      [--tolerance 0.01]
"""

from __future__ import annotations

import argparse
import json
import math


def load(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def stats(vals):
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1) if n > 1 else 0.0
    return mean, math.sqrt(var), math.sqrt(var / n) if n > 1 else float("inf")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", required=True)
    ap.add_argument("--oracle", required=True)
    ap.add_argument("--tolerance", type=float, default=0.01)
    args = ap.parse_args()

    eng, ora = load(args.engine), load(args.oracle)
    if not eng or not ora:
        print("need at least one record on each side")
        return 2
    cfg_keys = ("size", "colors", "imax", "population")
    # "content" is absent from pre-round-4 records (all smooth content)
    cfgs = {
        tuple(r[k] for k in cfg_keys) + (r.get("content", "smooth"),)
        for r in eng + ora
    }
    if len(cfgs) != 1:
        print(f"WARNING: mixed configs in inputs: {cfgs}")

    verdicts = []
    for metric in ("deltaE", "mse"):
        em, es, esem = stats([r[metric] for r in eng])
        om, osd, osem = stats([r[metric] for r in ora])
        gap = (em - om) / om
        noise = math.sqrt(esem**2 + osem**2) / om  # 1σ of the gap estimate
        print(
            f"{metric}: engine {em:.5g} ± {esem:.2g} (n={len(eng)}, "
            f"std {es:.3g})  oracle {om:.5g} ± {osem:.2g} (n={len(ora)}, "
            f"std {osd:.3g})"
        )
        print(f"  gap {gap * 100:+.2f}%  ± {noise * 100:.2f}% (1σ seed noise)")
        verdicts.append((metric, gap, noise))

    de_gap, de_noise = verdicts[0][1], verdicts[0][2]
    if abs(de_gap) + de_noise <= args.tolerance:
        # Power-gated PASS: the 1σ upper bound on the TRUE gap
        # (|measured gap| + seed noise) must fit inside the tolerance —
        # otherwise an n=2 run with ~4% noise could report a lucky small
        # gap and claim a parity the seed budget cannot resolve.
        print(f"PARITY: PASS (|ΔE gap| {abs(de_gap)*100:.2f}% + 1σ noise "
              f"{de_noise*100:.2f}% <= {args.tolerance:.0%})")
        return 0
    if abs(de_gap) <= args.tolerance:
        print(
            f"PARITY: INCONCLUSIVE — |gap| {abs(de_gap)*100:.2f}% is within "
            f"{args.tolerance:.0%} but the 1σ seed noise "
            f"({de_noise*100:.2f}%) pushes its upper bound past the "
            "tolerance, so this seed budget cannot resolve a pass; add "
            "seeds (both runners resume from their JSONL)"
        )
        return 1
    if abs(de_gap) - 2 * de_noise <= args.tolerance:
        print(
            f"PARITY: INCONCLUSIVE — |gap| {abs(de_gap)*100:.2f}% exceeds "
            f"{args.tolerance:.0%} but is within 2σ ({2*de_noise*100:.2f}%) "
            "of it; add seeds (both runners resume from their JSONL)"
        )
        return 1
    print(f"PARITY: FAIL (|gap| {abs(de_gap)*100:.2f}% > {args.tolerance:.0%} "
          f"beyond 2σ noise {2*de_noise*100:.2f}%)")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
