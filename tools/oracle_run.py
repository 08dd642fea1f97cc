"""Run NumPy-oracle SWASA seeds to a resumable JSONL file.

The config-2-scale parity protocol needs oracle anneals that cost
~45-90 min EACH on this host's 2 CPU cores (1500 iters x pop 4 x ~2 s
fitness under contention, with heavy CPU-steal variance). A monolithic
run risks losing everything at a round boundary, so this tool:

  - runs each requested seed in its own forked worker (pure NumPy),
  - appends one JSON line per finished seed to --out (atomic-ish: one
    line per write, flushed) with the f64-judged quality metrics,
  - skips seeds already present in --out (resume across sessions),
  - heartbeats per-worker progress to <out>.hb.<pid> every 50 iters so
    a stalled run is diagnosable from outside.

Combine with the engine seeds from tools/parity_check.py (or its log)
to form the distributional half of the config-2 parity case; the
deterministic half is tools/fitness_parity.py.

Usage:
  python tools/oracle_run.py --size 1024 --colors 64 --imax 1500 \
      --seeds 0,1,2,3 --jobs 2 --dtype f32 --out /tmp/oracle_c2.jsonl
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--content", default="smooth", choices=["smooth", "natural"])
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--colors", "-k", type=int, default=64)
    ap.add_argument("--imax", type=int, default=1500)
    ap.add_argument("--population", type=int, default=4)
    ap.add_argument("--seeds", default="0,1,2,3",
                    help="comma list of oracle seeds")
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--dtype", default="f32", choices=["f32", "f64"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from tests import oracle

    seeds = [int(s) for s in args.seeds.split(",") if s != ""]
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

    img = content_image(args.content, args.size)
    odtype = np.float32 if args.dtype == "f32" else np.float64
    ofilters, abs_k3, _ = oracle.build_filters(72, 45.0)
    target64 = oracle.srgb_to_scielab(img.astype(np.float64), ofilters, abs_k3)

    def judge(palette):
        idx = oracle.nearest_palette(
            img.reshape(-1, 3).astype(np.float64), palette.astype(np.float64)
        )
        q = palette[idx].reshape(img.shape)
        q_lab = oracle.srgb_to_scielab(q, ofilters, abs_k3)
        de = float(oracle.delta_e76(target64, q_lab).mean())
        mse = float(((q - img) ** 2).mean())
        return de, mse

    import multiprocessing as mp

    ctx = mp.get_context("fork")
    lock = ctx.Lock()

    def worker(seed_list):
        hb_path = f"{args.out}.hb.{os.getpid()}"
        for s in seed_list:
            t0 = time.time()

            def progress(ite):
                with open(hb_path, "w") as hb:
                    hb.write(
                        f"seed {s} iter {ite}/{args.imax} "
                        f"{time.time() - t0:.0f}s\n"
                    )

            pal, err = oracle.swasa_search(
                img.astype(odtype), args.colors, seed=s,
                population=args.population, imax=args.imax,
                dtype=odtype, progress=progress,
            )
            de, mse = judge(np.asarray(pal, np.float64))
            rec = {
                "seed": s, "deltaE": de, "mse": mse,
                "search_fitness": float(err), "dtype": args.dtype,
                "size": args.size, "colors": args.colors,
                "imax": args.imax, "population": args.population,
                "content": args.content,
                "seconds": round(time.time() - t0, 1),
            }
            with lock:
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                    f.flush()
                    os.fsync(f.fileno())
            print(f"[oracle done] {rec}", flush=True)

    chunks = [todo[j :: args.jobs] for j in range(args.jobs)]
    procs = [
        ctx.Process(target=worker, args=(c,)) for c in chunks if c
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    print("all requested seeds done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
