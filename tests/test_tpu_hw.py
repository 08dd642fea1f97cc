"""TPU hardware test tier (round-1 VERDICT item 5).

These run the REAL Mosaic-compiled kernels — CI's interpret mode has
measurably diverged from hardware before (argmax tie-break,
ops/pallas_assign.py module doc), so every hardware-sensitive contract
gets one on-chip check per round:

    HQ_TPU_TESTS=1 python -m pytest -m tpu -q

All tests are skipped automatically on the CPU backend (conftest).
Column-guard ppermute over real ICI needs >= 2 physical chips; with one
chip the fast sharded path still runs under shard_map on a 1x1 mesh
(mirror guards, real kernels) — the cross-chip exchange itself is covered
by the 8-virtual-device CPU tier (test_sharding.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridquantization_tpu import (
    HybridQuantizer,
    QuantizationConfig,
    SWASAConfig,
)
from hybridquantization_tpu.ops import pallas_assign as pa

pytestmark = pytest.mark.tpu


def test_first_index_ties_on_hardware(rng):
    """Exact-score ties must resolve to the FIRST palette index on the real
    chip (OptimizedConvolution.cl:158-167 semantics). Mosaic's own argmax
    does not guarantee this (measured: 62/34.5M pixels at 4K/K256) — the
    kernel's explicit min-over-hit-indices chain must."""
    feats = rng.random((1024, 3)).astype(np.float32)
    # palette with duplicated entries: indices 2 and 5 identical, 0 and 7
    pal = rng.random((8, 3)).astype(np.float32)
    pal[5] = pal[2]
    pal[7] = pal[0]
    # pixels exactly equal to palette colors tie against the duplicates
    feats[:16] = pal[5]
    feats[16:32] = pal[7]
    opp, usage = pa.assign_opp_usage(
        jnp.asarray(feats), jnp.asarray(pal), jnp.asarray(pal),
        precision="highest",
    )
    opp = np.asarray(opp)
    # winners for the tied pixels must be the FIRST duplicate (2 and 0)
    # (broadcast the expectation explicitly: numpy's assert_allclose
    # rejects (3, 16) vs (3, 1) as a shape mismatch)
    np.testing.assert_allclose(
        opp[:, :16], np.broadcast_to(pal[2][:, None], (3, 16)), atol=0
    )
    np.testing.assert_allclose(
        opp[:, 16:32], np.broadcast_to(pal[0][:, None], (3, 16)), atol=0
    )
    usage = np.asarray(usage)
    assert usage[2] and usage[0]
    assert not usage[5] and not usage[7]


def test_f32x3_scores_error_bound(rng):
    """f32x3 hi/lo-split scores vs true-f32 (highest) on hardware: winner
    colors may differ only where the two best scores are within the split
    error. The dropped cl*xl term is ~2^-18 * |s| ~= 4e-6 on [0,1] data
    (NOT 1e-7 — round-3 hardware measurement: 27/65536 flips at K=256,
    exactly the ~2e-6-band prediction for this gap distribution), so the
    flip-rate bound is 1e-3. Quality impact is separately bounded by the
    24-seed parity PASS (gap 0.01%, docs/PERFORMANCE.md)."""
    P, K = 1 << 16, 256
    feats = rng.random((P, 3)).astype(np.float32)
    pal = rng.random((K, 3)).astype(np.float32)
    opp_hi, _ = pa.assign_opp_usage(
        jnp.asarray(feats), jnp.asarray(pal), jnp.asarray(pal),
        precision="highest",
    )
    opp_f3, _ = pa.assign_opp_usage(
        jnp.asarray(feats), jnp.asarray(pal), jnp.asarray(pal),
        precision="f32x3",
    )
    flips = int((np.asarray(opp_hi) != np.asarray(opp_f3)).any(axis=0).sum())
    assert flips <= P * 1e-3, f"{flips}/{P} pixels flipped (f32x3 vs highest)"


@pytest.mark.parametrize("de", ["CIE76", "CIE94", "CIEDE2000"])
def test_fused_kernel_matches_xla_path_on_hardware(rng, de):
    """Mosaic-compiled fused fitness == the jnp/XLA fitness at a padded
    (4K-class layout) shape, per deltaE kind, on the real chip."""
    from hybridquantization_tpu.pipeline import (
        _make_context,
        make_population_fitness,
    )

    img = rng.random((300, 520, 3)).astype(np.float32)  # pad_ok dims
    pals = jnp.asarray(rng.random((2, 16, 3)).astype(np.float32))
    res = {}
    for mode in ["on", "off"]:
        cfg = QuantizationConfig(
            swasa=SWASAConfig(num_colors=16, population=2),
            use_pallas=mode, deltaE=de, precision="highest",
        )
        q = HybridQuantizer(cfg)
        ctx = _make_context(jnp.asarray(img), q.filters, cfg)
        e, u = jax.jit(
            make_population_fitness(ctx, cfg, q.filters.half_width)
        )(pals)
        res[mode] = (np.asarray(e), np.asarray(u))
    np.testing.assert_allclose(res["on"][0], res["off"][0], rtol=2e-5)
    np.testing.assert_array_equal(res["on"][1], res["off"][1])


def test_conv_precision_bf16_close_on_hardware(rng):
    """bf16 conv (the benched mode) stays within ~1% RELATIVE fitness
    perturbation of the f32x3 conv on hardware. (Round-3 measurement:
    0.24-0.65% relative on this image; the round-2 "~1.6e-2 absolute"
    figure was specific to the 4K ~deltaE-5 workload — the perturbation
    scales with the deltaE magnitude, so the contract is relative.
    Quality impact is separately bounded by the 24-seed parity PASS with
    conv_precision=bf16, gap 0.87%.)"""
    from hybridquantization_tpu.pipeline import (
        _make_context,
        make_population_fitness,
    )

    img = rng.random((300, 520, 3)).astype(np.float32)
    pals = jnp.asarray(rng.random((2, 16, 3)).astype(np.float32))
    errs = {}
    for conv_prec in ["f32x3", "bf16"]:
        cfg = QuantizationConfig(
            swasa=SWASAConfig(num_colors=16, population=2),
            use_pallas="on", conv_precision=conv_prec,
        )
        q = HybridQuantizer(cfg)
        ctx = _make_context(jnp.asarray(img), q.filters, cfg)
        e, _ = jax.jit(
            make_population_fitness(ctx, cfg, q.filters.half_width)
        )(pals)
        errs[conv_prec] = np.asarray(e)
    np.testing.assert_allclose(errs["bf16"], errs["f32x3"], rtol=2e-2)


def test_8k_single_eval_and_exact_counts(rng):
    """8K x K256 on the real chip (round-3 VERDICT Weak #5 / Next #6):

    (a) one fused-fitness eval at 8K (7680x4320, Hp=4352) must fit the
        kernel's VMEM budget and return a finite error — proving the
        110 MB scoped-vmem limit holds at double the 4K height;
    (b) usage counts stay EXACT when one palette entry takes all 33.2M
        pixels (> 2^24, where a plain f32 per-entry sum would round):
        the lane-folded accumulator keeps every element < 2^24 and
        pa.usage_counts reduces in int32.
    """
    from hybridquantization_tpu.pipeline import (
        _make_context,
        make_population_fitness,
    )

    H, W, K = 4320, 7680, 256
    # (a) fused eval at 8K: tile a random 540x960 patch (cheap host-side)
    img = np.tile(rng.random((540, 960, 3)).astype(np.float32), (8, 8, 1))
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=K, population=1),
        use_pallas="on", conv_precision="bf16",
    )
    q = HybridQuantizer(cfg)
    ctx = _make_context(jnp.asarray(img), q.filters, cfg)
    pal = jnp.asarray(rng.random((1, K, 3)).astype(np.float32))

    # ctx must be a TRACED argument: at 8K a closure capture turns the
    # image into MLIR constants and the program blows past the remote
    # compiler's request limit (CLAUDE.md gotcha, verified the hard way)
    @jax.jit
    def fit(ctx_, ps):
        return make_population_fitness(ctx_, cfg, q.filters.half_width)(ps)

    e, _usage = fit(ctx, pal)
    assert np.isfinite(np.asarray(e)).all()

    # (b) exact counts with a single dominant entry beyond 2^24 pixels
    P = H * W
    feats = jnp.full((P, 3), 0.25, jnp.float32)
    pal1 = jnp.asarray(rng.random((K, 3)).astype(np.float32))
    x4 = pa.pack_pixels(feats)
    c4, o4 = pa.pack_palette(pal1, pal1)
    _opp, acc = pa.assign_opp_pop(
        x4, c4[None], o4[None], jnp.int32(P), precision="f32x3"
    )
    counts = np.asarray(pa.usage_counts(acc, K))
    assert counts.sum() == P, (counts.sum(), P)
    winner = int(np.argmax(counts[0]))
    assert counts[0, winner] == P  # constant image: every pixel, exactly
    assert P > (1 << 24)  # the regime a naive f32 sum would round in


def test_checkpoint_resume_on_hardware(rng, tmp_path):
    """Checkpoint mid-anneal and resume must equal the uninterrupted run
    with the REAL Mosaic kernels (CI proves this in interpret mode; the
    state round-trips through host numpy, so dtype/layout fidelity of
    device arrays is worth one on-chip check)."""
    from hybridquantization_tpu.checkpoint import load_state, save_state

    img = rng.random((96, 128, 3)).astype(np.float32)
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=6, population=2, imax=40),
        use_pallas="on",
    )
    q = HybridQuantizer(cfg)
    key = jax.random.PRNGKey(3)

    pal_full, info_full = q.find_palette(img, key=key, chunk_size=20)

    path = str(tmp_path / "ck.npz")
    q2 = HybridQuantizer(cfg)
    _, info_half = q2.find_palette(
        img, key=key, chunk_size=20,
        progress=lambda done, imax, t: done < 20,
    )
    save_state(path, info_half["state"])
    st_loaded, _ = load_state(path)
    pal_res, info_res = q2.find_palette(
        img, key=key, chunk_size=20, initial_state=st_loaded
    )
    np.testing.assert_array_equal(np.asarray(pal_full), np.asarray(pal_res))
    assert info_full["best_error"] == info_res["best_error"]


def test_fast_sharded_path_on_hardware(rng):
    """The column-sharded engine's real-kernel path on however many chips
    exist (1xN mesh; guard exchange rides ICI when N > 1, local mirrors
    when N == 1)."""
    from hybridquantization_tpu.parallel import (
        ShardedBatchQuantizer,
        make_mesh,
        plan_fast,
    )

    n = len(jax.devices())
    n_pixel = n  # all chips on the pixel axis
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=4, population=2, imax=4),
        progress_every=2,
    )
    mesh = make_mesh(1, n_pixel)
    q = ShardedBatchQuantizer(cfg, mesh, strategy="columns")
    H, W = 256, 300 * n_pixel
    *_, ok = plan_fast(H, W, q.filters.half_width, n_pixel)
    assert ok
    img = rng.random((1, H, W, 3)).astype(np.float32)
    pal, info = q.find_palettes(img, chunk_size=2)
    assert np.isfinite(info["best_errors"]).all()
    out = np.asarray(q.quantize(img, pal))
    assert out.shape == img.shape


def test_large_k_block_shrink_on_hardware(rng):
    """K=1024 exercises the K-aware block path (pick_block -> 4096) with
    the real Mosaic kernel: one short anneal must produce a finite error
    and a full-shape palette."""
    from hybridquantization_tpu.ops import pallas_assign as pa

    assert pa.pick_block(1024) == pa.DEFAULT_BLOCK // 2
    img = rng.random((256, 384, 3)).astype(np.float32)
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=1024, population=2, imax=4),
        use_pallas="on",
    )
    q = HybridQuantizer(cfg)
    pal, info = q.find_palette(img, key=jax.random.PRNGKey(0), chunk_size=4)
    assert pal.shape == (1024, 3)
    assert np.isfinite(info["best_error"])
