"""Sharded execution == single-device execution (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from hybridquantization_tpu import QuantizationConfig, SWASAConfig, HybridQuantizer
from hybridquantization_tpu.parallel import (
    ShardedBatchQuantizer,
    conv1d_vertical_sharded,
    make_mesh,
    make_strip_fitness,
    strip_scielab,
    PIXEL_AXIS,
    DATA_AXIS,
)
from hybridquantization_tpu.ops.conv import conv1d_symmetric
from hybridquantization_tpu.pipeline import _make_context, make_fitness
from hybridquantization_tpu.scielab import build_filters
from hybridquantization_tpu.scielab import transform as sct


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _image(rng, h=80, w=48):
    return rng.random((h, w, 3), dtype=np.float32)


def test_vertical_conv_sharded_matches_local(rng):
    mesh = make_mesh(1, 4)
    x = rng.random((3, 80, 40), dtype=np.float32)
    k = rng.random((3, 9), dtype=np.float32)

    want = np.asarray(conv1d_symmetric(jnp.asarray(x), jnp.asarray(k), axis=1))

    def body(x_local):
        return conv1d_vertical_sharded(x_local, jnp.asarray(k), PIXEL_AXIS)

    got = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, PIXEL_AXIS, None),),
        out_specs=P(None, PIXEL_AXIS, None),
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_strip_scielab_matches_unsharded(rng):
    mesh = make_mesh(1, 4)
    filters = build_filters(72, 45.0)
    img = _image(rng)
    mats_h, mats_v = sct.band_matrices(filters)
    half = filters.half_width
    wp = jnp.asarray([0.95047, 1.0, 1.0883])

    want = np.asarray(sct.srgb_to_scielab(jnp.asarray(img), filters))

    got = shard_map(
        lambda im: strip_scielab(im, mats_h, mats_v, half, wp),
        mesh=mesh,
        in_specs=(P(PIXEL_AXIS, None, None),),
        out_specs=P(PIXEL_AXIS, None, None),
    )(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_strip_fitness_matches_unsharded(rng):
    mesh = make_mesh(1, 4)
    cfg = QuantizationConfig(swasa=SWASAConfig(num_colors=5, delta=2.0))
    q = HybridQuantizer(cfg)
    img = _image(rng)
    palette = rng.random((5, 3), dtype=np.float32)

    ctx = _make_context(jnp.asarray(img), q.filters, cfg)
    want_err, want_usage = jax.jit(make_fitness(ctx, cfg, q.filters.half_width))(
        jnp.asarray(palette)
    )

    mats_h, mats_v = sct.band_matrices(q.filters)
    half = q.filters.half_width
    wp = jnp.asarray([0.95047, 1.0, 1.0883])

    def body(img_local, pal):
        target = strip_scielab(img_local, mats_h, mats_v, half, wp)
        fitness = make_strip_fitness(img_local, target, mats_h, mats_v, half, wp, cfg)
        return fitness(pal)

    got_err, got_usage = jax.jit(
        shard_map(
            body, mesh=mesh,
            in_specs=(P(PIXEL_AXIS, None, None), P()),
            out_specs=(P(), P()),
        )
    )(jnp.asarray(img), jnp.asarray(palette))

    assert float(got_err) == pytest.approx(float(want_err), rel=1e-4)
    np.testing.assert_array_equal(np.asarray(got_usage), np.asarray(want_usage))


def test_batch_quantizer_end_to_end(rng):
    mesh = make_mesh(2, 4)
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=4, population=2, imax=30), progress_every=15
    )
    q = ShardedBatchQuantizer(cfg, mesh)
    images = np.stack([_image(rng), _image(rng), _image(rng), _image(rng)])
    palettes, info = q.find_palettes(images)
    assert palettes.shape == (4, 4, 3)
    assert info["best_errors"].shape == (4,)
    assert np.isfinite(info["best_errors"]).all()
    out = np.asarray(q.quantize(images, palettes))
    assert out.shape == images.shape
    for b in range(4):
        uniq = np.unique(out[b].reshape(-1, 3), axis=0)
        assert len(uniq) <= 4


def test_batch_matches_single_image_engine(rng):
    """One image through the sharded batch path == the single-device engine
    (same key, same config) — sharding must not change the math."""
    mesh = make_mesh(1, 4)
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=4, population=2, imax=12), seed=5
    )
    img = _image(rng)

    single = HybridQuantizer(cfg)
    pal_single, info_single = single.find_palette(
        img, key=jax.random.PRNGKey(5), chunk_size=12
    )

    batch = ShardedBatchQuantizer(cfg, mesh)
    pal_batch, info_batch = batch.find_palettes(
        img[None], seeds=np.array([5], np.uint32), chunk_size=12
    )
    np.testing.assert_allclose(pal_batch[0], pal_single, atol=2e-5)
    assert info_batch["best_errors"][0] == pytest.approx(
        info_single["best_error"], rel=1e-4
    )


def test_batch_validation_errors(rng):
    mesh = make_mesh(1, 4)
    q = ShardedBatchQuantizer(QuantizationConfig(), mesh)
    with pytest.raises(ValueError, match="not divisible"):
        q.find_palettes(np.zeros((1, 81, 16, 3), np.float32))
    with pytest.raises(ValueError, match="half-width"):
        q.find_palettes(np.zeros((1, 16, 16, 3), np.float32))


# ---------------------------------------------------------------------------
# Column-sharded Pallas fitness (parallel.fast; interpret mode on CPU)
# ---------------------------------------------------------------------------


def test_fast_fitness_matches_single_chip(rng):
    """Column-sharded fused-kernel fitness == single-chip fused fitness.

    Exercises: per-shard assignment, ppermute column-guard exchange (mirror
    only at true edges), the dynamic per-shard valid-width mask, and the
    psum error/usage collectives.
    """
    from hybridquantization_tpu.parallel import build_sharded_fast_fns, plan_fast
    from hybridquantization_tpu.pipeline import make_population_fitness

    mesh = make_mesh(1, 2)
    filters = build_filters(72, 45.0)
    # W=160: Wt = 2*128*ceil(170/256) = 256 -> Ws=128 per shard, pad 96 <= W
    img = rng.random((140, 160, 3), dtype=np.float32)
    pals = jnp.asarray(rng.random((2, 6, 3), dtype=np.float32))
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=6, population=2),
        use_pallas="on", precision="highest",
    )
    _, _, _, ok = plan_fast(140, 160, filters.half_width, 2)
    assert ok

    # single-chip fused path (interpret mode)
    engine = HybridQuantizer(cfg)
    ctx1 = _make_context(jnp.asarray(img), engine.filters, cfg)
    want_err, want_use = jax.jit(
        make_population_fitness(ctx1, cfg, filters.half_width)
    )(pals)

    prepare, init_fn, chunk_fn, _ = build_sharded_fast_fns(
        mesh, cfg, filters, interpret=True
    )
    ctx = prepare(jnp.asarray(img)[None])

    from hybridquantization_tpu.parallel import fast as fast_mod

    Hp, Wt, Ws, _ = fast_mod.plan_fast(140, 160, filters.half_width, 2)
    mats_h, mats_v = sct.band_matrices(filters)
    wp = jnp.asarray([0.95047, 1.0, 1.0883])

    def body(x4_local, tgt_local):
        fitness = fast_mod.make_fast_fitness(
            x4_local[0], tgt_local[0], cfg, mats_h, mats_v, wp,
            H=140, W=160, Hp=Hp, Ws=Ws, n_pixel=2, interpret=True,
        )
        return fitness(pals)

    got_err, got_use = shard_map(
        body, mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None, PIXEL_AXIS),
            P(DATA_AXIS, None, None, PIXEL_AXIS),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(ctx["x4"], ctx["targets"])

    np.testing.assert_allclose(np.asarray(got_err), np.asarray(want_err), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_use), np.asarray(want_use))


def test_fast_batch_end_to_end(rng):
    """ShardedBatchQuantizer(strategy='columns') end-to-end on 2 shards."""
    mesh = make_mesh(1, 2)
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=4, population=2, imax=6),
        progress_every=3, use_pallas="on", precision="highest",
    )
    q = ShardedBatchQuantizer(cfg, mesh, strategy="columns")
    images = rng.random((1, 140, 160, 3), dtype=np.float32)
    palettes, info = q.find_palettes(images, chunk_size=3)
    assert palettes.shape == (1, 4, 3)
    assert np.isfinite(info["best_errors"]).all()
    out = np.asarray(q.quantize(images, palettes))
    assert out.shape == images.shape


def test_fast_batch_matches_row_path(rng):
    """Same seeds: the column-fused path and the row-XLA path converge to
    the same palette trajectory (identical proposals; fitness fp-close)."""
    cfg = QuantizationConfig(
        swasa=SWASAConfig(num_colors=4, population=2, imax=8),
        use_pallas="on", precision="highest",
    )
    img = rng.random((140, 160, 3), dtype=np.float32)[None]
    seeds = np.array([7], np.uint32)

    mesh = make_mesh(1, 2)
    q_fast = ShardedBatchQuantizer(cfg, mesh, strategy="columns")
    pal_f, info_f = q_fast.find_palettes(img, seeds=seeds, chunk_size=8)

    q_rows = ShardedBatchQuantizer(cfg, mesh, strategy="rows")
    pal_r, info_r = q_rows.find_palettes(img, seeds=seeds, chunk_size=8)

    np.testing.assert_allclose(pal_f, pal_r, atol=2e-5)
    assert info_f["best_errors"][0] == pytest.approx(
        info_r["best_errors"][0], rel=1e-4
    )
