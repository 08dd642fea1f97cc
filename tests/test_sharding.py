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
