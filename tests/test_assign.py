"""Nearest-palette assignment: MXU-matmul formulation vs direct distances."""

import numpy as np
import jax.numpy as jnp

from hybridquantization_tpu.ops import assign

from . import oracle


def _check_vs_oracle(pixels, palette):
    got = np.asarray(assign.nearest_palette(jnp.asarray(pixels), jnp.asarray(palette)))
    want = oracle.nearest_palette(pixels.astype(np.float64), palette.astype(np.float64))
    if not np.array_equal(got, want):
        # matmul-trick f32 rounding may flip near-exact ties; any disagreement
        # must be between entries at (numerically) equal distance.
        d = np.linalg.norm(
            pixels[:, None, :].astype(np.float64) - palette[None].astype(np.float64),
            axis=-1,
        )
        bad = got != want
        np.testing.assert_allclose(
            d[bad, got[bad]], d[bad, want[bad]], rtol=1e-4, atol=1e-5
        )


def test_small(rng):
    _check_vs_oracle(
        rng.random((500, 3), dtype=np.float32), rng.random((16, 3), dtype=np.float32)
    )


def test_blocked_path_matches_unblocked(rng):
    pixels = rng.random((10_000, 3), dtype=np.float32)
    palette = rng.random((64, 3), dtype=np.float32)
    a = np.asarray(assign.nearest_palette(pixels, palette, block_size=1 << 20))
    b = np.asarray(assign.nearest_palette(pixels, palette, block_size=1024))
    np.testing.assert_array_equal(a, b)
    _check_vs_oracle(pixels, palette)


def test_non_multiple_block(rng):
    pixels = rng.random((1000, 3), dtype=np.float32)
    palette = rng.random((8, 3), dtype=np.float32)
    a = np.asarray(assign.nearest_palette(pixels, palette, block_size=300))
    b = np.asarray(assign.nearest_palette(pixels, palette, block_size=1 << 20))
    np.testing.assert_array_equal(a, b)


def test_tie_breaks_to_first_index():
    """Duplicate palette entries: the reference's strict-less scan keeps the
    first index (OptimizedConvolution.cl:158-167)."""
    palette = np.array([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5], [0.9, 0.9, 0.9]], np.float32)
    pixels = np.array([[0.51, 0.5, 0.5], [0.9, 0.9, 0.9]], np.float32)
    idx = np.asarray(assign.nearest_palette(pixels, palette))
    np.testing.assert_array_equal(idx, [0, 2])


def test_usage(rng):
    palette = rng.random((8, 3), dtype=np.float32)
    # pixels exactly at 3 palette entries
    pixels = palette[np.array([1, 5, 5, 7])]
    idx, used = assign.assign_with_usage(jnp.asarray(pixels), jnp.asarray(palette))
    np.testing.assert_array_equal(np.asarray(idx), [1, 5, 5, 7])
    np.testing.assert_array_equal(
        np.asarray(used), [False, True, False, False, False, True, False, True]
    )


def test_quantize_image(rng):
    img = rng.random((10, 12, 3), dtype=np.float32)
    palette = rng.random((4, 3), dtype=np.float32)
    out = np.asarray(assign.quantize_image(jnp.asarray(img), jnp.asarray(palette)))
    assert out.shape == img.shape
    # every output pixel is a palette color
    flat = out.reshape(-1, 3)
    dists = np.linalg.norm(flat[:, None] - palette[None], axis=-1).min(1)
    assert dists.max() < 1e-6
    # idempotent
    again = np.asarray(assign.quantize_image(jnp.asarray(out), jnp.asarray(palette)))
    np.testing.assert_array_equal(out, again)
