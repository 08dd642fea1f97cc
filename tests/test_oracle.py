"""Self-consistency of the NumPy oracle's round-3 vectorizations.

The oracle is the parity judge (tools/parity_check.py), so its fast paths
must provably equal its definitional forms: the FFT spatial filter vs the
direct correlate1d form, and the matmul nearest-palette vs the broadcast
distance form.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import oracle


@pytest.mark.parametrize("shape", [(64, 80), (97, 53), (41, 200)])
def test_fft_filter_equals_direct(shape, rng):
    ofilters, abs_k3, _ = oracle.build_filters(72, 45.0)
    x = rng.random((*shape, 3))
    want = oracle.scielab_filter_direct(x, ofilters, abs_k3)
    got = oracle.scielab_filter(x, ofilters, abs_k3)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_fft_filter_equals_direct_high_dpi(rng):
    # wider undecimated bank (no uprate path at dpi >= ~600)
    ofilters, abs_k3, spd = oracle.build_filters(300, 45.0)
    x = rng.random((80, 96, 3))
    want = oracle.scielab_filter_direct(x, ofilters, abs_k3)
    got = oracle.scielab_filter(x, ofilters, abs_k3)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_nearest_matches_broadcast_form(rng):
    px = rng.random((5000, 3))
    pal = rng.random((64, 3))
    d = np.linalg.norm(px[:, None, :] - pal[None, :, :], axis=-1)
    want = np.argmin(d, axis=1)
    got = oracle.nearest_palette(px, pal, chunk=1024)  # force chunk seams
    np.testing.assert_array_equal(got, want)


def test_nearest_first_minimum_ties():
    pal = np.array([[0.25, 0.5, 0.5], [0.75, 0.5, 0.5], [0.25, 0.5, 0.5]])
    px = np.array([[0.5, 0.5, 0.5], [0.25, 0.5, 0.5], [0.8, 0.5, 0.5]])
    got = oracle.nearest_palette(px, pal)
    # pixel 0 ties between entries 0 and 1 -> first index; pixel 1 ties
    # between the duplicate entries 0 and 2 -> first index
    np.testing.assert_array_equal(got, [0, 0, 1])


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_fitness_population_equals_per_member(rng, dtype):
    """The batched population fitness is bit-identical to evaluating each
    member through `fitness` (same GEMM formulation, same per-channel FFT
    batching) — in both the f64 judge precision and the f32 search mode."""
    ofilters, abs_k3, _ = oracle.build_filters(72, 45.0)
    img = rng.random((40, 56, 3)).astype(dtype)
    target = oracle.srgb_to_scielab(img, ofilters, abs_k3)
    pals = rng.random((4, 7, 3)).astype(dtype)
    # member 2 duplicates member 0's first entry -> exercises ties
    pals[2, 1] = pals[2, 0]
    per = np.array(
        [oracle.fitness(img, target, p, ofilters, abs_k3) for p in pals]
    )
    bat = oracle.fitness_population(img, target, pals, ofilters, abs_k3)
    np.testing.assert_array_equal(bat, per)


def test_f32_search_mode_tracks_f64(rng):
    """The float32 oracle search (the reference's OpenCL `float` precision)
    stays within a tiny fraction of the 1% parity budget of the f64 path."""
    ofilters, abs_k3, _ = oracle.build_filters(72, 45.0)
    img = rng.random((32, 32, 3))
    t64 = oracle.srgb_to_scielab(img, ofilters, abs_k3)
    t32 = oracle.srgb_to_scielab(img.astype(np.float32), ofilters, abs_k3)
    np.testing.assert_allclose(t32, t64, atol=2e-3)
    pal = rng.random((8, 3))
    f64 = oracle.fitness(img, t64, pal, ofilters, abs_k3)
    f32 = oracle.fitness(
        img.astype(np.float32), t32, pal.astype(np.float32), ofilters, abs_k3
    )
    assert abs(f32 - f64) / f64 < 1e-4


def test_fitness_palette_side_conversion_matches_per_pixel(rng):
    """The palette-gather Opp shortcut equals running the full per-pixel
    chain on the quantized image."""
    ofilters, abs_k3, _ = oracle.build_filters(72, 45.0)
    img = rng.random((32, 40, 3))
    pal = rng.random((6, 3))
    target = oracle.srgb_to_scielab(img, ofilters, abs_k3)

    got = oracle.fitness(img, target, pal, ofilters, abs_k3, delta=2.0)

    idx = oracle.nearest_palette(img.reshape(-1, 3), pal)
    used = np.zeros(len(pal), bool)
    used[idx] = True
    q = pal[idx].reshape(img.shape)
    q_lab = oracle.opp_to_lab(
        oracle.scielab_filter_direct(
            oracle.xyz_to_opp(oracle.srgb_to_xyz(q)), ofilters, abs_k3
        )
    )
    want = oracle.delta_e76(target, q_lab).mean() + 2.0 * (~used).sum()
    np.testing.assert_allclose(got, want, rtol=1e-12)
