"""Fused nearest-palette assignment as a Pallas TPU kernel.

The north-star kernel (BASELINE.json): distance + argmin + winner-color
gather + usage flags in ONE pass over the pixels at HBM-bandwidth, palette
resident in VMEM. TPU-native replacement for the reference's
`quantizeAndConvertToOpp` OpenCL kernel (OptimizedConvolution.cl:172-199),
which loops over palette entries per work-item; here the K-way search is a
single MXU matmul per pixel block.

Layout design (all planar, features on sublanes, pixels on lanes):

  X8   (8, P)   rows [f0, f1, f2, 1, 0, 0, 0, 0] of the pixel features
  C8   (8, K)   rows [c0, c1, c2, -|c|^2/2, 0, ...] of the palette features
  O8   (8, K)   rows [o0, o1, o2, 0, ...] of the palette's opponent colors

  scores (K, BP) = C8^T X8b       one MXU matmul; because of the bias row,
                                  scores[k, p] = f_p . c_k - |c_k|^2 / 2,
                                  whose argmax_k == argmin_k ||f_p - c_k||^2
  idx    (BP,)  = argmax over K   (first max == reference first-minimum ties,
                                  OptimizedConvolution.cl:158-167)
  onehot (K, BP)                  == (iota_K == idx)
  opp    (8, BP) = O8 @ onehot    winner gather as a second MXU matmul
  usage  (K,)   |= any(onehot)    accumulated across the pixel-block grid

Padding: P is padded to the block size (padded lanes masked out of usage and
never read back); K is padded to a sublane multiple with bias -inf so dummy
entries never win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_BLOCK = 2048

_NEG = -1e30  # effectively -inf for padded palette entries


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------

def pack_pixels(features: jnp.ndarray, block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """(P, 3) pixel features -> (8, P_pad) planar X8 with the ones bias row."""
    P = features.shape[0]
    pp = _round_up(P, block)
    f = jnp.pad(features, ((0, pp - P), (0, 0))).T  # (3, P_pad)
    ones = jnp.ones((1, pp), f.dtype)
    zeros = jnp.zeros((4, pp), f.dtype)
    return jnp.concatenate([f, ones, zeros], axis=0)


def pack_palette(pal_feats: jnp.ndarray, opp_palette: jnp.ndarray):
    """(K, 3) palette features + (K, 3) opponent colors -> (C8, O8) (8, K_pad)."""
    K = pal_feats.shape[0]
    kp = _round_up(max(K, 8), 8)
    bias = -0.5 * jnp.sum(pal_feats * pal_feats, axis=-1)  # (K,)
    c8 = jnp.zeros((8, kp), pal_feats.dtype)
    c8 = c8.at[0:3, :K].set(pal_feats.T)
    c8 = c8.at[3, :K].set(bias)
    c8 = c8.at[3, K:].set(_NEG)  # padded entries never win
    o8 = jnp.zeros((8, kp), opp_palette.dtype)
    o8 = o8.at[0:3, :K].set(opp_palette.T)
    return c8, o8


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _assign_opp_kernel(n_ref, x_ref, c_ref, o_ref, opp_ref, usage_ref):
    """One pixel block: scores -> argmax -> winner-opp + usage."""
    i = pl.program_id(0)
    bp = x_ref.shape[1]
    kp = c_ref.shape[1]

    scores = jax.lax.dot_general(
        c_ref[:, :], x_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,  # true f32: bf16 flips ~0.7% of
        preferred_element_type=jnp.float32,   # assignments (measured on v5e)
    )  # (K_pad, BP)

    idx = jnp.argmax(scores, axis=0)  # (BP,) first-max ties
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (kp, bp), 0) == idx[None, :]
    )

    # Mask out pixels beyond the true P (only the last block has any).
    valid = (i * bp + jax.lax.broadcasted_iota(jnp.int32, (1, bp), 1)) < n_ref[0]
    onehot_f = jnp.where(onehot & valid, 1.0, 0.0).astype(jnp.float32)

    opp = jax.lax.dot_general(
        o_ref[:, :], onehot_f,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,  # exact winner colors
        preferred_element_type=jnp.float32,
    )  # (8, BP)
    opp_ref[:, :] = opp[0:3, :]

    block_usage = jnp.max(onehot_f, axis=1, keepdims=True)  # (K_pad, 1)

    @pl.when(i == 0)
    def _():
        usage_ref[:, :] = block_usage

    @pl.when(i > 0)
    def _():
        usage_ref[:, :] = jnp.maximum(usage_ref[:, :], block_usage)


def _assign_opp_pop_kernel(n_ref, x_ref, c_ref, o_ref, opp_ref, usage_ref):
    """Population variant: grid (pop, blocks); member-specific palette blocks.

    The pixel buffer is shared across members (index map ignores the member
    coordinate), so no broadcast copy is ever materialized — each member
    streams the same HBM pixels, the TPU equivalent of the reference reusing
    one cl_rgbBuffer across the population (ImageManipulation.java:451).

    VPU budget: argmax (the K-way reduce) + one onehot compare are the only
    K-wide VPU passes; winner gather and usage both ride the MXU (usage as a
    count matvec against the all-ones bias row of X8). The out-of-range
    pixel mask is applied only on the final (partial) block.
    """
    i = pl.program_id(1)
    nblocks = pl.num_programs(1)
    bp = x_ref.shape[1]
    kp = c_ref.shape[2]

    # Mosaic supports only DEFAULT/HIGHEST dot precision; HIGHEST keeps the
    # distance comparison in true f32 (the TPU default bf16 flips ~0.7% of
    # assignments, measured).
    scores = jax.lax.dot_general(
        c_ref[0], x_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (K_pad, BP)
    idx = jnp.argmax(scores, axis=0)
    onehot = jax.lax.broadcasted_iota(jnp.int32, (kp, bp), 0) == idx[None, :]
    # Out-of-range mask (non-trivial only on the final partial block); the
    # compare/and/select chain fuses into a single VPU pass.
    valid = (i * bp + jax.lax.broadcasted_iota(jnp.int32, (1, bp), 1)) < n_ref[0]
    onehot_f = jnp.where(onehot & valid, 1.0, 0.0).astype(jnp.float32)
    del nblocks

    # Winner gather + usage count in one MXU pass: contract onehot against
    # [O8 | ones] — row 3 of x_ref is all-ones, reuse its layout by stacking.
    opp = jax.lax.dot_general(
        o_ref[0], onehot_f,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,  # exact winner colors
        preferred_element_type=jnp.float32,
    )
    opp_ref[0, :, :] = opp[0:3, :]

    counts = jax.lax.dot_general(
        onehot_f, x_ref[3:4, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,  # 0/1 x 1.0 exact in bf16
        preferred_element_type=jnp.float32,
    )  # (K_pad, 1)

    @pl.when(i == 0)
    def _():
        usage_ref[0, :, :] = counts

    @pl.when(i > 0)
    def _():
        usage_ref[0, :, :] = usage_ref[0, :, :] + counts


def _assign_idx_kernel(n_ref, x_ref, c_ref, idx_ref):
    del n_ref  # padded pixels produce indices that are never read back
    scores = jax.lax.dot_general(
        c_ref[:, :], x_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    idx_ref[0, :] = jnp.argmax(scores, axis=0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def assign_opp(
    x8: jnp.ndarray,
    c8: jnp.ndarray,
    o8: jnp.ndarray,
    num_pixels: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """(opp (3, P_pad), usage (K_pad, 1) f32) from packed inputs.

    num_pixels: () int32 — true pixel count P (<= P_pad).
    """
    pp = x8.shape[1]
    kp = c8.shape[1]
    grid = pp // block
    n = jnp.reshape(num_pixels.astype(jnp.int32), (1,))

    opp, usage = pl.pallas_call(
        _assign_opp_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((8, block), lambda i, n: (0, i)),
                pl.BlockSpec((8, kp), lambda i, n: (0, 0)),
                pl.BlockSpec((8, kp), lambda i, n: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((3, block), lambda i, n: (0, i)),
                pl.BlockSpec((kp, 1), lambda i, n: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((3, pp), jnp.float32),
            jax.ShapeDtypeStruct((kp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(n, x8, c8, o8)
    return opp, usage


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def assign_opp_pop(
    x8: jnp.ndarray,
    c8: jnp.ndarray,
    o8: jnp.ndarray,
    num_pixels: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Population assignment: c8/o8 (pop, 8, K_pad) -> (opp (pop, 3, P_pad),
    usage (pop, K_pad, 1))."""
    pop = c8.shape[0]
    pp = x8.shape[1]
    kp = c8.shape[2]
    grid = (pop, pp // block)
    n = jnp.reshape(num_pixels.astype(jnp.int32), (1,))

    opp, usage = pl.pallas_call(
        _assign_opp_pop_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, block), lambda p, i, n: (0, i)),
                pl.BlockSpec((1, 8, kp), lambda p, i, n: (p, 0, 0)),
                pl.BlockSpec((1, 8, kp), lambda p, i, n: (p, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 3, block), lambda p, i, n: (p, 0, i)),
                pl.BlockSpec((1, kp, 1), lambda p, i, n: (p, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((pop, 3, pp), jnp.float32),
            jax.ShapeDtypeStruct((pop, kp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(n, x8, c8, o8)
    return opp, usage


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def assign_idx(
    x8: jnp.ndarray,
    c8: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """(1, P_pad) int32 nearest-palette indices from packed inputs."""
    pp = x8.shape[1]
    kp = c8.shape[1]
    grid = pp // block
    n = jnp.zeros((1,), jnp.int32)

    idx = pl.pallas_call(
        _assign_idx_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((8, block), lambda i, n: (0, i)),
                pl.BlockSpec((8, kp), lambda i, n: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block), lambda i, n: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, pp), jnp.int32),
        interpret=interpret,
    )(n, x8, c8)
    return idx


# ---------------------------------------------------------------------------
# High-level fused entry (matches ops.assign semantics)
# ---------------------------------------------------------------------------

def assign_opp_usage(
    features: jnp.ndarray,
    pal_feats: jnp.ndarray,
    opp_palette: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Fused assignment for the fitness hot loop.

    Args:
      features: (P, 3) pixel features (sRGB or LAB).
      pal_feats: (K, 3) palette in the same feature space.
      opp_palette: (K, 3) palette converted to opponent space.

    Returns:
      (opp (3, P) f32 winner opponent colors, usage (K,) bool).
    """
    P, K = features.shape[0], pal_feats.shape[0]
    x8 = pack_pixels(features, block)
    c8, o8 = pack_palette(pal_feats, opp_palette)
    opp, usage = assign_opp(
        x8, c8, o8, jnp.int32(P), block=block, interpret=interpret
    )
    return opp[:, :P], usage[:K, 0] > 0.0


def assign_opp_usage_pop(
    features: jnp.ndarray,
    pal_feats: jnp.ndarray,
    opp_palettes: jnp.ndarray,
    *,
    x8: jnp.ndarray | None = None,
    num_pixels: int | None = None,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Population-fused assignment.

    Args:
      features: (P, 3) pixel features shared by all members (may be unused
        when both x8 and num_pixels are given).
      pal_feats: (pop, K, 3) candidate palettes in the feature space.
      opp_palettes: (pop, K, 3) candidate palettes in opponent space.
      x8: optional pre-packed pixels from pack_pixels(features, block) —
        pass this when calling repeatedly (packing rewrites the buffer).
      num_pixels: pixel count when x8 was packed from a different (e.g.
        mirror-padded) pixel set than `features`.

    Returns:
      (opp (pop, 3, P) f32, usage (pop, K) bool).
    """
    K = pal_feats.shape[1]
    P = num_pixels if num_pixels is not None else features.shape[0]
    if x8 is None:
        x8 = pack_pixels(features, block)
    c8, o8 = jax.vmap(pack_palette)(pal_feats, opp_palettes)
    opp, usage = assign_opp_pop(
        x8, c8, o8, jnp.int32(P), block=block, interpret=interpret
    )
    return opp[:, :, :P], usage[:, :K, 0] > 0.0


def nearest_palette_pallas(
    features: jnp.ndarray,
    pal_feats: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """(P,) int32 — drop-in for ops.assign.nearest_palette on TPU."""
    P = features.shape[0]
    x8 = pack_pixels(features, block)
    c8, _ = pack_palette(pal_feats, pal_feats)
    return assign_idx(x8, c8, block=block, interpret=interpret)[0, :P]
