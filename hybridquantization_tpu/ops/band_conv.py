"""Separable convolution as block-banded MXU matmuls.

The S-CIELAB 1-D convolutions (21 taps x 7 channels) are VPU-bound as
shift-FMA chains (~9 ms/pass at 4K on v5e) and pathological as XLA depthwise
convs. This module reformulates each pass as matrix multiplication on the
MXU, where the same arithmetic runs ~10x faster:

A symmetric-filter correlation y[i] = sum_t k[t] x[i+t-half] restricted to
128-wide blocks is block-Toeplitz: with x split into 128-pixel blocks X_j,

    Y_j = X_{j-1} @ A + X_j @ B + X_{j+1} @ C

where A/B/C are constant (128, 128) banded matrices built from the taps
(A: taps reaching back into the previous block, B: the main band, C: taps
reaching into the next block). The reference's half-sample symmetric
reflection (OptimizedConvolution.cl:21-27) enters as:
  - left edge: a small triangular correction matrix E_left added to block 0
    (the mirrored x[-m-1] = x[m] terms fold back into block 0 itself,
    valid because half < 128)
  - right edge: the input is mirror-extended into the zero-padding that
    rounds W up to a block multiple, so no special-casing is needed there.

Both passes use the same matrices: the horizontal pass right-multiplies row
blocks, the vertical pass left-multiplies with the transposes. f32
(HIGHEST) keeps reference parity.

Requires half-width <= 128 (band fits in adjacent blocks), i.e. up to 257
taps; the default S-CIELAB bank is 21 taps, undecimated high-dpi banks reach
~247.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BLOCK = 128


def build_band_matrices(kernels: np.ndarray):
    """Per-channel (A, B, C, E_left) block-band matrices from (C, taps) taps.

    Layout convention: y_block = x_block @ M with M[row=x_pos, col=y_pos],
    i.e. M[j, i] = k[j - i + half] (coefficient of x_j in y_i).
    """
    kernels = np.asarray(kernels, np.float32)
    C, taps = kernels.shape
    half = taps // 2
    # The +/-1-block band covers any half-width up to BLOCK (x for outputs in
    # block j spans blocks j-1..j+1 when half <= BLOCK).
    if half > BLOCK:
        raise ValueError(
            f"filter half-width {half} exceeds the one-block band ({BLOCK})"
        )

    j = np.arange(BLOCK)[:, None]
    i = np.arange(BLOCK)[None, :]

    def band(offset):
        # x global pos = j + offset*BLOCK; coeff index = (j + off*B) - i + half
        t = j + offset * BLOCK - i + half
        valid = (t >= 0) & (t < taps)
        out = np.zeros((C, BLOCK, BLOCK), np.float32)
        tt = np.clip(t, 0, taps - 1)
        for c in range(C):
            out[c] = np.where(valid, kernels[c][tt], 0.0)
        return out

    A = band(-1)  # previous block
    B = band(0)   # main
    Cm = band(+1)  # next block

    # Left-edge reflection: y_i (i < half) receives k[-(m+1) - i + half]
    # from virtual x_{-(m+1)} == x_m  ->  E[m, i] = k[half - 1 - m - i].
    t = half - 1 - j - i
    valid = (t >= 0) & (t < taps)
    E = np.zeros((C, BLOCK, BLOCK), np.float32)
    tt = np.clip(t, 0, taps - 1)
    for c in range(C):
        E[c] = np.where(valid, kernels[c][tt], 0.0)

    return A, B, Cm, E


def _mirror_extend(x: jnp.ndarray, half: int, axis: int) -> jnp.ndarray:
    """Pad `axis` to a BLOCK multiple that fits the full `half` mirror tail.

    The band reads up to x[n-1+half]; those positions MUST hold the mirrored
    samples (zeros there would corrupt the last `half` outputs), so the
    padded length is ceil((n + half) / BLOCK) * BLOCK: mirror first, zeros
    after.
    """
    n = x.shape[axis]
    nb = -(-(n + half) // BLOCK)
    pad_total = nb * BLOCK - n
    mirror = lax.rev(lax.slice_in_dim(x, n - half, n, axis=axis), (axis,))
    zshape = list(x.shape)
    zshape[axis] = pad_total - half
    tail = jnp.concatenate([mirror, jnp.zeros(zshape, x.dtype)], axis=axis)
    return jnp.concatenate([x, tail], axis=axis)


_PREC = lax.Precision.HIGHEST


def _shifted(x_blocks: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Neighbor blocks along the block axis, zero block at the open edge."""
    nb = x_blocks.shape[axis]
    zshape = list(x_blocks.shape)
    zshape[axis] = 1
    zero = jnp.zeros(zshape, x_blocks.dtype)
    if shift == -1:  # X_{j-1}
        body = lax.slice_in_dim(x_blocks, 0, nb - 1, axis=axis)
        return jnp.concatenate([zero, body], axis=axis)
    body = lax.slice_in_dim(x_blocks, 1, nb, axis=axis)  # X_{j+1}
    return jnp.concatenate([body, zero], axis=axis)


def conv_h_banded(x: jnp.ndarray, mats, taps_half: int) -> jnp.ndarray:
    """(C, H, W) horizontal pass. mats from build_band_matrices (as jnp)."""
    A, B, Cm, E = mats
    C, H, W = x.shape
    xp = _mirror_extend(x, taps_half, axis=2)
    nb = xp.shape[2] // BLOCK
    xb = xp.reshape(C, H, nb, BLOCK)

    def mm(xs, M):  # (C,H,nb,128) x (C,128,128) -> contract last dim of xs
        return jnp.einsum("chjb,cbk->chjk", xs, M, precision=_PREC)

    y = mm(xb, B) + mm(_shifted(xb, -1, 2), A) + mm(_shifted(xb, +1, 2), Cm)
    # left-edge reflection correction on block 0
    y0 = y[:, :, 0, :] + jnp.einsum(
        "chb,cbk->chk", xb[:, :, 0, :], E, precision=_PREC
    )
    y = jnp.concatenate([y0[:, :, None, :], y[:, :, 1:, :]], axis=2)
    return y.reshape(C, H, nb * BLOCK)[:, :, :W]


def conv_v_banded(x: jnp.ndarray, mats, taps_half: int) -> jnp.ndarray:
    """(C, H, W) vertical pass via left-multiplication with transposes."""
    A, B, Cm, E = mats
    C, H, W = x.shape
    xp = _mirror_extend(x, taps_half, axis=1)
    nb = xp.shape[1] // BLOCK
    xb = xp.reshape(C, nb, BLOCK, W)

    def mm(M, xs):  # y[c,j,k,w] = sum_b M[c,b,k] xs[c,j,b,w]
        return jnp.einsum("cbk,cjbw->cjkw", M, xs, precision=_PREC)

    y = mm(B, xb) + mm(A, _shifted(xb, -1, 1)) + mm(Cm, _shifted(xb, +1, 1))
    y0 = y[:, 0] + jnp.einsum(
        "cbk,cbw->ckw", E, xb[:, 0], precision=_PREC
    )
    y = jnp.concatenate([y0[:, None], y[:, 1:]], axis=1)
    return y.reshape(C, nb * BLOCK, W)[:, :H, :]


def conv_v_banded_valid(x: jnp.ndarray, mats, taps_half: int) -> jnp.ndarray:
    """Vertical banded conv in VALID mode for halo-extended row strips.

    x: (C, Hs + 2*half, W) — a local strip with `half` real halo rows above
    and below (parallel.halo). Returns (C, Hs, W): only rows with full
    support; no reflection is applied (shard boundaries are interior).
    """
    A, B, Cm, E = mats
    del E  # no edge reflection in valid mode
    C, Hin, W = x.shape
    nb = -(-Hin // BLOCK)
    pad = nb * BLOCK - Hin
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((C, pad, W), x.dtype)], axis=1
        )
    xb = x.reshape(C, nb, BLOCK, W)

    def mm(M, xs):
        return jnp.einsum("cbk,cjbw->cjkw", M, xs, precision=_PREC)

    y = mm(B, xb) + mm(A, _shifted(xb, -1, 1)) + mm(Cm, _shifted(xb, +1, 1))
    y = y.reshape(C, nb * BLOCK, W)
    return y[:, taps_half : Hin - taps_half, :]


# ---------------------------------------------------------------------------
# Pure-VALID fast path for PRE-PADDED images.
#
# The einsum path above spends most of its time on HBM copies for padding
# and shifted views (measured: each full-buffer concat costs ~4 ms at the
# chip's ~230 GB/s). If the image is padded ONCE per image to 128-multiples
# with `jnp.pad(mode="symmetric")` (so the first `half` padded samples are
# the exact reflection the filter needs, and the rest are harmless
# real-pixel duplicates) plus one guard block per side, each pass is
# reshape (free) + one VALID conv_general_dilated over block space with 128
# in/out features (perfect lane shape) — one HBM read and one write per
# pass, nothing else. Superseded intermediate formulations (blocked/padded
# variants with in-conv zero padding and E-matrix corrections) were removed
# in round 3; their measurements live in docs/PERFORMANCE.md and git
# history.
# ---------------------------------------------------------------------------

def padded_size(n: int, half: int) -> int:
    """Smallest BLOCK multiple with room for the `half`-sample mirror."""
    return -(-(n + half) // BLOCK) * BLOCK


def conv_h_valid(x: jnp.ndarray, mats, src=None) -> jnp.ndarray:
    """(P, C, H, Wx) -> (P, F, H, Wx - 2*BLOCK) pure-VALID horizontal pass.

    x must carry one full leading and trailing neighbor block on W (e.g.
    jnp.pad(mode="symmetric") by BLOCK on the left of an already
    mirror-extended image): no conv-internal padding, no edge-matrix
    corrections — the cheapest formulation XLA allows.
    """
    A, B, Cm, E = mats
    del E
    P_, C, H, Wx = x.shape
    F = A.shape[0]
    src = tuple(range(F)) if src is None else tuple(src)
    nb = Wx // BLOCK
    xb = x.reshape(P_, C, H, nb, BLOCK)
    outs = []
    for f in range(F):
        lhs = xb[:, src[f]].reshape(P_ * H, nb, BLOCK)
        rhs = jnp.stack([A[f], B[f], Cm[f]], axis=0)
        y = lax.conv_general_dilated(
            lhs, rhs, (1,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=_PREC,
        )
        outs.append(y.reshape(P_, H, nb - 2, BLOCK))
    return jnp.stack(outs, axis=1).reshape(P_, F, H, (nb - 2) * BLOCK)


def conv_v_valid(x: jnp.ndarray, mats) -> jnp.ndarray:
    """(P, C, Hx, W) -> (P, C, Hx - 2*BLOCK, W) pure-VALID vertical pass."""
    A, B, Cm, E = mats
    del E
    P_, C, Hx, W = x.shape
    nb = Hx // BLOCK
    xb = x.reshape(P_, C, nb, BLOCK, W)
    outs = []
    for c in range(C):
        rhs = jnp.stack([A[c], B[c], Cm[c]], axis=0)[:, None]
        y = lax.conv_general_dilated(
            xb[:, c], rhs, (1, 1), "VALID",
            dimension_numbers=("NHCW", "HWIO", "NHCW"),
            precision=_PREC,
        )
        outs.append(y)
    return jnp.stack(outs, axis=1).reshape(P_, C, (nb - 2) * BLOCK, W)


def padded_plan(H: int, W: int, half: int):
    """(Hp, Wp, ok): padded dims and whether jnp.pad(symmetric) can build the
    mirror (pad amounts must not exceed the image extent).

    W is padded to the coarsest feasible granularity of (4, 2, 1) blocks so
    the fused fitness kernel can run 4-block-wide stripes: a stripe reads
    its two neighbor blocks for the horizontal pass, so stripe width sw
    costs (sw + 2)/sw reads of the opponent image per evaluation — 1.5x at
    sw=4 vs 3x at sw=1 (the kernel is HBM-bound; docs/PERFORMANCE.md). A
    4K frame pays one extra 128-column stripe (3968 -> 4096, +3% compute)
    for the 2x read saving.
    """
    Hp = padded_size(H, half)
    Wp = padded_size(W, half)
    for gran in (4 * BLOCK, 2 * BLOCK, BLOCK):
        Wg = -(-(W + half) // gran) * gran
        if (Wg - W) <= W:
            Wp = Wg
            break
    return Hp, Wp, (Hp - H) <= H and (Wp - W) <= W
