"""Fused S-CIELAB fitness tail: conv x2 + Opp->LAB + Delta-E + reduce, one kernel.

TPU-native fusion of the reference's per-evaluation device chain
computeScielabKernelsTemp -> computeScielabKernelsEnd -> Opp2LAB -> CIEDE ->
mean (OptimizedConvolution.cl:234-306,124-145,201-232 and the host readback
ImageManipulation.java:653-714) into ONE Pallas kernel:

  for each 128-column stripe of the opponent image:
    1. horizontal pass: 7 banded-matmul filters (ops.band_conv matrices)
       into a VMEM-resident (7, Hp, 128) intermediate — the reference's
       "temp" buffers and our previous XLA path both round-tripped this
       7-channel image through HBM twice; here it never leaves the chip.
    2. vertical pass per 128-row block: banded matmuls, 7 -> 3 channel
       combine (k1 + k2, luminance += k3), Opp->XYZ->LAB, Delta-E against
       the target S-CIELAB image, pad masking, and accumulation into a
       (128, 128) partial-sum tile.

  err_sum[member] = sum(acc) outside the kernel; mean = err_sum / (H*W).

Edge handling is GUARD-FREE: the half-sample symmetric reflection at the
image borders (OptimizedConvolution.cl:21-27) folds into the constant band
matrices. With R the (128, 128) reversal (anti-identity), the mirror guard
block equals (edge block) @ R for columns and R @ (edge block) for rows, so

    guard @ A  ==  edge @ (R @ A)        (left column guard)
    A^T @ guard == (A^T @ R) @ edge      (top row guard)

i.e. edge stripes/blocks simply use precomputed alternate matrices — zero
runtime flips, zero guard-padding copies. The previous formulation padded a
one-block symmetric guard around the image per evaluation, a full extra
HBM round-trip of the population image that measured 31 ms at 4K/pop4
(docs/PERFORMANCE.md) — ~35% of the whole SWASA iteration.

For column-sharded execution (parallel.fast), `edges="slabs"` takes the two
128-column neighbor slabs (ppermuted over ICI, or local mirrors at true
image edges) as separate kernel inputs instead of using the mirror
matrices; rows are always mirror-folded (every shard holds full columns).

HBM traffic per evaluation: read q (x3 stripe overlap), read target once
per member — everything else stays in VMEM.

Precision modes (matmuls): "highest" (f32, 6 bf16 MXU passes), "f32x3"
(hi/lo bf16 split, 3 passes), "bf16" (1 pass, fast). NOTE the effective
f32x3 precision of THIS kernel is ~1e-5 relative, not the ~1e-6 of the
standalone f32x3 matmul: the horizontal-pass intermediate is stored as
bf16 hi/lo scratch pairs (t7a/t7b, ~2^-16 relative representation) rather
than f32, so the vertical pass inherits that quantization. The conv feeds
the CONTINUOUS fitness value (never the argmax), so this is quality-
neutral at parity scale (24-seed parity PASS, docs/PERFORMANCE.md); use
"highest" when strict f32 conv output is required (it keeps an f32
scratch). The Delta-E/LAB tail is always f32 VPU math.

Layout contract (from pipeline._make_context / ops.band_conv.padded_plan):
  q:      (pop, 3, Hp, Wp) opponent image, mirror-padded to 128-multiples
          at image build time (jnp.pad mode="symmetric" beyond the true
          H x W), so both passes are pure-VALID.
  target: (3, Hp, Wp) planar target S-CIELAB (pad region don't-care).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import colorspace as cs

BLOCK = 128
SRC7 = (0, 1, 2, 0, 1, 2, 0)  # filter -> opponent source channel

FUSED_DELTA_E = ("CIE76", "CIE94", "CIEDE2000")

# ---------------------------------------------------------------------------
# Matmul helper with precision modes
# ---------------------------------------------------------------------------

def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm(a, b, precision: str):
    """(m, k) @ (k, n) -> f32 (m, n) at the requested precision."""
    dims = (((1,), (0,)), ((), ()))
    if precision == "highest":
        return jax.lax.dot_general(
            a, b, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    if precision == "bf16":
        return jax.lax.dot_general(
            a, b, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return d(ah, bh) + d(ah, bl) + d(al, bh)


# ---------------------------------------------------------------------------
# Channel-wise LAB / Delta-E (planar 2D tiles; mirrors colorspace.py)
# ---------------------------------------------------------------------------

def _cbrt_pos(t):
    """cbrt for t > 0 via exp/log + one Newton step (~1 ulp of lax.cbrt).

    Mosaic has no cbrt lowering; this is only evaluated on the t > delta^3
    branch of lab_f, so the input is clamped to that positive threshold.
    """
    t = jnp.maximum(t, cs.LAB_DELTA3)
    y = jnp.exp(jnp.log(t) * (1.0 / 3.0))
    return (2.0 * y + t / (y * y)) * (1.0 / 3.0)


def _lab_f(t):
    return jnp.where(
        t > cs.LAB_DELTA3, _cbrt_pos(t), (cs.LAB_KAPPA * t + 16.0) / 116.0
    )


def _opp_tiles_to_lab(o0, o1, o2, whitepoint):
    M = np.asarray(cs.M_OPP2XYZ)
    wp = np.asarray(whitepoint, np.float32)
    fx = _lab_f((M[0, 0] * o0 + M[0, 1] * o1 + M[0, 2] * o2) / wp[0])
    fy = _lab_f((M[1, 0] * o0 + M[1, 1] * o1 + M[1, 2] * o2) / wp[1])
    fz = _lab_f((M[2, 0] * o0 + M[2, 1] * o1 + M[2, 2] * o2) / wp[2])
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


def _atan2_tiles(y, x):
    """atan2 for f32 tiles — Mosaic has no atan/atan2 lowering (probed on
    v5e: NotImplementedError), so this is the Cephes atanf minimax
    polynomial (|err| ~1e-7 rad) with branchless octant reduction.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    t = ay / jnp.maximum(ax, 1e-30)
    big = t > 2.414213562373095  # tan(3pi/8)
    mid = t > 0.4142135623730951  # tan(pi/8)
    xr = jnp.where(big, -1.0 / jnp.maximum(t, 1e-30), jnp.where(mid, (t - 1.0) / (t + 1.0), t))
    base = jnp.where(big, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    z = xr * xr
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * xr + xr
    a = base + p  # atan(|y|/|x|) in [0, pi/2]
    a = jnp.where(ax == 0.0, jnp.pi / 2, a)
    a = jnp.where(x < 0.0, jnp.pi - a, a)
    a = jnp.where(y < 0.0, -a, a)
    return jnp.where((x == 0.0) & (y == 0.0), 0.0, a)


def _pow7(c):
    c2 = c * c
    return c2 * c2 * c2 * c


def _delta_e_tiles(L1, a1, b1, L2, a2, b2, kind: str):
    dL = L1 - L2
    da = a1 - a2
    db = b1 - b2
    if kind == "CIE76":
        return jnp.sqrt(dL * dL + da * da + db * db)
    if kind == "CIE94":  # graphic-arts constants, asymmetric like the ref
        c1 = jnp.sqrt(a1 * a1 + b1 * b1)
        dC = c1 - jnp.sqrt(a2 * a2 + b2 * b2)
        dH = jnp.sqrt(jnp.maximum(da * da + db * db - dC * dC, 0.0))
        sc = 1.0 + 0.045 * c1
        sh = 1.0 + 0.015 * c1
        return jnp.sqrt(dL * dL + (dC / sc) ** 2 + (dH / sh) ** 2)
    if kind == "CIEDE2000":
        # Mirrors colorspace.delta_e2000 (Sharma et al., kL=kC=kH=1) on
        # planar tiles; the reference declares but never implements this
        # variant (OptimizedConvolution.cl:227-230). atan2 via the in-kernel
        # polynomial above; x^7 as multiplies (no pow lowering).
        pi = jnp.float32(jnp.pi)
        C1 = jnp.sqrt(a1 * a1 + b1 * b1)
        C2 = jnp.sqrt(a2 * a2 + b2 * b2)
        c7 = _pow7(0.5 * (C1 + C2))
        G = 0.5 * (1.0 - jnp.sqrt(c7 / (c7 + 25.0**7)))
        ap1 = (1.0 + G) * a1
        ap2 = (1.0 + G) * a2
        Cp1 = jnp.sqrt(ap1 * ap1 + b1 * b1)
        Cp2 = jnp.sqrt(ap2 * ap2 + b2 * b2)

        hp1 = _atan2_tiles(b1, ap1)
        hp1 = jnp.where(hp1 < 0, hp1 + 2 * pi, hp1)
        hp2 = _atan2_tiles(b2, ap2)
        hp2 = jnp.where(hp2 < 0, hp2 + 2 * pi, hp2)

        dCp = Cp2 - Cp1
        dhp_raw = hp2 - hp1
        dhp = jnp.where(
            jnp.abs(dhp_raw) <= pi,
            dhp_raw,
            jnp.where(dhp_raw > pi, dhp_raw - 2 * pi, dhp_raw + 2 * pi),
        )
        zero_c = Cp1 * Cp2 == 0.0
        dhp = jnp.where(zero_c, 0.0, dhp)
        dHp = 2.0 * jnp.sqrt(Cp1 * Cp2) * jnp.sin(0.5 * dhp)

        Lbp = 0.5 * (L1 + L2)
        Cbp = 0.5 * (Cp1 + Cp2)
        hsum = hp1 + hp2
        habs = jnp.abs(hp1 - hp2)
        hbp = jnp.where(
            zero_c,
            hsum,
            jnp.where(
                habs <= pi,
                0.5 * hsum,
                jnp.where(
                    hsum < 2 * pi, 0.5 * (hsum + 2 * pi), 0.5 * (hsum - 2 * pi)
                ),
            ),
        )
        T = (
            1.0
            - 0.17 * jnp.cos(hbp - pi / 6.0)
            + 0.24 * jnp.cos(2.0 * hbp)
            + 0.32 * jnp.cos(3.0 * hbp + pi / 30.0)
            - 0.20 * jnp.cos(4.0 * hbp - 63.0 * pi / 180.0)
        )
        dtheta = (30.0 * pi / 180.0) * jnp.exp(
            -(((hbp * 180.0 / pi - 275.0) / 25.0) ** 2)
        )
        cbp7 = _pow7(Cbp)
        RC = 2.0 * jnp.sqrt(cbp7 / (cbp7 + 25.0**7))
        lterm = (Lbp - 50.0) ** 2
        SL = 1.0 + 0.015 * lterm / jnp.sqrt(20.0 + lterm)
        SC = 1.0 + 0.045 * Cbp
        SH = 1.0 + 0.015 * Cbp * T
        RT = -jnp.sin(2.0 * dtheta) * RC
        return jnp.sqrt(
            (dL / SL) ** 2
            + (dCp / SC) ** 2
            + (dHp / SH) ** 2
            + RT * (dCp / SC) * (dHp / SH)
        )
    raise ValueError(f"fused kernel does not support deltaE {kind!r}")


def _sw_vmem_bytes(Hp: int, sw: int, precision: str, edges: str) -> int:
    """Estimated VMEM working set of the kernel at stripe width sw.

    Counts the Hp-scaled buffers with the same accounting on every config
    (double-buffered stripe inputs, t7 scratches, neighbor blocks, slabs);
    constant-size matrix stacks are excluded from both the estimate and
    the budget. The budgets (_SW_VMEM_BUDGET, one per edges mode) are
    self-calibrating: the 4K/f32x3/sw=4 configuration is measured-good on
    v5e (110 MB limit), so any config whose estimate fits under ITS
    estimate also fits; an absolute assert pins the anchors to 110 MB."""
    b = BLOCK
    t7_bytes = 2 if precision == "f32x3" else 4
    n_scratch = 2 if precision == "f32x3" else 1
    scratch = n_scratch * 7 * (Hp + 2 * b) * sw * b * t7_bytes
    qm = 2 * 3 * Hp * sw * b * 4          # double-buffered stripe body
    qn = 4 * 3 * Hp * b * 4               # qL/qR neighbor blocks
    slabs = (4 * 3 * Hp * b * 4) if edges == "slabs" else 0
    tgt = 2 * 3 * Hp * sw * b * 4
    return scratch + qm + qn + slabs + tgt


# Per-edges-mode budgets, both anchored at the 4K (Hp=2176) f32x3 sw=4
# configuration: mirror is measured-good on v5e, and the slabs anchor adds
# only the 4 neighbor-slab buffers (~13 MB) on top of it — a single budget
# anchored on mirror made every 4K slabs config step down to sw=2 by
# exactly the slab term (round-4 advisor finding).
_SW_VMEM_BUDGET = {
    "mirror": _sw_vmem_bytes(2176, 4, "f32x3", "mirror"),
    "slabs": _sw_vmem_bytes(2176, 4, "f32x3", "slabs"),
}
# Absolute ceiling: the self-calibrating anchors silently track any future
# estimator edit (round-4 VERDICT Weak #6), so pin them against the 110 MB
# measured-good VMEM limit on v5e (docs/PERFORMANCE.md) in absolute bytes.
assert max(_SW_VMEM_BUDGET.values()) <= 110 * 2**20, _SW_VMEM_BUDGET


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _fused_kernel(
    hw, *refs,
    n_rows, n_stripes, sw, whitepoint, deltaE, precision, edges,
):
    # hw: scalar-prefetched (2,) int32 [H_valid, W_valid] — dynamic so the
    # same compiled kernel serves every shard of a column-sharded image
    # (parallel.fast), where only the last shard masks columns.
    #
    # sw: static sub-blocks per stripe. A stripe of sw 128-column blocks
    # reads (sw + 2) blocks (its body + one neighbor on each side), so the
    # HBM traffic of the q image is (sw + 2)/sw x per evaluation.
    #
    # Matmul structure (round-2 redesign; tools/inloop_bench.py bisect —
    # the old per-term _mm structure cost 10.4 ms f32x3 vs 6.1 ms bf16 at
    # 4K/pop4, i.e. the splits/adds, not HBM, dominated):
    #   * the three conv terms (left + body + right) ride ONE contraction:
    #     the data side is a CONTIGUOUS 3-block window of an extended
    #     stripe `ext = [left | body | right]`, the matrix side is a
    #     pre-stacked (3*BLOCK, BLOCK) input — zero concats per dot, two
    #     fewer VPU adds per (filter, block)
    #   * f32x3 splits happen ONCE per channel (ext) and once per t7 value
    #     (hi/lo bf16 scratches), not once per _mm operand
    #   * vertical windows are contiguous (3*BLOCK, swb) slices of the t7
    #     scratch, whose top/bottom edge blocks are DUPLICATED so the
    #     r=0 / r=n-1 clamping needs no special slicing (the R-folded edge
    #     matrices handle the reflection exactly as before)
    #   * edge-matrix selection indexes a stacked (4, 7, ...) variant
    #     tensor: 0 interior, 1 left/top fold, 2 right/bottom fold, 3 both
    if precision == "f32x3":
        if edges == "slabs":
            (qL, qM, qR, ls, rs, tgt, mh_h, mh_l, mv_h, mv_l,
             acc, t7a, t7b) = refs
        else:
            (qL, qM, qR, tgt, mh_h, mh_l, mv_h, mv_l, acc, t7a, t7b) = refs
            ls = rs = None
        mh = mv = None
    else:
        if edges == "slabs":
            (qL, qM, qR, ls, rs, tgt, mh, mv, acc, t7a) = refs
        else:
            (qL, qM, qR, tgt, mh, mv, acc, t7a) = refs
            ls = rs = None
        t7b = None
    H = hw[0]
    W = hw[1]
    s = pl.program_id(0)
    is_left = s == 0
    is_right = s == n_stripes - 1
    swb = sw * BLOCK
    dot_prec = (
        jax.lax.Precision.HIGHEST if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=dot_prec, preferred_element_type=jnp.float32,
        )

    # -- horizontal pass into the VMEM scratch -------------------------------
    # Edge neighbors: "mirror" keeps the clamped self-block VALUES and swaps
    # in the R-folded matrix variant; "slabs" swaps in the neighbor-slab
    # VALUES (slabs stay VMEM-resident across the grid, constant index maps)
    # and keeps interior matrices for columns.
    Hp = qM.shape[2]
    for c in range(3):
        if edges == "slabs":
            xL = jnp.where(is_left, ls[0, c], qL[0, c])
            xR = jnp.where(is_right, rs[0, c], qR[0, c])
        else:
            xL, xR = qL[0, c], qR[0, c]
        ext = jnp.concatenate([xL, qM[0, c], xR], axis=1)  # (Hp, swb + 2B)
        if precision == "f32x3":
            exth = ext.astype(jnp.bfloat16)
            extl = (ext - exth.astype(jnp.float32)).astype(jnp.bfloat16)
        for f in range(7):
            if SRC7[f] != c:
                continue
            for j in range(sw):
                # matrix variant: left fold only at the global first block,
                # right fold only at the global last ("mirror" mode only)
                if edges == "slabs":
                    vj = 0
                else:
                    vj = jnp.where(is_left & (j == 0), 1, 0) + jnp.where(
                        is_right & (j == sw - 1), 2, 0
                    )
                lo = j * BLOCK
                if precision == "f32x3":
                    xwh = exth[:, lo:lo + 3 * BLOCK]
                    xwl = extl[:, lo:lo + 3 * BLOCK]
                    y = (
                        _dot(xwh, mh_h[vj, f])
                        + _dot(xwl, mh_h[vj, f])
                        + _dot(xwh, mh_l[vj, f])
                    )
                    yh = y.astype(jnp.bfloat16)
                    yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
                    t7a[f, BLOCK:BLOCK + Hp, lo:lo + BLOCK] = yh
                    t7b[f, BLOCK:BLOCK + Hp, lo:lo + BLOCK] = yl
                else:
                    y = _dot(ext[:, lo:lo + 3 * BLOCK], mh[vj, f])
                    t7a[f, BLOCK:BLOCK + Hp, lo:lo + BLOCK] = y
    # duplicate the top/bottom row blocks so every vertical window is one
    # contiguous (3*BLOCK, swb) slice (the clamp at r=0 / r=n-1 is baked in)
    for t in ([t7a] if t7b is None else [t7a, t7b]):
        t[:, 0:BLOCK, :] = t[:, BLOCK:2 * BLOCK, :]
        t[:, BLOCK + Hp:, :] = t[:, Hp:BLOCK + Hp, :]

    @pl.when(s == 0)
    def _():
        acc[0, :, :] = jnp.zeros_like(acc[0])

    col_ids = s * swb + jax.lax.broadcasted_iota(jnp.int32, (1, swb), 1)
    col_ok = col_ids < W

    # -- vertical pass + LAB + Delta-E + masked accumulation -----------------
    def body(r, carry):
        row0 = r * BLOCK
        vr = jnp.where(r == 0, 1, 0) + jnp.where(r == n_rows - 1, 2, 0)
        y = []
        for f in range(7):
            if precision == "f32x3":
                wh = t7a[f, pl.ds(row0, 3 * BLOCK), :]
                wl = t7b[f, pl.ds(row0, 3 * BLOCK), :]
                y.append(
                    _dot(mv_h[vr, f], wh)
                    + _dot(mv_h[vr, f], wl)
                    + _dot(mv_l[vr, f], wh)
                )
            else:
                y.append(_dot(mv[vr, f], t7a[f, pl.ds(row0, 3 * BLOCK), :]))
        o0 = y[0] + y[3] + y[6]
        o1 = y[1] + y[4]
        o2 = y[2] + y[5]
        L1, a1, b1 = _opp_tiles_to_lab(o0, o1, o2, whitepoint)

        L2 = tgt[0, pl.ds(row0, BLOCK), :]
        a2 = tgt[1, pl.ds(row0, BLOCK), :]
        b2 = tgt[2, pl.ds(row0, BLOCK), :]
        # Argument order matters: CIE94 is asymmetric (C1 from the FIRST
        # argument) and the pipeline computes de_fn(target, quantized).
        de = _delta_e_tiles(L2, a2, b2, L1, a1, b1, deltaE)

        row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
        masked = jnp.where((row_ids < H) & col_ok, de, 0.0)
        # fold the sw sub-blocks into the (BLOCK, BLOCK) accumulator
        total = masked[:, 0:BLOCK]
        for j in range(1, sw):
            total = total + masked[:, j * BLOCK:(j + 1) * BLOCK]
        acc[0, :, :] = acc[0] + total
        return carry

    jax.lax.fori_loop(0, n_rows, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "whitepoint", "H", "W", "deltaE", "precision", "interpret", "edges"
    ),
)
def fused_scielab_err_sums(
    q: jnp.ndarray,
    target: jnp.ndarray,
    mats_h,
    mats_v,
    whitepoint: tuple,
    *,
    H: int | None = None,
    W: int | None = None,
    hw: jnp.ndarray | None = None,
    deltaE: str = "CIE76",
    precision: str = "f32x3",
    interpret: bool = False,
    edges: str = "mirror",
    left_slab: jnp.ndarray | None = None,
    right_slab: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(pop,) Delta-E sums over the true HxW region (divide by H*W outside).

    q (pop, 3, Hp, Wp) opponent image (UNguarded, 128-multiple dims; mirror
    samples baked beyond the true H x W); target (3, Hp, Wp) planar target
    LAB; whitepoint a STATIC 3-tuple of floats; mats_h/mats_v from
    scielab.transform.band_matrices (the E edge matrices are unused — edge
    reflection enters via the R-folded matrices, module doc). The valid
    region is (H, W) static ints or `hw` a (2,) int32 array (dynamic — for
    per-shard masks under shard_map); rows >= H or columns >= W are excluded
    from the sums.

    edges="slabs": left_slab/right_slab (pop, 3, Hp, BLOCK) are the column
    neighbors used by the first/last stripe (parallel.fast ppermutes these
    over ICI; true image edges carry locally mirrored slabs).
    """
    pop, _, Hp, Wp = q.shape
    if hw is None:
        hw = jnp.asarray([H, W], jnp.int32)
    hw = hw.astype(jnp.int32)
    assert target.shape == (3, Hp, Wp), (target.shape, Hp, Wp)
    n_blocks = Wp // BLOCK
    # Widest stripe that tiles the padded width AND fits VMEM (padded_plan
    # prefers 4-block-divisible Wp so 4K frames get sw=4: 1.5x q reads vs
    # 3x; at 8K heights the sw=4 working set is ~195 MB > the chip's
    # 128 MB VMEM — measured on v5e — so tall images step down to sw=2/1,
    # which costs only extra q reads, not MACs).
    sw = 1
    for sw_c in (4, 2):
        if n_blocks % sw_c == 0 and _sw_vmem_bytes(
            Hp, sw_c, precision, edges
        ) <= _SW_VMEM_BUDGET[edges]:
            sw = sw_c
            break
    n_stripes = n_blocks // sw
    n_rows = Hp // BLOCK
    ah, bh, ch = (m.astype(jnp.float32) for m in mats_h[:3])
    # vertical matrices pre-transposed: y = M^T x as a plain (k,b)@(b,w)
    avt, bvt, cvt = (
        jnp.swapaxes(m, 1, 2).astype(jnp.float32) for m in mats_v[:3]
    )
    # R-folded edge matrices (module doc): left/top guard = mirror of the
    # edge block, so guard contributions become edge @ (R @ A) (columns)
    # and (A^T @ R) @ edge (rows). R is a permutation, so the fold is an
    # EXACT row/column reversal — never a matmul (an einsum here runs at
    # bf16 DEFAULT precision and silently rounds the band coefficients).
    ahL = ah[:, ::-1, :]
    chR = ch[:, ::-1, :]
    avtL = avt[:, :, ::-1]
    cvtR = cvt[:, :, ::-1]

    # Stacked matrix variants (kernel doc): the three conv terms ride one
    # contraction; index 0 interior, 1 left/top fold, 2 right/bottom fold,
    # 3 both (n_stripes == 1 / n_rows == 1).
    def _hstack(A, C):
        return jnp.concatenate([A, bh, C], axis=1)  # (7, 3B, B)

    def _vstack(A, C):
        return jnp.concatenate([A, bvt, C], axis=2)  # (7, B, 3B)

    mh4 = jnp.stack([
        _hstack(ah, ch), _hstack(ahL, ch), _hstack(ah, chR), _hstack(ahL, chR)
    ])
    mv4 = jnp.stack([
        _vstack(avt, cvt), _vstack(avtL, cvt),
        _vstack(avt, cvtR), _vstack(avtL, cvtR),
    ])
    # variant 3 (both edges folded) is reachable only with a single stripe /
    # single row block — drop it otherwise (every VMEM MB counts at sw=4)
    if n_rows > 1:
        mv4 = mv4[:3]
    if edges == "slabs":
        mh4 = mh4[:1]  # columns never matrix-fold under slab exchange
    elif n_stripes > 1:
        mh4 = mh4[:3]
    if precision == "f32x3":
        mh_h = mh4.astype(jnp.bfloat16)
        mh_l = (mh4 - mh_h.astype(jnp.float32)).astype(jnp.bfloat16)
        mv_h = mv4.astype(jnp.bfloat16)
        mv_l = (mv4 - mv_h.astype(jnp.float32)).astype(jnp.bfloat16)
        mat_stacks = [mh_h, mh_l, mv_h, mv_l]
    else:
        mat_stacks = [mh4, mv4]

    kernel = functools.partial(
        _fused_kernel,
        n_rows=n_rows, n_stripes=n_stripes, sw=sw, whitepoint=whitepoint,
        deltaE=deltaE, precision=precision, edges=edges,
    )
    # qL/qR are single-BLOCK neighbor columns (index maps in BLOCK units);
    # qM is the sw-block stripe body (index map in stripe units).
    qn_spec = lambda ix: pl.BlockSpec(  # noqa: E731
        (1, 3, Hp, BLOCK), lambda s, p, hw, _ix=ix: (p, 0, 0, _ix(s))
    )
    qm_spec = pl.BlockSpec(
        (1, 3, Hp, sw * BLOCK), lambda s, p, hw: (p, 0, 0, s)
    )
    in_specs = [
        qn_spec(lambda s: jnp.maximum(sw * s - 1, 0)),
        qm_spec,
        qn_spec(lambda s: jnp.minimum(sw * (s + 1), n_blocks - 1)),
    ]
    args = [q, q, q]
    if edges == "slabs":
        assert left_slab is not None and right_slab is not None
        slab_spec = pl.BlockSpec(
            (1, 3, Hp, BLOCK), lambda s, p, hw: (p, 0, 0, 0)
        )
        in_specs += [slab_spec, slab_spec]
        args += [left_slab, right_slab]
    in_specs += [
        pl.BlockSpec((3, Hp, sw * BLOCK), lambda s, p, hw: (0, 0, s))
    ]
    args += [target]
    for m in mat_stacks:
        in_specs.append(
            pl.BlockSpec(m.shape, lambda s, p, hw: (0,) * m.ndim)
        )
    args += mat_stacks

    t7_dtype = jnp.bfloat16 if precision == "f32x3" else jnp.float32
    n_scratch = 2 if precision == "f32x3" else 1
    acc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_stripes, pop),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, BLOCK, BLOCK), lambda s, p, hw: (p, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((7, Hp + 2 * BLOCK, sw * BLOCK), t7_dtype)
            ] * n_scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((pop, BLOCK, BLOCK), jnp.float32),
        # double-buffered (3, Hp, sw*128) stripes + the (7, Hp+256, sw*128)
        # scratches exceed Mosaic's default 16 MB scoped-vmem budget; the
        # chip has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(hw, *args)
    return jnp.sum(acc, axis=(1, 2))
