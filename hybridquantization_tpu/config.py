"""Configuration dataclasses — the framework's entire parameter surface.

Mirrors every parameter of the reference's EzPlug GUI panel with its default
value, range, and meaning (HybridQuantization.java:185-257); defaults are the
GUI defaults (SURVEY.md section 2b). These are frozen (hashable) so they can
be passed as static arguments to jitted entry points.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SWASAConfig:
    """Annealing parameters (HybridQuantization.java:196-225)."""

    num_colors: int = 8          # palette size K            (:192)
    population: int = 4          # candidate palettes        (:197)
    imax: int = 5000             # max iterations            (:199)
    delta: float = 2.0           # unused-color penalty      (:201)
    convergence: bool = True     # population convergence    (:204)
    conv_delay: float = 0.75     # convergence delay         (:206)
    conv_spread: float = 0.15    # convergence spread        (:208)
    t0: float = 20.0             # initial temperature       (:212)
    i_tc: int = 20               # iterations per temp step  (:214)
    alpha: float = 0.9           # cooling coefficient       (:216)
    s0: float = 100.0            # initial max step width    (:223)
    beta: float = 5.3            # step-width adaptation     (:224)


@dataclasses.dataclass(frozen=True)
class ScielabConfig:
    """Human-visual-system model parameters (HybridQuantization.java:228-235)."""

    dpi: int = 72                      # screen dpi          (:229)
    viewing_distance_cm: float = 45.0  # viewing distance    (:231)
    whitepoint: str = "D65"            # D65 | D50           (:233)


@dataclasses.dataclass(frozen=True)
class QuantizationConfig:
    """Full engine configuration.

    deltaE: fitness Delta-E formula; the reference plugin hardcodes CIE76
      (HybridQuantization.java:96,145) and selects it at OpenCL compile time
      (ImageManipulation.java:63). CIE94 and CIEDE2000 are also available.
    assignment_space: "srgb" reproduces the reference's Euclidean-in-sRGB
      palette assignment (OptimizedConvolution.cl:155,180); "lab" assigns by
      CIELAB Delta-E76 (the BASELINE north-star kernel).
    precision: assignment-scores matmul precision on TPU —
      "highest" (true f32, 6 bf16 MXU passes; bit-matches the jnp path),
      "f32x3" (hi/lo bf16 split, 3 passes, |err| ~2^-18 |s| ~ 1e-6 —
      the default; assignment flips only on score gaps below that (4e-4
      of pixels at K=256 random, measured on hardware), quality-neutral
      at 24-seed parity),
      "bf16" (1 pass fast mode; flips ~0.7% of assignments; quality cost
      is CONFIG-DEPENDENT and grows with scale — measured over 24 seeds:
      ~1.2% mean-deltaE at 64^2/K=6, +5.5% at BASELINE config-1
      (512^2/K=16, docs/evidence/engine_config1_bf16_r04.jsonl); use
      f32x3 whenever quality matters).
      The reference computes f32 distances (OptimizedConvolution.cl:155).
    tie_mode: exact-score tie handling in the Pallas assignment kernel —
      "first" picks the lowest palette index like the reference's
      strict-less scan (OptimizedConvolution.cl:158-167); "average" returns
      the mean of the tied colors and marks all of them used, trading
      tie exactness (ties are measure-zero for continuous palettes) for
      roughly half the kernel's VPU work (ops/pallas_assign.py module doc).
    conv_precision: matmul precision of the per-evaluation S-CIELAB filter
      (the fused fitness kernel), separable from `precision` because the
      conv feeds the CONTINUOUS fitness value, not the argmax: a bf16 conv
      perturbs the mean Delta-E by ~0.2-0.7% relative (hardware-measured;
      scales with the deltaE magnitude) but measured 24-seed final quality
      is parity-clean (tools/parity_check.py --conv-precision
      bf16), while it cuts the fused kernel's MAC-bound MXU time 3x
      (10.2 -> 6.0 ms at 4K/pop4, docs/PERFORMANCE.md round 2). "" (default)
      follows `precision`. The assignment scores stay at `precision` — THEY
      are the parity-critical part (bf16 scores flip 0.7% of assignments).
      Inside the FUSED kernel "f32x3" is ~1e-5 effective (bf16 hi/lo
      horizontal-pass scratch, ops/fused_fitness.py module doc); "highest"
      keeps an f32 scratch for strict conv precision.
    """

    swasa: SWASAConfig = SWASAConfig()
    scielab: ScielabConfig = ScielabConfig()
    deltaE: str = "CIE76"
    assignment_space: str = "srgb"
    precision: str = "f32x3"      # "highest" | "f32x3" | "bf16"
    tie_mode: str = "first"       # "first" | "average"
    conv_precision: str = ""      # "" (= precision) | "highest" | "f32x3" | "bf16"
    init: str = "random"        # "random" (reference parity, SWASA.java:40-52)
                                # | "kmeans" (histogram-weighted k-means
                                # seeds, ops/kmeans.py — beyond-reference)
    verbose: bool = False
    seed: int = 0
    progress_every: int = 10      # host progress cadence (ImageManipulation.java:546)
    use_pallas: str = "auto"      # "auto" (TPU only) | "on" | "off"
    overlap_collectives: bool = True
    # member-pipelined evaluation in the column-sharded engine: each
    # population member's (error, usage) psum is issued before the next
    # member's kernels, giving XLA's latency-hiding scheduler a window to
    # fly the collective under compute — the TPU analog of the reference's
    # cross-member OpenCL event overlap (ImageManipulation.java:620-727).
    # Numerically identical to the batched evaluation (False).
