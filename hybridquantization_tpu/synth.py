"""Deterministic synthetic content generators for bench/parity workloads.

Two content classes, both reproducible from a seed with zero network
egress (this environment cannot download image corpora):

- `smooth_test_image` — the round-1..3 parity workload (sine/ramp fields
  + light Gaussian noise). Re-exported here so tools and bench share one
  definition; `tools/parity_check.make_test_image` keeps its historical
  signature for the committed JSONL evidence.
- `natural_image` — the natural-statistics axis (round-3 VERDICT Missing
  #4): multi-octave value noise with a 1/f amplitude spectrum (power
  ~1/f^2, the classic natural-scene statistic) and luminance-dominant
  channel correlation. The reference's real workload is bioimages on the
  Icy platform (HybridQuantization.java:12) — spatially coherent,
  piecewise-smooth content, which is exactly the axis where the dense
  uniform-random bench image is adversarial (docs/PERFORMANCE.md round-3
  assignment investigation: block candidate unions approach K on random
  content but stay small on coherent content).

Pure NumPy, host-side, init-time only — never inside a jit.
"""

from __future__ import annotations

import numpy as np


def smooth_test_image(size: int, rng) -> np.ndarray:
    """(size, size, 3) float32 in [0,1] — the historical parity workload."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float64) / size
    img = np.stack(
        [
            0.5 + 0.5 * np.sin(6.28 * x) * np.cos(3.1 * y),
            y,
            np.clip(x + 0.3 * np.sin(12.0 * y), 0, 1),
        ],
        axis=-1,
    )
    img = np.clip(img + rng.normal(scale=0.04, size=img.shape), 0, 1)
    return img.astype(np.float32)


def _smoothstep(t: np.ndarray) -> np.ndarray:
    return t * t * (3.0 - 2.0 * t)


def _value_noise(h: int, w: int, gh: int, gw: int, rng) -> np.ndarray:
    """(h, w) smooth value noise from a (gh+1, gw+1) lattice of N(0,1)."""
    g = rng.standard_normal((gh + 1, gw + 1))
    y = np.linspace(0.0, gh, h, endpoint=False)
    x = np.linspace(0.0, gw, w, endpoint=False)
    y0 = np.minimum(y.astype(np.int64), gh - 1)
    x0 = np.minimum(x.astype(np.int64), gw - 1)
    ty = _smoothstep(y - y0)[:, None]
    tx = _smoothstep(x - x0)[None, :]
    rows0, rows1 = g[y0], g[y0 + 1]
    g00, g01 = rows0[:, x0], rows0[:, x0 + 1]
    g10, g11 = rows1[:, x0], rows1[:, x0 + 1]
    top = g00 + (g01 - g00) * tx
    bot = g10 + (g11 - g10) * tx
    return top + (bot - top) * ty


def natural_image(
    h: int, w: int, seed: int = 0, beta: float = 1.0
) -> np.ndarray:
    """(h, w, 3) float32 in [0,1] with natural-image statistics.

    Sum of value-noise octaves with amplitude f^-beta (beta=1 -> power
    spectrum ~1/f^2), three independent fields mixed into RGB with a
    luminance-dominant matrix (natural inter-channel correlation ~0.9),
    then standardized and squashed through a logistic so the histogram
    fills [0,1] with soft saturation instead of hard clipping.
    """
    rng = np.random.default_rng(seed)
    n_oct = max(int(np.log2(min(h, w))) - 1, 1)
    fields = np.zeros((3, h, w))
    for o in range(n_oct):
        gh = min(2 ** (o + 1), h)
        gw = min(max(int(round(gh * w / h)), 2), w)
        amp = float(2.0**o) ** (-beta)
        for c in range(3):
            fields[c] += amp * _value_noise(h, w, gh, gw, rng)
    L, c1, c2 = fields
    mix = np.stack(
        [
            L + 0.35 * c1,
            L - 0.12 * c1 + 0.18 * c2,
            L - 0.30 * c2,
        ]
    )
    mix = (mix - mix.mean()) / (mix.std() + 1e-12)
    img = 1.0 / (1.0 + np.exp(-1.2 * mix))
    return np.moveaxis(img, 0, -1).astype(np.float32)
