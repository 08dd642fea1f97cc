"""Unit tests for the layer-3 parity report tool (tools/parity_report.py).

The verdict logic gates the config-2 parity claim, so its three branches
(PASS / INCONCLUSIVE-within-noise / FAIL-beyond-noise) are pinned here
with hand-built JSONL inputs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write(tmp_path, name, des, cfg=None):
    cfg = cfg or {"size": 64, "colors": 8, "imax": 100, "population": 4}
    p = tmp_path / name
    with open(p, "w") as f:
        for i, de in enumerate(des):
            f.write(json.dumps({"seed": i, "deltaE": de, "mse": de / 100,
                                **cfg}) + "\n")
    return str(p)


def _run(engine, oracle, tol=0.01):
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "parity_report.py"),
         "--engine", engine, "--oracle", oracle, "--tolerance", str(tol)],
        capture_output=True, text=True,
    )
    return r.returncode, r.stdout


def test_pass_when_gap_inside_tolerance(tmp_path):
    rng = np.random.default_rng(0)
    base = 10 + 0.3 * rng.standard_normal(24)
    e = _write(tmp_path, "e.jsonl", list(base))
    o = _write(tmp_path, "o.jsonl", list(base + 0.01))  # 0.1% gap
    rc, out = _run(e, o)
    assert rc == 0 and "PARITY: PASS" in out


def test_inconclusive_when_gap_within_noise_of_tolerance(tmp_path):
    # 2 seeds/side, large std: gap ~2% but noise >> distance to 1%
    e = _write(tmp_path, "e.jsonl", [10.0, 10.8])
    o = _write(tmp_path, "o.jsonl", [10.4, 10.9])
    rc, out = _run(e, o)
    assert rc == 1 and "INCONCLUSIVE" in out
    assert "resume" in out or "add seeds" in out


def test_inconclusive_when_small_gap_is_underpowered(tmp_path):
    # Lucky small gap at n=2/side with ~4% per-seed noise: the measured gap
    # is inside the tolerance but the 1σ upper bound is not, so PASS must
    # be withheld (ADVICE r03: PASS was not power-gated).
    e = _write(tmp_path, "e.jsonl", [10.0, 11.0])
    o = _write(tmp_path, "o.jsonl", [10.1, 10.95])  # gap ~0.2%, noise ~3.5%
    rc, out = _run(e, o)
    assert rc == 1 and "INCONCLUSIVE" in out and "add seeds" in out


def test_fail_when_gap_beyond_noise(tmp_path):
    rng = np.random.default_rng(1)
    base = 10 + 0.01 * rng.standard_normal(24)
    e = _write(tmp_path, "e.jsonl", list(base))
    o = _write(tmp_path, "o.jsonl", list(base * 1.10))  # 10% gap, tiny noise
    rc, out = _run(e, o)
    assert rc == 1 and "PARITY: FAIL" in out


def test_mixed_config_warns(tmp_path):
    e = _write(tmp_path, "e.jsonl", [10.0, 10.1])
    o = _write(tmp_path, "o.jsonl", [10.0, 10.1],
               cfg={"size": 128, "colors": 8, "imax": 100, "population": 4})
    _rc, out = _run(e, o)
    assert "mixed configs" in out

def test_distribution_addendum_flags_shifted_distributions(tmp_path):
    """The round-5 distribution-aware block (round-4 VERDICT Weak #2):
    a genuinely shifted oracle distribution must trip the rank-sum test
    and show a matching median gap, not just a mean gap."""
    rng = np.random.default_rng(2)
    base = 10 + 0.3 * rng.standard_normal(24)
    e = _write(tmp_path, "e.jsonl", list(base))
    o = _write(tmp_path, "o.jsonl", list(base + 1.0))  # +10% shift
    _rc, out = _run(e, o)
    assert "median gap" in out and "rank-sum" in out
    assert "distributions DIFFER" in out


def test_distribution_addendum_counts_tail_seeds(tmp_path):
    """Tail seeds outside the other side's range are counted explicitly
    (the config-2 'oracle seed 1 outside the engine n=96 range' question)."""
    e = _write(tmp_path, "e.jsonl", [10.0, 10.2, 10.4, 10.6])
    o = _write(tmp_path, "o.jsonl", [10.1, 10.3, 12.0])  # one tail seed
    _rc, out = _run(e, o)
    assert "1/3 oracle seeds above the engine max" in out


def test_robust_stats_units():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "parity_report", os.path.join(_REPO, "tools", "parity_report.py"))
    pr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pr)
    assert pr.median([3.0, 1.0, 2.0]) == 2.0
    assert pr.median([4.0, 1.0, 2.0, 3.0]) == 2.5
    # n>=5: one point trimmed per end
    assert pr.trimmed_mean([100.0, 1.0, 2.0, 3.0, -50.0]) == 2.0
    # n<5: no trimming
    assert pr.trimmed_mean([1.0, 2.0, 9.0]) == 4.0
    # identical samples: p must be ~1, never "DIFFER"
    assert pr.rank_sum_p([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) > 0.9
    # disjoint samples: small p
    assert pr.rank_sum_p(list(range(10)), [v + 20 for v in range(10)]) < 0.01


def test_distribution_addendum_reports_dispersion(tmp_path):
    """Spread comparison (std + IQR ratios) prints descriptively — the
    'oracle walks into bad basins more often?' half of the config-2
    tail question, which location tests can't see."""
    e = _write(tmp_path, "e.jsonl", [10.0, 10.1, 10.2, 10.3])
    o = _write(tmp_path, "o.jsonl", [9.5, 10.1, 10.3, 11.0])
    _rc, out = _run(e, o)
    assert "dispersion: per-seed std engine" in out and "IQR" in out
