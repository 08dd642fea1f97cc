"""Checkpoint/resume for long annealing runs.

The reference has no checkpointing (SURVEY.md section 5); annealing state is
small (palettes + a few scalars + the PRNG key), so plain .npz round-trips
are exact. `find_palette_resumable` in the CLI composes this with the
chunked loop for crash-safe long runs.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from .swasa.state import SWASAState, state_from_numpy, state_to_numpy

_FORMAT_VERSION = 1


def save_state(path: str, state: SWASAState, extra: dict | None = None) -> None:
    """Atomically write the annealing state (+ optional metadata) to .npz."""
    payload = state_to_numpy(state)
    payload["__version__"] = np.int32(_FORMAT_VERSION)
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str) -> tuple[SWASAState, dict]:
    """Load (state, extra-metadata dict)."""
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    version = int(data.pop("__version__", 1))
    if version > _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {version} is newer than supported")
    extra = {k[6:]: data.pop(k) for k in list(data) if k.startswith("extra_")}
    return state_from_numpy(data), extra
