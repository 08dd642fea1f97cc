"""SWASA simulated annealing: schedules, state, on-device scan loop."""
from .state import SWASAState, state_to_numpy, state_from_numpy
from .loop import init_state, make_step, run_chunk
from . import schedule

__all__ = [
    "SWASAState",
    "state_to_numpy",
    "state_from_numpy",
    "init_state",
    "make_step",
    "run_chunk",
    "schedule",
]
