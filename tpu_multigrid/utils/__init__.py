from .checkpoint import (load_state, restore_refined_solve, restore_solve,
                         save_state, SolveState)
from .logging import get_logger, log_solve
from .profiling import CycleStats, profile_solve, trace_annotate

__all__ = [
    "SolveState", "save_state", "load_state", "restore_solve",
    "restore_refined_solve",
    "get_logger", "log_solve",
    "CycleStats", "profile_solve", "trace_annotate",
]
