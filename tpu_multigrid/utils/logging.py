"""Structured logging / observability (SURVEY.md §5).

The reference's entire observability surface is two ``std::cout`` lines
(``Poissons_SYCL.cpp:728-729``); it never computes a residual norm.  This
module logs per-solve convergence (residual history, per-cycle reduction
factors) as human-readable lines or JSON lines.
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Optional

import numpy as np

_LOGGER_NAME = "tpu_multigrid"


def get_logger(level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(level)
    return logger


def log_solve(result, *, grid: str = "", wall_s: Optional[float] = None,
              json_lines: bool = False, logger=None) -> dict:
    """Log a SolveResult's convergence record; returns the record dict."""
    logger = logger or get_logger()
    iters = int(result.iterations)
    hist = np.asarray(result.res_history)[: iters + 1]
    rec = {
        "event": "solve",
        "grid": grid,
        "iterations": iters,
        "converged": bool(result.converged),
        "residual_initial": float(hist[0]) if len(hist) else None,
        "residual_final": float(hist[-1]) if len(hist) else None,
    }
    if iters > 0 and len(hist) > 1:
        rec["reduction_per_cycle"] = float(
            (hist[-1] / hist[0]) ** (1.0 / iters))
    if wall_s is not None:
        rec["wall_s"] = round(wall_s, 4)
    if json_lines:
        print(json.dumps(rec))
    else:
        logger.info(
            "solve %s: %d cycles, converged=%s, |r| %.3e -> %.3e (%.3f/cycle)",
            grid, iters, rec["converged"], rec["residual_initial"] or 0.0,
            rec["residual_final"] or 0.0, rec.get("reduction_per_cycle", 0.0))
    return rec
