"""Convergence analysis: local Fourier analysis + measured factors.

The reference has no verification story at all (SURVEY.md §4) — these are
the textbook diagnostics that quantify smoother and cycle quality:

* :func:`smoothing_factor` — LFA smoothing factor of weighted Jacobi on the
  5-point stencil (max high-frequency amplification);
* :func:`optimal_jacobi_omega` — the 2D optimum (4/5; the reference's WIP
  variant *intended* this but computed ``4/5 == 0`` in integer arithmetic,
  ``Multigrid_functions.cpp:48``);
* :func:`measured_convergence_factor` — asymptotic per-cycle residual
  reduction measured by power iteration on the homogeneous problem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import MultigridConfig
from .core import ops


def jacobi_symbol(omega: float, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """LFA amplification symbol of weighted Jacobi on -lap (5-point):
    mu(theta) = 1 - omega + (omega/2)(cos tx + cos ty)."""
    return 1.0 - omega + 0.5 * omega * (np.cos(tx) + np.cos(ty))


def smoothing_factor(omega: float, resolution: int = 257) -> float:
    """max |mu| over the high-frequency range [pi/2, pi]^2 (union of axes).

    Textbook values: omega=4/5 -> 0.6 (optimal); omega=2/3 -> 2/3;
    omega=1 -> 1.0 (unweighted Jacobi does not smooth in 2D).
    """
    t = np.linspace(0.0, np.pi, resolution)
    tx, ty = np.meshgrid(t, t, indexing="ij")
    high = (np.abs(tx) >= np.pi / 2) | (np.abs(ty) >= np.pi / 2)
    return float(np.max(np.abs(jacobi_symbol(omega, tx, ty))[high]))


def optimal_jacobi_omega(resolution: int = 129) -> float:
    """argmin_omega of the smoothing factor (2D 5-point: 4/5)."""
    ws = np.linspace(0.3, 1.0, 141)
    fs = [smoothing_factor(w, resolution) for w in ws]
    return float(ws[int(np.argmin(fs))])


def measured_convergence_factor(hier, cfg: MultigridConfig, *,
                                cycles: int = 12, warmup: int = 4,
                                seed: int = 0) -> float:
    """Asymptotic per-cycle residual reduction, measured.

    Iterates the cycle on A u = 0 from a random start (pure error) and
    returns the geometric-mean residual reduction of the post-warmup
    cycles — the quantity the '~0.1 per V-cycle' textbook claim refers to.
    """
    from .cycles import cycle

    op = hier.levels[0]
    key = jax.random.PRNGKey(seed)
    u = ops.mask_interior(
        jax.random.normal(key, (op.S, op.S), cfg.dtype), op.n)
    b = jnp.zeros((op.S, op.S), cfg.dtype)

    @jax.jit
    def run(u, b):
        norms = jnp.zeros((cycles + 1,), jnp.float32)
        norms = norms.at[0].set(ops.norm2(op.residual(u, b)))

        def body(i, carry):
            u, norms = carry
            u = cycle(hier, cfg, u, b)
            norms = norms.at[i + 1].set(ops.norm2(op.residual(u, b)))
            return u, norms

        _, norms = jax.lax.fori_loop(0, cycles, body, (u, norms))
        return norms

    norms = np.asarray(run(u, b))
    tail = norms[warmup:]
    ratios = tail[1:] / np.maximum(tail[:-1], 1e-300)
    ratios = ratios[np.isfinite(ratios) & (ratios > 0)]
    return float(np.exp(np.mean(np.log(ratios)))) if len(ratios) else float("nan")
