"""Fused Pallas stencil kernels (placeholder gating; kernels land in stage 3).

``supported()`` gates dispatch from ``cycles._smooth_raw`` — until the fused
kernels are implemented it returns False and the jnp path runs.
"""

from __future__ import annotations


def supported(S: int, dtype) -> bool:
    return False


def jacobi_sweeps(u, b, n, omega, sweeps):  # pragma: no cover
    raise NotImplementedError


def rbgs_sweeps(u, b, n, sweeps):  # pragma: no cover
    raise NotImplementedError


def residual(u, b, n):  # pragma: no cover
    raise NotImplementedError
