"""Front-door solve API (SURVEY.md §7 stage 7).

The reference's only entry points are a compiled ``main()``
(``Poissons_SYCL.cpp:658-731``) and a never-finished pybind hook
(``Multigrid_functions.cpp:2,193-197``).  This module is the library entry
point those stood in for.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from .config import MultigridConfig
from .cycles import SolveResult, fmg, solve_fixed, solve_until_tol
from .problems import DiffusionProblem, PoissonProblem


def solve_poisson(
    finest_level: int = 10,
    *,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 4.0,
    boundary: Optional[Union[float, Callable]] = None,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    refined: Optional[bool] = None,
    neumann=(),
    neumann_value=0.0,
    mesh=None,
    u0=None,
    dist_path: str = "jnp",
    order: int = 2,
    bc: str = "dirichlet",
    jit: bool = True,
) -> SolveResult:
    """Solve -lap(u) = forcing on the unit square.

    Returns a :class:`SolveResult`; ``result.u`` is the (S, S) node grid
    (physical nodes at ``[0:n+1, 0:n+1]``).  ``num_cycles`` forces a fixed
    cycle count; otherwise cycles run until ``tol`` relative residual
    reduction.  ``use_fmg=True`` runs one full-multigrid pass first.
    ``refined=True`` uses compensated double-single iterative refinement
    (tpu_multigrid.precision) so f32 storage can reach/measure deep
    tolerances on TPU.  The default ``refined=None`` AUTO-selects it on
    the plain Dirichlet order-2 single-chip path whenever the requested
    ``tol`` sits below the f32 residual floor (tol < 1e-5 with f32
    storage) — without it the default tol=1e-8 is unreachable in plain
    f32 at any practical size and every default call honestly stalled
    with ``converged=False`` (VERDICT r4 weak #7); pass
    ``refined=False`` to force the plain iterate.  ``boundary`` (a
    constant or ``g(x, y)``) imposes inhomogeneous Dirichlet values via
    lifting — an extension over the reference, which hard-eliminates
    homogeneous boundary rows (``Poissons_SYCL.cpp:224,263``).
    ``neumann`` names sides ("bottom"/"top"/"left"/"right") carrying
    ``du/dn = neumann_value`` instead of Dirichlet (problems/mixedbc.py;
    box-masked K1v/K2v fused kernels on TPU).
    """
    if config is None:
        config = MultigridConfig(finest_level=finest_level)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if mesh is not None:
        if bc == "periodic":
            # Torus Poisson on shards (dist/periodic.py): ppermute wrap
            # ghosts ARE the periodic neighbors; mean-zero gauge.
            if (boundary is not None or neumann or refined or order != 2
                    or use_fmg):
                raise ValueError("mesh= bc='periodic' is incompatible "
                                 "with boundary/neumann/refined/order/"
                                 "use_fmg options")
            from .dist.periodic import periodic_sharded_solve
            res, _ = periodic_sharded_solve(
                config, mesh, forcing=forcing, tol=tol,
                max_cycles=max_cycles, num_cycles=num_cycles, u0=u0,
                jit=jit)
            return res
        if bc == "dirichlet" and order == 4:
            # Mehrstellen on shards: the constant 9-point stencil rides
            # the operator-general path; the smoothed RHS (h^2 * B f) is
            # assembled globally once and passed through b0=.
            if boundary is not None or neumann or refined or use_fmg:
                raise ValueError("mesh= order=4 is incompatible with "
                                 "boundary/neumann/refined/use_fmg")
            from .dist.shard_cycle import (sharded_level_sizes,
                                           sharded_solve)
            from .problems.poisson4 import (mehrstellen_rhs,
                                            mehrstellen_var_op)
            my, mx = mesh.devices.shape
            n0, S0 = sharded_level_sizes(config, (my, mx)).sizes[0]
            b0 = mehrstellen_rhs(n0, S0, forcing, config.dtype)
            res, _ = sharded_solve(
                config, mesh, b0=b0,
                operator=lambda n, S: mehrstellen_var_op(n, S,
                                                         config.dtype),
                operator_coarsening="rediscretize", u0=u0,
                tol=tol if tol is not None else 0.0,
                max_cycles=max_cycles, num_cycles=num_cycles, jit=jit)
            return res
        if bc != "dirichlet" or order != 2:
            raise ValueError("mesh= supports the second-order Dirichlet "
                             f"(order 2 and 4) and periodic paths only "
                             f"(got bc={bc!r}, order={order})")
        return _solve_on_mesh(config, mesh, forcing=forcing, u0=u0,
                              tol=tol, max_cycles=max_cycles,
                              num_cycles=num_cycles, use_fmg=use_fmg,
                              dist_path=dist_path, jit=jit,
                              boundary=boundary, neumann=neumann,
                              neumann_value=neumann_value,
                              refined=refined)
    if neumann:
        if boundary is not None:
            raise ValueError("neumann sides cannot be combined with the "
                             "Dirichlet `boundary` lifting (the lifting "
                             "grid spans all four sides)")
        if refined:
            raise ValueError("refined=True is not supported with neumann "
                             "sides (box operators run the jnp path)")
        from .problems.mixedbc import MixedBCPoissonProblem
        problem = MixedBCPoissonProblem(config, neumann=neumann,
                                        forcing=forcing,
                                        neumann_value=neumann_value,
                                        **_pad_kw(config))
        return _run(problem, config, tol, max_cycles, num_cycles, use_fmg,
                    jit)
    if bc == "periodic":
        # Unit-torus Poisson (problems/periodic.py): rolls wrap, so the
        # operator is mask-free; solution in the mean-zero gauge.
        if boundary is not None or neumann or refined or order != 2:
            raise ValueError("bc='periodic' is incompatible with "
                             "boundary/neumann/refined/order options")
        from .problems.periodic import PeriodicPoissonProblem
        problem = PeriodicPoissonProblem(config, forcing=forcing)
        from .cycles.periodic_fused import fused_levels
        if (tol is not None or num_cycles is not None) and fused_levels(
                problem.hierarchy, config, config.dtype) > 0:
            # Wrap-aware fused tier (cycles/periodic_fused.py): the
            # ghost-extended K1/K2 kernels with wrap halo refreshes;
            # state stays extended across the whole solve.
            from .cycles.periodic_fused import (solve_fixed_periodic,
                                                solve_until_tol_periodic)

            def go(hier, b):
                u0 = fmg(hier, config, b) if use_fmg else None
                if num_cycles is not None:
                    return solve_fixed_periodic(hier, config, b,
                                                num_cycles, u0=u0)
                return solve_until_tol_periodic(hier, config, b, tol=tol,
                                                max_cycles=max_cycles,
                                                u0=u0)

            if jit:
                go = jax.jit(go)
            return go(problem.hierarchy, problem.rhs())
        return _run(problem, config, tol, max_cycles, num_cycles, use_fmg,
                    jit)
    if bc != "dirichlet":
        raise ValueError(f'bc must be "dirichlet" or "periodic", got '
                         f"{bc!r}")
    if order == 4:
        # Fourth-order compact Mehrstellen discretization
        # (problems/poisson4.py): same grids/transfers, 9-point stencil +
        # smoothed RHS, O(h^4) for smooth f.
        if refined:
            raise ValueError("refined=True is not supported with order=4 "
                             "(the ds machinery is 5-point-specialized)")
        from .problems.poisson4 import Poisson4Problem
        problem = Poisson4Problem(config, forcing=forcing,
                                  **_pad_kw(config))
        return _run(problem, config, tol, max_cycles, num_cycles, use_fmg,
                    jit, boundary=boundary)
    if order != 2:
        raise ValueError(f"order must be 2 or 4, got {order}")
    if refined is None:
        # Auto: a tol below the f32 residual floor (~eps*n^2-scaled;
        # under 1e-5 at any practical size) cannot converge in the plain
        # f32 iterate — route it through compensated refinement so the
        # front-door defaults (tol=1e-8) actually deliver converged=True.
        refined = (tol is not None and tol < 1e-5
                   and jnp.dtype(config.dtype) == jnp.dtype(jnp.float32))
    problem = PoissonProblem(config, forcing=forcing, **_pad_kw(config))
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit,
                refined=refined, boundary=boundary)


def _pad_kw(config: MultigridConfig) -> dict:
    """Pallas kernels need 256-aligned level padding (kernels/transfer.py)."""
    if config.use_pallas:
        # Pad every level: the Pallas transfer kernels then cover the whole
        # hierarchy (down to 256^2 arrays), avoiding XLA conv transfers.
        return dict(align=256, min_pad_level=0)
    return {}


def _pad_kw3(config: MultigridConfig) -> dict:
    """3D Pallas layout: (z, y) 16-aligned, lane axis 128-aligned
    (kernels/stencil3d.py; XLA lane-pads internally anyway)."""
    if config.use_pallas:
        return dict(align=16, min_pad_level=0, lane_align=128)
    return {}


def _solve_on_mesh(config, mesh, *, forcing, u0, tol, max_cycles,
                   num_cycles, use_fmg, dist_path, jit,
                   coefficient=None, boundary=None, neumann=(),
                   neumann_value=0.0, refined=False) -> SolveResult:
    """Route a solve onto a device mesh (dist.shard_cycle /
    dist.pallas_cycle) with the single-chip API surface."""
    if boundary is not None:
        raise ValueError("mesh= does not support boundary lifting yet; "
                         "use the single-device path")
    if tol is None and num_cycles is None:
        raise ValueError("need either tol or num_cycles (both are None)")
    if neumann:
        # Mixed Dirichlet/Neumann on shards: box operators ride the
        # operator-general 9-point path (shard-local box masks,
        # box-nesting Galerkin coarsening); the FEM-weighted RHS is
        # assembled globally once (problems.mixedbc.mixed_rhs) and
        # passed via b0=.
        if refined:
            raise ValueError("refined=True is not supported with neumann "
                             "sides (the compensated cascades are "
                             "interior-5-point-specialized)")
        if dist_path == "pallas":
            raise ValueError('dist_path="pallas" does not support neumann '
                             'sides (extended-block kernels are interior-'
                             'specialized); use dist_path="jnp"')
        from .dist.shard_cycle import sharded_level_sizes, sharded_solve
        from .problems.mixedbc import mixed_poisson_op, mixed_rhs
        my, mx = mesh.devices.shape
        n0, S0 = sharded_level_sizes(config, (my, mx)).sizes[0]
        b0 = mixed_rhs(n0, S0, neumann, forcing, neumann_value,
                       config.dtype)
        res, _ = sharded_solve(
            config, mesh, b0=b0,
            operator=lambda n, S: mixed_poisson_op(
                n, S, neumann, dtype=config.dtype),
            operator_coarsening="galerkin", u0=u0, use_fmg=use_fmg,
            tol=tol if tol is not None else 0.0, max_cycles=max_cycles,
            num_cycles=num_cycles, jit=jit)
        return res
    if refined:
        # Distributed compensated refinement (dist/refine.py): the ds
        # outer iterate matching the single-chip refined=True semantics.
        # Poisson-only, like the single-chip tier (the compensated
        # cascades are 5-point-specialized).
        if coefficient is not None:
            raise ValueError("mesh= refined=True supports the constant "
                             "Poisson stencil only (like the single-chip "
                             "refined tier)")
        if use_fmg:
            raise ValueError("mesh= refined=True does not take use_fmg "
                             "yet (seed via u0= instead)")
        if dist_path == "pallas":
            # Fused tier: K1/K2 inner cycle + streamed compensated
            # kernels (dist/refine_pallas.py) — required at 16385^2-scale
            # where the jnp compensated expressions exhaust HBM.
            if u0 is not None:
                raise ValueError('dist_path="pallas" refined does not '
                                 'take u0 yet')
            from .dist.refine_pallas import refined_sharded_solve_pallas
            res, _ = refined_sharded_solve_pallas(
                config, mesh, forcing=forcing, tol=tol,
                max_iters=max_cycles, num_cycles=num_cycles, jit=jit)
            return res
        from .dist.refine import refined_sharded_solve
        res, _ = refined_sharded_solve(
            config, mesh, forcing=forcing, tol=tol, max_iters=max_cycles,
            num_cycles=num_cycles, u0=u0, jit=jit)
        return res
    if dist_path == "pallas":
        if coefficient is not None:
            raise ValueError('dist_path="pallas" supports the constant '
                             'Poisson stencil only (use dist_path="jnp" '
                             'for variable coefficients)')
        from .dist.pallas_cycle import sharded_solve_pallas
        res, _ = sharded_solve_pallas(
            config, mesh, forcing=forcing, u0=u0, use_fmg=use_fmg,
            tol=tol if tol is not None else 0.0,
            max_cycles=max_cycles, num_cycles=num_cycles, jit=jit)
        return res
    from .dist.shard_cycle import sharded_solve
    res, _ = sharded_solve(
        config, mesh, forcing=forcing, coefficient=coefficient, u0=u0,
        use_fmg=use_fmg, tol=tol if tol is not None else 0.0,
        max_cycles=max_cycles, num_cycles=num_cycles, jit=jit)
    return res


def solve_diffusion(
    finest_level: int = 10,
    *,
    coefficient: Union[float, Callable] = 1.0,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 4.0,
    boundary: Optional[Union[float, Callable]] = None,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    mesh=None,
    u0=None,
    jit: bool = True,
) -> SolveResult:
    """Solve -div(a grad u) = forcing with per-cell coefficients a."""
    if config is None:
        config = MultigridConfig(finest_level=finest_level)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if mesh is not None:
        return _solve_on_mesh(config, mesh, forcing=forcing, u0=u0,
                              tol=tol, max_cycles=max_cycles,
                              num_cycles=num_cycles, use_fmg=use_fmg,
                              dist_path="jnp", jit=jit,
                              coefficient=coefficient, boundary=boundary)
    problem = DiffusionProblem(config, coefficient=coefficient,
                               forcing=forcing, **_pad_kw(config))
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit,
                boundary=boundary)


def solve_helmholtz(
    finest_level: int = 10,
    *,
    shift: Union[float, Callable] = 1.0,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 4.0,
    boundary=None,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    mesh=None,
    jit: bool = True,
) -> SolveResult:
    """Solve -lap(u) + shift*u = forcing (reaction-diffusion / shifted
    Poisson), homogeneous or lifted Dirichlet BCs.  ``mesh``: optional 2D
    device mesh (sharded 9-point path, per-level re-discretized shifts).

    ``shift`` is a constant c >= 0 or a callable c(x, y) (mildly negative
    shifts with 4 + c h^2 > 0 are accepted — the operator must stay
    positive definite).  Runs on the variable-coefficient machinery, so
    the fused Pallas var-stencil kernels and all drivers apply
    (problems/helmholtz.py).
    """
    if config is None:
        config = MultigridConfig(finest_level=finest_level)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if mesh is not None:
        if boundary is not None:
            raise ValueError("mesh= does not support boundary lifting")
        import numpy as _np

        from .dist.shard_cycle import sharded_solve
        from .problems.helmholtz import helmholtz_op_host
        dt = _np.dtype(jnp.dtype(config.dtype).name)
        res, _ = sharded_solve(
            config, mesh, forcing=forcing,
            operator=lambda n, S: helmholtz_op_host(n, S, shift, dtype=dt),
            operator_coarsening="rediscretize", use_fmg=use_fmg,
            tol=tol if tol is not None else 0.0, max_cycles=max_cycles,
            num_cycles=num_cycles, jit=jit)
        return res
    from .problems import HelmholtzProblem
    problem = HelmholtzProblem(config, shift=shift, forcing=forcing,
                               **_pad_kw(config))
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit,
                boundary=boundary)


def solve_anisotropic(
    finest_level: int = 10,
    *,
    eps_x: float = 1.0,
    eps_y: float = 1.0,
    angle: float = 0.0,
    coarsening: str = "auto",
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 4.0,
    boundary: Optional[Union[float, Callable]] = None,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    mesh=None,
    jit: bool = True,
) -> SolveResult:
    """Solve -div(K grad u) = forcing with the constant tensor
    ``K = R(angle) diag(eps_x, eps_y) R(angle)^T`` (anisotropic Poisson;
    ``angle = 0`` is the classical -(eps_x u_xx + eps_y u_yy)).

    ``mesh``: optional 2D device mesh — the operator distributes via the
    sharded 9-point stencil path (coarsening="full"/Galerkin only; line
    smoothers are single-chip, so pick point smoothing and moderate
    anisotropy, or wrap with Krylov).

    ``coarsening``:

    * ``"auto"`` (default) — semi-coarsened hierarchy with point
      smoothing when the anisotropy exceeds 4:1 and no line smoother was
      explicitly configured; the standard hierarchy otherwise.
    * ``"semi"`` — coupling-balanced semi-coarsening (core.semicoarsen):
      point Jacobi/Chebyshev stays mesh-independent at any anisotropy.
    * ``"full"`` — standard full coarsening; robust at strong anisotropy
      only with ``config.smoother="zebra_x"`` (eps_x >> eps_y) or
      ``"zebra_y"`` (core.lines).

    Extension beyond the isotropic-only reference
    (``Poissons_SYCL.cpp:119-123``).
    """
    if config is None:
        config = MultigridConfig(finest_level=finest_level)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if mesh is not None:
        _ratio = max(eps_x, eps_y) / max(min(eps_x, eps_y), 1e-300)
        _want_semi = coarsening == "semi" or (
            coarsening == "auto" and _ratio > 4.0 and angle == 0.0
            and config.smoother not in ("zebra_x", "zebra_y"))
        if _want_semi:
            # Semi-coarsened rectangular levels distribute via GSPMD
            # (dist.mesh.gspmd_solve_hierarchy): per-level aspect ratios
            # change as one axis coarsens ahead, which the explicit
            # halving shard_map tier cannot express — XLA partitions the
            # plain jnp semicoarsen operators instead (VERDICT r3 #5).
            if boundary is not None:
                raise ValueError("mesh= does not support boundary lifting")
            from .dist.mesh import gspmd_solve_hierarchy
            from .problems import AnisotropicPoissonProblem
            problem = AnisotropicPoissonProblem(
                config, eps_x=eps_x, eps_y=eps_y, angle=angle,
                forcing=forcing, coarsening="semi")
            return gspmd_solve_hierarchy(
                problem.hierarchy, config, problem.rhs(), mesh,
                tol=tol if tol is not None else 0.0,
                max_cycles=max_cycles, num_cycles=num_cycles, jit=jit)
        if boundary is not None:
            raise ValueError("mesh= does not support boundary lifting")
        import numpy as _np

        from .dist.shard_cycle import sharded_solve
        from .problems.anisotropic import anisotropic_poisson_op
        dt = _np.dtype(jnp.dtype(config.dtype).name)
        res, _ = sharded_solve(
            config, mesh, forcing=forcing,
            operator=lambda n, S: anisotropic_poisson_op(
                n, S, eps_x, eps_y, angle=angle, dtype=dt),
            operator_coarsening="galerkin", use_fmg=use_fmg,
            tol=tol if tol is not None else 0.0, max_cycles=max_cycles,
            num_cycles=num_cycles, jit=jit)
        return res
    if coarsening == "auto":
        ratio = max(eps_x, eps_y) / max(min(eps_x, eps_y), 1e-300)
        zebra = config.smoother in ("zebra_x", "zebra_y")
        coarsening = "semi" if (ratio > 4.0 and not zebra
                                and angle == 0.0) else "full"
    from .problems import AnisotropicPoissonProblem
    if (coarsening == "full" and config.smoother == "zebra_y"
            and config.use_pallas):
        # The fused zebra tier is lane-axis only (sublane PCR would need
        # full-height windows, kernels/lines.py) — solve the TRANSPOSED
        # problem with zebra_x instead and transpose back.  Transposing
        # the grid maps K -> P K P^T, realized by the SAME (eps_x, eps_y)
        # with angle' = pi/2 - angle (K'_xx = K_yy, K'_xy = K_xy); the
        # forcing/boundary fields swap arguments.
        tcfg = dataclasses.replace(config, smoother="zebra_x")
        tforce = ((lambda x, y: forcing(y, x)) if callable(forcing)
                  else forcing)
        tbound = ((lambda x, y: boundary(y, x)) if callable(boundary)
                  else boundary)
        problem = AnisotropicPoissonProblem(
            tcfg, eps_x=eps_x, eps_y=eps_y, forcing=tforce,
            coarsening="full", angle=math.pi / 2 - angle,
            **_pad_kw(tcfg))
        res = _run(problem, tcfg, tol, max_cycles, num_cycles, use_fmg,
                   jit, boundary=tbound)
        return dataclasses.replace(res, u=res.u.T)
    # 128-aligned level padding puts zebra_x on the fused PCR kernel
    # (kernels/lines.py) and the var smoothers on their kernels.
    pad = _pad_kw(config) if coarsening == "full" else {}
    problem = AnisotropicPoissonProblem(config, eps_x=eps_x, eps_y=eps_y,
                                        forcing=forcing,
                                        coarsening=coarsening,
                                        angle=angle, **pad)
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit,
                boundary=boundary)


def solve_convection_diffusion(
    finest_level: int = 10,
    *,
    eps: float = 1.0,
    bx: Union[float, Callable] = 0.0,
    by: Union[float, Callable] = 0.0,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 4.0,
    boundary: Optional[Union[float, Callable]] = None,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    hierarchy_method: str = "rediscretize",
    mesh=None,
    jit: bool = True,
) -> SolveResult:
    """Solve -eps lap(u) + b . grad(u) = forcing (upwind convection-
    diffusion; nonsymmetric).

    ``mesh``: optional 2D device mesh — the upwind operator distributes
    via the sharded 9-point path (the shard-local ops stream all 9
    coefficient planes, so nonsymmetry is fine).

    ``bx``/``by`` are constants or callables ``b(x, y)``.  First-order
    upwinding keeps every level an M-matrix at any mesh Peclet; pick
    ``config.smoother="rbgs"`` at high Peclet (problems/convection.py).
    Extension beyond the pure-Poisson reference.
    """
    if config is None:
        config = MultigridConfig(finest_level=finest_level, smoother="rbgs")
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if mesh is not None:
        if boundary is not None:
            raise ValueError("mesh= does not support boundary lifting")
        import numpy as _np

        from .dist.shard_cycle import sharded_solve
        from .problems.convection import convection_diffusion_op
        dt = _np.dtype(jnp.dtype(config.dtype).name)
        res, _ = sharded_solve(
            config, mesh, forcing=forcing,
            operator=lambda n, S: convection_diffusion_op(
                n, S, eps, bx, by, dtype=dt),
            operator_coarsening=("rediscretize"
                                 if hierarchy_method == "rediscretize"
                                 else "galerkin"),
            use_fmg=use_fmg, tol=tol if tol is not None else 0.0,
            max_cycles=max_cycles, num_cycles=num_cycles, jit=jit)
        return res
    from .problems import ConvectionDiffusionProblem
    problem = ConvectionDiffusionProblem(
        config, eps=eps, bx=bx, by=by, forcing=forcing,
        hierarchy_method=hierarchy_method, **_pad_kw(config))
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit,
                boundary=boundary)


def solve_convection_diffusion3d(
    finest_level: int = 5,
    *,
    eps: float = 1.0,
    bx: Union[float, Callable] = 0.0,
    by: Union[float, Callable] = 0.0,
    bz: Union[float, Callable] = 0.0,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 6.0,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    boundary: Optional[Union[float, Callable]] = None,
    mesh=None,
    jit: bool = True,
) -> SolveResult:
    """Solve -eps lap(u) + b . grad(u) = forcing on the unit cube
    (upwind, nonsymmetric; problems/convection3d.py).  ``b*`` are
    constants or callables ``b(x, y, z)``; pick ``smoother="rbgs"`` at
    high mesh Peclet.  For Krylov wrapping use
    :func:`krylov.bicgstab_solve` (CG is invalid here)."""
    if config is None:
        config = MultigridConfig(finest_level=finest_level,
                                 smoother="rbgs")
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    from .problems.convection3d import ConvectionDiffusion3DProblem
    # Constant winds put each level's (spatially constant) upwind stencil
    # on the fused static-stencil kernels; lane-align when Pallas is on.
    problem = ConvectionDiffusion3DProblem(config, eps=eps, bx=bx, by=by,
                                           bz=bz, forcing=forcing,
                                           **_pad_kw3(config))
    if mesh is not None:
        # Upwind 3D hierarchies distribute via the generic GSPMD vehicle
        # ((Sz, Sy) shard; coefficient volumes ride the same spec).
        if use_fmg or boundary is not None:
            raise ValueError("mesh= does not support use_fmg/boundary on "
                             "the convection-diffusion 3D path")
        from .dist.mesh import gspmd_solve_hierarchy
        return gspmd_solve_hierarchy(
            problem.hierarchy, config, problem.rhs(), mesh,
            tol=tol if tol is not None else 0.0,
            max_cycles=max_cycles, num_cycles=num_cycles, jit=jit,
            grid_ndim=3)
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit,
                boundary=boundary)


def solve_poisson3d(
    finest_level: int = 6,
    *,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 6.0,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    refined: bool = False,
    mesh=None,
    bc: str = "dirichlet",
    order: int = 2,
    boundary: Optional[Union[float, Callable]] = None,
    neumann=(),
    neumann_value: Union[float, Callable] = 0.0,
    jit: bool = True,
) -> SolveResult:
    """Solve -lap(u) = forcing on the unit cube, homogeneous Dirichlet BCs
    (``boundary`` — a constant or ``g(x, y, z)`` — imposes inhomogeneous
    Dirichlet values on the six faces via lifting)
    (or the unit 3-torus with ``bc="periodic"``: zero-mean callable
    forcing, mean-zero gauge — problems/periodic3d.py).  ``order=4``
    uses the compact 19-point Mehrstellen stencil + smoothed RHS
    (problems/poisson4_3d.py; measured error ratio 16.2 per refinement).

    ``mesh``: optional 2D ``jax.sharding.Mesh`` — the cube decomposes
    (z, y) with the lane axis shard-local (``dist.shard_cycle3``;
    constant forcing, no FMG/refined yet).  ``bc="periodic"``,
    ``order=4``, and ``neumann=`` also accept ``mesh=`` via the generic
    GSPMD vehicle (``dist.mesh.gspmd_solve_hierarchy``, r4).

    3D extension beyond the strictly-2D reference; the 7-point hierarchy
    runs through the same V/W/F/FMG drivers (``core.ops3d``).  The
    recommended smoother in 3D is ``smoother="chebyshev"`` (measured
    rho ~0.13 vs ~0.35 for omega=2/3 Jacobi, whose weight is 2D-optimal).

    ``refined=True`` runs compensated double-single iterative refinement
    (``tpu_multigrid.precision``): the f32 residual floor in 3D scales
    like eps*n² (~1e-3 relative at level 8), so any deeper tolerance
    needs it.
    """
    if config is None:
        import jax
        config = MultigridConfig(
            finest_level=finest_level, smoother="chebyshev", nu1=3, nu2=2,
            # default to the streaming kernels on accelerator platforms
            # (they are interpret-only on CPU)
            use_pallas=jax.devices()[0].platform != "cpu")
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if neumann:
        if (bc != "dirichlet" or order != 2
                or refined or boundary is not None or use_fmg):
            raise ValueError(
                "neumann= (3D) supports the second-order V/W-cycle path "
                "(no boundary lifting / refined / fmg)")
        from .problems.mixedbc3d import MixedBC3DPoissonProblem
        # Box-masked K1v₃/K2v₃ engage on padded levels (r4): align 16 +
        # lane 128 like the diffusion3d tier; cycles gates fall back to
        # the jnp flux boxes when the kernels don't apply.  mesh= also
        # pads: even (Sz, Sy) extents are what lets the GSPMD leaves
        # actually shard (dist.mesh._shard_leaf divisibility).
        pad = (dict(align=16, min_pad_level=0, lane_align=128)
               if (config.use_pallas or mesh is not None) else {})
        problem = MixedBC3DPoissonProblem(config, neumann=neumann,
                                          forcing=forcing,
                                          neumann_value=neumann_value,
                                          **pad)
        if mesh is not None:
            # Box-unknown jnp flux operators are rolls + masks: the
            # generic GSPMD vehicle partitions them (Sz, Sy) like the
            # 2D box shard path (dist/boxes) does explicitly.
            from .dist.mesh import gspmd_solve_hierarchy
            return gspmd_solve_hierarchy(
                problem.hierarchy, config, problem.rhs(), mesh,
                tol=tol if tol is not None else 0.0,
                max_cycles=max_cycles, num_cycles=num_cycles, jit=jit,
                grid_ndim=3)
        return _run(problem, config, tol, max_cycles, num_cycles, use_fmg,
                    jit)
    if order == 4:
        if bc != "dirichlet" or refined:
            raise ValueError("order=4 (3D) supports the Dirichlet "
                             "unrefined path")
        if mesh is not None and boundary is not None:
            raise ValueError("mesh= does not support boundary lifting")
        from .problems.poisson4_3d import Poisson4_3DProblem
        # The 19-point operator rides the fused K1_3/K2_3 kernels via
        # static stencil weights (kernels/stencil3d._off_app27, r4).
        pad = (dict(align=16, min_pad_level=0, lane_align=128)
               if (config.use_pallas or mesh is not None) else {})
        problem = Poisson4_3DProblem(config, forcing=forcing, **pad)
        if mesh is not None:
            # The 19-point Mehrstellen operator is a static-weight jnp
            # stencil (rolls only): GSPMD partitions it (Sz, Sy) like
            # the 7-point tier; the smoothed RHS is assembled host-side
            # and sharded with b.
            from .dist.mesh import gspmd_solve_hierarchy
            return gspmd_solve_hierarchy(
                problem.hierarchy, config, problem.rhs(), mesh,
                tol=tol if tol is not None else 0.0,
                max_cycles=max_cycles, num_cycles=num_cycles, jit=jit,
                grid_ndim=3, use_fmg=use_fmg)
        return _run(problem, config, tol, max_cycles, num_cycles, use_fmg,
                    jit, boundary=boundary)
    if order != 2:
        raise ValueError(f"order must be 2 or 4, got {order}")
    if bc == "periodic":
        if refined or boundary is not None:
            raise ValueError("bc='periodic' (3D) supports the unrefined "
                             "path (and has no boundary)")
        import dataclasses as _dc

        from .problems.periodic3d import Periodic3DPoissonProblem
        pcfg = _dc.replace(config, use_pallas=False)  # torus ops are jnp
        problem = Periodic3DPoissonProblem(pcfg, forcing=forcing)
        if mesh is not None:
            # Torus grids are (n, n, n) with n = 2^l — every fine level
            # divides small meshes, so GSPMD shards the wrap rolls
            # directly (jnp.roll on a sharded axis lowers to collective
            # permutes = the ring topology the torus wants; the 2D
            # analogue is dist/periodic.py's explicit ppermute ring).
            from .dist.mesh import gspmd_solve_hierarchy
            return gspmd_solve_hierarchy(
                problem.hierarchy, pcfg, problem.rhs(), mesh,
                tol=tol if tol is not None else 0.0,
                max_cycles=max_cycles, num_cycles=num_cycles, jit=jit,
                grid_ndim=3, use_fmg=use_fmg)
        return _run(problem, pcfg, tol, max_cycles, num_cycles, use_fmg,
                    jit)
    if bc != "dirichlet":
        raise ValueError(f'bc must be "dirichlet" or "periodic", got '
                         f"{bc!r}")
    if mesh is not None:
        if callable(forcing) or use_fmg or refined or boundary is not None:
            raise ValueError("solve_poisson3d(mesh=...) supports constant "
                             "forcing without use_fmg/refined/boundary "
                             "for now")
        from .dist.shard_cycle3 import sharded_solve3
        res, _ = sharded_solve3(config, mesh, forcing=float(forcing),
                                tol=tol if tol is not None else 0.0,
                                max_cycles=max_cycles,
                                num_cycles=num_cycles, jit=jit)
        return res
    from .problems import Poisson3DProblem
    # Sublane/lane-aligned padded grids qualify for the Pallas streaming
    # kernels (align 16: the K1₃/K2₃ super-kernels need coarse-side y
    # offsets 8-aligned, kernels/transfer3d.py); lane padding costs no
    # extra HBM (XLA pads the minor dim to the 128-lane tile anyway).
    problem = Poisson3DProblem(config, forcing=forcing, align=16,
                               min_pad_level=0, lane_align=128)
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit,
                refined=refined, boundary=boundary)


def solve_diffusion3d(
    finest_level: int = 6,
    *,
    coefficient: Union[float, Callable] = 1.0,
    shift: Union[float, Callable] = 0.0,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 6.0,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    mesh=None,
    boundary: Optional[Union[float, Callable]] = None,
    jit: bool = True,
) -> SolveResult:
    """Solve -div(a grad u) + shift*u = forcing on the unit cube with
    per-cell coefficients a(x, y, z) (problems/diffusion3d.py);
    ``boundary`` imposes inhomogeneous Dirichlet face values via lifting.

    ``shift`` is an optional zeroth-order reaction/Helmholtz term —
    constant or ``c(x, y, z)`` — re-discretized per level (the 3D
    analogue of ``solve_helmholtz``; positive-definite regime only).
    Wide levels run the fused 3D var super-kernels (K1v₃/K2v₃,
    kernels/vartransfer3d.py: 3-plane transmissibility streaming, 4 with
    ``shift``); narrow levels the jnp 7-point flux path.  Coarse
    operators re-discretize
    from 2x2x2 cell-averaged coefficients.  ``mesh``: optional 2D device
    mesh — the cube decomposes (gz, gy) with the transmissibility planes
    sharded alongside u/b (dist.local_var3); with ``shift``, callable
    forcing, or ``use_fmg`` the solve routes through the generic GSPMD
    vehicle instead (r4).
    """
    if config is None:
        config = MultigridConfig(finest_level=finest_level,
                                 smoother="chebyshev", nu1=3, nu2=2)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if mesh is not None:
        if boundary is not None:
            raise ValueError("mesh= does not support boundary lifting")
        has_shift = callable(shift) or float(shift) != 0.0
        if not (has_shift or callable(forcing) or use_fmg):
            # Fast path: the explicit shard_map tier (ghost-extended
            # K1v₃/K2v₃ on accelerators, lean ppermute halos).
            from .dist.shard_cycle3 import sharded_solve3
            res, _ = sharded_solve3(config, mesh, forcing=float(forcing),
                                    coefficient=coefficient,
                                    tol=tol if tol is not None else 0.0,
                                    max_cycles=max_cycles,
                                    num_cycles=num_cycles, jit=jit)
            return res
        # Reaction shift / callable forcing / FMG: the generic GSPMD
        # vehicle partitions the jnp flux operators (the shift rides the
        # per-level rediscretized diagonals inside the hierarchy leaves,
        # which shard alongside u/b).
        from .dist.mesh import gspmd_solve_hierarchy
        from .problems import Diffusion3DProblem
        problem = Diffusion3DProblem(config, coefficient=coefficient,
                                     shift=shift, forcing=forcing)
        return gspmd_solve_hierarchy(
            problem.hierarchy, config, problem.rhs(), mesh,
            tol=tol if tol is not None else 0.0,
            max_cycles=max_cycles, num_cycles=num_cycles, jit=jit,
            grid_ndim=3, use_fmg=use_fmg)
    from .problems import Diffusion3DProblem
    problem = Diffusion3DProblem(config, coefficient=coefficient,
                                 shift=shift, forcing=forcing)
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit,
                boundary=boundary)


def solve_anisotropic3d(
    finest_level: int = 6,
    *,
    eps_x: float = 1.0,
    eps_y: float = 1.0,
    eps_z: float = 1.0,
    angle: float = 0.0,
    plane: str = "xy",
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 6.0,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    balance: float = 2.0,
    mesh=None,
    jit: bool = True,
) -> SolveResult:
    """Solve -div(K grad u) = forcing on the unit cube,
    K = R(angle, plane) diag(eps_x, eps_y, eps_z) R(angle, plane)^T.

    ``angle = 0`` (default): the axis-aligned case via the
    coupling-balanced SEMI-COARSENED hierarchy (core.semicoarsen3):
    point Jacobi/Chebyshev smoothing stays mesh-independent at any
    axis-aligned anisotropy because only the strongly coupled axes
    coarsen per level.  For mild anisotropy the full-coarsening
    variable-coefficient tier (``solve_diffusion3d``) also works and
    runs the fused 3D Pallas kernels.

    ``angle != 0``: the ROTATED tensor (cross-derivative) case via the
    matrix-free 19-point constant-K operator (``Rotated3DOp``) with
    full coarsening — the 3D counterpart of
    ``solve_anisotropic(angle=...)``; ``plane`` picks the rotation
    plane ("xy"/"xz"/"yz").

    Extension beyond the isotropic-only reference
    (``Poissons_SYCL.cpp:119-123``).
    """
    if config is None:
        config = MultigridConfig(finest_level=finest_level,
                                 smoother="chebyshev", nu1=3, nu2=2)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if config.smoother in ("zebra_x", "zebra_y"):
        raise ValueError("3D semi-coarsening uses point smoothers "
                         "(jacobi/chebyshev/rbgs); line relaxation is the "
                         "2D remedy")
    if angle != 0.0:
        # Rotated tensor (cross derivatives): the 19-point constant-K
        # operator on a full-coarsening re-discretized hierarchy
        # (problems/anisotropic3d.py Rotated3DOp; VERDICT r3 next #7) —
        # the 3D counterpart of solve_anisotropic(angle=...).  Pair
        # with W-cycles / Krylov wrapping at strong anisotropy, like the
        # 2D rotated guidance.
        from .problems.anisotropic3d import RotatedAnisotropic3DProblem
        problem = RotatedAnisotropic3DProblem(
            config, eps_x=eps_x, eps_y=eps_y, eps_z=eps_z, angle=angle,
            plane=plane, forcing=forcing, **_pad_kw3(config))
    else:
        from .problems.anisotropic3d import AnisotropicPoisson3DProblem
        problem = AnisotropicPoisson3DProblem(
            config, eps_x=eps_x, eps_y=eps_y, eps_z=eps_z,
            forcing=forcing, balance=balance)
    if mesh is not None:
        # Both 3D anisotropy remedies are matrix-free jnp operators
        # (static host stencils, zero coefficient volumes), so the
        # generic GSPMD vehicle distributes them: (Sz, Sy) shard over
        # the 2D device mesh, Sx lanes whole (dist.mesh._shard_leaf).
        if use_fmg:
            raise ValueError("mesh= does not support use_fmg on the "
                             "anisotropic 3D path")
        from .dist.mesh import gspmd_solve_hierarchy
        return gspmd_solve_hierarchy(
            problem.hierarchy, config, problem.rhs(), mesh,
            tol=tol if tol is not None else 0.0,
            max_cycles=max_cycles, num_cycles=num_cycles, jit=jit,
            grid_ndim=3)
    return _run(problem, config, tol, max_cycles, num_cycles, use_fmg, jit)


def _run(problem, config, tol, max_cycles, num_cycles, use_fmg, use_jit,
         refined: bool = False, boundary=None):
    hier = problem.hierarchy
    b = problem.rhs()

    lift = None
    if boundary is not None:
        # Inhomogeneous Dirichlet lifting: u = w + G with G carrying the
        # boundary values; w solves the homogeneous problem A w = b - A G
        # (op.apply's interior masking makes -A G exactly the boundary
        # coupling term).  Works for any operator family with masked
        # apply (Poisson/flux/Galerkin/upwind stencils, 2D and 3D).
        op0 = hier.levels[0]
        if getattr(op0, "ndim", 2) == 3:
            from .problems.poisson3d import boundary_grid3
            lift = boundary_grid3(op0.n, op0.grid_shape, boundary,
                                  config.dtype)
        else:
            from .problems.poisson import boundary_grid
            lift = boundary_grid(op0.n, op0.S, boundary, config.dtype)
        b = b - op0.apply(lift)

    # The hierarchy is a jit ARGUMENT, not a closure: closed-over arrays
    # become embedded constants, and variable-coefficient hierarchies carry
    # hundreds of MB of stencil coefficients (CLAUDE.md: constants are
    # shipped inside remote-compile requests).
    if refined and tol is None and num_cycles is None:
        raise ValueError(
            "refined=True needs either tol or num_cycles "
            "(got tol=None, num_cycles=None)")
    if tol is None and num_cycles is None:
        raise ValueError("need either tol or num_cycles (both are None)")

    def go(hier, b):
        u0 = fmg(hier, config, b) if use_fmg else None
        if refined:
            from .precision import solve_refined
            return solve_refined(hier, config, b, tol=tol,
                                 max_iters=max_cycles,
                                 num_cycles=num_cycles, u0=u0)
        if num_cycles is not None:
            return solve_fixed(hier, config, b, num_cycles, u0=u0)
        return solve_until_tol(hier, config, b, tol=tol,
                               max_cycles=max_cycles, u0=u0)

    if use_jit:
        go = jax.jit(go)
    res = go(hier, b)
    if lift is not None:
        res = dataclasses.replace(res, u=res.u + lift)
    return res


def extract_solution(result_u: jnp.ndarray, n: int) -> jnp.ndarray:
    """Crop the padded solve grid to the physical (n+1,)^d node grid.

    Periodic results (``bc="periodic"``) are (n,)^d arrays of the unique
    torus nodes; the closing row/col (node n == node 0) is appended by
    wrap so the returned grid is the same (n+1,)^d closed node view as
    the Dirichlet paths.
    """
    if result_u.shape[-1] == n:  # periodic: unique nodes only
        pad = [(0, 1)] * result_u.ndim
        return jnp.pad(result_u, pad, mode="wrap")
    return result_u[(slice(0, n + 1),) * result_u.ndim]


# ---------------------------------------------------------------------------
# Nonlinear solves (FAS multigrid; cycles/fas.py)
# ---------------------------------------------------------------------------

def _run_fas(problem, config: MultigridConfig, tol, max_cycles, num_cycles,
             use_fmg, use_jit) -> SolveResult:
    """FAS analogue of :func:`_run` (nonlinear residual norms; FMG-FAS
    prolongs the SOLUTION and needs per-level assembled RHS)."""
    from .cycles.fas import fas_solve_fixed, fas_solve_until_tol, fmg_fas
    hier = problem.hierarchy
    if tol is None and num_cycles is None:
        raise ValueError("need either tol or num_cycles (both are None)")
    if config.smoother != "jacobi":
        # FAS smoothing is Jacobi-Newton / Picard-Jacobi (op.nsmooth) —
        # cfg.smoother selections tuned for the linear tier (chebyshev /
        # rbgs / zebra) do not apply here and would silently change
        # behavior if ignored (ADVICE r3).
        import warnings
        warnings.warn(
            f"FAS solvers smooth with weighted Jacobi-Newton/Picard only; "
            f"config.smoother={config.smoother!r} is ignored",
            stacklevel=3)
    bs = problem.rhs_all_levels() if use_fmg else [problem.rhs()]

    def go(hier, bs):
        u0 = fmg_fas(hier, config, bs) if use_fmg else None
        if num_cycles is not None:
            return fas_solve_fixed(hier, config, bs[0], num_cycles, u0=u0)
        return fas_solve_until_tol(hier, config, bs[0], tol=tol,
                                   max_cycles=max_cycles, u0=u0)

    if use_jit:
        go = jax.jit(go)
    return go(hier, bs)


def _run_fas_gspmd(problem, config: MultigridConfig, mesh, tol,
                   max_cycles, num_cycles, use_fmg,
                   use_jit) -> SolveResult:
    """Distribute a FAS problem via the generic GSPMD vehicle
    (``dist.mesh.gspmd_fas_solve_hierarchy``) — the route for the 3D
    pointwise tier and the quasilinear flux families, whose operators
    are matrix-free jnp."""
    if use_fmg:
        raise ValueError("mesh= FAS does not support FMG yet (use the "
                         "single-device path)")
    if tol is None and num_cycles is None:
        raise ValueError("need either tol or num_cycles (both are None)")
    from .dist.mesh import gspmd_fas_solve_hierarchy
    return gspmd_fas_solve_hierarchy(
        problem.hierarchy, config, problem.rhs(), mesh,
        tol=tol if tol is not None else 0.0, max_cycles=max_cycles,
        num_cycles=num_cycles, jit=use_jit)


def solve_nonlinear_poisson(
    finest_level: int = 8,
    *,
    phi: Callable,
    dphi: Callable,
    ndim: int = 2,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable, None] = None,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    mesh=None,
    dist_path: str = "jnp",
    jit: bool = True,
) -> SolveResult:
    """Solve -lap(u) + phi(u) = forcing by FAS multigrid (2D or 3D).

    ``phi``/``dphi`` are traceable pointwise callables (the nonlinearity
    and its derivative).  ``ndim=3`` solves on the unit cube (7-point
    stencil, trilinear/FW transfers; problems/bratu.py).  ``mesh``: an
    optional 2D device mesh — FAS distributes via shard-local
    Jacobi–Newton sweeps and solution injection (dist/fas.py; 2D only,
    no FMG yet).  Nonlinear capability surplus over the linear-only
    reference (``Poissons_SYCL.cpp:119-123``); see ``cycles/fas.py`` for
    the scheme.  ``use_fmg=True`` runs one FMG-FAS (nested iteration)
    pass first.  Default forcing: 4 (2D) / 6 (3D), matching the Poisson
    entries.
    """
    if ndim not in (2, 3):
        raise ValueError(f"ndim must be 2 or 3, got {ndim}")
    if config is None:
        config = MultigridConfig(finest_level=finest_level)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if forcing is None:
        forcing = 4.0 if ndim == 2 else 6.0
    if mesh is not None and ndim == 2:
        if use_fmg:
            raise ValueError("mesh= FAS does not support FMG yet (use "
                             "the single-device path)")
        if dist_path == "pallas":
            from .dist.fas_pallas import fas_sharded_solve_pallas
            res, _ = fas_sharded_solve_pallas(
                config, mesh, phi=phi, dphi=dphi, forcing=forcing,
                tol=tol, max_cycles=max_cycles, num_cycles=num_cycles,
                jit=jit)
            return res
        from .dist.fas import fas_sharded_solve
        res, _ = fas_sharded_solve(
            config, mesh, phi=phi, dphi=dphi, forcing=forcing,
            tol=tol, max_cycles=max_cycles, num_cycles=num_cycles,
            jit=jit)
        return res
    if ndim == 3:
        from .problems.bratu import NonlinearPoisson3DProblem
        problem = NonlinearPoisson3DProblem(config, phi=phi, dphi=dphi,
                                            forcing=forcing,
                                            **_pad_kw3(config))
    else:
        from .problems.bratu import NonlinearPoissonProblem
        problem = NonlinearPoissonProblem(config, phi=phi, dphi=dphi,
                                          forcing=forcing,
                                          **_pad_kw(config))
    if mesh is not None:   # ndim == 3: generic GSPMD FAS vehicle
        return _run_fas_gspmd(problem, config, mesh, tol, max_cycles,
                              num_cycles, use_fmg, jit)
    return _run_fas(problem, config, tol, max_cycles, num_cycles, use_fmg,
                    jit)


def solve_bratu(
    finest_level: int = 8,
    *,
    lam: float = 1.0,
    ndim: int = 2,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable] = 0.0,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    mesh=None,
    dist_path: str = "jnp",
    jit: bool = True,
) -> SolveResult:
    """Solve the Bratu problem -lap(u) - lam * exp(u) = forcing (FAS).

    Converges to the lower solution branch for lam below the critical
    value (~6.81 on the unit square, ~9.9 on the unit cube with
    ``ndim=3``); see problems/bratu.py.  ``mesh``: optional 2D device
    mesh (distributed FAS; 2D, no FMG) — ``dist_path="jnp"`` (dist/fas.py,
    one halo ring per sweep) or ``"pallas"`` (dist/fas_pallas.py, fused
    K1f/K2f extended-block kernels; one ghost exchange per half-visit).
    """
    if ndim not in (2, 3):
        raise ValueError(f"ndim must be 2 or 3, got {ndim}")
    if config is None:
        config = MultigridConfig(finest_level=finest_level)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if mesh is not None and ndim == 2:
        if use_fmg:
            raise ValueError("mesh= FAS does not support FMG yet (use "
                             "the single-device path)")
        lamf = float(lam)
        phi = lambda u: -lamf * jnp.exp(u)
        if dist_path == "pallas":
            from .dist.fas_pallas import fas_sharded_solve_pallas
            res, _ = fas_sharded_solve_pallas(
                config, mesh, phi=phi, dphi=phi, forcing=forcing,
                tol=tol, max_cycles=max_cycles, num_cycles=num_cycles,
                jit=jit)
            return res
        from .dist.fas import fas_sharded_solve
        res, _ = fas_sharded_solve(
            config, mesh, phi=phi, dphi=phi, forcing=forcing,
            tol=tol, max_cycles=max_cycles, num_cycles=num_cycles,
            jit=jit)
        return res
    if ndim == 3:
        from .problems.bratu import Bratu3DProblem
        problem = Bratu3DProblem(config, lam=lam, forcing=forcing,
                                 **_pad_kw3(config))
    else:
        from .problems.bratu import BratuProblem
        problem = BratuProblem(config, lam=lam, forcing=forcing,
                               **_pad_kw(config))
    if mesh is not None:   # ndim == 3: generic GSPMD FAS vehicle
        return _run_fas_gspmd(problem, config, mesh, tol, max_cycles,
                              num_cycles, use_fmg, jit)
    return _run_fas(problem, config, tol, max_cycles, num_cycles, use_fmg,
                    jit)


def solve_quasilinear_diffusion(
    finest_level: int = 8,
    *,
    gamma: float = 1.0,
    a: Optional[Callable] = None,
    da: Optional[Callable] = None,
    ndim: int = 2,
    config: Optional[MultigridConfig] = None,
    forcing: Union[float, Callable, None] = None,
    tol: Optional[float] = 1e-8,
    max_cycles: int = 100,
    num_cycles: Optional[int] = None,
    use_fmg: bool = False,
    mesh=None,
    dist_path: str = "jnp",
    jit: bool = True,
) -> SolveResult:
    """Solve -div(a(u) grad u) = forcing by FAS multigrid (2D or 3D).

    Default a(u) = 1 + gamma * u^2; pass any traceable positive ``a``
    (``da`` is accepted for API symmetry).  Matrix-free flux operator with
    Picard-Jacobi smoothing (problems/nldiffusion.py).  The coarsest level
    is solved by smoothing; deep Picard sweeps there are cheap (9^2 / 9^3
    grid at the default coarsest_level=3).  Default forcing: 4 (2D) /
    6 (3D).  ``mesh``: optional 2D device mesh — the flux operator
    distributes via the generic GSPMD FAS vehicle (no FMG).
    """
    if ndim not in (2, 3):
        raise ValueError(f"ndim must be 2 or 3, got {ndim}")
    if config is None:
        config = MultigridConfig(finest_level=finest_level,
                                 coarse_solver="smooth",
                                 coarse_smooth_sweeps=40)
    elif config.finest_level != finest_level:
        config = dataclasses.replace(config, finest_level=finest_level)
    if forcing is None:
        forcing = 4.0 if ndim == 2 else 6.0
    if ndim == 3:
        from .problems.nldiffusion import QuasilinearDiffusion3DProblem
        problem = QuasilinearDiffusion3DProblem(config, gamma=gamma, a=a,
                                                da=da, forcing=forcing,
                                                **_pad_kw3(config))
    else:
        from .problems.nldiffusion import QuasilinearDiffusionProblem
        problem = QuasilinearDiffusionProblem(config, gamma=gamma, a=a,
                                              da=da, forcing=forcing,
                                              **_pad_kw(config))
    if mesh is not None and ndim == 2 and dist_path == "pallas":
        # Fused extended-block FAS (dist/fas_pallas.py): Picard-Jacobi
        # windows, edge coefficients recomputed in-VMEM per sweep.
        if use_fmg:
            raise ValueError("mesh= FAS does not support FMG yet")
        from .dist.fas_pallas import fas_sharded_solve_pallas
        res, _ = fas_sharded_solve_pallas(
            config, mesh, a=problem.a, forcing=forcing, tol=tol,
            max_cycles=max_cycles, num_cycles=num_cycles, jit=jit)
        return res
    if mesh is not None:
        return _run_fas_gspmd(problem, config, mesh, tol, max_cycles,
                              num_cycles, use_fmg, jit)
    return _run_fas(problem, config, tol, max_cycles, num_cycles, use_fmg,
                    jit)
