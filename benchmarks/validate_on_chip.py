#!/usr/bin/env python
"""On-hardware validation suite: every Pallas kernel vs its jnp reference.

Interpret mode doesn't model Mosaic's hardware constraints (it missed both
the bf16-rotate unsupport and would have missed the conv-precision issue),
so this script re-runs the kernel correctness checks on the real chip.
Run after any kernel change:  python benchmarks/validate_on_chip.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_multigrid.utils.profiling import enable_compilation_cache
enable_compilation_cache()

from tpu_multigrid.core import ops
from tpu_multigrid.core.operators import diffusion_op
from tpu_multigrid.kernels import stencil as K, transfer as T, varstencil as V

FAILURES = []


def check(name, got, want, tol):
    got = jnp.asarray(got, jnp.float32)
    want = jnp.asarray(want, jnp.float32)
    if got.shape != want.shape and got.ndim == want.ndim:
        # Paths with different padded layouts (e.g. the fused zebra tier
        # re-pads to S mult 256): crop to the common physical window —
        # everything outside nodes 0..n is zero by invariant.
        sl = tuple(slice(0, min(a, b)) for a, b in zip(got.shape, want.shape))
        got, want = got[sl], want[sl]
    err = float(jnp.max(jnp.abs(got - want)))
    status = "ok " if err <= tol else "FAIL"
    print(f"{status} {name:55s} max err {err:.3e} (tol {tol:.0e})", flush=True)
    if err > tol:
        FAILURES.append(name)


def grids(S, n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    u = np.zeros((S, S), np.float32)
    b = np.zeros((S, S), np.float32)
    u[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    b[1:n, 1:n] = rng.standard_normal((n - 1, n - 1))
    return jnp.asarray(u, dtype), jnp.asarray(b, dtype)


def main():
    print(f"device: {jax.devices()[0]}")
    for S, n in [(768, 512), (2816, 2048)]:
        u, b = grids(S, n)
        nc, Sc = n // 2, S // 2 + 128

        check(f"jacobi k=3 S={S}",
              K.jacobi_sweeps(u, b, n, 2 / 3, 3),
              ops.jacobi_sweeps(u, b, n, 2 / 3, 3), 5e-6)
        gu, gr = K.jacobi_sweeps_residual(u, b, n, 2 / 3, 2)
        wu = ops.jacobi_sweeps(u, b, n, 2 / 3, 2)
        check(f"jacobi+residual u S={S}", gu, wu, 5e-6)
        check(f"jacobi+residual r S={S}", gr, ops.residual(wu, b, n), 2e-5)
        check(f"rbgs k=2 S={S}",
              K.rbgs_sweeps(u, b, n, 2),
              ops.redblack_gs_sweeps(u, b, n, 2), 5e-6)

        check(f"restrict_fw_pallas S={S}",
              T.restrict_fw_pallas(u, n, Sc),
              ops.restrict_fw(u, n, Sc), 2e-5)
        e = grids(Sc, nc, seed=3)[0]
        check(f"prolong_add_pallas S={S}",
              T.prolong_add_pallas(u, e, n),
              ops.mask_interior(u + ops.prolong(e, nc, S), n), 5e-6)

        ku, krc = T.smooth_restrict(u, b, n, Sc, 2)
        wu2 = ops.jacobi_sweeps(u, b, n, 2 / 3, 2)
        check(f"K1 smooth_restrict u S={S}", ku, wu2, 5e-6)
        check(f"K1 smooth_restrict rc S={S}", krc,
              ops.restrict_fw(ops.residual(wu2, b, n), n, Sc), 5e-5)
        k2 = T.prolong_smooth(u, b, e, n, 2)
        check(f"K2 prolong_smooth S={S}", k2,
              ops.jacobi_sweeps(u + ops.prolong(e, nc, S), b, n, 2 / 3, 2),
              5e-6)
        k2u, k2n = T.prolong_smooth_resnorm(u, b, e, n, 2)
        check(f"K2 fused resnorm S={S}", k2n,
              ops.norm2(ops.residual(np.asarray(k2), b, n)), 2e-4)

        # variable-coefficient kernels
        rng = np.random.default_rng(1)
        op = diffusion_op(jnp.asarray(0.5 + rng.random((n, n)), jnp.float32),
                          n, S)
        vu, vr = V.var_smooth_residual(u, b, V._flat_coef(op), n, 2)
        wvu = op.smooth(u, b, smoother="jacobi", omega=2 / 3, sweeps=2)
        check(f"var smooth u S={S}", vu, wvu, 5e-6)
        check(f"var smooth r S={S}", vr, op.residual(wvu, b), 2e-5)

        # bf16 storage path
        u16, b16 = u.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        check(f"bf16 jacobi k=2 S={S}",
              K.jacobi_sweeps(u16, b16, n, 2 / 3, 2), wu2, 3e-2)

    # r3 session-2 problem families end-to-end (jnp tier on real
    # hardware: rolls/reshape-interleave transfers, no lane-strided ops).
    import math

    import tpu_multigrid as mg

    cfg = mg.MultigridConfig(finest_level=7, coarsest_level=3,
                             smoother="chebyshev", nu1=3, nu2=2,
                             use_pallas=False)
    r = mg.solve_anisotropic(7, eps_x=100.0, eps_y=1.0, coarsening="semi",
                             config=cfg, num_cycles=6)
    h = np.asarray(r.res_history)
    check("semicoarsen aniso 100:1 reduction", h[6] / h[0], 0.0, 5e-4)

    ccfg = mg.MultigridConfig(finest_level=7, coarsest_level=3,
                              smoother="rbgs", nu1=2, nu2=2,
                              use_pallas=False)
    r = mg.solve_convection_diffusion(7, eps=0.01, bx=1.0, by=0.5,
                                      config=ccfg, num_cycles=6)
    h = np.asarray(r.res_history)
    check("convection upwind reduction", h[6] / h[0], 0.0, 5e-3)

    r = mg.solve_poisson(7, order=4, config=cfg, num_cycles=6,
                         forcing=lambda x, y: 2 * math.pi ** 2
                         * jnp.sin(math.pi * x) * jnp.sin(math.pi * y))
    h = np.asarray(r.res_history)
    check("mehrstellen order-4 reduction", h[6] / h[0], 0.0, 5e-4)

    r = mg.solve_poisson(7, bc="periodic", config=cfg, num_cycles=6,
                         forcing=lambda x, y: 8 * math.pi ** 2
                         * jnp.sin(2 * math.pi * x)
                         * jnp.cos(2 * math.pi * y))
    h = np.asarray(r.res_history)
    check("periodic torus reduction", h[6] / h[0], 0.0, 5e-4)

    # Fused 3D var-coefficient tier (K1v₃/K2v₃): end-to-end at level 7
    # (finest pair fused; Sx=256) + bitwise-level parity vs the jnp tier.
    dcfg = mg.MultigridConfig(finest_level=7, coarsest_level=3,
                              smoother="chebyshev", nu1=3, nu2=2,
                              use_pallas=True)
    a_fn = lambda x, y, z: 1.0 + x + 2.0 * y + z
    rv = mg.solve_diffusion3d(7, coefficient=a_fn, config=dcfg,
                              num_cycles=6, tol=None)
    h = np.asarray(rv.res_history)
    check("3D var fused (K1v3/K2v3) reduction", h[6] / h[0], 0.0, 5e-4)
    import dataclasses as _dc
    rj = mg.solve_diffusion3d(
        7, coefficient=a_fn,
        config=_dc.replace(dcfg, use_pallas=False), num_cycles=6,
        tol=None)
    check("3D var fused vs jnp solution", np.asarray(rv.u),
          np.asarray(rj.u), 5e-6)

    # FAS nonlinear tier (r3 session 7): Bratu pointwise + quasilinear
    # flux families end-to-end on hardware (f32; reduction-bounded, the
    # absolute floor is the usual eps*n^2 f32 scaling).
    r = mg.solve_bratu(7, lam=5.0, config=mg.MultigridConfig(
        finest_level=7, coarsest_level=3), num_cycles=8, tol=None)
    h = np.asarray(r.res_history)
    check("FAS bratu lam=5 reduction", h[8] / h[0], 0.0, 5e-4)

    # Fused FAS super-kernels (K1f/K2f, r4) vs the jnp FAS tier.
    fcfg = mg.MultigridConfig(finest_level=8, coarsest_level=4,
                              use_pallas=True)
    rf = mg.solve_bratu(8, lam=5.0, config=fcfg, num_cycles=6, tol=None)
    h = np.asarray(rf.res_history)
    check("FAS bratu fused K1f/K2f reduction", h[6] / h[0], 0.0, 5e-3)
    rfj = mg.solve_bratu(8, lam=5.0,
                         config=_dc.replace(fcfg, use_pallas=False),
                         num_cycles=6, tol=None)
    check("FAS bratu fused vs jnp solution", np.asarray(rf.u),
          np.asarray(rfj.u), 5e-6)

    # Quasilinear fused FAS (Picard-Jacobi windows, qfas_* kernels).
    # The flux operator has no dense coarse Newton, so the coarsest
    # visit is Picard sweeps — 40 of them (the 17² coarsest at level 4
    # stalls the whole solve with the default 10; measured on-chip,
    # solution parity was unaffected at 2.98e-08).
    qcfg = _dc.replace(fcfg, coarse_smooth_sweeps=40, coarsest_level=3)
    rq = mg.solve_quasilinear_diffusion(8, gamma=2.0, config=qcfg,
                                        num_cycles=6, tol=None)
    h = np.asarray(rq.res_history)
    check("FAS quasilinear fused reduction", h[6] / h[0], 0.0, 5e-3)
    rqj = mg.solve_quasilinear_diffusion(
        8, gamma=2.0, config=_dc.replace(qcfg, use_pallas=False),
        num_cycles=6, tol=None)
    check("FAS quasilinear fused vs jnp solution", np.asarray(rq.u),
          np.asarray(rqj.u), 5e-6)

    # 3D fused FAS (K1f₃/K2f₃, kernels/fas3d.py) vs the jnp 3D FAS tier.
    f3cfg = mg.MultigridConfig(finest_level=7, coarsest_level=4,
                               use_pallas=True)
    rf3 = mg.solve_bratu(7, lam=4.0, ndim=3, config=f3cfg, num_cycles=5,
                         tol=None)
    h = np.asarray(rf3.res_history)
    check("3D FAS bratu fused reduction", h[5] / h[0], 0.0, 5e-3)
    rf3j = mg.solve_bratu(7, lam=4.0, ndim=3,
                          config=_dc.replace(f3cfg, use_pallas=False),
                          num_cycles=5, tol=None)
    check("3D FAS bratu fused vs jnp solution", np.asarray(rf3.u),
          np.asarray(rf3j.u), 5e-6)

    # Mehrstellen on the fused tier via static 9-point stencil weights.
    # Level 7 (the f32 residual floor scales ~n²; at level 8 the floor
    # itself is 8e-4 and would fail a 5e-4 reduction bar — measured).
    m9 = mg.MultigridConfig(finest_level=7, coarsest_level=4,
                            smoother="chebyshev", nu1=3, nu2=2,
                            use_pallas=True)
    r9 = mg.solve_poisson(7, order=4, config=m9, num_cycles=6, tol=None,
                          forcing=lambda x, y: 2 * math.pi ** 2
                          * jnp.sin(math.pi * x) * jnp.sin(math.pi * y))
    h = np.asarray(r9.res_history)
    check("mehrstellen fused (stencil9) reduction", h[6] / h[0], 0.0,
          5e-4)
    r9j = mg.solve_poisson(7, order=4,
                           config=_dc.replace(m9, use_pallas=False),
                           num_cycles=6, tol=None,
                           forcing=lambda x, y: 2 * math.pi ** 2
                           * jnp.sin(math.pi * x) * jnp.sin(math.pi * y))
    # 2e-5: the static-stencil kernel groups the 9-point off-sum
    # differently from Const9Op._off_sum (per-term c·nbr vs
    # (4·cross+diag)/6) — accumulated f32 rounding drift between two
    # iterates at their own floors, not operator error.
    check("mehrstellen fused vs jnp solution", np.asarray(r9.u),
          np.asarray(r9j.u), 2e-5)
    r = mg.solve_quasilinear_diffusion(7, gamma=2.0, num_cycles=8,
                                       tol=None)
    h = np.asarray(r.res_history)
    check("FAS quasilinear gamma=2 reduction", h[8] / h[0], 0.0, 5e-4)

    # Fused zebra level-visit super-kernels (K1z/K2z) vs the jnp line
    # smoother: same anisotropic solve, pallas vs jnp iterates.
    zcfg = mg.MultigridConfig(finest_level=7, coarsest_level=3,
                              smoother="zebra_x", nu1=1, nu2=1,
                              use_pallas=True)
    rz = mg.solve_anisotropic(7, eps_x=1.0, eps_y=0.05,
                              angle=math.radians(45), config=zcfg,
                              num_cycles=6, tol=None)
    h = np.asarray(rz.res_history)
    check("zebra K1z/K2z aniso reduction", h[6] / h[0], 0.0, 5e-3)
    rzj = mg.solve_anisotropic(7, eps_x=1.0, eps_y=0.05,
                               angle=math.radians(45),
                               config=_dc.replace(zcfg, use_pallas=False),
                               num_cycles=6, tol=None)
    check("zebra K1z/K2z vs jnp solution", np.asarray(rz.u),
          np.asarray(rzj.u), 5e-6)

    # 3D semi-coarsened multigrid (core/semicoarsen3.py) on hardware.
    r3 = mg.solve_anisotropic3d(5, eps_x=1.0, eps_y=1.0, eps_z=100.0,
                                config=cfg, num_cycles=6, tol=None)
    h = np.asarray(r3.res_history)
    check("3D semicoarsen aniso 100:1 reduction", h[6] / h[0], 0.0, 5e-3)

    # --- r4 additions ---

    # Nonsymmetric 9-plane fused tier: upwind convection rides K1v/K2v
    # (the r3 is_symmetric bail is gone) — fused vs jnp solution parity.
    ncfg = mg.MultigridConfig(finest_level=7, coarsest_level=3,
                              smoother="rbgs", nu1=2, nu2=2,
                              use_pallas=True)
    rn = mg.solve_convection_diffusion(7, eps=0.01, bx=1.0, by=0.5,
                                       config=ncfg, num_cycles=6,
                                       tol=None)
    h = np.asarray(rn.res_history)
    check("nonsym 9-plane fused reduction", h[6] / h[0], 0.0, 5e-3)
    rnj = mg.solve_convection_diffusion(
        7, eps=0.01, bx=1.0, by=0.5,
        config=_dc.replace(ncfg, use_pallas=False), num_cycles=6,
        tol=None)
    check("nonsym 9-plane fused vs jnp solution", np.asarray(rn.u),
          np.asarray(rnj.u), 2e-5)

    # 3D mixed-BC box-masked fused kernels vs jnp.
    mcfg = mg.MultigridConfig(finest_level=6, coarsest_level=3,
                              smoother="chebyshev", nu1=3, nu2=2,
                              use_pallas=True)
    rm = mg.solve_poisson3d(6, neumann=("zlo", "ylo"), config=mcfg,
                            num_cycles=6, tol=None)
    h = np.asarray(rm.res_history)
    check("3D mixed-BC box fused reduction", h[6] / h[0], 0.0, 5e-3)
    rmj = mg.solve_poisson3d(6, neumann=("zlo", "ylo"),
                             config=_dc.replace(mcfg, use_pallas=False),
                             num_cycles=6, tol=None)
    check("3D mixed-BC box fused vs jnp solution", np.asarray(rm.u),
          np.asarray(rmj.u), 5e-6)

    # 3D rotated anisotropic tensor (19-point Rotated3DOp) — jnp and the
    # fused static-stencil (stencil27) tiers.
    rr = mg.solve_anisotropic3d(5, eps_x=1.0, eps_y=0.05, eps_z=1.0,
                                angle=math.radians(30), plane="xy",
                                num_cycles=6, tol=None)
    h = np.asarray(rr.res_history)
    check("3D rotated tensor reduction", h[6] / h[0], 0.0, 5e-2)
    r27cfg = mg.MultigridConfig(finest_level=7, coarsest_level=3,
                                smoother="chebyshev", nu1=3, nu2=2,
                                use_pallas=True)
    rrf = mg.solve_anisotropic3d(7, eps_x=1.0, eps_y=0.05, eps_z=1.0,
                                 angle=math.radians(30), plane="xy",
                                 config=r27cfg, num_cycles=6, tol=None)
    h = np.asarray(rrf.res_history)
    check("3D rotated fused (stencil27) reduction", h[6] / h[0], 0.0,
          5e-2)
    rrj = mg.solve_anisotropic3d(7, eps_x=1.0, eps_y=0.05, eps_z=1.0,
                                 angle=math.radians(30), plane="xy",
                                 config=_dc.replace(r27cfg,
                                                    use_pallas=False),
                                 num_cycles=6, tol=None)
    check("3D rotated fused vs jnp solution", np.asarray(rrf.u),
          np.asarray(rrj.u), 2e-5)

    # 3D constant-wind upwind convection on the fused stencil27 tier.
    c27cfg = mg.MultigridConfig(finest_level=7, coarsest_level=3,
                                smoother="rbgs", nu1=2, nu2=2,
                                use_pallas=True)
    c27 = mg.solve_convection_diffusion3d(7, eps=0.01, bx=1.0, by=0.5,
                                          bz=0.25, config=c27cfg,
                                          num_cycles=6, tol=None)
    h = np.asarray(c27.res_history)
    check("3D upwind fused (stencil27) reduction", h[6] / h[0], 0.0,
          5e-3)
    c27j = mg.solve_convection_diffusion3d(
        7, eps=0.01, bx=1.0, by=0.5, bz=0.25,
        config=_dc.replace(c27cfg, use_pallas=False), num_cycles=6,
        tol=None)
    check("3D upwind fused vs jnp solution", np.asarray(c27.u),
          np.asarray(c27j.u), 2e-5)

    # 3D Mehrstellen on the fused stencil27 tier.
    m27 = mg.solve_poisson3d(7, order=4, config=r27cfg, num_cycles=6,
                             tol=None,
                             forcing=lambda x, y, z: 3 * math.pi ** 2
                             * jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
                             * jnp.sin(math.pi * z))
    h = np.asarray(m27.res_history)
    check("3D mehrstellen fused (stencil27) reduction", h[6] / h[0],
          0.0, 5e-3)
    m27j = mg.solve_poisson3d(7, order=4,
                              config=_dc.replace(r27cfg,
                                                 use_pallas=False),
                              num_cycles=6, tol=None,
                              forcing=lambda x, y, z: 3 * math.pi ** 2
                              * jnp.sin(math.pi * x)
                              * jnp.sin(math.pi * y)
                              * jnp.sin(math.pi * z))
    check("3D mehrstellen fused vs jnp solution", np.asarray(m27.u),
          np.asarray(m27j.u), 2e-5)

    # Distributed tiers on a (1,1) mesh — the real chip has one device;
    # this drives the actual dist code paths (padded layouts, halo
    # schedule, compensated kernels) on hardware.
    from tpu_multigrid.dist.mesh import make_grid_mesh
    from tpu_multigrid.dist.refine_pallas import refined_sharded_solve_pallas
    m11 = make_grid_mesh(shape=(1, 1), devices=jax.devices()[:1])
    rcfg = mg.MultigridConfig(finest_level=9, coarsest_level=4,
                              mesh_shape=(1, 1))
    # 10 iterations: the refined iterate contracts at the inner-cycle
    # rate (~0.19/iter for jacobi(2,2) — measured 5.8e-5 after 6), and
    # the bar must sit BELOW the plain-f32 floor at this size (~3e-5
    # relative) to actually demonstrate the compensated machinery.
    rres, _ = refined_sharded_solve_pallas(rcfg, m11, num_cycles=10,
                                           ts=True, ds_levels=2,
                                           replicate_below=64)
    h = np.asarray(rres.res_history)
    check("dist refined (ts+ds, fused) reduction", h[10] / h[0], 0.0,
          1e-6)

    from tpu_multigrid import topo as _topo
    thier = _topo.build_structured_topo_hierarchy(5, 2)
    tu, th = _topo.solve_topo(thier, thier.b_levels[0], num_cycles=6,
                              mesh=m11)
    tu1, th1 = _topo.solve_topo(thier, thier.b_levels[0], num_cycles=6)
    th, th1 = np.asarray(th), np.asarray(th1)
    check("dist topo rowpart reduction", th[6] / th[0], 0.0, 5e-3)
    check("dist topo rowpart vs single-chip", tu, np.asarray(tu1), 1e-5)

    # --- r5 additions ---

    # Wrap-aware fused periodic tier: identical reduction to the jnp
    # torus cycle (cycles/periodic_fused.py).
    import dataclasses as _dc
    from tpu_multigrid.cycles import periodic_fused as _pf, solve_fixed
    from tpu_multigrid.problems.periodic import PeriodicPoissonProblem
    pcfg = mg.MultigridConfig(finest_level=8, coarsest_level=4,
                              smoother="chebyshev", nu1=3, nu2=2,
                              use_pallas=True)
    pprob = PeriodicPoissonProblem(
        pcfg, forcing=lambda x, y: 8 * math.pi ** 2
        * jnp.sin(2 * math.pi * x) * jnp.cos(2 * math.pi * y))
    phier = jax.device_put(pprob.hierarchy)
    pb = pprob.rhs()
    pres = jax.jit(lambda h, bb: _pf.solve_fixed_periodic(
        h, pcfg, bb, 6))(phier, pb)
    presj = jax.jit(lambda h, bb: solve_fixed(
        h, _dc.replace(pcfg, use_pallas=False), bb, 6))(phier, pb)
    hp = np.asarray(pres.res_history)
    hpj = np.asarray(presj.res_history)
    check("periodic fused reduction", hp[6] / hp[0], 0.0, 5e-3)
    check("periodic fused vs jnp reduction", hp[6] / hp[0],
          hpj[6] / hpj[0], 1e-5)

    # Numbering-normalization route (topo.solve_permuted) vs the ELL
    # tier on the same permuted system.
    prng = np.random.default_rng(7)
    pperms = [prng.permutation((2 ** l - 1) ** 2) for l in (6, 5, 4)]
    pth = _topo.build_structured_topo_hierarchy_sparse(6, 4, perms=pperms)
    pbv = pth.b_levels[0]
    pu_e, _ = _topo.solve_topo(pth, pbv, num_cycles=30)
    pu_p, _ = _topo.solve_permuted(6, pbv, pperms[0], num_cycles=12)
    check("solve_permuted vs ELL route", np.asarray(pu_p),
          np.asarray(pu_e), 1e-4)

    # Dist-refined runner reuse: one jitted program, repeated calls,
    # bitwise-equal histories (the clean-timing methodology).
    from tpu_multigrid.dist.pallas_cycle import build_pallas_poisson
    pre = build_pallas_poisson(_dc.replace(rcfg, cycle="V"), m11,
                               replicate_below=64)
    rrun, rb, rh, _ = refined_sharded_solve_pallas(
        rcfg, m11, num_cycles=4, ts=True, ds_levels=2,
        replicate_below=64, prebuilt=pre, return_runner=True)
    _, h1_, _, _ = rrun(rb, rh)
    _, h2_, _, _ = rrun(rb, rh)
    check("dist refined runner reuse bitwise", np.asarray(h1_),
          np.asarray(h2_), 0.0)

    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    print("\nall on-chip validations passed")


if __name__ == "__main__":
    main()
