"""Cyclic-reduction KKT backend: exactness vs the sequential-scan path,
multi-rhs columns, odd/even/power-of-two horizons, and full-solve parity."""

import jax
import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.solver.kkt import solve_kkt
from quantumcollocation_tpu.solver.kkt_cr import solve_kkt_cr


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


def _vmapped(fn, *args, delta_c=1e-8):
    return jax.vmap(
        lambda h, c, a, b, r1, r2: fn(h, c, a, b, r1, r2, delta_c)
    )(*[jnp.asarray(x) for x in args])


class TestCyclicReductionKKT:
    def test_matches_scan_backend(self):
        args = _random_kkt()
        dz_ref, nu_ref, _ = _vmapped(solve_kkt, *args)
        dz, nu, ok = _vmapped(solve_kkt_cr, *args)
        assert bool(ok.all())
        np.testing.assert_allclose(np.asarray(dz), np.asarray(dz_ref), atol=1e-9)
        np.testing.assert_allclose(np.asarray(nu), np.asarray(nu_ref), atol=1e-9)

    def test_horizon_sweep(self):
        # T not a power of two (padding), exactly a power of two, tiny, odd
        for T in (2, 3, 4, 5, 8, 9, 17):
            args = _random_kkt(Bt=2, T=T, seed=T)
            dz_ref, nu_ref, _ = _vmapped(solve_kkt, *args)
            dz, nu, ok = _vmapped(solve_kkt_cr, *args)
            assert bool(ok.all()), T
            np.testing.assert_allclose(
                np.asarray(dz), np.asarray(dz_ref), atol=1e-9, err_msg=f"T={T}"
            )
            np.testing.assert_allclose(
                np.asarray(nu), np.asarray(nu_ref), atol=1e-9, err_msg=f"T={T}"
            )

    def test_multi_column_rhs(self):
        # (T, d, K) rhs (the L-BFGS SMW path) solves each column exactly as
        # a separate single-rhs solve would
        H, C, A, B, _, _ = _random_kkt(Bt=1, T=5, seed=7)
        rng = np.random.default_rng(8)
        K = 3
        RZ = jnp.asarray(rng.normal(size=(5, 5, K)))
        RNU = jnp.asarray(rng.normal(size=(4, 3, K)))
        args = [jnp.asarray(x[0]) for x in (H, C, A, B)]
        DZ, NU, ok = solve_kkt_cr(*args, RZ, RNU, 1e-8)
        assert DZ.shape == (5, 5, K) and NU.shape == (4, 3, K)
        assert bool(ok)
        for k in range(K):
            dzk, nuk, _ = solve_kkt_cr(*args, RZ[..., k], RNU[..., k], 1e-8)
            np.testing.assert_allclose(
                np.asarray(DZ[..., k]), np.asarray(dzk), atol=1e-10
            )
            np.testing.assert_allclose(
                np.asarray(NU[..., k]), np.asarray(nuk), atol=1e-10
            )

    def test_full_solve_with_cr_backend(self):
        # end-to-end: the cr backend must CONVERGE to the same KKT point as
        # the xla backend on the flagship Hadamard problem.  (Step-by-step
        # parity is not expected: cr's residual-gated acceptance regularizes
        # slightly more often than the scan's Cholesky criterion, so the
        # paths differ — but the optimum must not.)
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        out = {}
        for backend in ("xla", "cr"):
            prob = qct.UnitarySmoothPulseProblem(
                sys, qct.GATES["H"], 21, 0.2,
                ipopt_options=qct.SolverOptions(
                    print_level=1, tol=1e-8, kkt_backend=backend
                ),
                piccolo_options=qct.PiccoloOptions(verbose=False),
                rng=np.random.default_rng(0),
            )
            res = prob.solver.solve(prob.initial_decision(1), max_iter=120)
            out[backend] = (bool(res.converged[0]), float(res.objective[0]))
        assert out["xla"][0] and out["cr"][0], out
        assert abs(out["xla"][1] - out["cr"][1]) < 1e-8 * max(
            1.0, abs(out["xla"][1])
        ), out

    def test_lbfgs_cr_converges_to_xla_optimum(self):
        # quasi_newton="lbfgs" on the cr backend (multi-column SMW through
        # one parallel-in-T reduction) must reach the same optimum as the
        # xla SMW path.  L-BFGS dual infeasibility floors around 2e-6 on
        # this problem (the quasi-Newton tail — measured stalling even at
        # max_iter=400), which is exactly what Ipopt's acceptable-level
        # termination exists for: tol=1e-6 unreachable, acceptable_tol=1e-5
        # sustained for acceptable_iter iterations declares success
        # (Ipopt options acceptable_tol/acceptable_iter).
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        objs = {}
        for backend in ("xla", "cr"):
            prob = qct.UnitarySmoothPulseProblem(
                sys, qct.GATES["H"], 11, 0.2,
                ipopt_options=qct.SolverOptions(
                    print_level=1, tol=1e-6, kkt_backend=backend,
                    acceptable_tol=1e-5, acceptable_iter=8,
                ),
                piccolo_options=qct.PiccoloOptions(
                    verbose=False, eval_hessian=False
                ),
                rng=np.random.default_rng(0),
            )
            res = prob.solver.solve(prob.initial_decision(1), max_iter=120)
            assert bool(res.converged[0]), backend
            assert float(res.kkt_err[0]) < 1e-5, backend
            objs[backend] = float(res.objective[0])
        assert abs(objs["xla"] - objs["cr"]) < 1e-6 * max(
            1.0, abs(objs["xla"])
        )
