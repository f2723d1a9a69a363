"""Analytic propagator-bank assembly vs. the generic AD path.

The analytic path (solver/analytic.py) must reproduce the AD evaluators'
F/∂F/μ∂²F exactly — the same bar the reference sets for its QuantumDynamics
evaluators (dense finite-difference/structure checks,
/root/reference/test/test_utils.jl:14-27) — and full solves through either
path must land on the same optimum.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.dynamics.expm import (
    expm_frechet_bank,
    expm_squaring,
    frechet_pairs,
    pade_numerator_denominator,
    pade_poly_frechet,
)
from quantumcollocation_tpu.solver.stage_nlp import make_nlp_functions


def _compare_functions(prob, atol=1e-9):
    nlp = prob.nlp
    assert nlp.analytic is not None, "analytic assembly was not built"
    nlp_ad = dataclasses.replace(nlp, analytic=None)
    f_an = make_nlp_functions(nlp, exact_hessian=True)
    f_ad = make_nlp_functions(nlp_ad, exact_hessian=True)
    rng = np.random.default_rng(1)
    Z = jnp.asarray(
        np.asarray(nlp.z0) + 0.05 * rng.standard_normal(nlp.z0.shape)
    )
    lam = jnp.asarray(rng.standard_normal((nlp.T - 1, nlp.s)))
    w = jnp.zeros((nlp.T, nlp.m))

    np.testing.assert_allclose(
        np.asarray(f_an.defects(Z)), np.asarray(f_ad.defects(Z)), atol=atol
    )
    A1, B1, Jg1 = f_an.jac_blocks(Z)
    A2, B2, Jg2 = f_ad.jac_blocks(Z)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=atol)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=atol)
    np.testing.assert_allclose(np.asarray(Jg1), np.asarray(Jg2), atol=atol)
    H1, C1 = f_an.hess_blocks(Z, lam, w)
    H2, C2 = f_ad.hess_blocks(Z, lam, w)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), atol=atol)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C2), atol=atol)
    # grad of the Lagrangian assembled from blocks == reverse AD
    gl_ad = f_ad.grad_lagrangian(Z, lam, w)
    jt = (
        jnp.zeros_like(gl_ad)
        .at[:-1].add(jnp.einsum("tsd,ts->td", A1, lam))
        .at[1:].add(jnp.einsum("tsd,ts->td", B1, lam))
    )
    gl_blocks = f_an.grad_cost(Z) - jt
    np.testing.assert_allclose(
        np.asarray(gl_blocks), np.asarray(gl_ad), atol=atol
    )


def _sys():
    return qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])


class TestBankMath:
    def test_expm_frechet_bank_matches_nested_ad(self):
        rng = np.random.default_rng(0)
        n = 4
        G0 = rng.standard_normal((n, n))
        Gs = rng.standard_normal((2, n, n))

        def X_of(theta):
            a, dt = theta[:2], theta[2]
            return (G0 + a[0] * Gs[0] + a[1] * Gs[1]) * dt

        theta0 = jnp.asarray([0.3, -0.5, 0.2])
        f = lambda th: expm_squaring(X_of(th), order=8, num_squarings=4)
        P_ad = f(theta0)
        dP_ad = jax.jacfwd(f)(theta0)
        d2P_ad = jax.jacfwd(jax.jacfwd(f))(theta0)

        X = X_of(theta0)
        G = G0 + theta0[0] * Gs[0] + theta0[1] * Gs[1]
        dX = jnp.stack([Gs[0] * theta0[2], Gs[1] * theta0[2], G])
        pairs = frechet_pairs(3)
        d2X = jnp.stack(
            [
                Gs[min(k, l)]
                if (l == 2 and k < 2)
                else jnp.zeros((n, n))
                for (k, l) in pairs
            ]
        )
        P, dP, d2P = expm_frechet_bank(X, dX, d2X, order=8, num_squarings=4)
        np.testing.assert_allclose(np.asarray(P), np.asarray(P_ad), atol=1e-12)
        for k in range(3):
            np.testing.assert_allclose(
                np.asarray(dP[k]), np.asarray(dP_ad[:, :, k]), atol=1e-12
            )
        for p, (k, l) in enumerate(pairs):
            np.testing.assert_allclose(
                np.asarray(d2P[p]), np.asarray(d2P_ad[:, :, k, l]), atol=1e-12
            )

    def test_pade_poly_frechet_matches_nested_ad(self):
        rng = np.random.default_rng(2)
        n = 4
        G0 = rng.standard_normal((n, n))
        G1 = rng.standard_normal((n, n))

        def X_of(theta):
            return (G0 + theta[0] * G1) * theta[1]

        theta0 = jnp.asarray([0.4, 0.3])
        fn = lambda th: pade_numerator_denominator(X_of(th), 4)[0]
        fd = lambda th: pade_numerator_denominator(X_of(th), 4)[1]
        X = X_of(theta0)
        G = G0 + theta0[0] * G1
        dX = jnp.stack([G1 * theta0[1], G])
        pairs = frechet_pairs(2)
        d2X = jnp.stack(
            [jnp.zeros((n, n)), G1, jnp.zeros((n, n))]
        )  # pairs (0,0), (0,1), (1,1)
        Nm, dN, d2N, Dm, dD, d2D = pade_poly_frechet(X, dX, d2X, order=4)
        np.testing.assert_allclose(np.asarray(Nm), np.asarray(fn(theta0)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(Dm), np.asarray(fd(theta0)), atol=1e-12)
        d2N_ad = jax.jacfwd(jax.jacfwd(fn))(theta0)
        d2D_ad = jax.jacfwd(jax.jacfwd(fd))(theta0)
        for p, (k, l) in enumerate(pairs):
            np.testing.assert_allclose(
                np.asarray(d2N[p]), np.asarray(d2N_ad[:, :, k, l]), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(d2D[p]), np.asarray(d2D_ad[:, :, k, l]), atol=1e-12
            )


class TestAnalyticAssembly:
    def test_pade_free_time(self):
        _compare_functions(
            qct.UnitarySmoothPulseProblem(
                _sys(), qct.GATES["H"], 13, 0.2,
                piccolo_options=qct.PiccoloOptions(verbose=False),
                rng=np.random.default_rng(0),
            )
        )

    def test_exponential_free_time(self):
        _compare_functions(
            qct.UnitarySmoothPulseProblem(
                _sys(), qct.GATES["H"], 13, 0.2,
                piccolo_options=qct.PiccoloOptions(
                    verbose=False, integrator="exponential"
                ),
                rng=np.random.default_rng(0),
            )
        )

    def test_exponential_fixed_time(self):
        _compare_functions(
            qct.UnitarySmoothPulseProblem(
                _sys(), qct.GATES["H"], 13, 0.2,
                piccolo_options=qct.PiccoloOptions(
                    verbose=False, integrator="exponential", free_time=False
                ),
                rng=np.random.default_rng(0),
            )
        )

    def test_multi_state_shared_bank(self):
        prob = qct.QuantumStateSmoothPulseProblem(
            _sys(),
            [np.array([1, 0], dtype=complex), np.array([0, 1], dtype=complex)],
            [np.array([0, 1], dtype=complex), np.array([1, 0], dtype=complex)],
            13, 0.2,
            piccolo_options=qct.PiccoloOptions(verbose=False),
            rng=np.random.default_rng(0),
        )
        # both state integrators share ONE propagator bank
        assert len(prob.nlp.analytic.groups) == 1
        assert len(prob.nlp.analytic.groups[0].members) == 2
        _compare_functions(prob)

    def test_ad_fallback_for_unsupported_integrators(self):
        # the density (Lindblad) integrator has no analytic assembly yet ->
        # the problem must fall back to the generic AD evaluators
        sys_open = qct.OpenQuantumSystem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]],
            [0.05 * np.asarray(qct.annihilate(2))],
        )
        prob = qct.DensityOperatorSmoothPulseProblem(
            sys_open,
            np.array([1, 0], dtype=complex),
            np.array([0, 1], dtype=complex),
            13, 0.2,
            piccolo_options=qct.PiccoloOptions(verbose=False),
            rng=np.random.default_rng(0),
        )
        assert prob.nlp.analytic is None

    def test_solve_equivalence(self):
        # full solves through the analytic and AD paths reach the same optimum
        kw = dict(
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
            rng=np.random.default_rng(0),
        )
        p_an = qct.UnitarySmoothPulseProblem(
            _sys(), qct.GATES["H"], 21, 0.2,
            piccolo_options=qct.PiccoloOptions(verbose=False), **kw,
        )
        p_ad = qct.UnitarySmoothPulseProblem(
            _sys(), qct.GATES["H"], 21, 0.2,
            piccolo_options=qct.PiccoloOptions(
                verbose=False, jacobian_structure=False
            ),
            **kw,
        )
        assert p_an.nlp.analytic is not None and p_ad.nlp.analytic is None
        p_an.solve(max_iter=40)
        p_ad.solve(max_iter=40)
        assert bool(p_an.result.converged[0]) and bool(p_ad.result.converged[0])
        f_an = float(qct.unitary_rollout_fidelity(p_an.trajectory, _sys()))
        f_ad = float(qct.unitary_rollout_fidelity(p_ad.trajectory, _sys()))
        assert f_an > 0.85 and f_ad > 0.85  # the T=21/Q=100 NLP optimum
        np.testing.assert_allclose(f_an, f_ad, atol=1e-8)
        np.testing.assert_allclose(
            float(p_an.result.objective[0]),
            float(p_ad.result.objective[0]),
            rtol=1e-9,
        )


class TestFusedAssemblyKernel:
    """ops/pallas_dyn_assembly: ONE kernel == banks + dyn_eval +
    defect_curvature, in scaled units (interpret mode on CPU)."""

    def _check(self, prob, atol=5e-5):
        nlp = prob.nlp
        analytic = nlp.analytic
        assert analytic is not None
        B = 3
        rng = np.random.default_rng(3)
        Z = jnp.asarray(
            np.asarray(nlp.z0)[None]
            + 0.05 * rng.standard_normal((B, *nlp.z0.shape)),
            jnp.float64,
        )
        lam = jnp.asarray(
            rng.standard_normal((B, nlp.T - 1, nlp.s)), jnp.float64
        )
        out = analytic.assembly_batched(
            Z, lam, use_kernel=True, interpret=True
        )
        assert out is not None
        F_k, A_k, B_k, Hc_k, Cc_k = out

        def ref_one(Zi, lami):
            F, A, Bj, aux = analytic.dyn_eval(Zi, second_order=True)
            Hc, Cc = analytic.defect_curvature(lami, aux)
            return F, A, Bj, Hc, Cc

        F_r, A_r, B_r, Hc_r, Cc_r = jax.vmap(ref_one)(Z, lam)
        np.testing.assert_allclose(
            np.asarray(F_k), np.asarray(F_r), atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(A_k), np.asarray(A_r), atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(B_k), np.asarray(B_r), atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(Hc_k), np.asarray(Hc_r), atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(Cc_k), np.asarray(Cc_r), atol=atol
        )

    def test_exp_free_time(self):
        prob = qct.UnitarySmoothPulseProblem(
            _sys(), qct.GATES["H"], 9, 0.2,
            ipopt_options=qct.SolverOptions(print_level=1),
            piccolo_options=qct.PiccoloOptions(
                verbose=False, integrator="exponential"
            ),
            rng=np.random.default_rng(0),
        )
        self._check(prob)

    def test_exp_fixed_time(self):
        prob = qct.UnitarySmoothPulseProblem(
            _sys(), qct.GATES["H"], 9, 0.2,
            ipopt_options=qct.SolverOptions(print_level=1),
            piccolo_options=qct.PiccoloOptions(
                verbose=False, integrator="exponential", free_time=False
            ),
            rng=np.random.default_rng(0),
        )
        self._check(prob)

    def test_pade_free_time(self):
        prob = qct.UnitarySmoothPulseProblem(
            _sys(), qct.GATES["H"], 9, 0.2,
            ipopt_options=qct.SolverOptions(print_level=1),
            piccolo_options=qct.PiccoloOptions(
                verbose=False, integrator="pade", pade_order=4
            ),
            rng=np.random.default_rng(0),
        )
        self._check(prob)

    def test_ket_pair_shared_bank(self):
        # two kets sharing one system/drive (multi-member group)
        sys_q = _sys()
        psi0 = [np.array([1, 0], complex), np.array([0, 1], complex)]
        psi1 = [np.array([0, 1], complex), np.array([1, 0], complex)]
        prob = qct.QuantumStateSmoothPulseProblem(
            sys_q, psi0, psi1, 9, 0.2,
            ipopt_options=qct.SolverOptions(print_level=1),
            piccolo_options=qct.PiccoloOptions(
                verbose=False, integrator="exponential"
            ),
            rng=np.random.default_rng(0),
        )
        self._check(prob)

    def test_full_solve_fused_matches_unfused(self):
        # end-to-end: 12 IPM iterations with the fused kernel (interpret)
        # land on the same iterates as the banks path
        import dataclasses as _dc

        def build(fused):
            return qct.UnitarySmoothPulseProblem(
                _sys(), qct.GATES["H"], 11, 0.2, Q=100.0, R=1e-2,
                ipopt_options=qct.SolverOptions(
                    print_level=1, tol=1e-6, fused_assembly=fused
                ),
                piccolo_options=qct.PiccoloOptions(verbose=False),
                rng=np.random.default_rng(0),
            )

        p_off = build(False)
        p_on = build(True)
        assert p_on.solver.fused_assembly_on
        assert not p_off.solver.fused_assembly_on
        # route the fused path through interpret mode on CPU
        analytic = p_on.solver.nlp.analytic
        orig = analytic.assembly_batched
        patched = lambda Zb, lb, **kw: orig(
            Zb, lb, use_kernel=True, interpret=True
        )
        object.__setattr__(analytic, "assembly_batched", patched)
        Z0 = np.asarray(p_off.initial_decision(2))
        st_off = p_off.solver._solve_loop(p_off.solver.init_state(Z0), 12)
        st_on = p_on.solver._solve_loop(p_on.solver.init_state(Z0), 12)
        np.testing.assert_allclose(
            np.asarray(st_on.Z), np.asarray(st_off.Z), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st_on.kkt_err), np.asarray(st_off.kkt_err),
            rtol=1e-4, atol=1e-8,
        )
