"""Tests for expm kernels, integrators, and rollouts.

Integrator correctness is validated against dense finite differences and
scipy's expm — the pattern of the reference's `dense` fixture
(/root/reference/test/test_utils.jl:14-27) and integrator test scripts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

import quantumcollocation_tpu as qct


class TestExpm:
    def test_pade_coefficients_order4(self):
        # q_2(x) = 1 + x/2 + x^2/12
        c = qct.pade_coefficients(4)
        np.testing.assert_allclose(c, [1.0, 0.5, 1.0 / 12.0])

    def test_expm_matches_scipy(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(6, 6)) * 0.8
        ours = np.asarray(qct.expm_squaring(jnp.asarray(X), order=8, num_squarings=4))
        ref = sla.expm(X)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_expm_large_norm_with_squaring(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(4, 4)) * 5.0
        s = qct.default_num_squarings(float(np.linalg.norm(X, 2)))
        ours = np.asarray(qct.expm_squaring(jnp.asarray(X), order=8, num_squarings=s))
        np.testing.assert_allclose(ours, sla.expm(X), atol=1e-8)

    def test_vmap_expm(self):
        rng = np.random.default_rng(2)
        Xs = rng.normal(size=(10, 4, 4))
        outs = jax.vmap(lambda X: qct.expm_squaring(X, order=8, num_squarings=4))(
            jnp.asarray(Xs)
        )
        for i in range(10):
            np.testing.assert_allclose(outs[i], sla.expm(Xs[i]), atol=1e-9)


def _hadamard_traj_and_system(T=6, free_time=True, seed=0):
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    rng = np.random.default_rng(seed)
    traj = qct.initialize_unitary_trajectory(
        qct.GATES["H"], T, 0.2, 2,
        [np.ones(2), np.ones(2), np.ones(2)],
        free_time=free_time, rng=rng,
    )
    return traj, sys


class TestIntegrators:
    def test_exponential_defect_zero_on_rollout(self):
        traj, sys = _hadamard_traj_and_system()
        # build rollout-consistent states -> defects must vanish
        v0 = traj.initial["Ũ⃗"]
        Us = qct.unitary_rollout(v0, traj["a"], traj.get_timesteps(), sys)
        traj = traj.update("Ũ⃗", Us)
        integ = qct.UnitaryExponentialIntegrator(
            "Ũ⃗", "a", sys, num_squarings=8, order=12
        )
        for t in range(traj.T - 1):
            d = integ.defect(traj.data[t], traj.data[t + 1], traj)
            np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-9)

    def test_pade_defect_consistent_with_exponential(self):
        traj, sys = _hadamard_traj_and_system()
        # Padé defect at the exact propagated state should be ~0 for small dt
        v0 = traj.initial["Ũ⃗"]
        Us = qct.unitary_rollout(v0, traj["a"], traj.get_timesteps(), sys)
        traj = traj.update("Ũ⃗", Us)
        integ = qct.UnitaryPadeIntegrator("Ũ⃗", "a", sys, order=12)
        d = integ.defect(traj.data[0], traj.data[1], traj)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-8)

    def test_derivative_integrator(self):
        traj, _ = _hadamard_traj_and_system()
        integ = qct.DerivativeIntegrator("a", "da")
        zt = np.asarray(traj.data[0])
        ztp1 = np.asarray(traj.data[1])
        d = np.asarray(integ.defect(jnp.asarray(zt), jnp.asarray(ztp1), traj))
        sl_a = traj.comp_slice("a")
        sl_da = traj.comp_slice("da")
        dt = 0.2
        expected = ztp1[sl_a] - zt[sl_a] - zt[sl_da] * dt
        np.testing.assert_allclose(d, expected, atol=1e-12)

    def test_defect_jacobian_vs_finite_difference(self):
        traj, sys = _hadamard_traj_and_system()
        integ = qct.UnitaryExponentialIntegrator(
            "Ũ⃗", "a", sys, num_squarings=6, order=8
        )
        z0 = jnp.asarray(traj.data[0])
        z1 = jnp.asarray(traj.data[1])
        J_auto = jax.jacfwd(lambda z: integ.defect(z, z1, traj))(z0)
        eps = 1e-6
        J_fd = np.zeros_like(np.asarray(J_auto))
        f0 = np.asarray(integ.defect(z0, z1, traj))
        for j in range(z0.shape[0]):
            dz = np.zeros(z0.shape[0])
            dz[j] = eps
            f1 = np.asarray(integ.defect(z0 + dz, z1, traj))
            J_fd[:, j] = (f1 - f0) / eps
        np.testing.assert_allclose(np.asarray(J_auto), J_fd, atol=1e-5)

    def test_state_integrator(self):
        sys = qct.QuantumSystem(0.1 * qct.PAULIS["Z"], [qct.PAULIS["X"]])
        traj = qct.initialize_state_trajectory(
            [np.array([0, 1])], [np.array([1, 0])], 5, 0.2, 1,
            [np.ones(1), np.ones(1), np.ones(1)],
        )
        psis = qct.rollout(
            traj.initial["ψ̃"], traj["a"], traj.get_timesteps(), sys
        )
        traj = traj.update("ψ̃", psis)
        integ = qct.QuantumStateExponentialIntegrator(
            "ψ̃", "a", sys, num_squarings=8, order=12
        )
        d = integ.defect(traj.data[2], traj.data[3], traj)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-9)

    def test_density_integrator(self):
        a_op = qct.annihilate(2)
        sys = qct.OpenQuantumSystem(
            qct.PAULIS["Z"], [qct.PAULIS["X"]], [0.2 * a_op]
        )
        rho0 = np.array([[1, 0], [0, 0]], dtype=complex)
        rho1 = np.array([[0, 0], [0, 1]], dtype=complex)
        traj = qct.initialize_density_trajectory(
            rho0, rho1, 5, 0.2, 1, [np.ones(1), np.ones(1), np.ones(1)]
        )
        rhos = qct.open_rollout(
            traj.initial["ρ⃗̃"], traj["a"], traj.get_timesteps(), sys
        )
        traj = traj.update("ρ⃗̃", rhos)
        integ = qct.DensityOperatorExponentialIntegrator("ρ⃗̃", "a", sys)
        d = integ.defect(traj.data[1], traj.data[2], traj)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-8)


class TestRollouts:
    def test_unitary_rollout_free_evolution(self):
        # zero controls: U(T) = exp(-i H_drift t_total)
        sys = qct.QuantumSystem(qct.PAULIS["Z"], [qct.PAULIS["X"]])
        T, dt = 6, 0.1
        a = np.zeros((T, 1))
        dts = np.full(T, dt)
        v0 = qct.operator_to_iso_vec(np.eye(2, dtype=complex))
        Us = qct.unitary_rollout(v0, a, dts, sys)
        U_end = np.asarray(qct.iso_vec_to_operator(Us[-1]))
        expected = sla.expm(-1j * np.asarray(qct.PAULIS["Z"]) * dt * (T - 1))
        np.testing.assert_allclose(U_end, expected, atol=1e-9)

    def test_rollout_unitarity(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        rng = np.random.default_rng(3)
        a = rng.normal(size=(20, 2)) * 0.5
        dts = np.full(20, 0.2)
        v0 = qct.operator_to_iso_vec(np.eye(2, dtype=complex))
        Us = qct.unitary_rollout(v0, a, dts, sys)
        U_end = np.asarray(qct.iso_vec_to_operator(Us[-1]))
        np.testing.assert_allclose(
            U_end @ U_end.conj().T, np.eye(2), atol=1e-8
        )

    def test_unitary_rollout_fidelity_api(self):
        traj, sys = _hadamard_traj_and_system(T=10)
        f = qct.unitary_rollout_fidelity(traj, sys)
        assert 0.0 <= float(f) <= 1.0 + 1e-9

    def test_ket_rollout_matches_unitary(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        rng = np.random.default_rng(4)
        a = rng.normal(size=(8, 2)) * 0.3
        dts = np.full(8, 0.2)
        psi0 = np.array([1, 0], dtype=complex)
        psis = qct.rollout(qct.ket_to_iso(psi0), a, dts, sys)
        v0 = qct.operator_to_iso_vec(np.eye(2, dtype=complex))
        Us = qct.unitary_rollout(v0, a, dts, sys)
        U_end = np.asarray(qct.iso_vec_to_operator(Us[-1]))
        np.testing.assert_allclose(
            np.asarray(qct.iso_to_ket(psis[-1])), U_end @ psi0, atol=1e-9
        )

    def test_open_rollout_trace_preserving(self):
        a_op = qct.annihilate(2)
        sys = qct.OpenQuantumSystem(
            qct.PAULIS["Z"], [qct.PAULIS["X"]], [0.3 * a_op]
        )
        rho0 = np.array([[0.7, 0.2], [0.2, 0.3]], dtype=complex)
        a = np.zeros((10, 1))
        dts = np.full(10, 0.2)
        rhos = qct.open_rollout(qct.density_to_iso_vec(rho0), a, dts, sys)
        rho_end = np.asarray(qct.iso_vec_to_density(rhos[-1]))
        assert abs(np.trace(rho_end) - 1.0) < 1e-8


def test_expv_rollout_matches_expm():
    # PiccoloOptions.rollout_integrator="expv" applies the exponential action
    # without forming propagators (the reference's default integrator,
    # /root/reference/src/trajectory_initialization.jl:398) — both paths must
    # produce the same rollout
    import quantumcollocation_tpu as qct
    from quantumcollocation_tpu.dynamics.rollouts import unitary_rollout
    from quantumcollocation_tpu.quantum.isomorphisms import operator_to_iso_vec

    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    v0 = np.asarray(operator_to_iso_vec(np.eye(2, dtype=complex)))
    rng = np.random.default_rng(0)
    a = 0.3 * rng.standard_normal((12, 2))
    dts = np.full(12, 0.2)
    r_expm = np.asarray(unitary_rollout(v0, a, dts, sys_q, integrator="expm"))
    r_expv = np.asarray(unitary_rollout(v0, a, dts, sys_q, integrator="expv"))
    np.testing.assert_allclose(r_expv, r_expm, atol=1e-9)

    # round 4: "krylov" is a real integrator (Arnoldi action, dynamics/
    # expv.py) — it must match too; unknown names still raise
    r_kry = np.asarray(unitary_rollout(v0, a, dts, sys_q, integrator="krylov"))
    np.testing.assert_allclose(r_kry, r_expm, atol=1e-6)

    import pytest

    with pytest.raises(ValueError, match="rollout integrator"):
        unitary_rollout(v0, a, dts, sys_q, integrator="nonsense")
