"""Native library tests: the C++ KKT oracle must agree with both dense
numpy and the device (JAX) stage-wise scan; the C++ rollout validator must
agree with the JAX rollout."""

import numpy as np
import pytest

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.ops.native import (
    kkt_solve_native,
    native_available,
    unitary_rollout_fidelity_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


class TestNativeKKT:
    def test_matches_dense_and_device(self):
        import jax.numpy as jnp

        from quantumcollocation_tpu.solver.kkt import solve_kkt

        rng = np.random.default_rng(7)
        T, d, s = 6, 5, 3
        delta_c = 1e-8
        H = np.stack(
            [np.eye(d) * 2 + 0.1 * rng.normal(size=(d, d)) for _ in range(T)]
        )
        H = 0.5 * (H + H.transpose(0, 2, 1))
        C = 0.1 * rng.normal(size=(T - 1, d, d))
        A = rng.normal(size=(T - 1, s, d))
        B = rng.normal(size=(T - 1, s, d))
        rz = rng.normal(size=(T, d))
        rnu = rng.normal(size=(T - 1, s))

        dz_n, nu_n, ok = kkt_solve_native(H, C, A, B, rz, rnu, delta_c)
        assert ok
        dz_j, nu_j, ok_j = solve_kkt(
            jnp.asarray(H), jnp.asarray(C), jnp.asarray(A), jnp.asarray(B),
            jnp.asarray(rz), jnp.asarray(rnu), delta_c,
        )
        np.testing.assert_allclose(dz_n, np.asarray(dz_j), atol=1e-9)
        np.testing.assert_allclose(nu_n, np.asarray(nu_j), atol=1e-9)

    def test_detects_indefinite(self):
        T, d, s = 3, 2, 1
        H = np.zeros((T, d, d))
        C = np.zeros((T - 1, d, d))
        A = np.ones((T - 1, s, d))
        B = np.ones((T - 1, s, d))
        _, _, ok = kkt_solve_native(
            H, C, A, B, np.ones((T, d)), np.ones((T - 1, s)), 1e-8
        )
        assert not ok


class TestNativeRollout:
    def test_matches_jax_rollout(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        rng = np.random.default_rng(3)
        B, T = 4, 20
        a = rng.normal(size=(B, T, 2)) * 0.4
        dts = np.full((B, T), 0.2)
        goal_iso = np.asarray(
            qct.operator_to_iso_operator(qct.GATES["H"])
        )
        fids = unitary_rollout_fidelity_native(
            np.asarray(sys.G_drift), np.asarray(sys.G_drives), a, dts, goal_iso
        )
        v0 = qct.operator_to_iso_vec(np.eye(2, dtype=complex))
        for b in range(B):
            Us = qct.unitary_rollout(v0, a[b], dts[b], sys)
            f_jax = float(
                qct.iso_vec_unitary_fidelity(
                    Us[-1], qct.operator_to_iso_vec(qct.GATES["H"])
                )
            )
            assert abs(fids[b] - f_jax) < 1e-8
