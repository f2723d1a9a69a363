"""Unit tests for quantum objects: isomorphisms, operators, systems, embeddings.

Mirrors the invariants asserted by the reference's inline test items (e.g.
/root/reference/src/trajectory_initialization.jl:588-642 and the iso-vec
fixture /root/reference/test/test_utils.jl:103).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantumcollocation_tpu as qct


class TestIsomorphisms:
    def test_iso_vec_layout_matches_reference_fixture(self):
        # reference fixture: operator_to_iso_vec(I) == [1,0,0,0, 0,1,0,0]
        v = qct.operator_to_iso_vec(np.eye(2, dtype=complex))
        np.testing.assert_allclose(v, [1, 0, 0, 0, 0, 1, 0, 0])
        # X gate: [0,1,0,0, 1,0,0,0]
        v = qct.operator_to_iso_vec(qct.GATES["X"])
        np.testing.assert_allclose(v, [0, 1, 0, 0, 1, 0, 0, 0])

    def test_operator_iso_vec_roundtrip(self):
        U = qct.haar_random(4, seed=1)
        np.testing.assert_allclose(
            qct.iso_vec_to_operator(qct.operator_to_iso_vec(U)), U, atol=1e-12
        )

    def test_ket_iso_roundtrip(self):
        psi = np.array([0.6, 0.8j], dtype=complex)
        np.testing.assert_allclose(qct.iso_to_ket(qct.ket_to_iso(psi)), psi)

    def test_density_iso_roundtrip(self):
        psi = np.array([0.6, 0.8j], dtype=complex)
        rho = np.outer(psi, psi.conj())
        np.testing.assert_allclose(
            qct.iso_vec_to_density(qct.density_to_iso_vec(rho)), rho, atol=1e-12
        )

    def test_iso_G_matches_schroedinger(self):
        H = np.array(qct.GATES["H"]) + 0.3 * np.array(qct.PAULIS["Y"])
        psi = np.array([0.3 + 0.1j, 0.2 - 0.5j])
        lhs = qct.ket_to_iso(-1j * H @ psi)
        rhs = qct.iso_G(H) @ qct.ket_to_iso(psi)
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_iso_G_unitary_evolution(self):
        # exp(G(H) t) in iso coords == iso of exp(-i H t)
        from jax.scipy.linalg import expm

        H = np.array(qct.PAULIS["X"], dtype=complex)
        t = 0.7
        U = np.array(expm(-1j * jnp.asarray(H) * t))
        G = qct.iso_G(H)
        iso_prop = np.array(expm(jnp.asarray(G) * t))
        np.testing.assert_allclose(
            iso_prop @ qct.operator_to_iso_operator(np.eye(2, dtype=complex)),
            qct.operator_to_iso_operator(U),
            atol=1e-8,
        )

    def test_iso_D_trace_preserving(self):
        # Lindblad evolution preserves trace: d tr(rho)/dt = 0
        H = np.array(qct.PAULIS["Z"], dtype=complex)
        L = 0.3 * np.array(qct.annihilate(2))
        D = qct.iso_D(H, [L])
        psi = np.array([0.6, 0.8], dtype=complex)
        rho = np.outer(psi, psi.conj())
        drho_iso = D @ qct.density_to_iso_vec(rho)
        drho = qct.iso_vec_to_density(drho_iso)
        assert abs(np.trace(drho)) < 1e-12
        # and matches the direct Lindblad formula
        direct = -1j * (H @ rho - rho @ H) + (
            L @ rho @ L.conj().T
            - 0.5 * (L.conj().T @ L @ rho + rho @ L.conj().T @ L)
        )
        np.testing.assert_allclose(drho, direct, atol=1e-12)


class TestOperators:
    def test_annihilate_create(self):
        a = qct.annihilate(3)
        ad = qct.create(3)
        comm = a @ ad - ad @ a
        # canonical commutation holds away from the truncation level
        np.testing.assert_allclose(np.diag(comm)[:-1], [1, 1])

    def test_lift(self):
        X = np.array(qct.PAULIS["X"])
        lifted = qct.lift(X, 1, [2, 2, 2])
        expected = np.kron(np.kron(np.eye(2), X), np.eye(2))
        np.testing.assert_allclose(lifted, expected)

    def test_operator_from_string(self):
        op = qct.operator_from_string("XZ")
        np.testing.assert_allclose(
            op, np.kron(qct.PAULIS["X"], qct.PAULIS["Z"])
        )

    def test_haar_random_unitary(self):
        U = qct.haar_random(4, seed=3)
        np.testing.assert_allclose(U @ U.conj().T, np.eye(4), atol=1e-12)

    def test_haar_identity_near_identity(self):
        U = qct.haar_identity(3, 1e-3, seed=0)
        np.testing.assert_allclose(U, np.eye(3), atol=1e-2)
        np.testing.assert_allclose(U @ U.conj().T, np.eye(3), atol=1e-12)

    def test_coherent_ket(self):
        alpha = 1.2
        psi = qct.coherent_ket(alpha, 30)
        assert abs(np.linalg.norm(psi) - 1.0) < 1e-8
        # mean photon number = |alpha|^2
        n = np.arange(30)
        np.testing.assert_allclose(
            np.sum(n * np.abs(psi) ** 2), alpha**2, rtol=1e-6
        )


class TestQuantumSystem:
    def test_basic_fields(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        assert sys.n_drives == 2
        assert sys.levels == 2
        assert sys.G_drift.shape == (4, 4)
        assert sys.G_drives.shape == (2, 4, 4)

    def test_drift_free_constructor(self):
        sys = qct.QuantumSystem([qct.PAULIS["X"]])
        assert sys.n_drives == 1
        np.testing.assert_allclose(sys.H_drift, np.zeros((2, 2)))

    def test_hamiltonian_and_generator(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        a = jnp.array([0.3, -0.7])
        H = sys.hamiltonian(a)
        expected = np.array(qct.GATES["Z"]) + 0.3 * np.array(
            qct.GATES["X"]
        ) - 0.7 * np.array(qct.GATES["Y"])
        np.testing.assert_allclose(H, expected, atol=1e-12)
        np.testing.assert_allclose(
            sys.generator(a), qct.iso_G(expected), atol=1e-12
        )

    def test_pytree_roundtrip(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"]])
        leaves, treedef = jax.tree_util.tree_flatten(sys)
        sys2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert sys2.n_drives == 1
        np.testing.assert_allclose(sys2.H_drift, sys.H_drift)

    def test_jit_through_system(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"]])

        @jax.jit
        def f(s, a):
            return s.generator(a)

        out = f(sys, jnp.array([0.5]))
        np.testing.assert_allclose(
            out, sys.G_drift + 0.5 * sys.G_drives[0], atol=1e-12
        )

    def test_open_system(self):
        a = qct.annihilate(2)
        sys = qct.OpenQuantumSystem(
            qct.PAULIS["Z"], [qct.PAULIS["X"]], [0.1 * a]
        )
        assert sys.D_drift.shape == (8, 8)
        assert sys.D_drives.shape == (1, 8, 8)

    def test_composite_system(self):
        sub = qct.QuantumSystem(qct.PAULIS["Z"], [qct.PAULIS["X"]])
        coupling = qct.QuantumSystemCoupling(
            op=0.1 * np.kron(qct.PAULIS["Z"], qct.PAULIS["Z"]),
            g=0.1,
            pair=(0, 1),
            subsystem_levels=(2, 2),
        )
        comp = qct.CompositeQuantumSystem([sub, sub], [coupling])
        assert comp.levels == 4
        assert comp.n_drives == 2
        expected_drift = (
            np.kron(qct.PAULIS["Z"], np.eye(2))
            + np.kron(np.eye(2), qct.PAULIS["Z"])
            + 0.1 * np.kron(qct.PAULIS["Z"], qct.PAULIS["Z"])
        )
        np.testing.assert_allclose(comp.H_drift, expected_drift, atol=1e-12)


class TestEmbedded:
    def test_subspace_indices(self):
        idx = qct.get_subspace_indices([[0, 1], [0, 1]], [3, 3])
        assert idx == [0, 1, 3, 4]

    def test_embedded_operator_single_system(self):
        a = qct.annihilate(3)
        sys = qct.QuantumSystem([(a + a.conj().T) / 2])
        emb = qct.EmbeddedOperator(qct.GATES["H"], sys)
        assert emb.levels == 3
        assert emb.subspace == (0, 1)
        U = np.asarray(emb.operator)
        np.testing.assert_allclose(U[:2, :2], qct.GATES["H"])
        np.testing.assert_allclose(U @ U.conj().T, np.eye(3), atol=1e-12)

    def test_unembed_roundtrip(self):
        emb = qct.EmbeddedOperator(qct.GATES["X"], [0, 2], 4)
        np.testing.assert_allclose(
            qct.unembed(emb.operator, emb), qct.GATES["X"]
        )

    def test_leakage_indices(self):
        emb = qct.EmbeddedOperator(qct.GATES["X"], [0, 1], 3)
        assert qct.get_leakage_indices(emb) == [2]
        iso_leak = qct.get_iso_vec_leakage_indices(emb)
        # 2 columns x 1 leakage row x (re, im) = 4 entries
        assert len(iso_leak) == 4
        # they index the U[2, 0] and U[2, 1] entries
        N = 3
        assert set(iso_leak) == {2, 2 + N, 2 * N + 2, 2 * N + 2 + N}


class TestFidelities:
    def test_unitary_fidelity_perfect(self):
        U = qct.haar_random(4, seed=5)
        f = qct.unitary_fidelity(U, U)
        assert abs(f - 1.0) < 1e-12

    def test_unitary_fidelity_phase_invariant(self):
        U = qct.haar_random(2, seed=6)
        f = qct.unitary_fidelity(np.exp(1j * 0.7) * U, U)
        assert abs(f - 1.0) < 1e-12

    def test_iso_vec_unitary_fidelity(self):
        U = np.array(qct.GATES["H"])
        V = np.array(qct.GATES["X"])
        f_direct = qct.unitary_fidelity(U, V)
        f_iso = qct.iso_vec_unitary_fidelity(
            qct.operator_to_iso_vec(U), qct.operator_to_iso_vec(V)
        )
        np.testing.assert_allclose(f_iso, f_direct, atol=1e-12)

    def test_subspace_fidelity(self):
        emb = qct.EmbeddedOperator(qct.GATES["X"], [0, 1], 3)
        f = qct.unitary_fidelity(
            emb.operator, emb.operator, subspace=emb.subspace
        )
        assert abs(f - 1.0) < 1e-12

    def test_free_phase_fidelity(self):
        # Y is reachable from X up to a Z phase: exp(i pi/2 Z) X ∝ Y
        X = np.array(qct.PAULIS["X"], dtype=complex)
        Y = np.array(qct.PAULIS["Y"], dtype=complex)
        f = qct.iso_vec_unitary_free_phase_fidelity(
            qct.operator_to_iso_vec(X),
            qct.operator_to_iso_vec(Y),
            jnp.array([np.pi / 2]),
            [qct.PAULIS["Z"]],
        )
        assert abs(f - 1.0) < 1e-9

    def test_iso_fidelity_state(self):
        psi = np.array([1, 0], dtype=complex)
        phi = np.array([1, 1], dtype=complex) / np.sqrt(2)
        f = qct.iso_fidelity(qct.ket_to_iso(psi), qct.ket_to_iso(phi))
        assert abs(f - 0.5) < 1e-12

    def test_density_pure_state_fidelity(self):
        psi = np.array([0.6, 0.8], dtype=complex)
        rho = np.outer(psi, psi.conj())
        assert abs(qct.density_pure_state_fidelity(rho, psi) - 1.0) < 1e-12
