"""System template tests (mirror reference test items, e.g. rydberg.jl:122-124)."""

import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.systems import (
    CatSystem,
    MultiTransmonSystem,
    RydbergChainSystem,
    TransmonDipoleCoupling,
    TransmonSystem,
    get_cat_controls,
)


class TestTransmon:
    def test_rotating_frame_default(self):
        sys = TransmonSystem(omega=4.0, delta=0.2, levels=3)
        assert sys.levels == 3
        assert sys.n_drives == 2
        # rotating at omega: drift = -delta/2 * a'a'aa * 2pi
        a = np.asarray(qct.annihilate(3))
        expected = -0.1 * (a.conj().T @ a.conj().T @ a @ a) * 2 * np.pi
        np.testing.assert_allclose(sys.H_drift, expected, atol=1e-12)

    def test_lab_frame_duffing(self):
        sys = TransmonSystem(omega=4.0, delta=0.2, levels=3, lab_frame=True)
        a = np.asarray(qct.annihilate(3))
        n = a.conj().T @ a
        expected = (
            4.0 * n - 0.1 * (a.conj().T @ a.conj().T @ a @ a)
        ) * 2 * np.pi
        np.testing.assert_allclose(sys.H_drift, expected, atol=1e-10)

    def test_lab_frame_variants(self):
        for t in ("quartic", "cosine"):
            sys = TransmonSystem(levels=4, lab_frame=True, lab_frame_type=t)
            assert sys.levels == 4
            # Hermitian drift
            np.testing.assert_allclose(
                sys.H_drift, np.asarray(sys.H_drift).conj().T, atol=1e-8
            )

    def test_dipole_coupling(self):
        c = TransmonDipoleCoupling(0.1, (0, 1), [3, 3])
        assert c.op.shape == (9, 9)
        np.testing.assert_allclose(c.op, c.op.conj().T, atol=1e-12)

    def test_multi_transmon(self):
        gs = np.array([[0, 0.1], [0.1, 0]])
        sys = MultiTransmonSystem([4.0, 4.2], [0.2, 0.21], gs)
        assert sys.levels == 9
        assert sys.n_drives == 4


class TestRydberg:
    def test_construction(self):
        sys = RydbergChainSystem(N=3, cutoff_order=2, all2all=False)
        assert isinstance(sys, qct.QuantumSystem)
        assert sys.levels == 8
        assert sys.n_drives == 3  # X, Y, detune

    def test_all2all_vs_nn(self):
        nn = RydbergChainSystem(N=3, all2all=False, cutoff_order=1)
        aa = RydbergChainSystem(N=3, all2all=True)
        # all-to-all includes the next-nearest 1-3 term as well
        diff = np.abs(np.asarray(aa.H_drift) - np.asarray(nn.H_drift))
        assert diff.max() > 0

    def test_ignore_y(self):
        sys = RydbergChainSystem(N=2, ignore_Y_drive=True)
        assert sys.n_drives == 2


class TestCat:
    def test_construction(self):
        sys = CatSystem(cat_levels=6, buffer_levels=2)
        assert sys.levels == 12
        assert sys.n_drives == 2
        assert sys.L_dissipators.shape[0] == 2
        # drift Hermitian
        np.testing.assert_allclose(
            sys.H_drift, np.asarray(sys.H_drift).conj().T, atol=1e-8
        )

    def test_cat_controls(self):
        sys = CatSystem(cat_levels=6, buffer_levels=2)
        ctrl = get_cat_controls(sys, 2.0, 10)
        assert ctrl.shape == (10, 2)
        np.testing.assert_allclose(ctrl[0, 0], 4.0 * sys.params["g2"])

    def test_coherent_ket(self):
        psi = qct.coherent_ket(1.0, 20)
        assert abs(np.linalg.norm(psi) - 1) < 1e-8
