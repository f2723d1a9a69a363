"""Krylov expv action + matrix-free Lindblad rollout tests.

The reference's default rollout integrator is ExponentialAction.jl's expv
(/root/reference/src/trajectory_initialization.jl:398); its role is to make
rollouts on LARGE Hilbert spaces (cat x buffer systems,
/root/reference/src/quantum_system_templates/cats.jl:9-53) tractable
without forming dense propagators.  These tests pin:
- Krylov accuracy vs dense expm on closed and open generators
- the matrix-free lindblad_action against the dense superoperator
- a full cat-system rollout at a dimension where the dense superoperator
  (2N^2)^2 would be ~1.7e9 entries — only the matvec path can run it
"""

import jax
import numpy as np
import pytest

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.dynamics.expv import expv_krylov
from quantumcollocation_tpu.dynamics.rollouts import open_rollout
from quantumcollocation_tpu.quantum.isomorphisms import (
    density_to_iso_vec,
    iso_vec_to_density,
)


@pytest.fixture(scope="module")
def f64():
    jax.config.update("jax_enable_x64", True)
    yield


def test_expv_krylov_matches_dense_expm(f64):
    rng = np.random.default_rng(0)
    n = 40
    # skew-symmetric (closed-system iso generator structure) + general
    for kind in ("skew", "general"):
        M = rng.standard_normal((n, n))
        A = (M - M.T) if kind == "skew" else 0.3 * M
        b = rng.standard_normal(n)
        for t, substeps in ((0.1, 1), (1.0, 4), (3.0, 8)):
            from scipy.linalg import expm as scipy_expm

            want = scipy_expm(t * A) @ b
            got = np.asarray(
                expv_krylov(t, A, b, m=30, substeps=substeps)
            )
            np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9), (
                kind,
                t,
            )


def test_expv_krylov_matvec_callable(f64):
    rng = np.random.default_rng(1)
    n = 25
    A = rng.standard_normal((n, n)) * 0.2
    b = rng.standard_normal(n)
    from scipy.linalg import expm as scipy_expm

    got = np.asarray(
        expv_krylov(1.0, None, b, m=25, matvec=lambda v: A @ v)
    )
    np.testing.assert_allclose(got, scipy_expm(A) @ b, rtol=1e-9, atol=1e-10)


def test_losses_expv_signature(f64):
    # public surface: qct expv(t, A, b) (ExponentialAction.jl signature)
    rng = np.random.default_rng(2)
    A = rng.standard_normal((12, 12)) * 0.1
    b = rng.standard_normal(12)
    from scipy.linalg import expm as scipy_expm

    got = np.asarray(qct.expv(0.7, A, b))
    np.testing.assert_allclose(
        got, scipy_expm(0.7 * A) @ b, rtol=1e-9, atol=1e-10
    )


def test_lindblad_action_matches_dense_superop(f64):
    # small open system: matvec path == dense D(a) @ v
    sys_o = qct.CatSystem(cat_levels=4, buffer_levels=2)
    assert sys_o.D_drift is not None  # small enough to materialize
    rng = np.random.default_rng(3)
    a = rng.standard_normal(sys_o.n_drives)
    v = rng.standard_normal(2 * sys_o.levels**2)
    import jax.numpy as jnp

    dense = np.asarray(sys_o.lindblad_generator(jnp.asarray(a))) @ v
    mf = np.asarray(sys_o.lindblad_action(jnp.asarray(a), jnp.asarray(v)))
    np.testing.assert_allclose(mf, dense, rtol=1e-10, atol=1e-10)


def test_open_rollout_krylov_matches_dense(f64):
    # expv open rollout == dense expm rollout on a materializable system
    sys_o = qct.CatSystem(cat_levels=4, buffer_levels=2)
    N = sys_o.levels
    T = 8
    rng = np.random.default_rng(4)
    a = 0.1 * rng.standard_normal((T, sys_o.n_drives))
    dts = np.full(T, 0.05)
    psi0 = np.zeros(N, dtype=complex)
    psi0[0] = 1.0
    r0 = np.asarray(density_to_iso_vec(np.outer(psi0, psi0.conj())))

    dense = np.asarray(
        open_rollout(r0, a, dts, sys_o, integrator="expm")
    )
    kry = np.asarray(
        open_rollout(
            r0, a, dts, sys_o, integrator="expv", num_squarings=4
        )
    )
    np.testing.assert_allclose(kry[-1], dense[-1], rtol=1e-7, atol=1e-8)


def test_large_cat_rollout_matvec_only(f64):
    # the DEFAULT reference cat (13 x 3 = 39 levels; cats.jl:9) plus a
    # deliberately larger one: superop dim 2N^2 = 3042 / 4608 — the dense
    # (2N^2)^2 superoperator would be 9.3e6 / 2.1e7 entries PER DRIVE and
    # per knot; the matvec path needs only N x N complex matmuls
    sys_big = qct.CatSystem(cat_levels=16, buffer_levels=3)
    assert sys_big.D_drift is None  # above SUPEROP_MAX_LEVELS: not formed
    with pytest.raises(ValueError, match="lindblad_action"):
        sys_big.lindblad_generator(np.zeros(sys_big.n_drives))

    N = sys_big.levels
    T = 6
    alpha = 1.5
    a_ctrl = qct.get_cat_controls(sys_big, alpha, T)
    dts = np.full(T, 2e-3)
    psi0 = np.asarray(qct.coherent_ket(alpha, sys_big.params["cat_levels"]))
    psi0 = np.kron(psi0, np.eye(3)[:, 0])  # buffer vacuum
    rho0 = np.outer(psi0, psi0.conj())
    r0 = np.asarray(density_to_iso_vec(rho0))

    rhos = np.asarray(
        open_rollout(
            r0, a_ctrl, dts, sys_big, integrator="expv",
            num_squarings=2, krylov_dim=16,
        )
    )
    # physicality of the evolved state: unit trace, Hermitian, real trace
    rho_T = np.asarray(iso_vec_to_density(rhos[-1]))
    assert abs(np.trace(rho_T).real - 1.0) < 1e-6
    assert abs(np.trace(rho_T).imag) < 1e-8
    assert np.abs(rho_T - rho_T.conj().T).max() < 1e-8
    # the state evolved (dissipators + Kerr act) but stayed close-ish over
    # the short horizon
    overlap = np.real(np.trace(rho0 @ rho_T))
    assert 0.5 < overlap < 1.0 + 1e-9
