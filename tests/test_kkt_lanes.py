"""Lanes-layout KKT backend: exactness vs the XLA path, and a full solve."""

import jax
import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.solver.kkt import solve_kkt
from quantumcollocation_tpu.solver.kkt_lanes import (
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
