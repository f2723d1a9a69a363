"""Pallas kernel tests (interpret mode on CPU; compiled on TPU via bench)."""

import numpy as np
import pytest
import scipy.linalg as sla

import jax.numpy as jnp

from quantumcollocation_tpu.ops.pallas_expm import expm_batched_lanes


class TestExpmLanes:
    @pytest.mark.parametrize("n", [4, 6, 8])
    def test_matches_scipy(self, n):
        rng = np.random.default_rng(0)
        B = 10
        X = rng.normal(size=(B, n, n)).astype(np.float32) * 0.4
        out = np.asarray(
            expm_batched_lanes(
                jnp.asarray(X), order=8, num_squarings=3, interpret=True
            )
        )
        for b in range(B):
            np.testing.assert_allclose(
                out[b], sla.expm(X[b].astype(np.float64)), atol=5e-5
            )

    def test_padding_and_larger_batch(self):
        rng = np.random.default_rng(1)
        B, n = 200, 4  # crosses a lane boundary (128)
        X = rng.normal(size=(B, n, n)).astype(np.float32) * 0.3
        out = np.asarray(
            expm_batched_lanes(
                jnp.asarray(X), order=8, num_squarings=2, interpret=True
            )
        )
        assert out.shape == (B, n, n)
        np.testing.assert_allclose(
            out[150], sla.expm(X[150].astype(np.float64)), atol=5e-5
        )

    def test_larger_norm_with_squaring(self):
        rng = np.random.default_rng(2)
        X = rng.normal(size=(4, 6, 6)).astype(np.float32) * 2.0
        out = np.asarray(
            expm_batched_lanes(
                jnp.asarray(X), order=8, num_squarings=5, interpret=True
            )
        )
        for b in range(4):
            ref = sla.expm(X[b].astype(np.float64))
            # f32 kernel: compare with relative tolerance (entries reach ~1e2)
            rel = np.abs(out[b] - ref).max() / np.abs(ref).max()
            assert rel < 1e-4, rel


class TestPropBankLanes:
    def test_matches_pure_banks_all_modes(self):
        # the fused lanes kernel must reproduce the pure-JAX banks exactly
        # (interpret mode on CPU; real-TPU Mosaic compile is validated by
        # scripts/tpu_ab.py per CLAUDE.md)
        from quantumcollocation_tpu.dynamics.expm import (
            expm_frechet_bank,
            frechet_pairs,
            pade_poly_frechet,
        )
        from quantumcollocation_tpu.ops.pallas_prop_bank import prop_bank_lanes

        rng = np.random.default_rng(3)
        n, na, M = 4, 2, 70
        G0 = jnp.asarray(rng.standard_normal((n, n)))
        Gs = jnp.asarray(rng.standard_normal((na, n, n)))
        a = jnp.asarray(0.4 * rng.standard_normal((M, na)))
        dts = jnp.asarray(0.1 + 0.2 * rng.random(M))

        for kind in ("exp", "pade"):
            for free_dt in (True, False):
                order = 8 if kind == "exp" else 4
                out = prop_bank_lanes(
                    a, dts, G0, Gs, kind=kind, order=order, num_squarings=4,
                    free_dt=free_dt, second_order=True, interpret=True,
                )
                K = na + (1 if free_dt else 0)
                pairs = frechet_pairs(K)
                for i in (0, 33, M - 1):
                    G = G0 + jnp.tensordot(a[i], Gs, axes=1)
                    X = G * dts[i]
                    dX = jnp.stack(
                        [Gs[j] * dts[i] for j in range(na)]
                        + ([G] if free_dt else [])
                    )
                    d2X = (
                        jnp.stack(
                            [
                                Gs[k] if (k < na and l == na) else jnp.zeros((n, n))
                                for (k, l) in pairs
                            ]
                        )
                        if free_dt
                        else None
                    )
                    if kind == "exp":
                        ref = expm_frechet_bank(
                            X, dX, d2X, order=order, num_squarings=4
                        )
                    else:
                        ref = pade_poly_frechet(X, dX, d2X, order=order)
                    for oi, r in zip(out, ref):
                        np.testing.assert_allclose(
                            np.asarray(oi[i]), np.asarray(r), atol=1e-11
                        )

    def test_banks_batched_kernel_equals_pure(self):
        import quantumcollocation_tpu as qct

        sys_q = qct.QuantumSystem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]]
        )
        prob = qct.UnitarySmoothPulseProblem(
            sys_q, qct.GATES["H"], 9, 0.2,
            piccolo_options=qct.PiccoloOptions(verbose=False),
            rng=np.random.default_rng(0),
        )
        an = prob.solver.nlp.analytic  # scaled analytic
        rng = np.random.default_rng(1)
        Z = jnp.asarray(
            np.asarray(prob.solver.nlp.z0)[None]
            + 0.03 * rng.standard_normal((3, *prob.solver.nlp.z0.shape))
        )
        b_pure = an.banks_batched(Z, second_order=True, use_kernel=False)
        b_kern = an.banks_batched(
            Z, second_order=True, use_kernel=True, interpret=True
        )
        for gp, gk in zip(b_pure, b_kern):
            for xp_, xk in zip(gp, gk):
                if xp_ is None:
                    assert xk is None
                    continue
                np.testing.assert_allclose(
                    np.asarray(xp_), np.asarray(xk), atol=1e-11
                )
