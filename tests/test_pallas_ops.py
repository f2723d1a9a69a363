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
