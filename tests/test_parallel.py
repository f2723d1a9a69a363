"""Sharded batched-solve tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.parallel import batched_solve, make_mesh, shard_batch


@pytest.fixture(scope="module")
def prob():
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    return qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], 11, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-6),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("batch",)

    def test_shard_batch_places_shards(self, prob):
        mesh = make_mesh()
        n = mesh.devices.size
        Z0 = prob.initial_decision(2 * n)
        Zs = shard_batch(Z0, mesh)
        assert len(Zs.sharding.device_set) == n

    def test_sharded_solve_matches_unsharded(self, prob):
        mesh = make_mesh()
        n = mesh.devices.size
        B = 2 * n
        Z0 = prob.multistart_initial_decisions(
            B, sigma=0.05, rng=np.random.default_rng(1)
        )
        res_sharded = batched_solve(
            prob, jnp.asarray(Z0), mesh=mesh, max_iter=15
        )
        res_plain = prob.solver.solve(jnp.asarray(Z0), max_iter=15)
        np.testing.assert_allclose(
            np.asarray(res_sharded.objective),
            np.asarray(res_plain.objective),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(res_sharded.Z), np.asarray(res_plain.Z), atol=1e-7
        )
