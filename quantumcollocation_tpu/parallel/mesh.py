"""Device-mesh utilities for batched gate synthesis.

Parallelism design (SURVEY.md §5/§7): gate-synthesis instances and multi-start
seeds are embarrassingly parallel — the TPU-native scaling axis is the
instance BATCH, sharded over the ICI mesh with jax.sharding; the stage-wise
KKT factorization stays per-instance (never sharded), so the only collectives
XLA inserts are scalar reductions (convergence voting / aggregate metrics)
that ride ICI.  This replaces the reference's single-process Ipopt loop
(no distributed backend exists upstream; .github/workflows/CI.yml:20-27).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "batched_solve"]


def make_mesh(n_devices: int | None = None, axis_name: str = "batch") -> Mesh:
    """1-D device mesh over the instance-batch axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "batch"):
    """Shard every leaf's leading axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def batched_solve(problem, Z0, *, mesh: Mesh | None = None, max_iter=None):
    """Solve a batch of initial decisions, sharded across a device mesh.

    problem: a QuantumControlProblem; Z0: (B, T, d_aug) with B divisible by
    the mesh size.  The solve compiles once; XLA partitions every batched
    operation across devices and inserts only scalar collectives (the
    all-converged vote in the while_loop condition).
    """
    if mesh is None:
        mesh = make_mesh()
    Z0 = shard_batch(Z0, mesh)
    return problem.solver.solve(Z0, max_iter=max_iter)
