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

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batched_solve",
    "init_distributed",
    "make_global_batch",
]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
):
    """Multi-host (DCN) wiring: initialize the JAX distributed runtime so
    `jax.devices()` spans every host's chips and one `Mesh` covers the pod.

    On Cloud TPU pods all arguments auto-detect (call with no args in each
    host process).  After this, a real pod run is:

        init_distributed()
        mesh = make_mesh()                      # all global devices
        Z0 = make_global_batch(local_Z0, mesh)  # per-host shards -> global
        res = problem.solver.solve(Z0)

    The solve compiles identically to the single-host path; batch collectives
    (the all-converged vote) ride ICI within a slice and DCN across slices.
    Idempotent: a second call is a no-op.
    """
    # NOTE: must not call jax.process_count()/jax.devices() here — those
    # initialize the XLA backend, after which distributed.initialize()
    # refuses to run.  The idempotence check inspects the distributed
    # client state directly.
    if getattr(jax.distributed, "is_initialized", lambda: False)() or (
        getattr(jax.distributed, "global_state", None) is not None
        and getattr(jax.distributed.global_state, "client", None) is not None
    ):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def make_global_batch(local_batch, mesh: Mesh, axis_name: str = "batch"):
    """Assemble a globally-sharded batch array from each process's local
    shard (multi-host analog of shard_batch): host k contributes rows
    [k*B_local, (k+1)*B_local) of the global batch."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )


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
