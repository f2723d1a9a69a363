"""Solver iteration callbacks.

Mirrors the reference's Callbacks module surface
(/root/reference/docs/literate/man/ipopt_callbacks.jl:57-58,82-88):
trajectory_history_callback captures the trajectory at every iteration;
best_rollout_fidelity_callback tracks the best-rollout iterate (the solver's
monotone-in-merit path is not monotone in rollout fidelity, so keeping the
best is useful exactly as upstream documents).

The IPM callback protocol: callback(iteration, IPMState) -> bool | None;
returning False stops the solve (the Ipopt intermediate-callback analog).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "trajectory_history_callback",
    "best_rollout_fidelity_callback",
    "kkt_history_callback",
    "ipopt_callback_adapter",
]


def ipopt_callback_adapter(prob, user_cb, *, instance: int = 0):
    """Adapt a reference-shaped Ipopt intermediate callback to the IPM.

    `user_cb` receives the 11 positional fields of Ipopt's intermediate
    callback (alg_mod, iter_count, obj_value, inf_pr, inf_du, mu, d_norm,
    regularization_size, alpha_du, alpha_pr, ls_trials — documented at
    /root/reference/docs/literate/man/ipopt_callbacks.jl:17-31) for one batch
    instance, and may return False to stop the solve early (the reference's
    early-stop protocol, ipopt_callbacks.jl:36-37).

    Returns an IPM-protocol callback(k, IPMState).
    """

    def callback(k, state):
        st = prob.solver.iteration_stats(state, instance)
        return user_cb(
            0,  # alg_mod: 0 = regular mode (no restoration phase here)
            st["iter_count"],
            st["obj_value"],
            st["inf_pr"],
            st["inf_du"],
            st["mu"],
            st["d_norm"],
            st["regularization_size"],
            st["alpha_du"],
            st["alpha_pr"],
            st["ls_trials"],
        )

    return callback


def trajectory_history_callback(prob):
    """Returns (callback, history list of trajectories per iteration)."""
    history = []

    def callback(k, state):
        history.append(prob.write_back(prob.solver.unscale(state.Z[0])))
        return True

    return callback, history


def best_rollout_fidelity_callback(prob, *, state_name="Ũ⃗", drive_name="a"):
    """Returns (callback, best dict) keeping the best-rollout-fidelity iterate."""
    from ..dynamics.rollouts import unitary_rollout_fidelity

    best = {"fidelity": -np.inf, "trajectory": None, "iteration": -1}

    def callback(k, state):
        traj = prob.write_back(prob.solver.unscale(state.Z[0]))
        fid = float(
            unitary_rollout_fidelity(
                traj, prob.system, state_name=state_name, drive_name=drive_name
            )
        )
        if fid > best["fidelity"]:
            best.update(fidelity=fid, trajectory=traj, iteration=k)
        return True

    return callback, best


def kkt_history_callback():
    """Returns (callback, telemetry dict of per-iteration solver metrics)."""
    hist = {
        "kkt_err": [],
        "e_dual": [],
        "e_pr": [],
        "e_comp": [],
        "mu": [],
        "alpha": [],
        "reg_dw": [],
    }

    def callback(k, state):
        hist["kkt_err"].append(np.asarray(state.kkt_err).copy())
        hist["e_dual"].append(np.asarray(state.e_dual).copy())
        hist["e_pr"].append(np.asarray(state.e_pr).copy())
        hist["e_comp"].append(np.asarray(state.e_comp).copy())
        hist["mu"].append(np.asarray(state.mu).copy())
        hist["alpha"].append(np.asarray(state.alpha).copy())
        hist["reg_dw"].append(np.asarray(state.reg_dw).copy())
        return True

    return callback, hist
