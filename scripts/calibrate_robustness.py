"""Calibrate the robustness-template comparative test: find a solve config
where the Magnus sensitivity decreases with a solid margin."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import quantumcollocation_tpu as qct

QUIET = qct.PiccoloOptions(verbose=False)


def magnus_cost(traj, H_error, unitary_name="Ũ⃗"):
    U = np.asarray(traj[unitary_name])
    dts = np.asarray(traj.get_timesteps())
    T = U.shape[0]
    N = int(round((U.shape[1] / 2) ** 0.5))
    M = np.zeros((N, N), dtype=complex)
    for t in range(T - 1):
        Ut = np.asarray(qct.iso_vec_to_operator(U[t]))
        M += dts[t] * (Ut.conj().T @ H_error @ Ut)
    T_total = float(dts[: T - 1].sum())
    return float(np.linalg.norm(M) ** 2) / (N * T_total) ** 2


def main():
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], 51, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
        piccolo_options=QUIET,
    )
    prob.solve(max_iter=60)
    before = magnus_cost(prob.trajectory, np.asarray(qct.PAULIS["Z"]))
    print(f"warm-start magnus={before:.6e} "
          f"fid={float(qct.unitary_rollout_fidelity(prob.trajectory, sys)):.6f}")

    for label, opts, iters in [
        ("base40", qct.SolverOptions(print_level=1, tol=1e-6), 40),
        ("recalc60", qct.SolverOptions(print_level=1, tol=1e-6,
                                       recalc_y="yes",
                                       recalc_y_feas_tol=1e1), 60),
        ("base100", qct.SolverOptions(print_level=1, tol=1e-6), 100),
    ]:
        rob = qct.UnitaryRobustnessProblem(
            qct.PAULIS["Z"], prob, sys, final_fidelity=0.99,
            ipopt_options=opts,
        )
        rob.solve(max_iter=iters)
        after = magnus_cost(rob.trajectory, np.asarray(qct.PAULIS["Z"]))
        fid = float(qct.unitary_rollout_fidelity(rob.trajectory, sys))
        print(f"[{label}] after={after:.6e} ratio={after/before:.4f} "
              f"fid={fid:.6f} converged={bool(rob.result.converged[0])} "
              f"iters={int(rob.result.n_iter[0])}")


if __name__ == "__main__":
    main()
