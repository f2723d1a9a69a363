"""Calibration for VERDICT-r1 task 5: measure the comparative quantities the
tightened behavioral tests will assert, so thresholds are set from data.

Run on CPU (mirrors tests/conftest.py config).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import quantumcollocation_tpu as qct  # noqa: E402

TOL = qct.SolverOptions(print_level=1, tol=1e-6)
QUIET = qct.PiccoloOptions(verbose=False)


def magnus_cost(traj, H_error, unitary_name="Ũ⃗"):
    """First-order Magnus robustness cost ||sum_t dt U_t^† H_e U_t||_F^2,
    normalized by (N * T_total)^2 — matches RobustnessAccumulatorIntegrator +
    terminal cost in problems/unitary_robustness.py."""
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


def run_sampling():
    def sys_with_zeta(z):
        return qct.QuantumSystem(
            z * qct.PAULIS["Z"], [qct.PAULIS["X"], qct.PAULIS["Y"]]
        )

    T, dt = 50, 0.2
    sampled = qct.UnitarySamplingProblem(
        [sys_with_zeta(-0.05), sys_with_zeta(0.0), sys_with_zeta(0.05)],
        qct.GATES["H"], T, dt,
        ipopt_options=TOL, piccolo_options=QUIET,
        rng=np.random.default_rng(1234),
    )
    sampled.solve(max_iter=30)

    plain = qct.UnitarySmoothPulseProblem(
        sys_with_zeta(0.0), qct.GATES["H"], T, dt,
        ipopt_options=TOL, piccolo_options=QUIET,
        rng=np.random.default_rng(1234),
    )
    plain.solve(max_iter=30)

    goal = qct.operator_to_iso_vec(qct.GATES["H"])
    v0 = qct.operator_to_iso_vec(np.eye(2, dtype=complex))
    f_sampled = f_plain = 0.0
    for z in np.arange(-0.05, 0.0501, 0.01):
        sysz = sys_with_zeta(z)
        for name, traj in (("sampled", sampled.trajectory),
                           ("plain", plain.trajectory)):
            a = traj["a"]
            dts = traj.get_timesteps()
            Us = qct.unitary_rollout(v0, a, dts, sysz)
            f = float(qct.iso_vec_unitary_fidelity(Us[-1], goal))
            if name == "sampled":
                f_sampled += f
            else:
                f_plain += f
    print(f"[sampling] f_sampled={f_sampled:.6f} f_plain={f_plain:.6f} "
          f"ratio={f_sampled/f_plain:.4f}")


def run_robustness():
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], 51, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-7),
        piccolo_options=QUIET,
    )
    prob.solve(max_iter=60)
    before = magnus_cost(prob.trajectory, np.asarray(qct.PAULIS["Z"]))
    rob = qct.UnitaryRobustnessProblem(
        qct.PAULIS["Z"], prob, sys, final_fidelity=0.99,
    )
    rob.solve(max_iter=40)
    after = magnus_cost(rob.trajectory, np.asarray(qct.PAULIS["Z"]))
    fid = float(qct.unitary_rollout_fidelity(rob.trajectory, sys))
    print(f"[robustness] before={before:.6e} after={after:.6e} "
          f"ratio={after/max(before,1e-300):.4f} fid_after={fid:.6f}")


def run_leakage():
    from quantumcollocation_tpu.systems import TransmonSystem

    sys = TransmonSystem(omega=4.0, delta=0.2, levels=3)
    U_goal = qct.EmbeddedOperator(qct.GATES["X"], sys)

    def total_leakage(p):
        iso_leak = qct.get_iso_vec_leakage_indices(U_goal)
        U = np.asarray(p.trajectory["Ũ⃗"])
        return float(np.linalg.norm(U[:, iso_leak]))

    kwargs = dict(a_bound=0.5, ipopt_options=TOL)
    prob = qct.UnitarySmoothPulseProblem(
        sys, U_goal, 40, 0.1,
        piccolo_options=qct.PiccoloOptions(
            verbose=False, leakage_suppression=True, R_leakage=1e-1,
            free_time=False,
        ),
        rng=np.random.default_rng(11), **kwargs,
    )
    prob.solve(max_iter=70)
    plain = qct.UnitarySmoothPulseProblem(
        sys, U_goal, 40, 0.1,
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(11), **kwargs,
    )
    plain.solve(max_iter=70)
    ls, lp = total_leakage(prob), total_leakage(plain)
    fid = float(qct.unitary_rollout_fidelity(
        prob.trajectory, sys, subspace=U_goal.subspace))
    print(f"[leakage] suppressed={ls:.6f} plain={lp:.6f} ratio={ls/lp:.4f} "
          f"fid={fid:.6f}")


def run_direct_sum():
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    kwargs = dict(ipopt_options=TOL, piccolo_options=QUIET)
    p1 = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], 31, 0.2, rng=np.random.default_rng(0), **kwargs)
    p2 = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["X"], 31, 0.2, rng=np.random.default_rng(1), **kwargs)
    p1.solve(max_iter=30)
    p2.solve(max_iter=30)
    ds = qct.UnitaryDirectSumProblem(
        [p1, p2], 0.99, drive_reset_ratio=0.25,
        rng=np.random.default_rng(2),
    )
    f1_0 = float(qct.unitary_rollout_fidelity(
        ds.trajectory, sys, state_name="Ũ⃗1", drive_name="a1"))
    f2_0 = float(qct.unitary_rollout_fidelity(
        ds.trajectory, sys, state_name="Ũ⃗2", drive_name="a2"))
    ds.solve(max_iter=20)
    f1 = float(qct.unitary_rollout_fidelity(
        ds.trajectory, sys, state_name="Ũ⃗1", drive_name="a1"))
    f2 = float(qct.unitary_rollout_fidelity(
        ds.trajectory, sys, state_name="Ũ⃗2", drive_name="a2"))
    print(f"[direct_sum] f1 {f1_0:.4f}->{f1:.4f}  f2 {f2_0:.4f}->{f2:.4f}")


if __name__ == "__main__":
    import sys as _s
    which = _s.argv[1] if len(_s.argv) > 1 else "all"
    if which in ("all", "sampling"):
        run_sampling()
    if which in ("all", "robustness"):
        run_robustness()
    if which in ("all", "leakage"):
        run_leakage()
    if which in ("all", "direct_sum"):
        run_direct_sum()
