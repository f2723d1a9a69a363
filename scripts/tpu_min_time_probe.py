"""Real-TPU probe: min_time per-iteration cost vs hadamard (VERDICT r5 #2).

Builds the bench min_time config (B=512, T=51, lanes backend), times short
resumable solve segments, and prints a JSON summary with a same-run
hadamard calibration so relay health is controlled for.

One TPU process, every device call well under the relay's ~100 s kill
threshold; problem builds run under the CPU device (CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

B, T, dt = 512, 51, 0.2
dtype = jnp.float32
out = {"backend": jax.default_backend(), "batch": B}


def _cpu():
    return jax.default_device(jax.local_devices(backend="cpu")[0])


def _time_segments(solver, Z0, n_iters, seg, label):
    """Compile + run seg-sized _solve_loop chains; return (compile_s,
    best wall over repeats, final state)."""
    segs = [seg] * (n_iters // seg) + (
        [n_iters % seg] if n_iters % seg else []
    )

    def solve(z):
        st = solver._init_state_jit(z)
        for n in segs:
            st = solver._solve_loop(st, n)
        return st

    t0 = time.perf_counter()
    st = solve(jnp.asarray(Z0, dtype))
    jax.block_until_ready(st)
    compile_s = time.perf_counter() - t0
    walls = []
    for rep in range(3):
        Zr = jnp.asarray(
            Z0 + 1e-5 * np.random.default_rng(rep).standard_normal(Z0.shape),
            dtype,
        )
        jax.block_until_ready(Zr)
        t0 = time.perf_counter()
        st = solve(Zr)
        jax.block_until_ready(st)
        _ = float(np.asarray(st.kkt_err).sum())
        walls.append(time.perf_counter() - t0)
        if walls[-1] > 60:
            break
    best = min(walls)
    print(f"[{label}] compile {compile_s:.1f}s  walls "
          f"{[round(w, 3) for w in walls]}  -> {1e3 * best / n_iters:.1f} "
          f"ms/iter", file=sys.stderr, flush=True)
    return compile_s, best, st


# ---- hadamard calibration (same-run relay reference) --------------------
with _cpu():
    had = qct.UnitarySmoothPulseProblem(
        sys_q := qct.QuantumSystem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]]
        ),
        qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-5, matmul_precision="highest",
            eval_precision="high", kkt_backend="lanes",
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )
    z0h = np.asarray(had.initial_decision(1))[0]
    rngh = np.random.default_rng(1)
    Z0h = np.broadcast_to(z0h, (B, *z0h.shape)).copy()
    a_sl = had.trajectory.comp_slice("a")
    Z0h[:, 1:-1, a_sl] += 0.1 * rngh.standard_normal(
        (B, T - 2, a_sl.stop - a_sl.start)
    )
c_h, w_h, _ = _time_segments(had.solver, Z0h, 20, 20, "hadamard-20it")
out["hadamard_ms_per_iter"] = round(1e3 * w_h / 20, 2)
out["hadamard_compile_s"] = round(c_h, 1)


# ---- min_time variants --------------------------------------------------
def build_mt(**over):
    with _cpu():
        warm = qct.UnitarySmoothPulseProblem(
            sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
            ipopt_options=qct.SolverOptions(
                print_level=1, tol=1e-7, recalc_y="yes",
                recalc_y_feas_tol=1e1, kkt_backend="xla",
            ),
            piccolo_options=qct.PiccoloOptions(verbose=False,
                                               free_time=False),
            rng=np.random.default_rng(0),
        )
        warm.solve(max_iter=80)
        a_solved = np.asarray(warm.trajectory["a"])
        traj2 = qct.initialize_unitary_trajectory(
            qct.GATES["H"], T, dt, 2,
            [np.ones(2), np.full(2, np.inf), np.ones(2)],
            free_time=True, a_guess=a_solved, system=sys_q,
        )
        kw = dict(
            print_level=1, tol=1e-6, matmul_precision="highest",
            eval_precision="high", kkt_backend="lanes",
        )
        kw.update(over)
        mt = qct.UnitaryMinimumTimeProblem(
            traj2, sys_q, warm.get_objective(), warm.integrators, [],
            final_fidelity=0.99995, D=1000.0,
            ipopt_options=qct.SolverOptions(**kw),
        )
        z0 = np.asarray(mt.initial_decision(1))[0]
        rng = np.random.default_rng(2)
        Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
        a_sl2 = mt.trajectory.comp_slice("a")
        Z0[:, 1:-1, a_sl2] += 1e-4 * rng.standard_normal(
            (B, T - 2, a_sl2.stop - a_sl2.start)
        )
    return mt, Z0


mt, Z0m = build_mt()
c_m, w_m, st_m = _time_segments(mt.solver, Z0m, 20, 10, "min_time-20it")
out["min_time_ms_per_iter"] = round(1e3 * w_m / 20, 2)
out["min_time_compile_s"] = round(c_m, 1)
out["min_time_vs_hadamard"] = round(w_m / (w_h or 1e-9), 1)

mt_off, Z0o = build_mt(kkt_aug=False)
c_o, w_o, _ = _time_segments(mt_off.solver, Z0o, 20, 10, "min_time-aug_off")
out["min_time_aug_off_ms_per_iter"] = round(1e3 * w_o / 20, 2)

print(json.dumps(out))
