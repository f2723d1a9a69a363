"""Real-TPU A/B: leakage config (d=28, s=22) KKT family routing.

BENCH_r03 ran leakage on the XLA fallback (255 ms/iter); r04's default
lanes_vec_max_dim=64 moved it to the VECTORIZED lanes family, which is a
measured ~100x runtime loss at small d (kkt_lanes module docs).  d=28 sits
in the gap where the UNROLLED family still compiles (~40 s measured r03)
and should run at hadamard-class speed.  This times all three routings in
one TPU session, plus the min_time retry-warm-start A/B.
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
from quantumcollocation_tpu.systems import TransmonSystem
from quantumcollocation_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

dtype = jnp.float32
out = {"backend": jax.default_backend()}


def _cpu():
    return jax.default_device(jax.local_devices(backend="cpu")[0])


def _time_segments(solver, Z0, n_iters, seg, label):
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
    return compile_s, best


# ---- leakage: three routings -------------------------------------------
B, T, dt = 256, 40, 0.2
with _cpu():
    sys_t = TransmonSystem(omega=4.0, delta=0.2, levels=3)
    U_goal = qct.EmbeddedOperator(qct.GATES["X"], sys_t)


def build_leak(**kw):
    with _cpu():
        prob = qct.UnitarySmoothPulseProblem(
            sys_t, U_goal, T, dt, a_bound=0.5, Q=1e4, R=1e-3,
            ipopt_options=qct.SolverOptions(
                print_level=1, tol=1e-5, matmul_precision="highest",
                eval_precision="high", **kw,
            ),
            piccolo_options=qct.PiccoloOptions(
                verbose=False, leakage_suppression=True, R_leakage=1e-1,
                free_time=False,
            ),
            rng=np.random.default_rng(11),
        )
        z0 = np.asarray(prob.initial_decision(1))[0]
        a_sl = prob.trajectory.comp_slice("a")
        rng = np.random.default_rng(42)
        Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
        Z0[:, 1:-1, a_sl] += 0.05 * rng.standard_normal(
            (B, T - 2, a_sl.stop - a_sl.start)
        )
    return prob, Z0


for label, kw in [
    ("leak_unrolled", dict(kkt_backend="lanes", lanes_max_dim=32)),
    ("leak_vec", dict(kkt_backend="lanes")),  # default vec path at d=28
    ("leak_xla", dict(kkt_backend="xla")),
]:
    try:
        prob, Z0 = build_leak(**kw)
        c, w = _time_segments(prob.solver, Z0, 20, 10, label)
        out[label + "_ms_per_iter"] = round(1e3 * w / 20, 2)
        out[label + "_compile_s"] = round(c, 1)
    except Exception as e:
        out[label + "_error"] = f"{type(e).__name__}: {e}"[:300]
        print(f"[{label}] FAILED {e}", file=sys.stderr, flush=True)

# ---- min_time: retry warm start A/B ------------------------------------
T2 = 51
with _cpu():
    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    warm = qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], T2, 0.2, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-7, recalc_y="yes", recalc_y_feas_tol=1e1,
            kkt_backend="xla",
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(0),
    )
    warm.solve(max_iter=80)
    a_solved = np.asarray(warm.trajectory["a"])
    traj2 = qct.initialize_unitary_trajectory(
        qct.GATES["H"], T2, 0.2, 2,
        [np.ones(2), np.full(2, np.inf), np.ones(2)],
        free_time=True, a_guess=a_solved, system=sys_q,
    )

for label, wflag in [("mt_warm", "auto"), ("mt_cold", False)]:
    with _cpu():
        mt = qct.UnitaryMinimumTimeProblem(
            traj2, sys_q, warm.get_objective(), warm.integrators, [],
            final_fidelity=0.99995, D=1000.0,
            ipopt_options=qct.SolverOptions(
                print_level=1, tol=1e-6, matmul_precision="highest",
                eval_precision="high", kkt_backend="lanes",
                kkt_retry_warm=wflag,
            ),
        )
        z0 = np.asarray(mt.initial_decision(1))[0]
        a_sl = mt.trajectory.comp_slice("a")
        rng = np.random.default_rng(2)
        Z0m = np.broadcast_to(z0, (512, *z0.shape)).copy()
        Z0m[:, 1:-1, a_sl] += 1e-4 * rng.standard_normal(
            (512, T2 - 2, a_sl.stop - a_sl.start)
        )
    c, w = _time_segments(mt.solver, Z0m, 20, 10, label)
    out[label + "_ms_per_iter"] = round(1e3 * w / 20, 2)
    out[label + "_compile_s"] = round(c, 1)

print(json.dumps(out))
with open("artifacts/tpu_leakage_ab_r05.json", "w") as f:
    json.dump(out, f, indent=1)
