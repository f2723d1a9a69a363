"""Real-TPU A/B: hadamard bench-config converged_frac, fused assembly
on vs off (round-5 rehearsal read 0.873 vs the r02 unfused 0.986)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.ops.native import unitary_rollout_fidelity_native
from quantumcollocation_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

B, T, dt = 512, 51, 0.2
out = {}


def _cpu():
    return jax.default_device(jax.local_devices(backend="cpu")[0])


VARIANTS = [
    # bench-exact baseline (filter LS, kappa_mu=0.1) vs the knobs the
    # earlier sweep accidentally changed (merit LS, kappa_mu=0.2)
    ("flt_km01_48", dict(line_search="filter", kappa_mu=0.1, _iters=48)),
    ("flt_km02_48", dict(line_search="filter", kappa_mu=0.2, _iters=48)),
    ("mrt_km02_48", dict(line_search="merit", kappa_mu=0.2, _iters=48)),
    ("mrt_km01_48", dict(line_search="merit", kappa_mu=0.1, _iters=48)),
    ("flt_km02_52", dict(line_search="filter", kappa_mu=0.2, _iters=52)),
    ("mrt_km02_44", dict(line_search="merit", kappa_mu=0.2, _iters=44)),
]
for label, kw in VARIANTS:
    kw = dict(kw)
    iters = kw.pop("_iters", 44)
    with _cpu():
        sys_q = qct.QuantumSystem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]]
        )
        prob = qct.UnitarySmoothPulseProblem(
            sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
            ipopt_options=qct.SolverOptions(
                print_level=1, tol=1e-5, matmul_precision="highest",
                eval_precision="high", kkt_backend="lanes",
                **kw,
            ),
            piccolo_options=qct.PiccoloOptions(verbose=False),
            rng=np.random.default_rng(0),
        )
        z0 = np.asarray(prob.initial_decision(1))[0]
        a_sl = prob.trajectory.comp_slice("a")
        rng = np.random.default_rng(42)
        Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
        Z0[:, 1:-1, a_sl] += 0.1 * rng.standard_normal(
            (B, T - 2, a_sl.stop - a_sl.start)
        )
    solver = prob.solver
    loop = jax.jit(lambda z: solver._solve_loop(solver.init_state(z), iters))
    t0 = time.perf_counter()
    st = loop(jnp.asarray(Z0, jnp.float32))
    jax.block_until_ready(st)
    compile_s = time.perf_counter() - t0
    Z = solver.unscale(np.asarray(st.Z))
    a_all = Z[:, :, a_sl]
    tname = prob.trajectory.timestep
    dt_sl = prob.trajectory.comp_slice(tname)
    dts_all = Z[:, :, dt_sl][:, :, 0]
    goal_iso = np.asarray(qct.operator_to_iso_operator(qct.GATES["H"]))
    fids = unitary_rollout_fidelity_native(
        np.asarray(sys_q.G_drift), np.asarray(sys_q.G_drives),
        a_all, dts_all, goal_iso,
    )
    infid = 1.0 - np.asarray(fids)
    out[label] = {
        "compile_s": round(compile_s, 1),
        "frac_1e-4": float(np.mean(infid <= 1e-4)),
        "frac_1e-3": float(np.mean(infid <= 1e-3)),
        "median_infid": float(np.median(infid)),
        "conv_flag_frac": float(np.asarray(st.converged).mean()),
        "kkt_med": float(np.median(np.asarray(st.kkt_err))),
    }
    print(label, out[label], file=sys.stderr, flush=True)

print(json.dumps(out))
with open("artifacts/tpu_fused_quality_ab_r05.json", "w") as f:
    json.dump(out, f, indent=1)
