"""Real-TPU batch-scaling probe: hadamard full-step loop at B=512/1024/2048.

The headline metric is solves/s/chip = B*frac/wall; if the 20-iter loop
wall grows sublinearly in B (lanes kernels under-filled, per-call relay
floor amortized), raising the bench batch is a direct headline win."""

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

T, dt, N = 51, 0.2, 20
out = {}


def _cpu():
    return jax.default_device(jax.local_devices(backend="cpu")[0])


with _cpu():
    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-5, matmul_precision="highest",
            eval_precision="high", kkt_backend="lanes",
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )
solver = prob.solver

for B in (512, 1024, 2048, 4096):
    with _cpu():
        Z0 = np.asarray(prob.multistart_initial_decisions(
            B, sigma=0.1, rng=np.random.default_rng(42)
        ))
    loop = jax.jit(lambda z: solver._solve_loop(solver.init_state(z), N))
    Z0j = jnp.asarray(Z0, jnp.float32)
    t0 = time.perf_counter()
    st = loop(Z0j)
    jax.block_until_ready(st)
    compile_s = time.perf_counter() - t0
    walls = []
    for rep in range(4):
        Zr = jnp.asarray(
            Z0 + 1e-5 * np.random.default_rng(rep).standard_normal(Z0.shape),
            jnp.float32,
        )
        jax.block_until_ready(Zr)
        t0 = time.perf_counter()
        st = loop(Zr)
        jax.block_until_ready(st)
        _ = float(np.asarray(st.kkt_err).sum())
        walls.append(time.perf_counter() - t0)
        if len(walls) >= 2 and min(walls) > 60:
            break
    best = min(walls)
    out[B] = {
        "compile_s": round(compile_s, 1),
        "walls_s": [round(w, 3) for w in walls],
        "ms_per_iter": round(1e3 * best / N, 2),
        "iter_throughput_inst_per_s": round(B * N / best, 0),
    }
    print(B, out[B], file=sys.stderr, flush=True)

print(json.dumps(out))
with open("artifacts/tpu_batch_scaling_r05.json", "w") as f:
    json.dump(out, f, indent=1)
