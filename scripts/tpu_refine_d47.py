"""Real-TPU: iterative refinement on the d=47 vectorized lanes family.

VERDICT r4 weak #6: rel_err 9.3e-5 vs dense f64 at d=47 sits close to the
1e-4 cnot scoring band.  This measures the SolverOptions.kkt_refine
mechanism at the exact shape: f32 solve + want_factors, one/two
rhs-resolve refinement passes, relative error and wall cost per pass.
Writes artifacts/tpu_refine_d47_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from quantumcollocation_tpu.solver.kkt_lanes import (
    resolve_kkt_lanes,
    solve_kkt_lanes,
)
from quantumcollocation_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

B, T, d, s = 128, 51, 47, 40
rng = np.random.default_rng(0)
H = rng.standard_normal((B, T, d, d)).astype(np.float32) * 0.01
H = H + np.swapaxes(H, -1, -2) + 3.0 * np.eye(d, dtype=np.float32)
C = rng.standard_normal((B, T - 1, d, d)).astype(np.float32) * 0.01
A = rng.standard_normal((B, T - 1, s, d)).astype(np.float32) * 0.1
Bj = rng.standard_normal((B, T - 1, s, d)).astype(np.float32) * 0.1
rz = rng.standard_normal((B, T, d)).astype(np.float32)
rnu = rng.standard_normal((B, T - 1, s)).astype(np.float32)
args = [jnp.asarray(x) for x in (H, C, A, Bj, rz, rnu)]
delta_c = 1e-8


@jax.jit
def solve_refined(H32, C32, A32, B32, rz32, rnu32):
    dz, nu, ok, fac = solve_kkt_lanes(
        H32, C32, A32, B32, rz32, rnu32, delta_c, want_factors=True
    )
    outs = [dz]
    for _ in range(2):
        Hdz = jnp.einsum("btij,btj->bti", H32, dz)
        Hdz = Hdz.at[:, :-1].add(
            jnp.einsum("btij,btj->bti", C32, dz[:, 1:])
        )
        Hdz = Hdz.at[:, 1:].add(
            jnp.einsum("btji,btj->bti", C32, dz[:, :-1])
        )
        JTnu = jnp.zeros_like(dz)
        JTnu = JTnu.at[:, :-1].add(jnp.einsum("btsd,bts->btd", A32, nu))
        JTnu = JTnu.at[:, 1:].add(jnp.einsum("btsd,bts->btd", B32, nu))
        r1 = Hdz + JTnu - rz32
        Jdz = jnp.einsum("btsd,btd->bts", A32, dz[:, :-1]) + jnp.einsum(
            "btsd,btd->bts", B32, dz[:, 1:]
        )
        r2 = Jdz - delta_c * nu - rnu32
        ez, enu, okr = resolve_kkt_lanes(fac, -r1, -r2)
        dz = dz + jnp.where(okr[:, None, None], ez, 0.0)
        nu = nu + jnp.where(okr[:, None, None], enu, 0.0)
        outs.append(dz)
    return outs, ok


t0 = time.perf_counter()
with jax.default_matmul_precision("highest"):
    outs, ok = solve_refined(*args)
jax.block_until_ready(outs)
compile_s = time.perf_counter() - t0

walls = []
for rep in range(3):
    args2 = [
        jnp.asarray(x + np.float32(1e-6 * (rep + 1))) for x in (H, C, A, Bj, rz, rnu)
    ]
    jax.block_until_ready(args2)
    t0 = time.perf_counter()
    with jax.default_matmul_precision("highest"):
        o2, _ = solve_refined(*args2)
    jax.block_until_ready(o2)
    walls.append(time.perf_counter() - t0)

# dense f64 reference, instance 0
Hn, Cn, An, Bn, rzn, rnun = (
    np.asarray(x, np.float64) for x in (H, C, A, Bj, rz, rnu)
)
n, nc = T * d, (T - 1) * s
W = np.zeros((n, n))
for t in range(T):
    W[t * d:(t + 1) * d, t * d:(t + 1) * d] = Hn[0, t]
for t in range(T - 1):
    W[t * d:(t + 1) * d, (t + 1) * d:(t + 2) * d] += Cn[0, t]
    W[(t + 1) * d:(t + 2) * d, t * d:(t + 1) * d] += Cn[0, t].T
J = np.zeros((nc, n))
for t in range(T - 1):
    J[t * s:(t + 1) * s, t * d:(t + 1) * d] = An[0, t]
    J[t * s:(t + 1) * s, (t + 1) * d:(t + 2) * d] = Bn[0, t]
K = np.block([[W, J.T], [J, -delta_c * np.eye(nc)]])
sol = np.linalg.solve(
    K, np.concatenate([rzn[0].reshape(-1), rnun[0].reshape(-1)])
)
dz_ref = sol[:n].reshape(T, d)
scale = max(1.0, np.abs(dz_ref).max())
errs = [
    float(np.max(np.abs(np.asarray(o[0], np.float64) - dz_ref)) / scale)
    for o in outs
]
out = {
    "B": B, "T": T, "d": d, "s": s,
    "ok": bool(np.asarray(ok).all()),
    "compile_s": round(compile_s, 1),
    "walls_s": [round(w, 4) for w in walls],
    "rel_err_passes": errs,  # [no refine, 1 pass, 2 passes]
}
print(json.dumps(out))
with open("artifacts/tpu_refine_d47_r05.json", "w") as f:
    json.dump(out, f, indent=1)
