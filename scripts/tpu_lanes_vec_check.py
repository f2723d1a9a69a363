"""Real-TPU validation of the VECTORIZED lanes family (round 4):
Mosaic-compilability + numerics at d=47 (the cnot/su4 stage dimension that
the unrolled family's cubic compile time kept off the fast path), plus a
d=15 A/B to tune _VEC_MIN_DIM.

Writes artifacts/tpu_lanes_vec_r04.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def make_problem(B, T, d, s, seed=0):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((B, T, d, d)).astype(np.float32) * 0.01
    H = H + np.swapaxes(H, -1, -2) + 3.0 * np.eye(d, dtype=np.float32)
    C = rng.standard_normal((B, T - 1, d, d)).astype(np.float32) * 0.01
    A = rng.standard_normal((B, T - 1, s, d)).astype(np.float32) * 0.1
    Bj = rng.standard_normal((B, T - 1, s, d)).astype(np.float32) * 0.1
    rz = rng.standard_normal((B, T, d)).astype(np.float32)
    rnu = rng.standard_normal((B, T - 1, s)).astype(np.float32)
    return H, C, A, Bj, rz, rnu


def run(vec: bool, B, T, d, s, n_solves=3):
    os.environ["QCT_LANES_VEC"] = "1" if vec else "0"
    import importlib

    import quantumcollocation_tpu.solver.kkt_lanes as kl

    importlib.reload(kl)
    args = [jnp.asarray(x) for x in make_problem(B, T, d, s)]
    t0 = time.perf_counter()
    dz, nu, ok = kl.solve_kkt_lanes(*args, 1e-8, interpret=False)
    jax.block_until_ready(dz)
    compile_s = time.perf_counter() - t0
    walls = []
    for k in range(n_solves):
        args2 = [jnp.asarray(x) for x in make_problem(B, T, d, s, seed=k + 1)]
        jax.block_until_ready(args2)
        t0 = time.perf_counter()
        dz2, nu2, ok2 = kl.solve_kkt_lanes(*args2, 1e-8, interpret=False)
        jax.block_until_ready(dz2)
        walls.append(time.perf_counter() - t0)
    # numerics: dense f64 reference on instance 0
    Hn, Cn, An, Bn, rzn, rnun = [np.asarray(a, np.float64) for a in args]
    n = T * d
    nc = (T - 1) * s
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
    K = np.block([[W, J.T], [J, -1e-8 * np.eye(nc)]])
    sol = np.linalg.solve(
        K, np.concatenate([rzn[0].reshape(-1), rnun[0].reshape(-1)])
    )
    dz_ref = sol[:n].reshape(T, d)
    err = float(
        np.max(np.abs(np.asarray(dz[0], np.float64) - dz_ref))
        / max(1.0, np.abs(dz_ref).max())
    )
    return {
        "vec": vec, "B": B, "T": T, "d": d, "s": s,
        "ok": bool(np.asarray(ok).all()),
        "compile_s": round(compile_s, 1),
        "wall_s": [round(w, 4) for w in walls],
        "wall_min_s": round(min(walls), 4),
        "rel_err_vs_dense_f64": err,
    }


def main():
    rows = []
    # d=15-ish headline shape: unrolled vs vectorized runtime A/B
    for vec in (False, True):
        rows.append(run(vec, 512, 51, 15, 8))
        print(json.dumps(rows[-1]), flush=True)
    # d=47 cnot/su4 shape: vectorized only (unrolled compile is the
    # known 160+ s failure mode; skip)
    rows.append(run(True, 128, 51, 47, 40))
    print(json.dumps(rows[-1]), flush=True)
    out = {"artifact": "tpu_lanes_vec", "rows": rows}
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts",
            "tpu_lanes_vec_r04.json"), "w",
    ) as f:
        json.dump(out, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
