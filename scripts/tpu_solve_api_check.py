"""Exercise the PUBLIC solve API on the real TPU once (round-2 verdict
Missing #1: `prob.solve()` crashed on TPU via eager complex objective
evaluation; round-2/3 fixes: real-iso fidelities + jitted objective +
CPU-device problem builds).

Run:  python scripts/tpu_solve_api_check.py
Prints one JSON line: backend, fidelity before/after, wall seconds.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    t0 = time.perf_counter()
    import quantumcollocation_tpu as qct

    backend = jax.default_backend()
    # problem construction on the CPU device (each eager op is a relay
    # round trip on the tunneled TPU runtime — CLAUDE.md)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        sys_q = qct.QuantumSystem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]]
        )
        prob = qct.UnitarySmoothPulseProblem(
            sys_q, qct.GATES["H"], 51, 0.2, Q=1e4, R=1e-3,
            ipopt_options=qct.SolverOptions(print_level=1, tol=1e-5),
            piccolo_options=qct.PiccoloOptions(verbose=False),
            rng=np.random.default_rng(0),
        )
        f0 = float(qct.unitary_rollout_fidelity(prob.trajectory, sys_q))
    build_s = time.perf_counter() - t0

    # the public one-line workflow (reference: solve!(prob),
    # /root/reference/README.md:115) — THIS runs on the default (TPU) device
    t1 = time.perf_counter()
    prob.solve(max_iter=44)
    solve_s = time.perf_counter() - t1

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        f1 = float(qct.unitary_rollout_fidelity(prob.trajectory, sys_q))
    # f32 rollout drift over T=51 sequential products is ~1e-4, so the
    # fidelity may legitimately read slightly above 1 here; the bench's
    # separate host-f64 validation is the precise instrument
    ok = f1 > f0 and f1 <= 1.0 + 5e-4 and abs(1.0 - f1) < 1e-3
    print(
        json.dumps(
            {
                "check": "public_solve_api",
                "backend": backend,
                "build_s": round(build_s, 1),
                "solve_s": round(solve_s, 1),
                "fid_before": round(f0, 6),
                "fid_after": round(f1, 8),
                "ok": bool(ok),
            }
        ),
        flush=True,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
