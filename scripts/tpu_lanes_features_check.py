"""Real-TPU (Mosaic) validation of the lanes-backend feature kernels:
want_factors output, rhs-only re-solve (SOC), and multi-column rhs (L-BFGS
SMW).  Interpret-mode success does NOT imply TPU compile success (CLAUDE.md)
— run this once after touching kkt_lanes.py.

Usage: python scripts/tpu_lanes_features_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from quantumcollocation_tpu.solver.kkt import factor_kkt, solve_with_factors
from quantumcollocation_tpu.solver.kkt_lanes import (
    resolve_kkt_lanes,
    solve_kkt_lanes,
)


def main():
    print("backend:", jax.default_backend())
    assert jax.default_backend() == "tpu", "run on the TPU host"
    rng = np.random.default_rng(0)
    # bench-like shapes
    Bt, T, d, s = 256, 51, 15, 13
    M = rng.standard_normal((Bt, T, d, d))
    H = (np.einsum("btij,btkj->btik", M, M) / d + 3 * np.eye(d)).astype(
        np.float32
    )
    C = 0.1 * rng.standard_normal((Bt, T - 1, d, d)).astype(np.float32)
    A = rng.standard_normal((Bt, T - 1, s, d)).astype(np.float32)
    Bj = rng.standard_normal((Bt, T - 1, s, d)).astype(np.float32)
    rz = rng.standard_normal((Bt, T, d)).astype(np.float32)
    rnu = rng.standard_normal((Bt, T - 1, s)).astype(np.float32)
    delta_c = 1e-8
    args = [jnp.asarray(x) for x in (H, C, A, Bj, rz, rnu)]

    with jax.default_matmul_precision("highest"):
        fac_x = jax.jit(
            jax.vmap(lambda h, c, a, b: factor_kkt(h, c, a, b, delta_c))
        )(*args[:4])
        dz_x, nu_x, _ = jax.jit(jax.vmap(solve_with_factors))(
            fac_x, args[4], args[5]
        )
        jax.block_until_ready(dz_x)

    t0 = time.perf_counter()
    dz_l, nu_l, ok, fac = solve_kkt_lanes(*args, delta_c, want_factors=True)
    jax.block_until_ready(dz_l)
    print(f"factor+solve compile+run: {time.perf_counter()-t0:.1f}s")
    # want_factors must be BITWISE identical to the (round-1 TPU-validated)
    # plain path; vs the xla path only consistency to f32-conditioning level
    # is expected on this deliberately random synthetic system
    dz_p, _, _ = solve_kkt_lanes(*args, delta_c)
    err_p = float(jnp.max(jnp.abs(dz_l - dz_p)))
    rel_x = float(jnp.max(jnp.abs(dz_l - dz_x)) / jnp.max(jnp.abs(dz_x)))
    print("want_factors vs plain lanes:", err_p, "| rel vs xla:", rel_x)
    assert bool(ok.all()) and err_p == 0.0 and rel_x < 0.25

    rz2 = jnp.asarray(rng.standard_normal((Bt, T, d)).astype(np.float32))
    rnu2 = jnp.asarray(
        rng.standard_normal((Bt, T - 1, s)).astype(np.float32)
    )
    t0 = time.perf_counter()
    dz_r, nu_r, ok_r = resolve_kkt_lanes(fac, rz2, rnu2)
    jax.block_until_ready(dz_r)
    print(f"re-solve compile+run: {time.perf_counter()-t0:.1f}s")
    dz_x2, _, _ = jax.jit(jax.vmap(solve_with_factors))(fac_x, rz2, rnu2)
    rel = float(jnp.max(jnp.abs(dz_r - dz_x2)) / jnp.max(jnp.abs(dz_x2)))
    print("resolve dz rel err vs xla:", rel)
    assert bool(ok_r.all()) and rel < 0.25

    r = 13  # 1 + 2*lbfgs_memory
    RZ = jnp.asarray(rng.standard_normal((Bt, T, d, r)).astype(np.float32))
    RNU = jnp.asarray(
        rng.standard_normal((Bt, T - 1, s, r)).astype(np.float32)
    )
    t0 = time.perf_counter()
    DZ, NU, okm = solve_kkt_lanes(*args[:4], RZ, RNU, delta_c)
    jax.block_until_ready(DZ)
    print(f"multi-rhs (r={r}) compile+run: {time.perf_counter()-t0:.1f}s")
    # each column must match a single-rhs lanes solve bitwise
    dz_ck, _, _ = solve_kkt_lanes(*args[:4], RZ[..., 5], RNU[..., 5], delta_c)
    err = float(jnp.max(jnp.abs(DZ[..., 5] - dz_ck)))
    print("multi-rhs col-5 err vs single-rhs lanes:", err)
    assert bool(okm.all()) and err == 0.0

    # timing: re-solve vs fresh factor+solve
    for fn, name in [
        (lambda: solve_kkt_lanes(*args, delta_c), "factor+solve"),
        (lambda: resolve_kkt_lanes(fac, rz2, rnu2), "rhs re-solve"),
    ]:
        out = fn()
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn()
            jax.block_until_ready(out[0])
        print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.2f} ms")

    print("TPU lanes feature check OK")


if __name__ == "__main__":
    main()
