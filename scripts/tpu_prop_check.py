"""Real-TPU validation of the Pallas propagator-bank kernel.

1. prop_bank_lanes (Mosaic-compiled) vs the pure-JAX banks — value check.
2. One IPM step with the hoisted bank kernel vs the pure path — value check.
3. Per-iteration timing probe at bench shapes.

Run: timeout 900 python scripts/tpu_prop_check.py   (ONE process; never kill)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
    on_tpu = jax.default_backend() == "tpu"

    import quantumcollocation_tpu as qct
    from quantumcollocation_tpu.ops.pallas_prop_bank import prop_bank_lanes

    rng = np.random.default_rng(3)
    n, na, M = 4, 2, 512
    G0 = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Gs = jnp.asarray(rng.standard_normal((na, n, n)), jnp.float32)
    a = jnp.asarray(0.4 * rng.standard_normal((M, na)), jnp.float32)
    dts = jnp.asarray(0.1 + 0.2 * rng.random(M), jnp.float32)

    for kind, order in (("pade", 4), ("exp", 8)):
        t0 = time.perf_counter()
        out = prop_bank_lanes(
            a, dts, G0, Gs, kind=kind, order=order, num_squarings=4,
            free_dt=True, second_order=True, interpret=not on_tpu,
        )
        jax.block_until_ready(out[0])
        print(f"[{kind}] kernel compile+run: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        # pure-JAX reference at f32 via banks (on-device, highest precision)
        from quantumcollocation_tpu.dynamics.expm import (
            expm_frechet_bank, pade_poly_frechet, frechet_pairs,
        )
        pairs = frechet_pairs(na + 1)
        with jax.default_matmul_precision("highest"):
            def ref_one(ai, dti):
                G = G0 + jnp.tensordot(ai, Gs, axes=1)
                X = G * dti
                dX = jnp.concatenate([Gs * dti, G[None]], axis=0)
                d2X = jnp.stack([
                    Gs[k] if (k < na and l == na) else jnp.zeros((n, n))
                    for (k, l) in pairs
                ])
                if kind == "exp":
                    return expm_frechet_bank(
                        X, dX, d2X, order=order, num_squarings=4)
                return pade_poly_frechet(X, dX, d2X, order=order)
            refs = jax.jit(jax.vmap(ref_one))(a, dts)
        err = 0.0
        for oi, r in zip(out, refs):
            if r is None:
                continue
            scale = float(jnp.max(jnp.abs(r))) or 1.0
            err = max(err, float(jnp.max(jnp.abs(oi - r))) / scale)
        print(f"[{kind}] kernel vs pure max REL err: {err:.3e}")
        # f32 roundoff bar (the kernel is measured CLOSER to the f64 truth
        # than the 6-pass XLA path; this guards against layout/logic bugs)
        assert err < 5e-5, f"{kind} kernel mismatch on TPU: {err}"

    # --- one IPM step: kernel banks vs pure banks ------------------------- #
    B, T = 128, 51
    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], T, 0.2, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-5, kkt_backend="lanes" if on_tpu else "xla"
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )
    solver = prob.solver
    an = solver.nlp.analytic
    assert an is not None
    z0 = np.asarray(prob.initial_decision(1)[0])
    a_sl = prob.trajectory.comp_slice("a")
    Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
    Z0[:, 1:-1, a_sl] += 0.1 * rng.standard_normal((B, T - 2, 2))
    state = solver._init_state_jit(jnp.asarray(Z0, jnp.float32))

    with jax.default_matmul_precision("highest"):
        bk = jax.jit(
            lambda Z: an.banks_batched(Z, second_order=True, use_kernel=True)
        )(state.Z)
        bp = jax.jit(
            lambda Z: an.banks_batched(Z, second_order=True, use_kernel=False)
        )(state.Z)
    err = 0.0
    for gk, gp in zip(bk, bp):
        for xk, xp_ in zip(gk, gp):
            if xk is None:
                continue
            err = max(err, float(jnp.max(jnp.abs(xk - xp_))))
    print(f"[ipm-banks] kernel vs pure max err: {err:.3e}")

    step = jax.jit(solver._step_impl)
    t0 = time.perf_counter()
    s1 = step(state)
    jax.block_until_ready(s1.Z)
    print(f"[ipm] step compile+run: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    # timing: a few steps with fresh states (relay caches identical inputs)
    times = []
    st = s1
    for _ in range(5):
        t0 = time.perf_counter()
        st = step(st)
        jax.block_until_ready(st.Z)
        times.append(time.perf_counter() - t0)
    print(f"[ipm] per-step wall (B={B}): {min(times)*1e3:.1f} ms "
          f"(all: {[f'{t*1e3:.1f}' for t in times]})")
    print(f"[ipm] kkt_err[0] after 6 steps: {float(st.kkt_err[0]):.3e}")
    print("TPU PROP CHECK OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
