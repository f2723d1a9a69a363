"""Probe the per-iteration cost split of the lanes IPM step on real TPU.

Times fused loops (lax.fori_loop, data-dependent across iterations so XLA
cannot CSE) of: the full step, the step with a single-candidate line search,
the KKT solve alone, and the pre stage (residuals+Jacobian+Hessian assembly)
alone.  Guides kernel-fusion priorities (docs/roadmap.md TPU section).
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

T, dt, B, N = 51, 0.2, 512, 20
sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])


def build(**kw):
    return qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-5, matmul_precision="highest",
            kkt_backend="lanes", **kw,
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )


def bench_fn(fn, *args, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1].sum()
    )
    dtms = (time.perf_counter() - t0) * 1e3
    print(json.dumps({"probe": label, "total_ms": round(dtms, 1),
                      "per_iter_ms": round(dtms / N, 2)}), flush=True)


def main():
    prob = build()
    solver = prob.solver
    Z0 = prob.multistart_initial_decisions(
        B, sigma=0.1, rng=np.random.default_rng(42)
    )
    Z0j = jnp.asarray(Z0, jnp.float32)

    # full step loop
    full = jax.jit(
        lambda z: solver._solve_loop(solver.init_state(z), N)
    )
    bench_fn(full, Z0j, label="full_step")

    # single-candidate line search
    prob1 = build(max_ls_iters=1)
    s1 = prob1.solver
    ls1 = jax.jit(lambda z: s1._solve_loop(s1.init_state(z), N))
    bench_fn(ls1, Z0j, label="ls1_step")

    # pre stage only (Z perturbed per iteration from the outputs)
    state = jax.jit(solver.init_state)(Z0j)
    jax.block_until_ready(state)

    @jax.jit
    def pre_loop(st):
        def body(i, Z):
            st2 = st._replace(Z=Z)
            with jax.default_matmul_precision("highest"):
                kkt_in, aux = jax.vmap(solver._iteration_pre)(st2)
            return Z + 1e-9 * kkt_in.rz
        return jax.lax.fori_loop(0, N, body, st.Z)

    bench_fn(pre_loop, state, label="pre_only")

    # KKT solve only
    with jax.default_matmul_precision("highest"):
        kkt_in, aux = jax.jit(
            lambda s: jax.vmap(solver._iteration_pre)(s)
        )(state)
    jax.block_until_ready(kkt_in)

    @jax.jit
    def kkt_loop(ki, dw):
        def body(i, rz):
            with jax.default_matmul_precision("highest"):
                (dz, dlam, ok, dw_used, dw_new, fac, rho_used) = (
                    solver._solve_kkt_batched(ki._replace(rz=rz), dw)
                )
            return rz + 1e-9 * dz
        return jax.lax.fori_loop(0, N, body, ki.rz)

    bench_fn(kkt_loop, kkt_in, state.delta_w, label="kkt_only")
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    if "--finer" not in sys.argv:
        main()


def finer():
    """Finer pre-stage split: banks kernel vs post-bank assembly vs
    Hessian contraction (round-5 fusion-planning probe)."""
    prob = build()
    solver = prob.solver
    analytic = solver.nlp.analytic
    f = solver.funcs
    Z0 = prob.multistart_initial_decisions(
        B, sigma=0.1, rng=np.random.default_rng(42)
    )
    Z0j = jnp.asarray(Z0, jnp.float32)
    state = jax.jit(solver.init_state)(Z0j)
    jax.block_until_ready(state)

    @jax.jit
    def banks_loop(Z):
        def body(i, Zc):
            with jax.default_matmul_precision("highest"):
                banks = analytic.banks_batched(Zc, second_order=True)
            leaf = jax.tree_util.tree_leaves(banks)[0]
            return Zc + 1e-12 * leaf.sum()
        return jax.lax.fori_loop(0, N, body, Z)

    bench_fn(banks_loop, state.Z, label="banks_only")

    @jax.jit
    def dyn_loop(Z):
        def body(i, Zc):
            with jax.default_matmul_precision("highest"):
                banks = analytic.banks_batched(Zc, second_order=True)
                F, A, Bj, Jg, aux = jax.vmap(
                    lambda z, b: f.dyn_eval(z, b)
                )(Zc, banks)
            return Zc + 1e-12 * (F.sum() + A.sum() + Bj.sum())
        return jax.lax.fori_loop(0, N, body, Z)

    bench_fn(dyn_loop, state.Z, label="banks_plus_dyn_eval")

    with jax.default_matmul_precision("highest"):
        banks0 = jax.jit(
            lambda z: analytic.banks_batched(z, second_order=True)
        )(state.Z)
        F0, A0, B0, Jg0, aux0 = jax.jit(
            lambda z, b: jax.vmap(lambda zz, bb: f.dyn_eval(zz, bb))(z, b)
        )(state.Z, banks0)
    jax.block_until_ready(aux0)

    @jax.jit
    def hess_loop(lam, aux):
        def body(i, lamc):
            with jax.default_matmul_precision("highest"):
                H, C = jax.vmap(f.hess_blocks_aux)(
                    state.Z, lamc, state.w, aux
                )
            return lamc + 1e-12 * (H.sum() + C.sum())
        return jax.lax.fori_loop(0, N, body, lam)

    bench_fn(hess_loop, state.lam, aux0, label="hess_only")
    print("FINER DONE", flush=True)


if __name__ == "__main__" and "--finer" in sys.argv:
    finer()
