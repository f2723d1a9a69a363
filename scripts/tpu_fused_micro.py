"""Micro-probe: time the fused assembly kernel ALONE vs the banks kernel
alone on real TPU (distinguishes kernel cost from relay noise)."""

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
N = 20


def _cpu():
    return jax.default_device(jax.local_devices(backend="cpu")[0])


with _cpu():
    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
        ipopt_options=qct.SolverOptions(
            print_level=1, tol=1e-5, kkt_backend="lanes",
        ),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )
    Z0 = np.asarray(prob.multistart_initial_decisions(
        B, sigma=0.1, rng=np.random.default_rng(42)
    ))

solver = prob.solver
analytic = solver.nlp.analytic
Z0j = jnp.asarray(Z0, jnp.float32)
lam0 = jnp.zeros((B, T - 1, solver.nlp.s), jnp.float32)
out = {}


def probe(fn, args, label):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    walls = []
    for rep in range(4):
        # fresh input per repeat: the relay caches identical
        # (executable, input) pairs (CLAUDE.md)
        Zr = jnp.asarray(
            Z0 + 1e-6 * np.random.default_rng(rep).standard_normal(Z0.shape),
            jnp.float32,
        )
        jax.block_until_ready(Zr)
        t0 = time.perf_counter()
        r = f(Zr, *args[1:])
        jax.block_until_ready(r)
        _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        walls.append(time.perf_counter() - t0)
    out[label] = {
        "compile_s": round(compile_s, 1),
        "walls_ms": [round(1e3 * w, 2) for w in walls],
    }
    print(label, out[label], file=sys.stderr, flush=True)


def fused_loop(Z, lam):
    def body(i, Zc):
        F, A, Bj, Hc, Cc = analytic.assembly_batched(Zc, lam)
        return Zc + 1e-12 * (F.sum() + A.sum() + Hc.sum())
    return jax.lax.fori_loop(0, N, body, Z)


def banks_loop(Z):
    def body(i, Zc):
        banks = analytic.banks_batched(Zc, second_order=True)
        leaf = jax.tree_util.tree_leaves(banks)[0]
        return Zc + 1e-12 * leaf.sum()
    return jax.lax.fori_loop(0, N, body, Z)


probe(banks_loop, (Z0j,), "banks_loop20")
probe(fused_loop, (Z0j, lam0), "fused_loop20")
print(json.dumps(out))


# cost-Hessian + ineq-Jacobian + grad_cost: the XLA parts remaining in the
# fused pre stage
f_nlp = solver.funcs
w0 = jnp.zeros((B, T, solver.nlp.m), jnp.float32)


def cost_hess_loop(Z, w):
    def body(i, Zc):
        H, C = jax.vmap(f_nlp.cost_hess)(Zc, w)
        return Zc + 1e-12 * (H.sum() + C.sum())
    return jax.lax.fori_loop(0, N, body, Z)


def gradcost_loop(Z):
    def body(i, Zc):
        g = jax.vmap(f_nlp.grad_cost)(Zc)
        return Zc + 1e-12 * g.sum()
    return jax.lax.fori_loop(0, N, body, Z)


probe(cost_hess_loop, (Z0j, w0), "cost_hess_loop20")
probe(gradcost_loop, (Z0j,), "gradcost_loop20")
print(json.dumps({k: out[k] for k in ("cost_hess_loop20", "gradcost_loop20")}))
