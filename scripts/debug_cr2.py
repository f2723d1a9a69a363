"""Residual accuracy of cr vs scan on real mid-run KKT systems."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.solver.kkt import solve_kkt
from quantumcollocation_tpu.solver.kkt_cr import solve_kkt_cr

sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
prob = qct.UnitarySmoothPulseProblem(
    sys_q, qct.GATES["H"], 21, 0.2,
    ipopt_options=qct.SolverOptions(print_level=1, tol=1e-8),
    piccolo_options=qct.PiccoloOptions(verbose=False),
    rng=np.random.default_rng(0),
)
solver = prob.solver
state = solver.init_state(prob.initial_decision(1))


def kkt_residual(H, C, A, B, rz, rnu, dz, nu, delta_c):
    """True residual of the saddle system, single instance."""
    T = H.shape[0]
    # z rows: H_t dz_t + C_{t-1}^T dz_{t-1} + C_t dz_{t+1} + A_t^T nu_t
    #         + B_{t-1}^T nu_{t-1} = rz_t
    r1 = jnp.einsum("tij,tj->ti", H, dz)
    r1 = r1.at[1:].add(jnp.einsum("tij,ti->tj", C, dz[:-1]))
    r1 = r1.at[:-1].add(jnp.einsum("tij,tj->ti", C, dz[1:]))
    r1 = r1.at[:-1].add(jnp.einsum("tsj,ts->tj", A, nu))
    r1 = r1.at[1:].add(jnp.einsum("tsj,ts->tj", B, nu))
    r2 = (
        jnp.einsum("tsj,tj->ts", A, dz[:-1])
        + jnp.einsum("tsj,tj->ts", B, dz[1:])
        - delta_c * nu
    )
    return float(jnp.max(jnp.abs(r1 - rz))), float(jnp.max(jnp.abs(r2 - rnu)))


for it in range(12):
    analytic = solver.nlp.analytic
    with jax.default_matmul_precision("highest"):
        banks = analytic.banks_batched(state.Z, second_order=solver.exact_hessian)
        kkt_in, aux = jax.vmap(solver._iteration_pre)(state, banks)
        H, C, A, Bj, rz, rnu = [x[0] for x in kkt_in[:6]]
        dc = solver.options.delta_c
        eye_d = jnp.eye(H.shape[1], dtype=H.dtype)
        # escalate dw like the retry loop until the scan succeeds
        dw = 0.0
        for k in range(12):
            Hreg = H + dw * eye_d
            dz1, nu1, ok1 = solve_kkt(Hreg, C, A, Bj, rz, rnu, dc)
            if bool(ok1):
                break
            dw = 1e-4 if dw == 0.0 else dw * 8.0
        dz2, nu2, ok2 = solve_kkt_cr(Hreg, C, A, Bj, rz, rnu, dc)
        res1 = kkt_residual(Hreg, C, A, Bj, rz, rnu, dz1, nu1, dc)
        res2 = kkt_residual(Hreg, C, A, Bj, rz, rnu, dz2, nu2, dc)
        scale = float(jnp.max(jnp.abs(rz)))
        print(
            f"it={it} dw={dw:.1e} ok_scan={bool(ok1)} ok_cr={bool(ok2)} "
            f"res_scan=({res1[0]:.2e},{res1[1]:.2e}) "
            f"res_cr=({res2[0]:.2e},{res2[1]:.2e}) "
            f"|dz diff|={float(jnp.max(jnp.abs(dz1-dz2))):.2e} rzmax={scale:.1e}"
        )
        state = solver.step(state)
