"""Solver and framework option structs.

SolverOptions mirrors the reference's IpoptOptions surface (call sites:
/root/reference/src/problem_templates/unitary_bang_bang_problem.jl:207,
unitary_sampling_problem.jl:216) for the in-house interior-point method;
PiccoloOptions mirrors the framework-level flag struct (field inventory:
SURVEY.md §2b, uses at _problem_templates.jl:41-73).
"""

from __future__ import annotations

import dataclasses
from typing import Any

__all__ = ["SolverOptions", "IpoptOptions", "PiccoloOptions"]


@dataclasses.dataclass
class SolverOptions:
    """Options for the batched primal-dual interior-point solver."""

    print_level: int = 1
    max_iter: int = 100
    tol: float = 1e-8
    # Ipopt's acceptable-level termination (options `acceptable_tol` /
    # `acceptable_iter`): declare success when the scaled optimality error
    # stays <= acceptable_tol for acceptable_iter CONSECUTIVE iterations.
    # This is how Ipopt handles quasi-Newton tails whose dual infeasibility
    # floors above `tol` (hessian_approximation=limited-memory).  Ipopt
    # defaults: 1e-6 / 15.  acceptable_iter=0 disables.
    acceptable_tol: float = 1e-6
    acceptable_iter: int = 15
    # barrier schedule (Fiacco-McCormick, Ipopt defaults)
    mu_init: float = 1e-1
    kappa_mu: float = 0.2
    theta_mu: float = 1.5
    kappa_epsilon: float = 10.0
    tau_min: float = 0.99
    # barrier strategy: "monotone" (Fiacco-McCormick, the fields above) or
    # "adaptive" (LOQO centrality oracle — Ipopt's mu_strategy=adaptive,
    # mu_oracle=loqo analog; re-centers every iteration, no extra solves)
    mu_strategy: str = "monotone"
    mu_max: float = 1e2
    # regularization
    delta_w_init: float = 1e-8
    delta_w_min: float = 1e-20
    delta_w_max: float = 1e6
    delta_c: float = 1e-8
    # rho*J^T J inertia lift: the stage-wise Riccati factorization needs
    # every partially-condensed block PD — a condition that can demand
    # delta_w 100-1000x larger than the true reduced-Hessian negative
    # curvature (measured on free-dt min-time: lambda_min(reduced) = -0.46
    # but plain factorization needs delta_w >= 100, crippling Newton into a
    # crawl).  Adding rho*J^T J to the (1,1) block is an EXACT transform
    # (J dz = rnu on the solution manifold => same (dz, nu)), preserves the
    # block-tridiagonal structure, and makes the stage-PD condition track
    # the true reduced inertia, so delta_w ~ |lambda_min| suffices.  Engaged
    # only from the `kkt_aug_start`-th factorization retry (the plain fast
    # path is unchanged); rho = kkt_aug_rho_factor * max_t ||H_t||_inf per
    # instance.  kkt_aug_start=1 engages the lift on EVERY regularized
    # retry (k=0 stays plain): a plain attempt at the warm-started large
    # delta would otherwise succeed first and mask the small-delta
    # augmented direction (measured: min-time stayed at delta_w ~ 100-800
    # with kkt_aug_start=2 because plain k=1 succeeded).
    # Default "auto" = on iff the NLP carries stage inequality rows
    # (min-time fidelity floors, L1 slacks, modulus disks) — the class
    # where the persistent-negative-curvature crawl occurs.  Measured A/B
    # (CPU f32, B=64, 44 iters): min_time success 0.906 -> 0.953 with the
    # lift, while always-on cost the PLAIN hadamard path 80% wall and
    # 0.98 -> 0.89 converged (f32 conditioning noise from rho) — hence not
    # a blanket default.  True/False force.
    kkt_aug: Any = "auto"
    kkt_aug_rho_factor: float = 2.0
    kkt_aug_start: int = 1
    # retry warm start: skip the known-doomed plain (dw=0, rho=0) first
    # factorization attempt for instances whose PREVIOUS iteration needed
    # regularization — their k=0 attempt starts directly at dw_prev/3 with
    # the rho lift engaged (per instance; cold instances still try pure
    # Newton first).  Measured on the min-time class the plain attempt
    # fails for ~100% of instances on ~100% of iterations (round-5 diag),
    # so every iteration paid >= 1 wasted batched factorization.  The
    # /3-per-success decay still recovers the Newton tail: once
    # dw_prev/3 < kkt_retry_warm_min the instance resumes trying dw=0.
    # "auto" = on iff the rho*J^T J lift is active (the chronic-retry
    # class); True/False force.
    kkt_retry_warm: Any = "auto"
    kkt_retry_warm_min: float = 1e-6
    # feasibility restoration (the batched analog of Ipopt algorithm A-9,
    # the one structural Ipopt piece the reference inherits that rounds
    # 1-4 lacked): when an instance's line search fails `resto_trigger`
    # consecutive iterations while still infeasible, the instance enters a
    # restoration episode — its objective model is swapped for the scaled
    # proximity cost zeta/2 ||D_R (z - z_R)||^2 (D_R = min(1, 1/|z_R|),
    # Ipopt's scaling) while the linearized defects/bounds/barrier
    # machinery keeps running, so each step is a proximal Newton projection
    # toward the feasible manifold through the SAME batched KKT solve (no
    # second solver).  Unlike Ipopt we keep hard linearized defect rows
    # instead of the l1-elastic split (p, n slacks): the delta_c
    # regularization plays the elastic role and no NLP resizing is needed
    # in lockstep batch mode.  The episode ends when the l1 infeasibility
    # theta drops below resto_kappa * theta_entry (or tol, or after
    # resto_max_iters), the instance's filter is reset on entry and exit,
    # and equality multipliers are frozen across the episode.  Exact /
    # Gauss-Newton Hessian modes only (L-BFGS's sigma*I model never
    # produces the degenerate steps restoration exists for).
    restoration: bool = True
    # trigger 8 (not 4): real-TPU headline A/B (B=512 Hadamard, 44 iters,
    # artifacts/tpu_fused_quality_ab_r05.json) measured trigger=4 entering
    # episodes on transiently-rejected but CONVERGING instances, costing
    # converged_frac 0.912 -> 0.881; trigger=8 restores 0.908 while still
    # catching genuine stalls (the manufactured-stall tests pass unchanged)
    resto_trigger: int = 8
    # fused dynamics assembly: ONE Pallas kernel computes F/A/B and the
    # defect curvature Hc/Cc for every (instance, knot) lane
    # (ops/pallas_dyn_assembly.py), replacing the bank kernel plus ~40
    # dispatch-bound XLA assembly ops per iteration (measured 51% of the
    # step).  "auto" = on when the analytic path, exact Hessian, and the
    # lanes backend apply, recalc_y is off (the kernel consumes pre-reset
    # multipliers), and stage dims fit lanes_max_dim (trace cost is cubic
    # in d, like the unrolled KKT family).  True/False force.
    fused_assembly: Any = "auto"
    # extra iterative-refinement passes after every KKT solve, re-solving
    # the f32 residual through the SAME kept factorization (triangular
    # work only).  Each pass multiplies the backward error by ~eps*cond —
    # the d=47 vectorized-lanes family measured rel_err 9.3e-5 vs dense
    # f64, one pass on real TPU lands 2.9e-7
    # (artifacts/tpu_refine_d47_r05.json), comfortably past the 1e-4
    # scoring band.  Implies factor-keeping on the xla/fused-lanes
    # backends (like soc).  "auto" = 1 pass exactly when the fused lanes
    # backend runs the VECTORIZED family (stage dims above lanes_max_dim
    # — the family whose full-width frontier arithmetic carries the error
    # band), else 0.  An int forces.
    kkt_refine: Any = "auto"
    resto_kappa: float = 0.1
    resto_zeta: float = 1e-3
    resto_max_iters: int = 10
    # line search: "filter" (Wächter–Biegler filter acceptance: a trial is
    # accepted when it improves constraint violation OR barrier objective
    # vs. the filter, with an Armijo test on the barrier objective when the
    # switching condition holds — Ipopt's globalization) or "merit"
    # (l1-merit backtracking with best-merit fallback)
    line_search: str = "merit"
    max_ls_iters: int = 10
    # Armijo slope fraction eta_phi in the filter f-type acceptance test
    # phi(trial) <= phi + eta * alpha * grad_phi^T dz (Ipopt eta_phi)
    armijo_eta: float = 1e-4
    # filter parameters (Wächter & Biegler 2006, Table 1 defaults)
    theta_max_fact: float = 1e4  # absolute-infeasibility cap factor
    gamma_theta: float = 1e-5
    gamma_phi: float = 1e-8
    s_theta: float = 1.1
    s_phi: float = 2.3
    delta_ls: float = 1.0
    filter_size: int = 8  # device-resident filter slots (oldest evicted)
    # watchdog: accept up to `watchdog_trials` non-monotone full steps before
    # falling back to the last safe iterate (0 disables)
    watchdog_trials: int = 0
    # second-order correction (Ipopt step A-5.1): when the full step is
    # rejected and constraint violation grew, re-solve the SAME KKT
    # factorization with a corrected defect rhs and take that step if it
    # wins on merit.  Reuses the factorization (triangular solves only; on
    # the lanes backend, fused rhs-only Pallas sweeps).  Supported by the
    # exact/Gauss-Newton Hessian modes on the "xla" and "lanes" backends;
    # inert on "lanes_scan" (cross-validation path keeps no factors) and
    # with quasi_newton="lbfgs" (the SMW-corrected factorization is not
    # kept — enable soc with gauss-newton instead).
    soc: bool = False
    kappa_soc: float = 0.99
    # dual recalculation (least-squares multiplier resets; the reference's
    # recalc_y knob, unitary_robustness_problem.jl:166 — Ipopt spells it
    # "yes"/"no", accepted here alongside bools)
    recalc_y: bool = False
    recalc_y_feas_tol: float = 1e-6
    # quasi-Newton mode used when the problem requests eval_hessian=False:
    # "lbfgs" (compact limited-memory BFGS + SMW low-rank KKT correction —
    # Ipopt's hessian_approximation=limited-memory analog) or "gauss-newton"
    # (drop defect curvature, keep exact cost Hessians)
    quasi_newton: str = "lbfgs"
    lbfgs_memory: int = 6
    # numerical type for solver state: None -> follow the input dtype;
    # "float32"/"float64" force a cast of the initial decision (f64 needs
    # jax_enable_x64, i.e. the CPU/test backend)
    dtype: str | None = None
    # TPU matmul precision for solver arithmetic: "highest" (6-pass bf16,
    # full f32 accuracy), "high" (3-pass), or "default" (fast, bf16-ish —
    # insufficient for tight KKT tolerances)
    matmul_precision: str = "highest"
    # precision ladder: NLP function/derivative evaluation (defects,
    # Jacobians, Hessians, merit) may run at a lower pass count than the KKT
    # factorization; None -> follow matmul_precision
    eval_precision: str | None = None
    # Ipopt-style gradient-based objective/constraint scaling plus
    # Jacobian-column variable scaling, computed once at the initial point
    nlp_scaling: bool = True
    # KKT factorization backend: "xla" (vmapped small linear algebra),
    # "lanes" (fused Pallas batch-across-lanes sweeps; TPU-optimized),
    # "lanes_scan" (per-knot lanes kernels; cross-validation fallback), or
    # "cr" (block cyclic reduction, parallel-in-T: O(log T) critical path
    # instead of O(T) — the latency backend for single/small-batch solves;
    # soc is inert on "cr", which keeps no reusable factors)
    kkt_backend: str = "xla"
    # largest stage dimension the lanes backends accept with the UNROLLED
    # primitive family (O(d^3) traced ops; compile explodes beyond ~24).
    # Above it, up to lanes_vec_max_dim, the VECTORIZED family is used
    # (O(d) traced ops: d=47 compiles in 41 s and solves B=128/T=51 in
    # 28 ms on v5e — real-TPU validated, artifacts/tpu_lanes_vec_r04.json,
    # with the raised scoped-VMEM allowance); beyond that the solver falls
    # back to "xla" with a one-time note.  Default 64: the full cnot
    # config ran end-to-end on the vec-lanes path on real TPU
    # (frac_infid_1e-4 = 1.0, compile 39.6 s, and ~2.8x faster than the
    # xla path under identical degraded-relay conditions).  None means
    # "same as lanes_max_dim" (vec family disabled).
    lanes_max_dim: int = 24
    lanes_vec_max_dim: int | None = 64

    _ENUMS = {
        "mu_strategy": ("monotone", "adaptive"),
        "quasi_newton": ("lbfgs", "gauss-newton"),
        "kkt_backend": ("xla", "lanes", "lanes_scan", "cr"),
        "matmul_precision": ("default", "high", "highest"),
        "eval_precision": (None, "default", "high", "highest"),
        "dtype": (None, "float32", "float64"),
        "line_search": ("filter", "merit"),
    }

    def __post_init__(self):
        import os

        if isinstance(self.recalc_y, str):
            self.recalc_y = self.recalc_y.lower() in ("yes", "true", "on")
        # experiment escape hatch: QCT_KKT_AUG=0 disables the rho*J^T J
        # lift globally (A/B benchmarking without code changes)
        if "QCT_KKT_AUG" in os.environ:
            v = os.environ["QCT_KKT_AUG"]
            self.kkt_aug = (
                "auto" if v == "auto" else v not in ("0", "false")
            )
        if self.kkt_aug not in (True, False, "auto"):
            raise ValueError(
                f"SolverOptions.kkt_aug={self.kkt_aug!r} must be True, "
                f"False, or 'auto'"
            )
        for field, allowed in self._ENUMS.items():
            val = getattr(self, field)
            if val not in allowed:
                raise ValueError(
                    f"SolverOptions.{field}={val!r} is not one of {allowed}"
                )

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


# Back-compatible alias: templates accept ipopt_options=...
IpoptOptions = SolverOptions


@dataclasses.dataclass
class PiccoloOptions:
    """Framework-level flags threaded through every problem template."""

    verbose: bool = True
    free_time: bool = True
    timesteps_all_equal: bool = True
    integrator: str = "pade"  # or "exponential"
    pade_order: int = 4
    # integrator used by initialization/validation rollouts: "expm" (dense
    # propagator bank, parallel-in-t) or "expv" (Krylov/Taylor action of
    # exp(G dt) on the state without forming the propagator — the
    # reference's default, /root/reference/src/trajectory_initialization.jl:398)
    rollout_integrator: str = "expm"
    geodesic: bool = True
    bound_state: bool = False
    eval_hessian: bool = True
    leakage_suppression: bool = False
    R_leakage: float = 1.0
    complex_control_norm_constraint_name: str | None = None
    complex_control_norm_constraint_radius: float = 1.0
    build_trajectory_constraints: bool = True
    # exploit defect sparsity structure: nonlinear-coordinate-restricted
    # Hessian passes + (where available) the analytic propagator-bank
    # assembly.  False falls back to dense AD over full knot rows.
    jacobian_structure: bool = True

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)
