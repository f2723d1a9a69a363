"""Feasibility-restoration phase (Ipopt A-9 analog; SolverOptions.restoration).

The reference inherits restoration from Ipopt (/root/reference/README.md:93
— Ipopt's A-9 l1 restoration); rounds 1-4 of this framework had only the
best-merit fallback + watchdog.  These tests drive the batched restoration
state machine directly: a manufactured infeasible stalled iterate must
enter an episode, cut the l1 infeasibility theta, and exit back to normal
iterations; healthy solves must never trigger it.
"""

import jax
import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct


def _hadamard(T=25, **solver_kw):
    sys_q = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    return sys_q, qct.UnitarySmoothPulseProblem(
        sys_q, qct.GATES["H"], T, 0.2, Q=100.0, R=1e-2,
        ipopt_options=qct.SolverOptions(print_level=1, tol=1e-6, **solver_kw),
        piccolo_options=qct.PiccoloOptions(verbose=False, free_time=False),
        rng=np.random.default_rng(0),
    )


def _corrupt_interior(solver, state, scale=0.5, seed=5):
    """Dynamics-infeasible but bound-INTERIOR corruption of state.Z (the
    realistic stall class: an IPM iterate is always interior, so the
    manufactured point must be too — an out-of-bounds point floors the
    slacks and no interior-point method can move at all)."""
    B = state.Z.shape[0]
    rng = np.random.default_rng(seed)
    free = jnp.asarray(solver._free, state.Z.dtype)
    Zbad = state.Z + scale * jnp.asarray(
        rng.standard_normal(state.Z.shape), state.Z.dtype
    ) * free
    lb = jnp.asarray(solver._lb, state.Z.dtype)
    ub = jnp.asarray(solver._ub, state.Z.dtype)
    has_lb = jnp.asarray(solver._has_lb, bool)
    has_ub = jnp.asarray(solver._has_ub, bool)
    margin = 1e-2
    Zbad = jnp.where(has_lb, jnp.maximum(Zbad, lb + margin), Zbad)
    Zbad = jnp.where(has_ub, jnp.minimum(Zbad, ub - margin), Zbad)
    return state._replace(
        Z=Zbad,
        ls_fail=jnp.ones((B,), bool),
        stall_count=jnp.full(
            (B,), solver.options.resto_trigger, jnp.int32
        ),
    )


def _theta(solver, state):
    F = jax.vmap(solver.funcs.defects)(state.Z)
    th = jnp.sum(jnp.abs(F), axis=(1, 2))
    if solver.nlp.m > 0:
        g = jax.vmap(solver.funcs.ineqs)(state.Z)
        th = th + jnp.sum(jnp.abs(g - state.sig), axis=(1, 2))
    return np.asarray(th)


class TestRestorationStateMachine:
    def test_stalled_infeasible_iterate_enters_and_recovers(self):
        _, prob = _hadamard()
        solver = prob.solver
        assert solver.resto_on

        Z0 = np.asarray(prob.initial_decision(3))
        state = _corrupt_interior(solver, solver.init_state(Z0))
        theta_before = _theta(solver, state)
        assert (theta_before > 1e2 * solver.options.tol).all()

        # the first iteration must ENTER restoration (flag visible in the
        # post state while the episode is still running)
        st1 = solver._solve_loop(state, 1)
        assert np.asarray(st1.in_resto).all(), "episode did not engage"

        # a short restoration burst must cut theta by >= 1/kappa while
        # keeping every iterate finite, then exit
        st = st1
        for _ in range(solver.options.resto_max_iters + 2):
            st = solver._solve_loop(st, 1)
        theta_after = _theta(solver, st)
        assert np.isfinite(np.asarray(st.Z)).all()
        assert (
            theta_after <= solver.options.resto_kappa * theta_before
        ).all(), (theta_before, theta_after)
        assert not np.asarray(st.in_resto).any(), "episode failed to exit"

    def test_episode_bounded_by_resto_max_iters(self):
        _, prob = _hadamard()
        solver = prob.solver
        Z0 = np.asarray(prob.initial_decision(2))
        state = _corrupt_interior(solver, solver.init_state(Z0), seed=7)
        st = state
        max_ep = solver.options.resto_max_iters
        in_resto_trace = []
        for _ in range(max_ep + 3):
            st = solver._solve_loop(st, 1)
            in_resto_trace.append(np.asarray(st.in_resto).copy())
        ks = np.asarray(st.resto_k)
        assert (ks <= max_ep).all()
        # after the cap every instance is out of the episode
        assert not in_resto_trace[-1].any()

    def test_healthy_solve_never_triggers(self):
        # the headline-path guard: a normal converging solve must not pay
        # any restoration behavior change
        _, prob = _hadamard()
        solver = prob.solver
        Z0 = np.asarray(prob.initial_decision(4))
        st = solver._solve_loop(solver.init_state(Z0), 30)
        assert not np.asarray(st.in_resto).any()
        assert int(np.asarray(st.resto_k).max()) == 0

    def test_restoration_off_disables_fields(self):
        _, prob = _hadamard(restoration=False)
        solver = prob.solver
        assert not solver.resto_on
        st = solver.init_state(np.asarray(prob.initial_decision(2)))
        assert st.in_resto is None and st.resto_zR is None
