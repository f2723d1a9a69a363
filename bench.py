"""Benchmark: the five BASELINE.json canonical configs on real TPU.

Headline (config #1): batched single-qubit Hadamard gate synthesis —
solves/s/chip at host-validated f64 rollout infidelity <= 1e-4, measured
against the north star of 10k solves/s on a v5e-64 (156.25 solves/s/chip).

Also measured (BASELINE.json configs #2-#5; EVERY config — hadamard
included — prints its own JSON line the moment it completes, full records
land in artifacts/bench_full.json, and the compact final summary carries a
name->value map under detail.configs plus detail.relay_probe_s):
  #2 UnitaryMinimumTimeProblem (free Δt, fidelity floor 0.9999)
  #3 two-qubit CNOT smooth pulse (cross-resonance-style drives)
  #4 transmon-with-leakage gate synthesis (3-level, L1 leakage suppression)
  #5 batched multi-start synthesis: randomized SU(4) goals × seeds in ONE
     compiled solve (goal-as-pinned-data, problems/multigoal.py)

The LAST stdout line is the headline JSON:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Usage: python bench.py [--configs hadamard,min_time,cnot,leakage,su4|all]
                       [--batch B] [--iters N] [--smoke] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_PER_CHIP = 10000.0 / 64.0


# --------------------------------------------------------------------- #
# host-side f64 ground-truth validation
# --------------------------------------------------------------------- #
def _host_unitaries(sys_q, a_all, dts_all):
    """(B, N, N) final unitaries via batched eigh-expm, f64 host numpy."""
    H_drift = np.asarray(sys_q.H_drift, dtype=complex)
    H_drives = np.stack([np.asarray(h, dtype=complex) for h in sys_q.H_drives])
    N = H_drift.shape[0]
    a = np.asarray(a_all, dtype=np.float64)
    dts = np.asarray(dts_all, dtype=np.float64)
    B, T = a.shape[0], a.shape[1]
    H = H_drift[None, None] + np.einsum("btj,jkl->btkl", a[:, :-1], H_drives)
    w, V = np.linalg.eigh(H)
    phase = np.exp(-1j * w * dts[:, : T - 1, None])
    P = np.einsum("btij,btj,btkj->btik", V, phase, V.conj())
    U = np.broadcast_to(np.eye(N, dtype=complex), (B, N, N)).copy()
    for t in range(T - 1):
        U = P[:, t] @ U
    return U


def _host_fids(sys_q, a_all, dts_all, U_goal, subspace=None):
    U = _host_unitaries(sys_q, a_all, dts_all)
    G = np.asarray(U_goal, dtype=complex)
    if subspace is not None:
        idx = np.asarray(subspace)
        U = U[:, idx[:, None], idx[None, :]]
        G = G[idx[:, None], idx[None, :]] if G.shape[0] != len(idx) else G
    n = G.shape[0]
    return np.abs(np.einsum("ij,bji->b", G.conj().T, U)) / n


def _extract_controls(prob, Z, control_name="a"):
    traj = prob.trajectory
    a_sl = traj.comp_slice(control_name)
    Z = np.asarray(Z, dtype=np.float64)
    a_all = Z[:, :, a_sl]
    tname = traj.timestep if isinstance(traj.timestep, str) else None
    if tname is not None:
        dt_sl = traj.comp_slice(tname)
        dts_all = Z[:, :, dt_sl][:, :, 0]
    else:
        dts_all = np.full(Z.shape[:2], float(traj.timestep))
    return a_all, dts_all


def _build_ctx():
    """Context for problem CONSTRUCTION: pin eager ops to the CPU device.

    Building a problem issues ~750 small eager ops (device_puts, geodesic
    assembly, scaling probes); on the relayed TPU runtime each is a relay
    round trip, which turned the leakage build into 390+ s of dispatch
    latency (measured).  Under jax.default_device(cpu) the build runs
    host-side; only the jitted solve (created OUTSIDE this context) touches
    the TPU."""
    import jax

    return jax.default_device(jax.local_devices(backend="cpu")[0])


def _timed(solver, seeds_fn, iters, repeats, dtype, seg=None):
    """Compile + time repeated batched solves with FRESH seeds per repeat
    (the TPU relay caches identical (executable, input) pairs).

    seg: if set, run the solve as resumable `seg`-iteration _solve_loop
    segments instead of one device call — the relay kills single calls
    running ≳100 s (observed UNAVAILABLE on the 80-iter 2-qubit configs),
    and IPMState chains exactly across segments.  Leave None for sub-second
    calls: every extra device call costs a relay round trip.
    """
    import jax
    import jax.numpy as jnp

    if seg:
        segs = [seg] * (iters // seg) + ([iters % seg] if iters % seg else [])

        def solve(z):
            st = solver._init_state_jit(z)
            for n in segs:
                st = solver._solve_loop(st, n)
            return st

    else:
        solve = jax.jit(
            lambda z: solver._solve_loop(solver.init_state(z), iters)
        )
    t_c0 = time.perf_counter()
    state = solve(jnp.asarray(seeds_fn(7), dtype))
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t_c0
    # discarded warm run on FRESH inputs: the relay systematically stalls
    # the first fresh-input invocation of a new executable (measured
    # 100-270 s for sub-second solves, then 0.4 s on every later repeat —
    # scripts/tpu_fused_micro.py walls [111430, 99, 101, 114] ms and both
    # round-5 rehearsals' first configs); absorbing it here keeps the
    # stall out of the timed repeats and out of the >60 s abort guard
    warm = solve(jnp.asarray(seeds_fn(6), dtype))
    jax.block_until_ready(warm)
    _ = float(np.asarray(warm.kkt_err).sum())
    times = []
    for rep in range(repeats):
        Z0j = jnp.asarray(seeds_fn(42 + rep), dtype)
        jax.block_until_ready(Z0j)
        t0 = time.perf_counter()
        state = solve(Z0j)
        jax.block_until_ready(state)
        _ = float(np.asarray(state.kkt_err).sum())  # force host read
        times.append(time.perf_counter() - t0)
        if times[-1] > 60.0:
            # degraded-relay guard: a healthy chip runs these solves in
            # ~0.1-10 s; when the relay is wedged (observed: a 0.1 s solve
            # taking 20+ min after an unrelated process kill) more repeats
            # only burn the per-config timeout without improving the min
            break
    return state, min(times), compile_s


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _solver_options(qct, args, **over):
    kw = dict(
        print_level=1,
        tol=1e-5,
        matmul_precision=args.precision,
        eval_precision=args.eval_precision,
        kkt_backend=args.kkt_backend,
        kappa_mu=args.kappa_mu,
        line_search=args.line_search,
        mu_strategy=args.mu_strategy,
    )
    if args.lanes_vec_max_dim is not None:
        kw["lanes_vec_max_dim"] = args.lanes_vec_max_dim
    if args.kkt_refine is not None:
        kw["kkt_refine"] = args.kkt_refine
    kw.update(over)
    return qct.SolverOptions(**kw)


# --------------------------------------------------------------------- #
# config #1: Hadamard smooth pulse (headline)
# --------------------------------------------------------------------- #
def bench_hadamard(qct, args, dtype):
    import jax

    B, T, dt = args.batch, 51, 0.2
    with _build_ctx():
        sys_q = qct.QuantumSystem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]]
        )
        # Q/R chosen so the NLP optimum is well below the 1e-4 infidelity
        # target (the README default Q=100, R=1e-2 optimum sits at ~2.7e-4)
        prob = qct.UnitarySmoothPulseProblem(
            sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
            ipopt_options=_solver_options(qct, args),
            piccolo_options=qct.PiccoloOptions(verbose=False),
            rng=np.random.default_rng(0),
        )
        z0 = np.asarray(prob.initial_decision(1))[0]
    a_sl = prob.trajectory.comp_slice("a")

    def seeds(seed):
        rng = np.random.default_rng(seed)
        Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
        Z0[:, 1:-1, a_sl] += 0.1 * rng.standard_normal(
            (B, T - 2, a_sl.stop - a_sl.start)
        )
        return Z0

    state, wall, compile_s = _timed(
        prob.solver, seeds, args.iters, args.repeats, dtype
    )

    Z = prob.solver.unscale(np.asarray(state.Z))
    a_all, dts_all = _extract_controls(prob, Z)
    try:
        from quantumcollocation_tpu.ops.native import (
            unitary_rollout_fidelity_native,
        )

        goal_iso = np.asarray(qct.operator_to_iso_operator(qct.GATES["H"]))
        fids = unitary_rollout_fidelity_native(
            np.asarray(sys_q.G_drift), np.asarray(sys_q.G_drives),
            a_all, dts_all, goal_iso,
        )
    except Exception:
        fids = _host_fids(sys_q, a_all, dts_all, np.asarray(qct.GATES["H"]))
    infid = 1.0 - np.asarray(fids)
    frac_ok = float(np.mean(infid <= 1e-4))
    return {
        "metric": "hadamard_solves_per_s_per_chip_at_infid_1e-4",
        "value": round(B * frac_ok / wall, 3),
        "unit": "solves/s/chip",
        "batch": B,
        "ipm_iters": args.iters,
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 1),
        "converged_frac": frac_ok,
        "best_infid": float(infid.min()),
        "median_infid": float(np.median(infid)),
        "kkt_iters_per_s": round(args.iters * B / wall, 1),
    }


# --------------------------------------------------------------------- #
# config #2: minimum time under a 0.9999 fidelity floor (free Δt)
# --------------------------------------------------------------------- #
def bench_min_time(qct, args, dtype):
    B, T, dt = args.batch, 51, 0.2
    with _build_ctx():
        sys_q = qct.QuantumSystem(
            qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]]
        )
        # stage 1: high-quality fixed-time warm start (one solve; runs on
        # the CPU device — B=1, build-time)
        # kkt_backend="xla": this one-shot B=1 warm solve runs on the CPU
        # device (inside _build_ctx) where the lanes Pallas kernels would
        # need interpret mode ("Only interpret mode is supported on CPU")
        warm = qct.UnitarySmoothPulseProblem(
            sys_q, qct.GATES["H"], T, dt, Q=1e4, R=1e-3,
            ipopt_options=_solver_options(qct, args, tol=1e-7,
                                          recalc_y="yes",
                                          recalc_y_feas_tol=1e1,
                                          kkt_backend="xla"),
            piccolo_options=qct.PiccoloOptions(verbose=False,
                                               free_time=False),
            rng=np.random.default_rng(0),
        )
        warm.solve(max_iter=80)
        fid_warm = float(
            qct.unitary_rollout_fidelity(warm.trajectory, sys_q)
        )

        # stage 2: free-time minimum-time problem warm-started from stage 1
        a_solved = np.asarray(warm.trajectory["a"])
        traj2 = qct.initialize_unitary_trajectory(
            qct.GATES["H"], T, dt, 2,
            [np.ones(2), np.full(2, np.inf), np.ones(2)],
            free_time=True, a_guess=a_solved, system=sys_q,
        )
        dur0 = float(traj2.duration())
        # D=1000 so the time objective overcomes the carried Q=1e4
        # infidelity term (CPU sweep: D=10 -> durations GROW; D=100 ->
        # -0.1%; D=1000 -> -2%/-3% at 44/80 iters with 100% of seeds
        # holding fid >= 0.9999)
        mt = qct.UnitaryMinimumTimeProblem(
            traj2, sys_q, warm.get_objective(), warm.integrators, [],
            # floor ABOVE the 0.9999 success bar: since the kkt_aug lift
            # (round 4) the solver drives fidelity EXACTLY onto the floor
            # (real min-time optimization: median duration now drops ~24%
            # instead of 1.5%), so a floor AT the bar leaves half the seeds
            # a hair below it in f64 host validation (measured median_fid
            # 0.99990, success_frac 0.48); 5e-5 of margin clears the f32
            # noise band
            final_fidelity=0.99995, D=1000.0,
            ipopt_options=_solver_options(qct, args, tol=1e-6),
        )
        z0 = np.asarray(mt.initial_decision(1))[0]
    a_sl = mt.trajectory.comp_slice("a")

    def seeds(seed):
        rng = np.random.default_rng(seed)
        Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
        # tiny perturbations: distinct inputs (defeats the relay result
        # cache) that keep every seed inside the fidelity-floor basin
        Z0[:, 1:-1, a_sl] += 1e-4 * rng.standard_normal(
            (B, T - 2, a_sl.stop - a_sl.start)
        )
        return Z0

    state, wall, compile_s = _timed(
        mt.solver, seeds, args.iters, args.repeats, dtype
    )
    Z = mt.solver.unscale(np.asarray(state.Z))
    a_all, dts_all = _extract_controls(mt, Z)
    fids = _host_fids(sys_q, a_all, dts_all, np.asarray(qct.GATES["H"]))
    durs = dts_all[:, :-1].sum(axis=1)
    ok = (fids >= 0.9999) & (durs < dur0)
    return {
        "metric": "min_time_solves_per_s_per_chip_at_fid_0.9999",
        "value": round(B * float(ok.mean()) / wall, 3),
        "unit": "solves/s/chip",
        "batch": B,
        "ipm_iters": args.iters,
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 1),
        "success_frac": float(ok.mean()),
        "warm_fid": fid_warm,
        "duration_before": dur0,
        "median_duration_after": float(np.median(durs)),
        "median_fid": float(np.median(fids)),
    }


# --------------------------------------------------------------------- #
# config #3: two-qubit CNOT smooth pulse
# --------------------------------------------------------------------- #
def bench_cnot(qct, args, dtype):
    B = max(args.batch // 4, 8)
    T, dt = 40, 0.3
    ZX = np.kron(qct.PAULIS["Z"], qct.PAULIS["X"])
    XI = np.kron(qct.PAULIS["X"], qct.PAULIS["I"])
    YI = np.kron(qct.PAULIS["Y"], qct.PAULIS["I"])
    IX = np.kron(qct.PAULIS["I"], qct.PAULIS["X"])
    IY = np.kron(qct.PAULIS["I"], qct.PAULIS["Y"])
    with _build_ctx():
        sys_q = qct.QuantumSystem(
            0.1 * np.kron(qct.PAULIS["Z"], qct.PAULIS["Z"]),
            [ZX, XI, YI, IX, IY],
        )
        prob = qct.UnitarySmoothPulseProblem(
            sys_q, qct.GATES["CX"], T, dt, Q=1e4, R=1e-3,
            ipopt_options=_solver_options(qct, args),
            piccolo_options=qct.PiccoloOptions(verbose=False,
                                               free_time=False),
            rng=np.random.default_rng(7),
        )

    def seeds(seed):
        with _build_ctx():
            return np.asarray(prob.multistart_initial_decisions(
                B, sigma=0.3, rng=np.random.default_rng(seed)
            ))

    iters = args.iters_2q
    state, wall, compile_s = _timed(
        prob.solver, seeds, iters, args.repeats, dtype, seg=10
    )
    Z = prob.solver.unscale(np.asarray(state.Z))
    a_all, dts_all = _extract_controls(prob, Z)
    fids = _host_fids(sys_q, a_all, dts_all, np.asarray(qct.GATES["CX"]))
    infid = 1.0 - fids
    frac4 = float(np.mean(infid <= 1e-4))
    return {
        "metric": "cnot_solves_per_s_per_chip_at_infid_1e-4",
        "value": round(B * frac4 / wall, 3),
        "unit": "solves/s/chip",
        "batch": B,
        "ipm_iters": iters,
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 1),
        "frac_infid_1e-4": frac4,
        "frac_infid_1e-3": float(np.mean(infid <= 1e-3)),
        "frac_infid_1e-2": float(np.mean(infid <= 1e-2)),
        "best_infid": float(infid.min()),
        "median_infid": float(np.median(infid)),
    }


# --------------------------------------------------------------------- #
# config #4: transmon-with-leakage gate synthesis
# --------------------------------------------------------------------- #
def bench_transmon_leakage(qct, args, dtype):
    from quantumcollocation_tpu.systems import TransmonSystem

    B = max(args.batch // 2, 8)
    # dt=0.2 (8 time units total): at dt=0.1 the problem's OPTIMUM sits at
    # ~3e-3 subspace infidelity (CPU scan — pulse too short for the 0.5
    # drive bound), so no iteration count can pass the 1e-3 bar
    T, dt = 40, 0.2
    with _build_ctx():
        sys_q = TransmonSystem(omega=4.0, delta=0.2, levels=3)
        U_goal = qct.EmbeddedOperator(qct.GATES["X"], sys_q)
        prob = qct.UnitarySmoothPulseProblem(
            sys_q, U_goal, T, dt, a_bound=0.5, Q=1e4, R=1e-3,
            ipopt_options=_solver_options(qct, args),
            piccolo_options=qct.PiccoloOptions(
                verbose=False, leakage_suppression=True, R_leakage=1e-1,
                free_time=False,
            ),
            rng=np.random.default_rng(11),
        )
        z0 = np.asarray(prob.initial_decision(1))[0]
    a_sl = prob.trajectory.comp_slice("a")

    def seeds(seed):
        rng = np.random.default_rng(seed)
        Z0 = np.broadcast_to(z0, (B, *z0.shape)).copy()
        Z0[:, 1:-1, a_sl] += 0.05 * rng.standard_normal(
            (B, T - 2, a_sl.stop - a_sl.start)
        )
        return Z0

    # 120 iters: with the kkt_aug lift the >1e-4 tail is pure slow
    # convergence — measured 0.875 @ 80 iters -> 1.000 @ 120 (CPU-f32 B=64
    # proxy); without the lift 80 iters gave 0.50
    iters = args.iters_leakage
    state, wall, compile_s = _timed(
        prob.solver, seeds, iters, args.repeats, dtype, seg=10
    )
    Z = prob.solver.unscale(np.asarray(state.Z))
    a_all, dts_all = _extract_controls(prob, Z)
    sub = np.asarray(U_goal.subspace)
    fids = _host_fids(
        sys_q, a_all, dts_all, np.asarray(U_goal.operator), subspace=sub
    )
    infid = 1.0 - fids
    frac3 = float(np.mean(infid <= 1e-3))
    return {
        "metric": "transmon_leakage_solves_per_s_per_chip_at_subspace_infid_1e-3",
        "value": round(B * frac3 / wall, 3),
        "unit": "solves/s/chip",
        "batch": B,
        "ipm_iters": iters,
        "wall_s": round(wall, 3),
        "compile_s": round(compile_s, 1),
        "frac_subspace_infid_1e-3": frac3,
        "frac_subspace_infid_1e-2": float(np.mean(infid <= 1e-2)),
        "frac_subspace_infid_1e-4": float(np.mean(infid <= 1e-4)),
        "best_infid": float(infid.min()),
        "median_infid": float(np.median(infid)),
    }


# --------------------------------------------------------------------- #
# config #5: randomized-SU(4) multi-goal multi-start batch
# --------------------------------------------------------------------- #
def bench_su4_multigoal(qct, args, dtype):
    import jax
    import jax.numpy as jnp

    from quantumcollocation_tpu.problems import (
        UnitaryMultiGoalProblem,
        multigoal_initial_decisions,
        multigoal_rollout_fidelities,
        random_su,
    )

    n_goals, n_seeds = args.su4_goals, args.su4_seeds
    waves = args.su4_waves
    T, dt = 33, 0.3
    ZX = np.kron(qct.PAULIS["Z"], qct.PAULIS["X"])
    XI = np.kron(qct.PAULIS["X"], qct.PAULIS["I"])
    YI = np.kron(qct.PAULIS["Y"], qct.PAULIS["I"])
    IX = np.kron(qct.PAULIS["I"], qct.PAULIS["X"])
    IY = np.kron(qct.PAULIS["I"], qct.PAULIS["Y"])
    with _build_ctx():
        sys_q = qct.QuantumSystem(
            0.1 * np.kron(qct.PAULIS["Z"], qct.PAULIS["Z"]),
            [ZX, XI, YI, IX, IY],
        )
        prob = UnitaryMultiGoalProblem(
            sys_q, T, dt, Q=1e4, R=1e-3,
            ipopt_options=_solver_options(qct, args),
            piccolo_options=qct.PiccoloOptions(verbose=False,
                                               free_time=False),
        )
    solver = prob.solver
    iters = args.iters_2q

    rng = np.random.default_rng(2024)
    goals = [random_su(4, rng) for _ in range(n_goals * waves)]

    # The relayed TPU kills single device calls running longer than ~1-2
    # minutes (observed: the B>=512 80-iter while_loop dies UNAVAILABLE at
    # ~100 s while the same shapes at 20 iters complete in 48 s); run the
    # solve as short resumable segments — IPMState is a valid while_loop
    # carry, so chaining _solve_loop segments is exact (converged members
    # exit the loop immediately; n_iter keeps the true total).
    seg = 10
    segs = [seg] * (iters // seg) + ([iters % seg] if iters % seg else [])

    def solve(z):
        st = solver._init_state_jit(z)
        for n in segs:
            st = solver._solve_loop(st, n)
        return st

    total_wall = 0.0
    compile_s = None
    all_fids = []
    for w in range(waves):
        gw = goals[w * n_goals : (w + 1) * n_goals]
        with _build_ctx():
            Z0 = np.asarray(multigoal_initial_decisions(
                prob, gw, n_seeds_per_goal=n_seeds, sigma=0.2,
                rng=np.random.default_rng(100 + w),
            ))
        Z0j = jnp.asarray(Z0, dtype)
        jax.block_until_ready(Z0j)
        if compile_s is None:  # first wave pays compilation
            t0 = time.perf_counter()
            state = solve(Z0j)
            jax.block_until_ready(state)
            compile_s = time.perf_counter() - t0
            # fresh-noise warm run absorbs the relay's systematic
            # first-fresh-input stall (see _timed), then re-time honestly
            with _build_ctx():
                Zw = np.asarray(multigoal_initial_decisions(
                    prob, gw, n_seeds_per_goal=n_seeds, sigma=0.2,
                    rng=np.random.default_rng(300 + w),
                ))
            warm = solve(jnp.asarray(Zw, dtype))
            jax.block_until_ready(warm)
            _ = float(np.asarray(warm.kkt_err).sum())
            with _build_ctx():
                Z0 = np.asarray(multigoal_initial_decisions(
                    prob, gw, n_seeds_per_goal=n_seeds, sigma=0.2,
                    rng=np.random.default_rng(200 + w),
                ))
            Z0j = jnp.asarray(Z0, dtype)
            jax.block_until_ready(Z0j)
        t0 = time.perf_counter()
        state = solve(Z0j)
        jax.block_until_ready(state)
        _ = float(np.asarray(state.kkt_err).sum())
        total_wall += time.perf_counter() - t0
        Z = solver.unscale(np.asarray(state.Z))
        with _build_ctx():
            fids = np.asarray(multigoal_rollout_fidelities(
                prob, Z, gw, n_seeds_per_goal=n_seeds
            ))
        all_fids.append(fids)

    fids = np.concatenate(all_fids)
    infid = 1.0 - fids
    B_total = n_goals * n_seeds * waves
    per_goal_best = fids.reshape(n_goals * waves, n_seeds).max(axis=1)
    frac4 = float(np.mean(infid <= 1e-4))
    return {
        "metric": "su4_multigoal_solves_per_s_per_chip_at_infid_1e-4",
        "value": round(B_total * frac4 / total_wall, 3),
        "unit": "solves/s/chip",
        "batch_total": B_total,
        "goals": n_goals * waves,
        "seeds_per_goal": n_seeds,
        "waves": waves,
        "ipm_iters": iters,
        "wall_s": round(total_wall, 3),
        "compile_s": round(compile_s, 1),
        "frac_infid_1e-4": frac4,
        "frac_infid_1e-3": float(np.mean(infid <= 1e-3)),
        "goal_frac_solved_1e-4": float(np.mean(1.0 - per_goal_best <= 1e-4)),
        "goal_frac_solved_1e-3": float(np.mean(1.0 - per_goal_best <= 1e-3)),
        "median_infid": float(np.median(infid)),
    }


# --------------------------------------------------------------------- #
def _run_probe_subprocess(args, timeout_s=300):
    """Tiny relay-health calibration solve (B=8, 30-iter smoke Hadamard).

    Relay throughput varies >10x over tens of minutes (CLAUDE.md), so
    cross-round throughput deltas are meaningless without a same-run
    calibration number (VERDICT r4 weak #5).  The probe's wall_s is
    emitted as its own JSON line and recorded in the final summary under
    detail.relay_probe_s; a healthy relay runs it in ~0.1 s.
    """
    import subprocess

    cmd = [
        sys.executable, __file__, "--child", "--configs", "hadamard",
        "--smoke", "--precision", args.precision,
    ]
    if args.eval_precision:
        cmd += ["--eval-precision", args.eval_precision]
    if args.cpu:
        cmd.append("--cpu")
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s
        )
    except subprocess.TimeoutExpired:
        return {"error": f"probe timeout after {timeout_s}s"}
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return {"error": f"probe rc={out.returncode}"}


def _run_config_subprocess(name, args, timeout_s=1500):
    """Run one config in its own process (own TPU client).

    Round 2 ran all five configs in ONE process: the first TPU error
    poisoned the shared runtime and cascade-failed every later config
    (BENCH_r02: cnot/leakage/su4 all died in 0.0s).  A subprocess per
    config gives each a fresh client and bounds the blast radius; children
    run strictly sequentially so only one TPU process exists at a time
    (relay constraint, CLAUDE.md).
    """
    import subprocess

    cmd = [
        sys.executable, __file__, "--child", "--configs", name,
        "--batch", str(args.batch), "--iters", str(args.iters),
        "--iters-2q", str(args.iters_2q), "--repeats", str(args.repeats),
        "--iters-leakage", str(args.iters_leakage),
        "--precision", args.precision, "--kappa-mu", str(args.kappa_mu),
        "--line-search", args.line_search, "--mu-strategy", args.mu_strategy,
        "--su4-goals", str(args.su4_goals), "--su4-seeds", str(args.su4_seeds),
        "--su4-waves", str(args.su4_waves),
    ]
    if args.lanes_vec_max_dim is not None:
        cmd += ["--lanes-vec-max-dim", str(args.lanes_vec_max_dim)]
    if args.kkt_refine is not None:
        cmd += ["--kkt-refine", str(args.kkt_refine)]
    if args.eval_precision:
        cmd += ["--eval-precision", args.eval_precision]
    if args.kkt_backend:
        cmd += ["--kkt-backend", args.kkt_backend]
    if args.cpu:
        cmd.append("--cpu")
    if args.smoke:
        cmd.append("--smoke")
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s
        )
    except subprocess.TimeoutExpired:
        return {"metric": name, "error": f"timeout after {timeout_s}s"}
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    tail = (out.stderr or "").strip().splitlines()[-3:]
    return {
        "metric": name,
        "error": f"child rc={out.returncode}: {' | '.join(tail)[-400:]}",
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=512)
    # round-5 sweep (v5e-1, fused assembly + resto_trigger=8, B=512,
    # identical seeds): 44 iters -> frac 0.908; 48 -> 0.961; 52 -> 0.982
    # (artifacts/tpu_fused_quality_ab_r05.json).  48 balances headline
    # value (~572 solves/s) against converged_frac
    parser.add_argument("--iters", type=int, default=48)
    parser.add_argument("--iters-2q", dest="iters_2q", type=int, default=80)
    parser.add_argument(
        "--iters-leakage", dest="iters_leakage", type=int, default=120,
        help="leakage-config IPM iterations (slow-converger tail reaches "
        "the 1e-4 bar by ~120; docs in bench_transmon_leakage)",
    )
    # 0.2 (Ipopt's default): the round-2 kappa_mu=0.1 tuning went stale —
    # round-5 sweep at 48 iters (filter LS): frac@1e-4 0.889 at 0.1 vs
    # 0.982 at 0.2; min_time 312.9 solves/s at success 0.973 and leakage
    # frac@1e-4 1.000 confirm 0.2 across configs
    parser.add_argument("--kappa-mu", dest="kappa_mu", type=float, default=0.2)
    parser.add_argument(
        "--lanes-vec-max-dim", dest="lanes_vec_max_dim", type=int,
        default=None,
        help="override SolverOptions.lanes_vec_max_dim (default 64: the "
        "2-qubit configs run on the vectorized lanes Pallas path; pass 24 "
        "to force the xla fallback)",
    )
    parser.add_argument(
        "--kkt-refine", dest="kkt_refine", type=int, default=None,
        help="override SolverOptions.kkt_refine (default auto: 1 pass on "
        "the vectorized lanes family)",
    )
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--precision", type=str, default="highest")
    parser.add_argument(
        "--eval-precision", dest="eval_precision", type=str, default="high",
    )
    parser.add_argument(
        "--kkt-backend", dest="kkt_backend", type=str, default=None
    )
    parser.add_argument(
        "--line-search", dest="line_search", type=str, default="filter"
    )
    parser.add_argument(
        "--mu-strategy", dest="mu_strategy", type=str, default="monotone"
    )
    parser.add_argument(
        "--configs", type=str, default="all",
        help="comma list of hadamard,min_time,cnot,leakage,su4 (or all)",
    )
    parser.add_argument("--su4-goals", dest="su4_goals", type=int, default=128)
    parser.add_argument("--su4-seeds", dest="su4_seeds", type=int, default=4)
    # 8 waves x 128 goals x 4 seeds = 4096 total seeds (the BASELINE-named
    # su4 batch size); per-wave B=512 keeps each segmented device call well
    # under the relay's observed ~100 s single-call kill threshold
    parser.add_argument("--su4-waves", dest="su4_waves", type=int, default=8)
    parser.add_argument(
        "--child", action="store_true",
        help="internal: run the requested configs in-process (no isolation)",
    )
    parser.add_argument(
        "--config-timeout", dest="config_timeout", type=int, default=None,
        help="per-config subprocess timeout (seconds; default 1500, "
        "raised to 3000 for su4 unless explicitly set)",
    )
    parser.add_argument(
        "--total-budget", dest="total_budget", type=int, default=1080,
        help="total wall budget (seconds): remaining configs are skipped "
        "(recorded as skipped_budget) once exceeded, and the final summary "
        "line ALWAYS prints.  Round 4's driver killed bench.py mid-su4 at "
        "rc=124, erasing the then-withheld hadamard headline (VERDICT r4 "
        "weak #1); the budget guarantees a complete artifact.  Pass 0 to "
        "disable.",
    )
    args = parser.parse_args()
    if args.smoke:
        args.batch, args.iters, args.repeats = 8, 30, 1
        args.iters_2q = 30
        args.iters_leakage = 30
        args.su4_goals, args.su4_seeds, args.su4_waves = 2, 2, 1
        if args.configs == "all":
            args.configs = "hadamard"

    names = (
        ["hadamard", "min_time", "cnot", "leakage", "su4"]
        if args.configs == "all"
        else [c.strip() for c in args.configs.split(",")]
    )
    in_process = args.child or len(names) == 1

    if in_process:
        import jax

        from quantumcollocation_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        # persistent compile cache: compile_s was 15-25 s/config/run with
        # zero cross-run reuse before this (VERDICT r3)
        enable_persistent_cache()

        if args.cpu:
            # note: the environment's sitecustomize pins jax_platforms to
            # "axon,cpu"; an explicit config update is required to override
            jax.config.update("jax_platforms", "cpu")
        if args.kkt_backend is None:
            args.kkt_backend = (
                "lanes" if jax.default_backend() == "tpu" else "xla"
            )

        import jax.numpy as jnp

        import quantumcollocation_tpu as qct

        dtype = jnp.float32 if jax.default_backend() != "cpu" else (
            jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        )
        backend_name = jax.default_backend()
    else:
        # IMPORTANT: the parent must NOT touch jax — creating a TPU client
        # here would hold the (single-process) relay lease while the child
        # processes need it
        qct = dtype = None
        backend_name = "cpu" if args.cpu else "tpu(subprocess)"

    fns = {
        "hadamard": bench_hadamard,
        "min_time": bench_min_time,
        "cnot": bench_cnot,
        "leakage": bench_transmon_leakage,
        "su4": bench_su4_multigoal,
    }
    budget_t0 = time.perf_counter()

    def _remaining():
        if not args.total_budget:
            return float("inf")
        return args.total_budget - (time.perf_counter() - budget_t0)

    relay_probe_s = None
    if not in_process and not args.smoke:
        print("[bench] relay calibration probe...", file=sys.stderr,
              flush=True)
        pr = _run_probe_subprocess(args, timeout_s=240)
        relay_probe_s = pr.get("wall_s")
        _emit({"metric": "relay_probe", "value": relay_probe_s, "unit": "s",
               **({"error": pr["error"]} if "error" in pr else
                  {"compile_s": pr.get("compile_s")})})

    results = {}
    for name in names:
        rem = _remaining()
        if rem < 60:
            r = {"metric": name, "skipped_budget": True,
                 "note": f"total budget {args.total_budget}s exhausted"}
            results[name] = r
            if not args.child:
                _emit(r)
            continue
        print(f"[bench] running config {name}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        if in_process:
            try:
                r = fns[name](qct, args, dtype)
            except Exception as e:  # record, keep the headline alive
                r = {"metric": name, "error": f"{type(e).__name__}: {e}"}
        else:
            # per-config process isolation: a TPU runtime error in one
            # config cannot poison the others' client
            to = args.config_timeout if args.config_timeout is not None \
                else (3000 if name == "su4" else 1500)
            # never let one config run past the total budget
            to = int(min(to, max(60.0, rem)))
            r = _run_config_subprocess(name, args, to)
        r["config_total_s"] = round(time.perf_counter() - t0, 1)
        results[name] = r
        # emit EVERY config (hadamard too) the moment it completes: the
        # round-4 driver kill erased the then-withheld headline (VERDICT)
        if not args.child:
            _emit(r)

    if args.child:
        # exactly one raw config record; the parent parses the LAST line
        _emit(results[names[0]])
        return 0

    head = results.get("hadamard")
    if head is None or "error" in head or "skipped_budget" in head:
        # headline unavailable: emit the first successful config as headline
        ok = [r for r in results.values()
              if "error" not in r and "skipped_budget" not in r]
        head = ok[0] if ok else {"metric": "bench_failed", "value": 0.0,
                                 "unit": "solves/s/chip"}
    # full per-config records go to a FILE: round 3's final line embedded
    # them all, overflowed the driver's tail buffer, and parsed as null
    # even at rc=0 (BENCH_r03).  The final stdout line stays compact.
    try:
        import os

        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/bench_full.json", "w") as f:
            json.dump({"relay_probe_s": relay_probe_s, "configs": results},
                      f, indent=1)
    except OSError:
        pass
    detail = {
        "backend": backend_name,
        "kkt_backend": args.kkt_backend,
        "relay_probe_s": relay_probe_s,
        "configs": {
            n: (round(r["value"], 2) if "value" in r else
                ("skipped_budget" if "skipped_budget" in r else "error"))
            for n, r in results.items()
        },
        **{k: head[k] for k in ("converged_frac", "wall_s", "batch")
           if k in head},
    }
    _emit(
        {
            "metric": head["metric"],
            "value": head.get("value", 0.0),
            "unit": head.get("unit", "solves/s/chip"),
            "vs_baseline": round(head.get("value", 0.0) / BASELINE_PER_CHIP, 4),
            "detail": detail,
        }
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
