"""Tests for NamedTrajectory, initialization, interpolation, direct sums.

Mirrors reference invariants at
/root/reference/src/trajectory_initialization.jl:573-642 (control guess
shapes/bounds, geodesic endpoint/generator properties) and
trajectory_interpolations.jl:76-118 (interpolation round trips).
"""

import jax
import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct


def _mk_traj(T=5, free_time=True):
    rng = np.random.default_rng(0)
    comps = {
        "Ũ⃗": rng.normal(size=(T, 8)),
        "a": rng.normal(size=(T, 2)),
        "da": rng.normal(size=(T, 2)),
        "dda": rng.normal(size=(T, 2)),
    }
    kwargs = dict(
        controls=("dda",),
        bounds={"a": 1.0, "dda": 1.0},
        initial={
            "Ũ⃗": np.array([1.0, 0, 0, 0, 0, 1, 0, 0]),
            "a": np.zeros(2),
        },
        final={"a": np.zeros(2)},
        goal={"Ũ⃗": np.arange(8.0)},
    )
    if free_time:
        comps["Δt"] = np.full((T, 1), 0.2)
        kwargs["timestep"] = "Δt"
        kwargs["bounds"]["Δt"] = (0.1, 0.3)
    else:
        kwargs["timestep"] = 0.2
    return qct.NamedTrajectory(comps, **kwargs)


class TestNamedTrajectory:
    def test_shapes_and_slices(self):
        traj = _mk_traj()
        assert traj.T == 5
        assert traj.dim == 8 + 2 + 2 + 2 + 1
        assert traj["a"].shape == (5, 2)
        assert traj.names == ("Ũ⃗", "a", "da", "dda", "Δt")
        assert traj.state_names == ("Ũ⃗", "a", "da")
        assert "Δt" in traj.controls  # timestep auto-added to controls
        assert traj.dims["states"] == 12

    def test_attr_access(self):
        traj = _mk_traj()
        np.testing.assert_allclose(traj.a, traj["a"])

    def test_timesteps_and_times(self):
        traj = _mk_traj()
        np.testing.assert_allclose(traj.get_timesteps(), 0.2)
        np.testing.assert_allclose(
            traj.get_times(), [0.0, 0.2, 0.4, 0.6, 0.8]
        )
        assert abs(float(traj.duration()) - 0.8) < 1e-12
        fixed = _mk_traj(free_time=False)
        np.testing.assert_allclose(fixed.get_timesteps(), 0.2)

    def test_update_functional(self):
        traj = _mk_traj()
        new = traj.update("a", np.zeros((5, 2)))
        np.testing.assert_allclose(new["a"], 0.0)
        assert not np.allclose(traj["a"], 0.0)  # original untouched

    def test_pytree_jit(self):
        traj = _mk_traj()

        @jax.jit
        def f(tr):
            return jnp.sum(tr["a"] ** 2)

        out = f(traj)
        np.testing.assert_allclose(out, np.sum(np.asarray(traj["a"]) ** 2))

    def test_flatten_dim(self):
        traj = _mk_traj()
        z = traj.flatten()
        assert z.shape == (traj.T * traj.dim,)

    def test_global_data(self):
        traj = qct.NamedTrajectory(
            {"x": np.zeros((3, 1))},
            timestep=0.1,
            global_data={"ϕ": np.array([0.5])},
        )
        assert traj.global_dim == 1
        leaves, treedef = jax.tree_util.tree_flatten(traj)
        traj2 = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(traj2.global_data["ϕ"], [0.5])


class TestGeodesic:
    def test_pi_rotation(self):
        Us, H = qct.unitary_geodesic(
            qct.GATES["I"], qct.GATES["X"], np.linspace(0, 1, 4),
            return_generator=True,
        )
        assert Us.shape == (4, 8)
        np.testing.assert_allclose(
            Us[0], qct.operator_to_iso_vec(qct.GATES["I"]), atol=1e-9
        )
        np.testing.assert_allclose(
            Us[-1], qct.operator_to_iso_vec(qct.GATES["X"]), atol=1e-9
        )
        np.testing.assert_allclose(H, H.conj().T, atol=1e-9)  # Hermitian
        assert abs(np.linalg.norm(H) - np.pi) < 1e-6

    def test_scaled_times(self):
        Us, H = qct.unitary_geodesic(
            qct.GATES["I"], qct.GATES["X"], np.linspace(-5, 5, 4),
            return_generator=True,
        )
        np.testing.assert_allclose(
            Us[-1], qct.operator_to_iso_vec(qct.GATES["X"]), atol=1e-9
        )
        assert abs(np.linalg.norm(H) - np.pi / 10) < 1e-6

    def test_single_arg_form(self):
        Us = qct.unitary_geodesic(qct.GATES["X"], 10)
        np.testing.assert_allclose(
            Us[0], qct.operator_to_iso_vec(qct.GATES["I"]), atol=1e-9
        )
        np.testing.assert_allclose(
            Us[-1], qct.operator_to_iso_vec(qct.GATES["X"]), atol=1e-9
        )

    def test_off_identity_start(self):
        U0 = np.asarray(sla_sqrtm(np.asarray(qct.GATES["X"])))
        Us = qct.unitary_geodesic(U0, qct.GATES["X"], np.linspace(0, 1, 10))
        np.testing.assert_allclose(
            Us[0], qct.operator_to_iso_vec(U0), atol=1e-8
        )
        np.testing.assert_allclose(
            Us[-1], qct.operator_to_iso_vec(qct.GATES["X"]), atol=1e-8
        )

    def test_embedded_geodesic(self):
        emb = qct.EmbeddedOperator(qct.GATES["H"], [0, 1], 3)
        Us = qct.unitary_geodesic(np.eye(3, dtype=complex), emb, samples=6)
        assert Us.shape == (6, 18)
        U_end = qct.iso_vec_to_operator(Us[-1])
        np.testing.assert_allclose(
            np.asarray(U_end)[:2, :2], qct.GATES["H"], atol=1e-8
        )


def sla_sqrtm(M):
    import scipy.linalg

    return scipy.linalg.sqrtm(M)


class TestControlInit:
    def test_random_controls(self):
        a, da, dda = qct.initialize_control_trajectory(
            2, 2, 10, [1.0, 2.0], 0.01
        )
        assert a.shape == (10, 2)
        assert da.shape == (10, 2)
        assert dda.shape == (10, 2)
        np.testing.assert_allclose(a[0], 0.0)
        np.testing.assert_allclose(a[-1], 0.0)
        assert np.all(np.abs(a[:, 0]) <= 1.0)
        assert np.all(np.abs(a[:, 1]) <= 2.0)

    def test_derivative_consistent_chain(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(8, 2))
        a[0] = a[-1] = 0
        chain = qct.initialize_control_trajectory(a, 2, 0.2)
        a_, da, dda = chain
        # derivative-chain defects hold at interior knots
        for t in range(6):
            np.testing.assert_allclose(
                a_[t + 1], a_[t] + 0.2 * da[t], atol=1e-9
            )


class TestInitializeTrajectory:
    def test_unitary_init(self):
        traj = qct.initialize_unitary_trajectory(
            qct.GATES["H"], 10, 0.2, 2, [np.ones(2), np.ones(2), np.ones(2)],
            free_time=True,
        )
        assert traj.T == 10
        assert traj.names == ("Ũ⃗", "a", "da", "dda", "Δt")
        np.testing.assert_allclose(
            traj.initial["Ũ⃗"], qct.operator_to_iso_vec(np.eye(2, dtype=complex))
        )
        np.testing.assert_allclose(
            traj.goal["Ũ⃗"], qct.operator_to_iso_vec(qct.GATES["H"]), atol=1e-9
        )
        # geodesic start/end
        np.testing.assert_allclose(
            traj["Ũ⃗"][0], traj.initial["Ũ⃗"], atol=1e-8
        )

    def test_state_init_multiple(self):
        traj = qct.initialize_state_trajectory(
            [np.array([0, 1]), np.array([1, 0])],
            [np.array([1, 0]), np.array([0, 1])],
            8,
            0.1,
            2,
            [np.ones(2), np.ones(2), np.ones(2)],
        )
        assert "ψ̃1" in traj.names and "ψ̃2" in traj.names

    def test_rollout_consistent_init(self):
        sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
        rng = np.random.default_rng(2)
        a_guess = 0.1 * rng.normal(size=(10, 2))
        traj = qct.initialize_unitary_trajectory(
            qct.GATES["H"], 10, 0.2, 2, [np.ones(2), np.ones(2), np.ones(2)],
            a_guess=a_guess, system=sys,
        )
        # states satisfy the rollout recursion by construction
        v0 = traj["Ũ⃗"][0]
        Us = qct.unitary_rollout(v0, traj["a"], traj.get_timesteps(), sys)
        np.testing.assert_allclose(np.asarray(traj["Ũ⃗"]), np.asarray(Us), atol=1e-6)


class TestInterpolation:
    def test_roundtrip_same_grid(self):
        traj = _mk_traj()
        interp = qct.DataInterpolation(traj)
        traj2 = interp(np.asarray(traj.get_times()))
        np.testing.assert_allclose(
            np.asarray(traj2["a"]), np.asarray(traj["a"]), atol=1e-9
        )

    def test_resample(self):
        traj = _mk_traj()
        interp = qct.DataInterpolation(traj)
        traj2 = interp(T=9)
        assert traj2.T == 9
        np.testing.assert_allclose(
            np.asarray(traj2["a"][0]), np.asarray(traj["a"][0]), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(traj2["a"][-1]), np.asarray(traj["a"][-1]), atol=1e-9
        )

    def test_resample_free_time(self):
        # fixed-time -> free-time warm-start conversion for min-time chains
        traj = _mk_traj(free_time=False)
        assert not isinstance(traj.timestep, str)
        ft = qct.resample_free_time(traj, T=13)
        assert ft.T == 13
        assert ft.timestep == "Δt"
        assert "Δt" in ft.names and "Δt" in ft.control_names
        # duration preserved by the resample
        np.testing.assert_allclose(
            float(ft.duration()), float(traj.duration()), rtol=1e-6
        )
        lo, hi = ft.bounds["Δt"]
        dt0 = float(np.asarray(ft["Δt"])[0, 0])
        assert float(np.min(lo)) < dt0 < float(np.max(hi))
        # endpoint controls preserved
        np.testing.assert_allclose(
            np.asarray(ft["a"][0]), np.asarray(traj["a"][0]), atol=1e-9
        )
        # already-free-time trajectories resample cleanly
        ft2 = qct.resample_free_time(ft, T=7)
        assert ft2.timestep == "Δt" and ft2.T == 7

    def test_plot(self, tmp_path):
        traj = _mk_traj()
        out = tmp_path / "traj.png"
        fig = traj.plot(path=str(out))
        assert out.stat().st_size > 1000
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestDirectSums:
    def test_add_suffix(self):
        traj = _mk_traj()
        s = qct.add_suffix(traj, "_sys1")
        assert "a_sys1" in s.names
        assert s.timestep == "Δt_sys1"

    def test_merge_shared_controls(self):
        traj = _mk_traj()
        t1 = qct.add_suffix(traj, "_1")
        t2 = qct.add_suffix(traj, "_2")
        # pre-merge: rename controls back to shared names
        merged = qct.merge(
            [t1, t2],
            merge_names={},
        )
        assert "Ũ⃗_1" in merged.names and "Ũ⃗_2" in merged.names
        assert merged.dim == 2 * traj.dim
