"""Trajectory save/load (the reference's JLD2 checkpointing analog,
Project.toml:10).  Uses a single .npz per trajectory with a JSON metadata
blob; round-trips all components, bounds, pins, goals, and global data."""

from __future__ import annotations

import json

import numpy as np

from ..trajectory.named_trajectory import NamedTrajectory

__all__ = ["save_trajectory", "load_trajectory"]


def save_trajectory(path: str, traj: NamedTrajectory) -> None:
    arrays = {"data": np.asarray(traj.data)}
    meta = {
        "components": {n: list(traj.components[n]) for n in traj.names},
        "controls": list(traj.controls),
        "timestep": traj.timestep,
        "bounds": list(traj.bounds),
        "initial": list(traj.initial),
        "final": list(traj.final),
        "goal": list(traj.goal),
        "global": list(traj.global_data),
    }
    for name, (lo, hi) in traj.bounds.items():
        arrays[f"bound_lo::{name}"] = lo
        arrays[f"bound_hi::{name}"] = hi
    for name, val in traj.initial.items():
        arrays[f"initial::{name}"] = val
    for name, val in traj.final.items():
        arrays[f"final::{name}"] = val
    for name, val in traj.goal.items():
        arrays[f"goal::{name}"] = val
    for name, val in traj.global_data.items():
        arrays[f"global::{name}"] = np.asarray(val)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_trajectory(path: str) -> NamedTrajectory:
    with np.load(path) as f:
        meta = json.loads(bytes(f["__meta__"]).decode())
        data = f["data"]
        comps = {}
        for name, (start, stop) in meta["components"].items():
            comps[name] = data[:, start:stop]
        bounds = {
            n: (f[f"bound_lo::{n}"], f[f"bound_hi::{n}"])
            for n in meta["bounds"]
        }
        initial = {n: f[f"initial::{n}"] for n in meta["initial"]}
        final = {n: f[f"final::{n}"] for n in meta["final"]}
        goal = {n: f[f"goal::{n}"] for n in meta["goal"]}
        global_data = {n: f[f"global::{n}"] for n in meta["global"]}
    return NamedTrajectory(
        comps,
        controls=tuple(
            c
            for c in meta["controls"]
            if not (
                isinstance(meta["timestep"], str) and c == meta["timestep"]
            )
        ),
        timestep=meta["timestep"],
        bounds=bounds,
        initial=initial,
        final=final,
        goal=goal,
        global_data=global_data,
    )
