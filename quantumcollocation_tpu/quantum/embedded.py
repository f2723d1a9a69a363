"""Embedded operators and subspace/leakage bookkeeping.

Mirrors the reference's EmbeddedOperator surface (call sites:
/root/reference/src/problem_templates/unitary_smooth_pulse_problem.jl:129,273,
unitary_robustness_problem.jl:195-199, unitary_bang_bang_problem.jl:123) and the
subspace index machinery (get_subspace_indices / get_leakage_indices /
get_iso_vec_leakage_indices, see _problem_templates.jl usage and
trajectory_initialization.jl:92-97).
"""

from __future__ import annotations

import dataclasses
from itertools import product
from typing import Any, Sequence

import numpy as np

__all__ = [
    "EmbeddedOperator",
    "embed",
    "unembed",
    "get_subspace_indices",
    "get_leakage_indices",
    "get_iso_vec_leakage_indices",
    "get_iso_vec_subspace_indices",
]


def get_subspace_indices(
    subspaces: Sequence[Sequence[int]] | Sequence[int],
    subsystem_levels: Sequence[int] | int | None = None,
) -> list[int]:
    """Indices of the tensor-product basis states lying in the given subspaces.

    `subspaces` is a list (one per subsystem) of the retained levels of that
    subsystem; `subsystem_levels` the full dimension of each subsystem.  For a
    single system, `get_subspace_indices([0, 1], 3) == [0, 1]`.
    """
    if subsystem_levels is None:
        raise ValueError("subsystem_levels required")
    if isinstance(subsystem_levels, int):
        subsystem_levels = [subsystem_levels]
        if len(subspaces) and isinstance(subspaces[0], int):
            subspaces = [list(subspaces)]
    indices = []
    for combo in product(*[list(s) for s in subspaces]):
        idx = 0
        for c, dim in zip(combo, subsystem_levels):
            idx = idx * dim + c
        indices.append(idx)
    return sorted(indices)


def embed(op: np.ndarray, subspace_indices, levels: int | None = None) -> np.ndarray:
    """Embed a small operator into a larger Hilbert space at subspace_indices.

    `embed(op, embedded_operator)` is also accepted.
    """
    if isinstance(subspace_indices, EmbeddedOperator):
        emb = subspace_indices
        subspace_indices, levels = emb.subspace, emb.levels
    op = np.asarray(op)
    out = np.zeros((levels, levels), dtype=np.complex128)
    out[np.ix_(subspace_indices, subspace_indices)] = op
    # identity on the leakage block keeps the embedded operator unitary
    leakage = [i for i in range(levels) if i not in set(subspace_indices)]
    out[leakage, leakage] = 1.0
    return out


def unembed(U: np.ndarray, subspace_indices) -> np.ndarray:
    """Restrict a full-space operator to the subspace block."""
    if isinstance(subspace_indices, EmbeddedOperator):
        subspace_indices = subspace_indices.subspace
    U = np.asarray(U)
    idx = np.asarray(subspace_indices)
    return U[..., idx[:, None], idx[None, :]]


@dataclasses.dataclass(frozen=True)
class EmbeddedOperator:
    """A target gate embedded in a larger Hilbert space.

    Fields: `.operator` (full-space matrix with identity on leakage block),
    `.subspace` (= `.subspace_indices`), `.levels`, `.subsystem_levels`.

    Constructors:
      - EmbeddedOperator(op, system)                       # qubit subspace of system
      - EmbeddedOperator(op, subspace_indices, levels)     # explicit
      - EmbeddedOperator(op, subspace_indices, subsystem_levels=[...])
    """

    operator: Any
    subspace: tuple
    levels: int
    subsystem_levels: tuple

    def __init__(self, op, system_or_indices=None, levels=None, *, subsystem_levels=None):
        op = np.asarray(op)
        if hasattr(system_or_indices, "levels") and not isinstance(
            system_or_indices, (list, tuple, np.ndarray)
        ):
            sys = system_or_indices
            sub_levels = tuple(sys.params.get("subsystem_levels", (sys.levels,)))
            n_q = int(round(np.log2(op.shape[0])))
            if len(sub_levels) == 1:
                # single system: subspace is the first 2^(n_q) levels... use
                # qubit-per-subsystem convention: first op.shape[0] levels.
                indices = list(range(op.shape[0]))
            else:
                subspaces = [[0, 1]] * len(sub_levels)
                indices = get_subspace_indices(subspaces, list(sub_levels))
                assert len(indices) == op.shape[0], (
                    f"operator dim {op.shape[0]} != subspace size {len(indices)}"
                )
            total_levels = int(np.prod(sub_levels))
        else:
            indices = list(system_or_indices)
            if levels is not None:
                total_levels = int(levels)
                sub_levels = (total_levels,)
            elif subsystem_levels is not None:
                sub_levels = tuple(subsystem_levels)
                total_levels = int(np.prod(sub_levels))
            else:
                raise ValueError("need levels or subsystem_levels")
        full = embed(op, indices, total_levels)
        object.__setattr__(self, "operator", full)
        object.__setattr__(self, "subspace", tuple(indices))
        object.__setattr__(self, "levels", total_levels)
        object.__setattr__(self, "subsystem_levels", tuple(sub_levels))

    @property
    def subspace_indices(self):
        return self.subspace

    @property
    def shape(self):
        return (self.levels, self.levels)

    def __array__(self, dtype=None):
        return np.asarray(self.operator, dtype=dtype)


def get_leakage_indices(op: "EmbeddedOperator | Sequence[int]", levels: int | None = None) -> list[int]:
    """Complement of the subspace — the leakage levels."""
    if isinstance(op, EmbeddedOperator):
        subspace, levels = set(op.subspace), op.levels
    else:
        subspace = set(op)
    return [i for i in range(levels) if i not in subspace]


def get_iso_vec_subspace_indices(op: EmbeddedOperator) -> list[int]:
    """Indices in the unitary iso-vec layout of the subspace block entries.

    iso_vec layout: entry (r, c) of U occupies flat positions c*2N + r (real)
    and c*2N + N + r (imag).
    """
    N = op.levels
    idx = []
    for c in op.subspace:
        for r in op.subspace:
            idx.append(c * 2 * N + r)
            idx.append(c * 2 * N + N + r)
    return sorted(idx)


def get_iso_vec_leakage_indices(op: EmbeddedOperator) -> list[int]:
    """Iso-vec indices of leakage transitions out of the computational subspace.

    These are the entries U[r, c] with c in the subspace (columns we actually
    drive) and r in the leakage levels — the amplitudes the L1 leakage
    suppression penalizes (reference call site:
    /root/reference/src/problem_templates/_problem_templates.jl:46-53).
    """
    N = op.levels
    leakage_rows = get_leakage_indices(op)
    idx = []
    for c in op.subspace:
        for r in leakage_rows:
            idx.append(c * 2 * N + r)
            idx.append(c * 2 * N + N + r)
    return sorted(idx)
