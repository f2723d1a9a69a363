"""Standard operator library.

Mirrors the reference's PiccoloQuantumObjects operator surface inferred from
call sites (/root/reference/src/quantum_system_templates/transmons.jl:55,145-146,
rydberg.jl:83-86, unitary_direct_sum_problem.jl:191): GATES, PAULIS,
annihilate/create, lift, operator_from_string, haar utilities.

All functions return numpy-compatible jax arrays in complex dtype; subsystem
indices are 0-based (Python convention; the reference uses 1-based Julia
indices).
"""

from __future__ import annotations

import math
from functools import reduce
from typing import Mapping, Sequence

import numpy as np

__all__ = [
    "GATES",
    "PAULIS",
    "annihilate",
    "create",
    "number_op",
    "quad_op",
    "lift",
    "operator_from_string",
    "kron_all",
    "haar_random",
    "haar_identity",
    "coherent_ket",
]

_SQ2 = 1.0 / math.sqrt(2.0)

PAULIS: Mapping[str, np.ndarray] = {
    "I": np.eye(2, dtype=np.complex128),
    "X": np.array([[0, 1], [1, 0]], dtype=np.complex128),
    "Y": np.array([[0, -1j], [1j, 0]], dtype=np.complex128),
    "Z": np.array([[1, 0], [0, -1]], dtype=np.complex128),
}

GATES: Mapping[str, np.ndarray] = {
    "I": np.eye(2, dtype=np.complex128),
    "X": PAULIS["X"],
    "Y": PAULIS["Y"],
    "Z": PAULIS["Z"],
    "H": _SQ2 * np.array([[1, 1], [1, -1]], dtype=np.complex128),
    "S": np.array([[1, 0], [0, 1j]], dtype=np.complex128),
    "T": np.array([[1, 0], [0, np.exp(1j * np.pi / 4)]], dtype=np.complex128),
    "CZ": np.diag([1, 1, 1, -1]).astype(np.complex128),
    "CX": np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
        dtype=np.complex128,
    ),
}


def annihilate(levels: int) -> np.ndarray:
    """Bosonic annihilation operator truncated to `levels` levels."""
    return np.diag(
        np.sqrt(np.arange(1, levels, dtype=np.float64)), k=1
    ).astype(np.complex128)


def create(levels: int) -> np.ndarray:
    """Bosonic creation operator truncated to `levels` levels."""
    return annihilate(levels).conj().T


def number_op(levels: int) -> np.ndarray:
    """Number operator a'a."""
    return np.diag(np.arange(levels, dtype=np.float64)).astype(np.complex128)


def quad_op(levels: int) -> np.ndarray:
    """Position-like quadrature (a + a')."""
    a = annihilate(levels)
    return a + a.conj().T


def kron_all(ops: Sequence[np.ndarray]) -> np.ndarray:
    """Kronecker product of a list of operators, left to right."""
    return reduce(np.kron, [np.asarray(op) for op in ops])


def lift(op: np.ndarray, index: int, subsystem_levels) -> np.ndarray:
    """Lift `op` acting on subsystem `index` (0-based) into the tensor product.

    `subsystem_levels` is either a list of per-subsystem dimensions or an int
    (number of qubit subsystems).  Mirrors the reference's `lift`
    (call sites /root/reference/src/quantum_system_templates/transmons.jl:145-146).
    """
    if isinstance(subsystem_levels, int):
        subsystem_levels = [2] * subsystem_levels
    ops = [
        np.asarray(op)
        if i == index
        else np.eye(levels, dtype=np.complex128)
        for i, levels in enumerate(subsystem_levels)
    ]
    return kron_all(ops)


def operator_from_string(
    op_string: str, lookup: Mapping[str, np.ndarray] | None = None
) -> np.ndarray:
    """Build a tensor-product operator from a character string.

    e.g. operator_from_string("XIZ") == X ⊗ I ⊗ Z.  Matches the pattern
    construction in the reference's Rydberg template
    (/root/reference/src/quantum_system_templates/rydberg.jl:83-86).
    """
    if lookup is None:
        lookup = {**PAULIS, "n": np.array([[0, 0], [0, 1]], dtype=np.complex128)}
    return kron_all([lookup[ch] for ch in op_string])


def haar_random(n: int, seed: int | np.random.Generator = 0) -> np.ndarray:
    """Haar-random unitary of dimension n (QR of a Ginibre matrix)."""
    rng = (
        seed
        if isinstance(seed, np.random.Generator)
        else np.random.default_rng(seed)
    )
    z = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    q, r = np.linalg.qr(z)
    return q * (np.diag(r) / np.abs(np.diag(r)))


def haar_identity(n: int, radius: float, seed: int | np.random.Generator = 0) -> np.ndarray:
    """A Haar-like random unitary near the identity.

    Draws a random Hermitian H (GUE-normalized) and returns exp(-i*radius*H),
    mirroring the reference's `haar_identity` usage
    (/root/reference/src/problem_templates/unitary_direct_sum_problem.jl:191).
    """
    rng = (
        seed
        if isinstance(seed, np.random.Generator)
        else np.random.default_rng(seed)
    )
    z = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    h = (z + z.conj().T) / 2.0
    h = h / np.linalg.norm(h)
    evals, evecs = np.linalg.eigh(h)
    return (evecs * np.exp(-1j * radius * evals)) @ evecs.conj().T


def coherent_ket(alpha, levels: int) -> np.ndarray:
    """Coherent state |alpha> truncated to `levels` levels.

    Mirrors /root/reference/src/quantum_system_templates/cats.jl:5-7.
    """
    n = np.arange(levels)
    log_fact = np.cumsum(np.log(np.maximum(n, 1)))
    amp = np.exp(-0.5 * abs(alpha) ** 2) * np.power(
        complex(alpha), n
    ) / np.exp(0.5 * log_fact)
    return amp.astype(np.complex128)
