"""Rydberg atom chain system template.

Re-implements /root/reference/src/quantum_system_templates/rydberg.jl:
van-der-Waals C/r^6 interactions (nearest-neighbor, next-nearest, or
all-to-all), global X/Y drives and global detuning, built from string-pattern
operators in the spin basis |g> = [1,0], |r> = [0,1].
"""

from __future__ import annotations

import numpy as np

from ..quantum.operators import operator_from_string
from ..quantum.systems import QuantumSystem

__all__ = ["RydbergChainSystem"]

_LOOKUP = {
    "I": np.eye(2, dtype=complex),
    "X": np.array([[0, 1], [1, 0]], dtype=complex),
    "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
    "Z": np.array([[1, 0], [0, -1]], dtype=complex),
    "n": np.array([[0, 0], [0, 1]], dtype=complex),
}


def _pattern_with_gap(N: int, i: int, gap: int) -> str:
    """'I'*N with 'n' at positions i and i+gap+1 (0-based)."""
    chars = ["I"] * N
    if i + gap + 1 < N:
        chars[i] = "n"
        chars[i + gap + 1] = "n"
    return "".join(chars)


def _lift_char(ch: str, i: int, N: int) -> str:
    chars = ["I"] * N
    chars[i] = ch
    return "".join(chars)


def RydbergChainSystem(
    *,
    N: int = 3,
    C: float = 862690 * 2 * np.pi,  # MHz * um^6
    distance: float = 8.7,  # um
    cutoff_order: int = 1,
    local_detune: bool = False,
    all2all: bool = True,
    ignore_Y_drive: bool = False,
) -> QuantumSystem:
    """Rydberg chain: H = sum_i 0.5*Omega_i cos(phi) X_i - ... - Delta n_i
    + sum_{i<j} C/|i-j|^6 n_i n_j, with global X/Y/detune drives."""
    dim = 2**N
    H_drift = np.zeros((dim, dim), dtype=complex)
    if all2all:
        for gap in range(N - 1):
            for i in range(N - gap - 1):
                H_drift += (
                    C
                    * operator_from_string(
                        _pattern_with_gap(N, i, gap), lookup=_LOOKUP
                    )
                    / ((gap + 1) * distance) ** 6
                )
    else:
        if cutoff_order not in (1, 2):
            raise ValueError("Higher cutoff order not supported")
        for i in range(N - 1):
            H_drift += (
                C
                * operator_from_string(
                    _pattern_with_gap(N, i, 0), lookup=_LOOKUP
                )
                / distance**6
            )
        if cutoff_order == 2:
            for i in range(N - 2):
                H_drift += (
                    C
                    * operator_from_string(
                        _pattern_with_gap(N, i, 1), lookup=_LOOKUP
                    )
                    / (2 * distance) ** 6
                )

    H_drives = []
    # global X drive
    Hx = sum(
        0.5 * operator_from_string(_lift_char("X", i, N), lookup=_LOOKUP)
        for i in range(N)
    )
    H_drives.append(Hx)
    if not ignore_Y_drive:
        Hy = sum(
            0.5 * operator_from_string(_lift_char("Y", i, N), lookup=_LOOKUP)
            for i in range(N)
        )
        H_drives.append(Hy)
    # global detuning
    H_detune = -sum(
        operator_from_string(_lift_char("n", i, N), lookup=_LOOKUP)
        for i in range(N)
    )
    H_drives.append(H_detune)
    if local_detune:
        # one local detuning pattern (staggered)
        H_local = -sum(
            (i % 2)
            * operator_from_string(_lift_char("n", i, N), lookup=_LOOKUP)
            for i in range(N)
        )
        H_drives.append(H_local)

    params = {
        "N": N,
        "C": C,
        "distance": distance,
        "cutoff_order": cutoff_order,
        "local_detune": local_detune,
        "all2all": all2all,
        "ignore_Y_drive": ignore_Y_drive,
    }
    return QuantumSystem(H_drift, H_drives, params=params)
