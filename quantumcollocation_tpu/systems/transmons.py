"""Transmon system templates.

Re-implements /root/reference/src/quantum_system_templates/transmons.jl:
TransmonSystem (duffing/quartic/cosine lab frames, rotating frame, 2π unit
handling, :32-103), TransmonDipoleCoupling (lab/rotating forms, :137-181),
MultiTransmonSystem (all-pairs couplings -> CompositeQuantumSystem, :198-242).
Subsystem indices are 0-based (Python convention).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

from ..quantum.operators import annihilate, lift
from ..quantum.systems import (
    CompositeQuantumSystem,
    QuantumSystem,
    QuantumSystemCoupling,
)

__all__ = ["TransmonSystem", "TransmonDipoleCoupling", "MultiTransmonSystem"]


def TransmonSystem(
    *,
    omega: float = 4.0,  # GHz
    delta: float = 0.2,  # GHz (anharmonicity)
    levels: int = 3,
    lab_frame: bool = False,
    frame_omega: float | None = None,
    multiply_by_2pi: bool = True,
    lab_frame_type: str = "duffing",
    drives: bool = True,
) -> QuantumSystem:
    """Transmon qubit: H = omega a'a - delta/2 a'a'aa (rotating frame by
    default; lab-frame variants duffing/quartic/cosine)."""
    assert lab_frame_type in ("duffing", "quartic", "cosine")

    if frame_omega is None:
        frame_omega = 0.0 if lab_frame else omega
    if lab_frame and abs(frame_omega) > 1e-12:
        frame_omega = 0.0
    if abs(frame_omega) > 1e-12:
        lab_frame = False

    a = annihilate(levels)
    ad = a.conj().T
    n_op = ad @ a

    if lab_frame:
        if lab_frame_type == "duffing":
            H_drift = omega * n_op - (delta / 2) * (ad @ ad @ a @ a)
        elif lab_frame_type == "quartic":
            omega0 = omega + delta
            H_drift = omega0 * n_op - (delta / 12) * np.linalg.matrix_power(
                a + ad, 4
            )
        else:  # cosine
            omega0 = omega + delta
            E_C = delta
            E_J = omega0**2 / (8 * E_C)
            n_hat = 1j / 2 * (E_J / (2 * E_C)) ** 0.25 * (a - ad)
            phi_hat = (2 * E_C / E_J) ** 0.25 * (a + ad)
            H_drift = 4 * E_C * (n_hat @ n_hat) - E_J * np.real(
                sla.cosm(phi_hat)
            ).astype(complex)
    else:
        H_drift = (omega - frame_omega) * n_op - (delta / 2) * (
            ad @ ad @ a @ a
        )

    if drives:
        H_drives = [a + ad, 1j * (a - ad)]
    else:
        H_drives = []

    if multiply_by_2pi:
        H_drift = H_drift * 2 * np.pi
        H_drives = [H * 2 * np.pi for H in H_drives]

    params = {
        "omega": omega,
        "delta": delta,
        "levels": levels,
        "lab_frame": lab_frame,
        "frame_omega": frame_omega,
        "multiply_by_2pi": multiply_by_2pi,
        "lab_frame_type": lab_frame_type,
        "drives": drives,
    }
    return QuantumSystem(H_drift, H_drives, params=params)


def TransmonDipoleCoupling(
    g_ij: float,
    pair: tuple,
    subsystem_levels,
    *,
    lab_frame: bool = False,
    multiply_by_2pi: bool = True,
) -> QuantumSystemCoupling:
    """Dipole coupling between transmons i and j (0-based pair).

    Lab frame: g (a_i + a_i')(a_j + a_j'); rotating frame:
    g (a_i a_j' + a_i' a_j).  `subsystem_levels` is a list of dims or a list
    of QuantumSystem (dims taken from .levels).
    """
    if subsystem_levels and hasattr(subsystem_levels[0], "levels"):
        subsystem_levels = [s.levels for s in subsystem_levels]
    subsystem_levels = list(subsystem_levels)
    i, j = pair
    a_i = lift(annihilate(subsystem_levels[i]), i, subsystem_levels)
    a_j = lift(annihilate(subsystem_levels[j]), j, subsystem_levels)

    if lab_frame:
        op = g_ij * (a_i + a_i.conj().T) @ (a_j + a_j.conj().T)
    else:
        op = g_ij * (a_i @ a_j.conj().T + a_i.conj().T @ a_j)

    if multiply_by_2pi:
        op = op * 2 * np.pi

    return QuantumSystemCoupling(
        op=op,
        g=g_ij,
        pair=tuple(pair),
        subsystem_levels=tuple(subsystem_levels),
        coupling_type="TransmonDipoleCoupling",
        params={"lab_frame": lab_frame, "multiply_by_2pi": multiply_by_2pi},
    )


def MultiTransmonSystem(
    omegas,
    deltas,
    gs,
    *,
    levels_per_transmon: int = 3,
    subsystem_levels=None,
    lab_frame: bool = False,
    subsystems=None,
    subsystem_drive_indices=None,
) -> CompositeQuantumSystem:
    """Multi-transmon composite with all-pairs dipole couplings."""
    omegas = list(omegas)
    n = len(omegas)
    deltas = list(deltas)
    gs = np.asarray(gs)
    assert len(deltas) == n and gs.shape == (n, n)
    if subsystem_levels is None:
        subsystem_levels = [levels_per_transmon] * n
    subsystems = list(range(n)) if subsystems is None else list(subsystems)
    if subsystem_drive_indices is None:
        subsystem_drive_indices = list(range(n))

    systems = []
    kept = []
    for i in range(n):
        if i in subsystems:
            systems.append(
                TransmonSystem(
                    levels=subsystem_levels[i],
                    omega=omegas[i],
                    delta=deltas[i],
                    lab_frame=lab_frame,
                    drives=i in subsystem_drive_indices,
                )
            )
            kept.append(i)

    kept_levels = [subsystem_levels[i] for i in kept]
    couplings = []
    for ii, i in enumerate(kept):
        for jj, j in enumerate(kept):
            if i < j:
                couplings.append(
                    TransmonDipoleCoupling(
                        float(gs[i, j]), (ii, jj), kept_levels,
                        lab_frame=lab_frame,
                    )
                )

    return CompositeQuantumSystem(systems, couplings)
