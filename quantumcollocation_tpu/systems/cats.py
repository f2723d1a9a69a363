"""Cat-qubit (Kerr + two-photon exchange) open system template.

Re-implements /root/reference/src/quantum_system_templates/cats.jl:
cat ⊗ buffer system with Kerr couplings, two-photon exchange g2, dissipators
sqrt(kappa) a, buffer drive + Kerr-correction drive; `get_cat_controls`
returns the steady-state control values.
"""

from __future__ import annotations

import numpy as np

from ..quantum.operators import annihilate, coherent_ket  # noqa: F401
from ..quantum.systems import OpenQuantumSystem

__all__ = ["CatSystem", "get_cat_controls", "coherent_ket"]


def CatSystem(
    *,
    g2: float = 0.36,
    chi_aa: float = -7e-3,
    chi_bb: float = -32.0,
    chi_ab: float = 0.79,
    kappa_a: float = 53e-3,
    kappa_b: float = 13.0,
    cat_levels: int = 13,
    buffer_levels: int = 3,
    prefactor: float = 1.0,
) -> OpenQuantumSystem:
    """Cat ⊗ buffer Kerr system with two-photon exchange and dissipation."""
    params = {
        "g2": prefactor * g2,
        "chi_aa": prefactor * chi_aa,
        "chi_bb": prefactor * chi_bb,
        "chi_ab": prefactor * chi_ab,
        "kappa_a": prefactor * kappa_a,
        "kappa_b": prefactor * kappa_b,
        "cat_levels": cat_levels,
        "buffer_levels": buffer_levels,
        "prefactor": prefactor,
    }

    eye_b = np.eye(buffer_levels, dtype=complex)
    eye_a = np.eye(cat_levels, dtype=complex)
    a = np.kron(annihilate(cat_levels), eye_b)
    b = np.kron(eye_a, annihilate(buffer_levels))
    ad, bd = a.conj().T, b.conj().T

    H_drift = (
        -chi_aa / 2 * (ad @ ad @ a @ a)
        - chi_bb / 2 * (bd @ bd @ b @ b)
        - chi_ab * (ad @ a @ bd @ b)
        + g2 * (ad @ ad @ b)
        + np.conj(g2) * (a @ a @ bd)
    )

    # buffer drive and Kerr-correction drive
    H_drives = [b + bd, ad @ a]

    L_dissipators = [np.sqrt(kappa_a) * a, np.sqrt(kappa_b) * b]

    H_drift = H_drift * 2 * np.pi
    H_drives = [H * 2 * np.pi for H in H_drives]
    L_dissipators = [L * np.sqrt(2 * np.pi) for L in L_dissipators]

    return OpenQuantumSystem(H_drift, H_drives, L_dissipators, params=params)


def get_cat_controls(system, alpha: float, T: int) -> np.ndarray:
    """Steady-state control guess for a cat system: (T, 2) array of
    [buffer drive, Kerr correction] values."""
    assert "g2" in system.params, (
        "Requires photon transfer coupling between buffer and cat"
    )
    assert "chi_aa" in system.params, "Requires Kerr coupling for cat"
    buffer_drive = abs(alpha) ** 2 * system.params["g2"]
    cat_kerr_correction = (2.0 * abs(alpha) ** 2 + 1.0) * system.params[
        "chi_aa"
    ]
    return np.stack(
        [np.full(T, buffer_drive), np.full(T, cat_kerr_correction)], axis=1
    )
