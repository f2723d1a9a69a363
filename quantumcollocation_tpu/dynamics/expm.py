"""Matrix exponentials and propagators with static, jit-friendly structure.

The collocation hot path evaluates exp(G(a_t) * dt_t) for every knot t and
every batch instance.  jax.scipy.linalg.expm uses data-dependent norm-based
squaring — fine on CPU, but on TPU the dynamic control flow blocks fusion.
Here the number of squarings is STATIC, derived at trace time from an upper
bound on ||G*dt|| (known from control bounds), so the whole propagator bank
compiles to a fixed chain of batched matmuls that XLA can tile onto the MXU.

Padé coefficients follow the classic diagonal [m/m] approximant
exp(X) ≈ q_m(-X)^{-1} q_m(X), the same family the reference's
UnitaryPadeIntegrator uses for its implicit defects
(/root/reference/src/problem_templates/unitary_smooth_pulse_problem.jl:14,30,
README.md:79).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "pade_coefficients",
    "pade_numerator_denominator",
    "expm_pade",
    "expm_squaring",
    "default_num_squarings",
]


def pade_coefficients(order: int):
    """Coefficients c_k of the [m/m] diagonal Padé numerator q_m(X) = sum c_k X^k.

    order = 2m is the accuracy order (matches the reference's `pade_order`
    convention: order 4 -> m=2, ..., order 20 -> m=10).
    """
    if order % 2 != 0:
        raise ValueError("pade order must be even")
    m = order // 2
    coeffs = []
    for k in range(m + 1):
        c = (
            math.factorial(2 * m - k)
            * math.factorial(m)
            / (
                math.factorial(2 * m)
                * math.factorial(k)
                * math.factorial(m - k)
            )
        )
        coeffs.append(c)
    return tuple(coeffs)


def _polyval_matrix(coeffs, X):
    """sum_k coeffs[k] X^k by Horner's rule (matrix argument)."""
    eye = jnp.eye(X.shape[-1], dtype=X.dtype)
    acc = coeffs[-1] * eye
    for c in reversed(coeffs[:-1]):
        acc = X @ acc + c * eye
    return acc


def pade_numerator_denominator(X, order: int = 4):
    """(A, B) with exp(X) ≈ B^{-1} A: A = q(X), B = q(-X)."""
    coeffs = pade_coefficients(order)
    num = _polyval_matrix(coeffs, X)
    den = _polyval_matrix(
        tuple(c * (-1.0) ** k for k, c in enumerate(coeffs)), X
    )
    return num, den


@partial(jax.jit, static_argnames=("order",))
def expm_pade(X, order: int = 8):
    """Single-step diagonal Padé approximant of exp(X) (no squaring)."""
    A, B = pade_numerator_denominator(X, order)
    return jnp.linalg.solve(B, A)


def default_num_squarings(norm_bound: float, order: int = 8) -> int:
    """Static squaring count s so that ||X|| / 2^s is inside the Padé sweet spot.

    For order-8 Padé, ||X||/2^s <= ~1.0 keeps the local error near machine
    epsilon in f32; we target 0.5 for margin.
    """
    if norm_bound <= 0.5:
        return 0
    return max(0, math.ceil(math.log2(norm_bound / 0.5)))


@partial(jax.jit, static_argnames=("order", "num_squarings"))
def expm_squaring(X, order: int = 8, num_squarings: int = 4):
    """exp(X) by scaling-and-squaring with a STATIC squaring count.

    All shapes/iteration counts are trace-time constants -> a fixed chain of
    batched matmuls, ideal for vmap over (batch, knots).
    """
    scale = 2.0 ** (-num_squarings)
    P = expm_pade(X * scale, order=order)
    for _ in range(num_squarings):
        P = P @ P
    return P
