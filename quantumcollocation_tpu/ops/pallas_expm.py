"""Pallas TPU kernel: batched small-matrix exponential bank.

The collocation hot path evaluates exp(X_b) for huge batches of SMALL real
matrices (X = G(a_t)Δt_t, n = 2N ∈ [4, 64)).  XLA's batched expm path
(LU-based solve per instance) leaves the MXU idle at these sizes and bounces
intermediates through HBM.  This kernel uses the batch-across-lanes layout:

    X is stored (n, n, B) — each matrix ENTRY is a 128-lane vector of batch
    instances.  Matrix products become n³ fused vector multiply-adds on the
    VPU, the Padé solve becomes branch-free Gaussian elimination (no
    pivoting — the Padé denominator q(-X) is diagonally dominant for
    ||X|| <= 0.5 after scaling), and the whole Horner + solve + squaring
    chain stays in VMEM.

All loop bounds (n, squarings) are trace-time constants.  Interpret mode
makes the kernel testable on CPU; `expm_batched` falls back to the pure-JAX
path off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..dynamics.expm import expm_squaring, pade_coefficients

__all__ = ["expm_batched_lanes", "expm_batched"]

_LANES = 128


def _expm_kernel(x_ref, out_ref, *, n: int, order: int, num_squarings: int):
    """x_ref/out_ref: (n, n, LANES) blocks in VMEM."""
    coeffs = pade_coefficients(order)
    scale = 2.0 ** (-num_squarings)
    X = x_ref[...] * scale  # (n, n, L)

    def matmul(A, B):
        # (n, n, L) @ (n, n, L) with batch in the lane dimension
        return jnp.einsum(
            "ikb,kjb->ijb", A, B, preferred_element_type=jnp.float32
        )

    eye = jnp.broadcast_to(
        jnp.eye(n, dtype=X.dtype)[:, :, None], X.shape
    )

    # Horner evaluation of the Padé numerator/denominator
    acc = coeffs[-1] * eye
    for c in reversed(coeffs[:-1]):
        acc = matmul(X, acc) + c * eye
    A_num = acc
    acc = (coeffs[-1] * (-1.0) ** (len(coeffs) - 1)) * eye
    for k, c in reversed(list(enumerate(coeffs[:-1]))):
        acc = matmul(X, acc) + (c * (-1.0) ** k) * eye
    B_den = acc

    # P = B_den^{-1} A_num by Gauss-Jordan without pivoting (lanewise)
    M = B_den
    R = A_num
    for col in range(n):
        pivot = M[col, col, :]
        inv_p = 1.0 / pivot
        # normalize pivot row
        M = M.at[col].set(M[col] * inv_p[None, :])
        R = R.at[col].set(R[col] * inv_p[None, :])
        for row in range(n):
            if row == col:
                continue
            f = M[row, col, :]
            M = M.at[row].add(-f[None, :] * M[col])
            R = R.at[row].add(-f[None, :] * R[col])
    P = R

    for _ in range(num_squarings):
        P = matmul(P, P)

    out_ref[...] = P


@functools.partial(
    jax.jit, static_argnames=("order", "num_squarings", "interpret")
)
def expm_batched_lanes(X, *, order: int = 8, num_squarings: int = 4, interpret: bool = False):
    """exp(X) for X of shape (B, n, n) via the batch-across-lanes kernel.

    B is padded up to a multiple of 128 internally.
    """
    B, n, _ = X.shape
    Bp = ((B + _LANES - 1) // _LANES) * _LANES
    Xp = jnp.zeros((Bp, n, n), X.dtype).at[:B].set(X)
    # eye on the padding keeps the Gauss-Jordan pivots nonzero
    Xp = Xp.at[B:].set(jnp.zeros((n, n), X.dtype))
    Xl = jnp.moveaxis(Xp, 0, -1)  # (n, n, Bp)

    kernel = functools.partial(
        _expm_kernel, n=n, order=order, num_squarings=num_squarings
    )
    out = pl.pallas_call(
        kernel,
        grid=(Bp // _LANES,),
        in_specs=[
            pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), X.dtype),
        interpret=interpret,
    )(Xl)
    return jnp.moveaxis(out, -1, 0)[:B]


def expm_batched(X, *, order: int = 8, num_squarings: int = 4):
    """Batched expm: Pallas lanes kernel on TPU, pure-JAX fallback elsewhere."""
    if jax.default_backend() == "tpu" and X.ndim == 3:
        return expm_batched_lanes(
            X, order=order, num_squarings=num_squarings
        )
    return jax.vmap(
        lambda x: expm_squaring(x, order=order, num_squarings=num_squarings)
    )(X)
