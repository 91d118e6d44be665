"""ADMM solver for positive-Lasso concept decomposition, in JAX.

Rebuilds the reference's torch ADMM
(reference: additional_approaches/src/my_splice/admm.py:3-47): minimize
``‖Cᵀw − v‖² + λ‖w‖₁  s.t. w ≥ 0`` via scaled ADMM — x-update is a
Cholesky solve against the cached factor of ``2CCᵀ + ρI`` (one c×c factor
per dictionary, reused across every embedding), z-update is a positive
soft-threshold, u is the scaled dual.

TPU-first differences:

* the iteration is a ``lax.while_loop`` with the same dual/primal residual
  stopping rule — one compiled program instead of a Python loop;
* iterates start at zero (deterministic) instead of the reference's
  ``randn`` — the problem is convex so the fixed point is identical, and
  determinism-under-jit is required for the rank-search cache
  (SURVEY.md §7 hard part #4);
* fully batched: one solve handles (batch, dim) embeddings, the
  triangular solves and matmuls land on the MXU;
* differentiable like the reference's ADMM path (no sklearn break).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ADMMFactors(NamedTuple):
    """Per-dictionary cached factorization."""

    concepts: Array  # (c, dim)
    chol: Array      # (c, c) lower Cholesky factor of 2CCᵀ + ρI
    rho: float


def precompute_factors(concepts: Array, rho: float = 5.0) -> ADMMFactors:
    c = concepts.shape[0]
    Q = 2.0 * concepts @ concepts.T + rho * jnp.eye(c, dtype=concepts.dtype)
    return ADMMFactors(concepts=concepts,
                       chol=jnp.linalg.cholesky(Q), rho=rho)


@partial(jax.jit, static_argnames=("max_iter",))
def _solve(factors: ADMMFactors, v: Array, l1_penalty: Array,
           tol: float, max_iter: int) -> Array:
    C, L, rho = factors.concepts, factors.chol, factors.rho
    c = C.shape[0]
    n = v.shape[0]
    Cb = C @ v.T  # (c, n)

    def chol_solve(rhs):
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    def cond(state):
        _, z, _, z_old, it = state
        res_prim = jnp.linalg.norm(state[0] - z, axis=0).max()
        res_dual = jnp.linalg.norm(rho * (z - z_old), axis=0).max()
        not_converged = jnp.logical_or(res_prim >= tol, res_dual >= tol)
        return jnp.logical_and(it < max_iter,
                               jnp.logical_or(it == 0, not_converged))

    def body(state):
        x, z, u, _, it = state
        xn = chol_solve(2.0 * Cb + rho * (z - u))
        thresh = xn + u - l1_penalty / rho
        zn = jnp.maximum(thresh, 0.0)
        un = u + xn - zn
        return xn, zn, un, z, it + 1

    zeros = jnp.zeros((c, n), v.dtype)
    x, z, u, _, _ = jax.lax.while_loop(
        cond, body, (zeros, zeros, zeros, zeros, jnp.int32(0)))
    return z.T  # (n, c)


def admm_lasso(concepts: Array, v: Array, l1_penalty: float,
               rho: float = 5.0, tol: float = 1e-6,
               max_iter: int = 2000,
               factors: ADMMFactors = None) -> Array:
    """Solve the positive lasso for a batch of embeddings ``v`` (n, dim)
    against dictionary ``concepts`` (c, dim) → sparse weights (n, c).

    Pass precomputed ``factors`` to amortize the Cholesky across calls
    (the rank search calls this repeatedly with varying ``l1_penalty``).
    """
    if factors is None:
        factors = precompute_factors(jnp.asarray(concepts), rho)
    return _solve(factors, jnp.asarray(v), jnp.asarray(l1_penalty, jnp.float32),
                  tol, max_iter)
