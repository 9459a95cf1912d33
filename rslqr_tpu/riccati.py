"""Riccati-recursion LQR solver — the serial parity oracle.

TPU-native counterpart of the reference's ``src/riccati_solve.{h,c}`` and
``src/riccati_solver.{h,c}``: the hand-written backward/forward loops over
per-knot heap matrices (riccati_solve.c:26-150) become two ``lax.scan``s over
stacked arrays. The backward pass is inherently serial in the horizon, which
is exactly why the nested-dissection solver in :mod:`rslqr_tpu.rslqr` exists;
this implementation is the correctness baseline held to the reference's
1e-10 golden-parity bar (test/riccati_solver_test.c:343).

The produced KKT vector uses the same variable ordering as the reference,
``[y0 x0 u0 y1 x1 u1 ... y_{N-1} x_{N-1}]`` (riccati_solver.c:77-85), so it is
directly comparable against the rsLQR solver and the shipped golden ``soln``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .problem import LQRProblem, pack_solution


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RiccatiSolution:
    """All Riccati solver outputs (ref riccati_solver.h:62-86).

    Attributes:
      K: ``[N-1, m, n]`` feedback gains.
      d: ``[N-1, m]`` feedforward terms.
      P: ``[N, n, n]`` cost-to-go Hessians.
      p: ``[N, n]`` cost-to-go gradients.
      X: ``[N, n]`` state trajectory.
      U: ``[N-1, m]`` input trajectory.
      Y: ``[N, n]`` costates (dynamics multipliers).
    """

    K: jax.Array
    d: jax.Array
    P: jax.Array
    p: jax.Array
    X: jax.Array
    U: jax.Array
    Y: jax.Array

    def kkt_vector(self) -> jax.Array:
        """Flat solution in the reference's interleaved variable ordering."""
        return pack_solution(self.Y, self.X, self.U)


def backward_step(P_next, p_next, A, B, f, Qd, Rd, q, r):
    """One backward Riccati step at a single knot point.

    Exposed separately so the action-value expansion in the middle of the
    pass is unit-testable against the reference's hard-coded single-step
    literals (riccati_solver_test.c:87-220), not just via end-to-end parity.

    Returns ``(Qx, Qu, Qxx, Quu, Qux, K, d, P, p)``.
    """
    # Gradient terms (riccati_solve.c:50-61)
    Pf_p = P_next @ f + p_next
    Qx = q + A.T @ Pf_p
    Qu = r + B.T @ Pf_p
    # Hessian terms (riccati_solve.c:63-78)
    AtP = A.T @ P_next
    BtP = B.T @ P_next
    Qxx = jnp.diag(Qd) + AtP @ A
    Quu = jnp.diag(Rd) + BtP @ B
    Qux = BtP @ A
    # Gains via Cholesky (riccati_solve.c:80-93)
    L = jnp.linalg.cholesky(Quu)
    rhs = jnp.concatenate([Qux, Qu[:, None]], axis=1)
    sol = jax.scipy.linalg.cho_solve((L, True), rhs)
    K = -sol[:, :-1]
    dgain = -sol[:, -1]
    # Cost-to-go (riccati_solve.c:95-109)
    QuuK = Quu @ K
    P = Qxx + K.T @ QuuK + K.T @ Qux + Qux.T @ K
    p = Qx + K.T @ (Quu @ dgain) + K.T @ Qu + Qux.T @ dgain
    return Qx, Qu, Qxx, Quu, Qux, K, dgain, P, p


def backward_pass(prob: LQRProblem):
    """Backward Riccati recursion (ref riccati_solve.c:26-112).

    Returns ``(K, d, P, p)`` stacked over the horizon.
    """
    N = prob.nhorizon
    PN = jnp.diag(prob.Qdiag[-1])
    pN = prob.q[-1]

    def step(carry, inp):
        P_next, p_next = carry
        A, B, f, Qd, Rd, q, r = inp
        *_, K, dgain, P, p = backward_step(P_next, p_next, A, B, f, Qd, Rd, q, r)
        return (P, p), (K, dgain, P, p)

    inputs = (
        prob.A[:-1],
        prob.B[:-1],
        prob.f[:-1],
        prob.Qdiag[:-1],
        prob.Rdiag[:-1],
        prob.q[:-1],
        prob.r[:-1],
    )
    (_, _), (K, d, Ps, ps) = jax.lax.scan(step, (PN, pN), inputs, reverse=True)
    P = jnp.concatenate([Ps, PN[None]], axis=0)
    p = jnp.concatenate([ps, pN[None]], axis=0)
    return K, d, P, p


def forward_pass(prob: LQRProblem, K, d, P, p):
    """Forward rollout (ref riccati_solve.c:114-150). Returns ``(X, U, Y)``."""

    def step(x, inp):
        A, B, f, Pk, pk, Kk, dk = inp
        y = Pk @ x + pk
        u = Kk @ x + dk
        x_next = A @ x + B @ u + f
        return x_next, (x, u, y)

    inputs = (prob.A[:-1], prob.B[:-1], prob.f[:-1], P[:-1], p[:-1], K, d)
    xN, (X, U, Y) = jax.lax.scan(step, prob.x0, inputs)
    yN = P[-1] @ xN + p[-1]
    X = jnp.concatenate([X, xN[None]], axis=0)
    Y = jnp.concatenate([Y, yN[None]], axis=0)
    return X, U, Y


def solve_riccati(prob: LQRProblem) -> RiccatiSolution:
    """Full Riccati solve (ref ndlqr_SolveRiccati, riccati_solve.c:7-24).

    Pure and jittable; vmap over a batched :class:`LQRProblem` for many
    instances. Timing lives in :mod:`rslqr_tpu.profile`, not here.
    """
    K, d, P, p = backward_pass(prob)
    X, U, Y = forward_pass(prob, K, d, P, p)
    return RiccatiSolution(K=K, d=d, P=P, p=p, X=X, U=U, Y=Y)
