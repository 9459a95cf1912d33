"""LQR problem definition as a JAX pytree of stacked arrays.

TPU-native counterpart of the reference's ``src/lqr_data.{h,c}`` and
``src/lqr_problem.{h,c}``: instead of ``N`` individually-malloc'd per-knot
``LQRData`` structs (lqr_data.c:24-49), the whole horizon is stored as dense
arrays stacked over the knot axis — the natural layout for ``vmap``/``scan``
and for feeding batched block kernels.

The problem solved (ref docs/Overview.dox:10-14, riccati_solver.h:24-30):

  minimize   0.5 x_N' Q_N x_N + q_N' x_N + c_N
             + sum_{k<N-1} 0.5 x_k' Q_k x_k + q_k' x_k + 0.5 u_k' R_k u_k + r_k' u_k + c_k
  subject to x_{k+1} = A_k x_k + B_k u_k + f_k,   x_0 = x0

``Q`` and ``R`` are diagonal, stored as vectors (ref lqr_data.h:73-77) — the
reference expands them to dense matrices at solver init (solver.c:160-169);
here they stay vectors and every "Q^{-1} @ M" becomes an elementwise scale.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .utils import is_power_of_two


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LQRProblem:
    """A discrete-time affine LQR problem over ``N`` knot points.

    All arrays are stacked over the leading knot axis. Index ``N-1`` of the
    dynamics arrays (``A``, ``B``, ``f``) and of ``Rdiag``/``r`` is carried
    for JSON round-trip fidelity with the reference format but is semantically
    unused (there is no control or dynamics step at the terminal knot).

    Attributes:
      A: ``[N, n, n]`` dynamics state Jacobians.
      B: ``[N, n, m]`` dynamics input Jacobians.
      f: ``[N, n]`` dynamics affine terms.
      Qdiag: ``[N, n]`` diagonal of the state cost Hessian.
      Rdiag: ``[N, m]`` diagonal of the input cost Hessian.
      q: ``[N, n]`` state cost gradients.
      r: ``[N, m]`` input cost gradients.
      c: ``[N]`` cost constants.
      x0: ``[n]`` initial state.
    """

    A: jax.Array
    B: jax.Array
    f: jax.Array
    Qdiag: jax.Array
    Rdiag: jax.Array
    q: jax.Array
    r: jax.Array
    c: jax.Array
    x0: jax.Array

    @property
    def nhorizon(self) -> int:
        return self.A.shape[-3]

    @property
    def nstates(self) -> int:
        return self.A.shape[-1]

    @property
    def ninputs(self) -> int:
        return self.B.shape[-1]

    @property
    def nvars(self) -> int:
        """Length of the KKT variable vector (ref solver.c:64)."""
        n, m, N = self.nstates, self.ninputs, self.nhorizon
        return (2 * n + m) * N - m

    def validate(self) -> None:
        """Shape/consistency checks (ref lqr_problem.c:16-37 error paths)."""
        n, m, N = self.nstates, self.ninputs, self.nhorizon
        if not is_power_of_two(N):
            raise ValueError(f"nhorizon must be a power of two, got {N}")
        expect = {
            "A": (N, n, n),
            "B": (N, n, m),
            "f": (N, n),
            "Qdiag": (N, n),
            "Rdiag": (N, m),
            "q": (N, n),
            "r": (N, m),
            "c": (N,),
            "x0": (n,),
        }
        for name, shape in expect.items():
            arr = getattr(self, name)
            if tuple(arr.shape[-len(shape):]) != shape:
                raise ValueError(f"{name}: expected trailing shape {shape}, got {arr.shape}")

    def astype(self, dtype) -> "LQRProblem":
        return jax.tree.map(lambda x: x.astype(dtype), self)


def problem_from_arrays(A, B, f, Qdiag, Rdiag, q, r, c, x0) -> LQRProblem:
    """Build and validate an :class:`LQRProblem` from array-likes.

    Counterpart of ``ndlqr_InitializeLQRProblem`` (lqr_problem.c:39-52).
    """
    prob = LQRProblem(
        A=jnp.asarray(A),
        B=jnp.asarray(B),
        f=jnp.asarray(f),
        Qdiag=jnp.asarray(Qdiag),
        Rdiag=jnp.asarray(Rdiag),
        q=jnp.asarray(q),
        r=jnp.asarray(r),
        c=jnp.asarray(c),
        x0=jnp.asarray(x0),
    )
    prob.validate()
    return prob


def double_integrator_problem(
    nhorizon: int,
    nstates: int = 6,
    ninputs: int = 3,
    dt: float = 0.1,
    dtype=jnp.float64,
) -> LQRProblem:
    """A double-integrator-style benchmark problem like the shipped JSONs.

    Mirrors the structure of ``lqr_prob.json`` / ``lqr_prob_256.json`` (see
    SURVEY.md §2 #23): block dynamics ``[[I, 0], [dt*I, I]]`` with input
    entering as ``[dt^2/2; dt]``, unit state cost, 1e-2 input cost.
    """
    if nstates % 2 != 0 or ninputs * 2 != nstates:
        raise ValueError("double integrator needs nstates = 2 * ninputs")
    n, m, N = nstates, ninputs, nhorizon
    eye = np.eye(m)
    A1 = np.block([[np.eye(m), np.zeros((m, m))], [dt * eye, np.eye(m)]])
    B1 = np.vstack([0.5 * dt * dt * eye, dt * eye])
    A = np.broadcast_to(A1, (N, n, n)).copy()
    B = np.broadcast_to(B1, (N, n, m)).copy()
    f = np.full((N, n), 1.5)
    Qdiag = np.ones((N, n))
    Qdiag[-1] = 100.0
    Rdiag = np.full((N, m), 0.01)
    ks = np.arange(1, N + 1)[:, None]
    q = np.linspace(-2.0, 2.0, n)[None, :] * ks
    r = np.linspace(-1.0, 1.0, m)[None, :] * np.ones((N, 1))
    c = np.ones(N)
    x0 = np.array([1.0, -1.0, 2.0, -2.0, 3.0, -3.0][:n] or np.ones(n))
    if len(x0) != n:
        x0 = np.arange(1, n + 1) * (-1.0) ** np.arange(n)
    return problem_from_arrays(A, B, f, Qdiag, Rdiag, q, r, c, x0).astype(dtype)


def random_problem(
    key: jax.Array,
    nhorizon: int,
    nstates: int,
    ninputs: int,
    dtype=jnp.float32,
) -> LQRProblem:
    """A random well-conditioned LQR instance (for benchmarks/fuzz tests)."""
    n, m, N = nstates, ninputs, nhorizon
    ks = jax.random.split(key, 8)
    # Stable-ish dynamics: identity plus small random perturbation.
    A = jnp.eye(n, dtype=dtype) + 0.1 * jax.random.normal(ks[0], (N, n, n), dtype)
    B = 0.2 * jax.random.normal(ks[1], (N, n, m), dtype)
    f = 0.1 * jax.random.normal(ks[2], (N, n), dtype)
    Qdiag = 0.5 + jax.random.uniform(ks[3], (N, n), dtype)
    Rdiag = 0.1 + jax.random.uniform(ks[4], (N, m), dtype)
    q = jax.random.normal(ks[5], (N, n), dtype)
    r = jax.random.normal(ks[6], (N, m), dtype)
    c = jnp.zeros((N,), dtype)
    x0 = jax.random.normal(ks[7], (n,), dtype)
    return LQRProblem(A, B, f, Qdiag, Rdiag, q, r, c, x0)


def perturb_problem(prob: LQRProblem, key: jax.Array, scale: float = 0.1) -> LQRProblem:
    """Perturb initial state and cost gradients — MPC-style batch scenarios.

    Used to build the "1024 perturbed instances" benchmark configs from
    BASELINE.json by vmapping over a batch of keys.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = prob.x0.dtype
    return dataclasses.replace(
        prob,
        x0=prob.x0 + scale * jax.random.normal(k1, prob.x0.shape, dtype),
        q=prob.q + scale * jax.random.normal(k2, prob.q.shape, dtype),
        r=prob.r + scale * jax.random.normal(k3, prob.r.shape, dtype),
    )


def batch_problems(prob: LQRProblem, keys: jax.Array, scale: float = 0.1) -> LQRProblem:
    """Stack ``len(keys)`` perturbed copies of ``prob`` along a new batch axis."""
    return jax.vmap(lambda k: perturb_problem(prob, k, scale))(keys)


# ---------------------------------------------------------------------------
# Verification helpers: objective + KKT residual of a candidate solution.
# ---------------------------------------------------------------------------


def unpack_solution(prob: LQRProblem, soln: jax.Array):
    """Split flat KKT vector(s) ``[..., (y0 x0 u0 ... y_{N-1} x_{N-1})]`` into
    ``(Y, X, U)`` stacked arrays (ref variable ordering: solve.h:50-53).

    Returns Y ``[..., N, n]``, X ``[..., N, n]``, U ``[..., N-1, m]``;
    leading batch axes pass through.
    """
    n, m, N = prob.nstates, prob.ninputs, prob.nhorizon
    stride = 2 * n + m
    batch = soln.shape[:-1]
    body = soln[..., : stride * (N - 1)].reshape(batch + (N - 1, stride))
    tail = soln[..., stride * (N - 1):]
    Y = jnp.concatenate([body[..., :n], tail[..., None, :n]], axis=-2)
    X = jnp.concatenate([body[..., n : 2 * n], tail[..., None, n : 2 * n]], axis=-2)
    U = body[..., 2 * n :]
    return Y, X, U


def pack_solution(Y: jax.Array, X: jax.Array, U: jax.Array) -> jax.Array:
    """Inverse of :func:`unpack_solution`; batch axes (leading) pass through."""
    N = X.shape[-2]
    batch = X.shape[:-2]
    body = jnp.concatenate(
        [Y[..., : N - 1, :], X[..., : N - 1, :], U], axis=-1
    ).reshape(batch + (-1,))
    tail = jnp.concatenate([Y[..., N - 1, :], X[..., N - 1, :]], axis=-1)
    return jnp.concatenate([body, tail], axis=-1)


def objective(prob: LQRProblem, X: jax.Array, U: jax.Array) -> jax.Array:
    """Total LQR objective of trajectories ``X [N,n]``, ``U [N-1,m]``."""
    qcost = 0.5 * jnp.sum(prob.Qdiag * X * X) + jnp.sum(prob.q * X)
    Ru = prob.Rdiag[:-1] * U
    rcost = 0.5 * jnp.sum(Ru * U) + jnp.sum(prob.r[:-1] * U)
    return qcost + rcost + jnp.sum(prob.c)


def kkt_residual(prob: LQRProblem, soln: jax.Array) -> jax.Array:
    """Max-norm residual of the KKT optimality system at ``soln``.

    Stationarity:  Q_k x_k + q_k - y_k + A_k' y_{k+1} = 0   (k < N-1)
                   R_k u_k + r_k + B_k' y_{k+1} = 0         (k < N-1)
                   Q_N x_N + q_N - y_N = 0
    Primal:        x_0 = x0;  x_{k+1} = A_k x_k + B_k u_k + f_k.

    Independent of either solver — used to verify both implementations.
    """
    Y, X, U = unpack_solution(prob, soln)
    n = prob.nstates
    A, B = prob.A[:-1], prob.B[:-1]
    r_dyn0 = X[0] - prob.x0
    r_dyn = X[1:] - (
        jnp.einsum("kij,kj->ki", A, X[:-1]) + jnp.einsum("kij,kj->ki", B, U) + prob.f[:-1]
    )
    r_x = (
        prob.Qdiag[:-1] * X[:-1]
        + prob.q[:-1]
        - Y[:-1]
        + jnp.einsum("kji,kj->ki", A, Y[1:])
    )
    r_u = prob.Rdiag[:-1] * U + prob.r[:-1] + jnp.einsum("kji,kj->ki", B, Y[1:])
    r_xN = prob.Qdiag[-1] * X[-1] + prob.q[-1] - Y[-1]
    return jnp.max(
        jnp.array(
            [
                jnp.max(jnp.abs(r_dyn0)),
                jnp.max(jnp.abs(r_dyn)),
                jnp.max(jnp.abs(r_x)),
                jnp.max(jnp.abs(r_u)),
                jnp.max(jnp.abs(r_xN)),
            ]
        )
    )
