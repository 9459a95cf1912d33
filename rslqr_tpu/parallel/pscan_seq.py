"""Horizon-sharded associative-scan Riccati solve (multi-chip pscan).

The throughput-champion solver (:mod:`rslqr_tpu.pscan`) distributed over a
mesh axis: the N knot points are split into contiguous chunks of ``C = N/D``
per device. The suffix scan over conditional-value-function elements
decomposes exactly like any associative scan:

1. **Local up-sweep**: each device reduces its chunk to ONE full element
   ``T_d = e_{dC} ∘ ... ∘ e_{dC+C-1}`` (log2 C pairwise combines).
2. **Segment exchange**: one ``all_gather`` of the D segment elements — a
   few ``[n, n, batch_local]`` blocks per device, independent of N. Every
   device then computes the reduced suffix chain ``r_d = T_d ∘ r_{d+1}``
   (D-1 tiny reduced combines, replicated) and picks its right-seed
   ``seed_d = r_{d+1}`` (identity for the last device).
3. **Seeded local scan**: the ordinary odd-even suffix scan runs on the
   local chunk with the seed appended (``pscan._suffix_pj(seed=...)``) —
   every down-sweep combine stays reduced, as single-device.

The closed-loop forward rollout is the mirrored prefix scan over affine
maps: local composition, one ``all_gather`` of D chunk maps, a serial
chunk-start recursion, then the local seeded ``_prefix_action``. Gains need
one extra ``ppermute`` (cost-to-go of the next chunk's first knot).

Communication per solve: 2 all_gathers + 1 ppermute of O(n^2 D) blocks —
independent of N, far below the tree solver's per-level boundary exchange
(rslqr_tpu.parallel.seq). This is the TPU answer to the reference's
long-horizon mission (docs/rslqr.dox:65-138) at pod scale.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import linalg as la
from .. import pscan as ps
from ..problem import LQRProblem, pack_solution


def _tree_stack(elems_list):
    return tuple(jnp.stack(parts, axis=0) for parts in zip(*elems_list))


def _local_elements(p: LQRProblem, d, D, nb: int):
    """Leaf elements for a local chunk (pscan._value_scan leaf algebra), with
    the global terminal element (pure cost, no propagation) masked in on the
    last device's last knot."""
    A, B = p.A, p.B
    C, n = A.shape[0], A.shape[1]
    b_shape = A.shape[3:]
    dtype = A.dtype

    rinv = 1.0 / p.Rdiag
    Brinv = B * jnp.expand_dims(rinv, -(nb + 2))
    Bt = la.transpose_block(B, nb)

    F = A
    c = p.f - la.bgemv(Brinv, p.r, nb)
    Cm = la.bgemm(Brinv, Bt, nb)
    eta = -p.q
    diag = (jnp.arange(n), jnp.arange(n))
    J = jnp.zeros((C, n, n) + b_shape, dtype)
    J = J.at[(slice(None),) + diag].set(p.Qdiag)

    # Terminal knot (global N-1): F = c = C = 0 (ref: the terminal element
    # in pscan._value_scan). eta/J keep the same cost form.
    is_term = jnp.logical_and(d == D - 1, jnp.arange(C) == C - 1)
    mt2 = is_term.reshape((C, 1, 1) + (1,) * nb)
    mt1 = is_term.reshape((C, 1) + (1,) * nb)
    F = jnp.where(mt2, 0.0, F)
    Cm = jnp.where(mt2, 0.0, Cm)
    c = jnp.where(mt1, 0.0, c)
    return (F, c, Cm, eta, J)


@partial(jax.jit, static_argnames=("mesh", "sp_axis", "dp_axis", "options"))
def solve_pscan_sharded(
    prob: LQRProblem,
    mesh: Mesh,
    sp_axis: str = "sp",
    dp_axis: Optional[str] = None,
    options=None,
) -> jax.Array:
    """Horizon-sharded parallel-scan LQR solve over ``mesh[sp_axis]``.

    ``prob`` may carry leading batch axes (sharded over ``dp_axis`` when
    given). Returns the flat KKT vector(s) ``[*batch, nvars]`` with the same
    values as :func:`rslqr_tpu.pscan.solve_pscan_kkt`. ``options`` (a static
    :class:`rslqr_tpu.config.SolveOptions`) pins the linalg dispatch
    threshold per call.
    """
    from ..config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), \
            la.pallas_ctx(opts.pallas):
        return _solve_pscan_sharded_impl(prob, mesh, sp_axis, dp_axis)


def _solve_pscan_sharded_impl(
    prob: LQRProblem,
    mesh: Mesh,
    sp_axis: str = "sp",
    dp_axis: Optional[str] = None,
) -> jax.Array:
    nb = prob.A.ndim - 3
    N = prob.A.shape[-3]
    D = mesh.shape[sp_axis]
    C = N // D
    if C * D != N or C < 2:
        raise ValueError(f"need N ({N}) divisible by devices ({D}) with chunk >= 2")
    if C & (C - 1):
        # The forward chunk-composition fold below halves Mc each step, so
        # the per-device chunk must be a power of two (unlike single-device
        # pscan, whose scans odd-peel). N=24 over D=4 (C=6) would otherwise
        # fail with an opaque bgemm shape error mid-trace.
        raise ValueError(
            f"per-device chunk N/D = {N}/{D} = {C} must be a power of two"
        )

    def bl(x):
        if nb == 0:
            return x
        perm = tuple(range(nb, x.ndim)) + tuple(range(nb))
        return jnp.transpose(x, perm)

    pbl = jax.tree.map(bl, prob)

    dp = dp_axis
    knot_spec = lambda ndim: P(
        *(sp_axis,) + (None,) * (ndim - 1 - (1 if dp else 0)) + ((dp,) if dp else ())
    )
    specs = jax.tree.map(lambda x: knot_spec(x.ndim), pbl)
    x0_spec = P(*(None,) * (pbl.x0.ndim - (1 if dp else 0)) + ((dp,) if dp else ()))
    specs = dataclasses.replace(specs, x0=x0_spec)

    def body(p):
        d = jax.lax.axis_index(sp_axis)
        n, m = p.A.shape[1], p.B.shape[2]

        # ---- backward: seeded suffix scan of value elements.
        elems = _local_elements(p, d, D, nb)
        if D > 1:
            T = ps._reduce_full(elems, nb)  # [1, ...] full chunk element
            Tg = tuple(jax.lax.all_gather(t[0], sp_axis) for t in T)  # [D, ...]
            # Reduced suffix chain over segments, right to left (replicated).
            etas = [None] * D
            Js = [None] * D
            etas[D - 1], Js[D - 1] = Tg[3][D - 1 :], Tg[4][D - 1 :]
            for dd in range(D - 2, -1, -1):
                seg = tuple(t[dd : dd + 1] for t in Tg)
                etas[dd], Js[dd] = ps._combine_reduced(
                    seg, (etas[dd + 1], Js[dd + 1]), nb
                )
            # seed for device d = r_{d+1}; identity (0, 0) for the last one.
            zero_eta = jnp.zeros_like(etas[0])
            zero_J = jnp.zeros_like(Js[0])
            seed_eta = jnp.concatenate(
                [jnp.concatenate(etas[1:], axis=0), zero_eta], axis=0
            )  # [D, n, *b]
            seed_J = jnp.concatenate(
                [jnp.concatenate(Js[1:], axis=0), zero_J], axis=0
            )
            my_seed = (
                jax.lax.dynamic_slice_in_dim(seed_eta, d, 1, axis=0),
                jax.lax.dynamic_slice_in_dim(seed_J, d, 1, axis=0),
            )
        else:
            my_seed = None
        eta_all, J_all = ps._suffix_pj(elems, nb, seed=my_seed)
        Pk, pk = J_all, -eta_all  # local [C, n, n, *b] / [C, n, *b]

        # ---- gains: need next knot's cost-to-go; first local entry crosses
        # the chunk boundary leftwards (ppermute; device D-1 gets zeros,
        # its terminal "gain" is scratch and never consumed).
        perm = [(dd, dd - 1) for dd in range(1, D)]
        P_next_first = jax.lax.ppermute(Pk[0], sp_axis, perm)
        p_next_first = jax.lax.ppermute(pk[0], sp_axis, perm)
        Pn = jnp.concatenate([Pk[1:], P_next_first[None]], axis=0)
        pn = jnp.concatenate([pk[1:], p_next_first[None]], axis=0)
        K, dgain = ps._gains_from(p.A, p.B, p.Rdiag, p.r, p.f, Pn, pn, nb)

        # ---- forward: seeded prefix scan of the closed-loop affine maps.
        Phi = p.A + la.bgemm(p.B, K, nb)
        tv = la.bgemv(p.B, dgain, nb) + p.f
        # Chunk composition (pairwise fold, earlier map first).
        Mc, tc = Phi, tv
        while Mc.shape[0] > 1:
            Me, Mo = ps._even_odd(Mc)
            te, to = ps._even_odd(tc)
            Mc = la.bgemm(Mo, Me, nb)
            tc = la.bgemv(Mo, te, nb) + to
        Mg = jax.lax.all_gather(Mc[0], sp_axis)  # [D, n, n, *b]
        tg = jax.lax.all_gather(tc[0], sp_axis)
        # Serial chunk-start recursion (replicated): x_start[0] = x0.
        xs = [p.x0]
        for dd in range(D - 1):
            xs.append(la.bgemv(Mg[dd], xs[-1], nb) + tg[dd])
        x_starts = jnp.stack(xs, axis=0)  # [D, n, *b]
        x_start = jax.lax.dynamic_index_in_dim(x_starts, d, 0, keepdims=False)

        a = ps._prefix_action(Phi, tv, x_start, nb)  # [C, n, *b]
        X = jnp.concatenate([x_start[None], a[:-1]], axis=0)
        U = la.bgemv(K, X, nb) + dgain  # terminal entry is scratch
        Y = la.bgemv(Pk, X, nb) + pk
        return Y, X, U

    zspec = knot_spec(pbl.q.ndim)
    Y, X, U = jax.shard_map(
        body, mesh=mesh, in_specs=(specs,), out_specs=(zspec, zspec, zspec)
    )(pbl)

    def bf(x):
        if nb == 0:
            return x
        nd = x.ndim
        perm = tuple(range(nd - nb, nd)) + tuple(range(nd - nb))
        return jnp.transpose(x, perm)

    return pack_solution(bf(Y), bf(X), bf(U[:-1]))
