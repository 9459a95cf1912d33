#!/usr/bin/env python
"""Stage attribution of the CHUNKED quadruped pscan solve (round 5).

Times, at the production chunk shape (N=512 nx=36 nu=12 B=128, s from
PROBE_S, default 32): the full solve, the value scan with fused gains, the
serial chunk fold alone, the suffix tree over the N/s composites alone,
the gains down-sweep alone, and the chunked forward rollout alone — all as
hoist-proof chained finite differences. The sum of stages vs the full
solve bounds the remaining inter-stage glue.
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import rslqr_tpu as rt
from rslqr_tpu import pscan
from rslqr_tpu import linalg as la

N, NX, NU, B = 512, 36, 12, 128
S = int(os.environ.get("PROBE_S", "32"))


def timeit(fn, args, K=4, reps=3, label=""):
    f1 = jax.jit(functools.partial(fn, 1))
    fK = jax.jit(functools.partial(fn, K))
    t0 = time.time()
    float(f1(*args)); float(fK(*args))
    log_c = time.time() - t0
    t1s, tKs = [], []
    for _ in range(reps):
        t0 = time.time(); float(f1(*args)); t1s.append(time.time() - t0)
        t0 = time.time(); float(fK(*args)); tKs.append(time.time() - t0)
    per = (sorted(tKs)[1] - sorted(t1s)[1]) / (K - 1)
    print(f"{label}: {per*1e3:.2f} ms (compile {log_c:.0f}s)", flush=True)
    return per


def dep(x, s):
    return x + s * jnp.asarray(1e-38, x.dtype)


def em_problem(b):
    nb = 1

    def bl(x):
        perm = tuple(range(nb, x.ndim)) + tuple(range(nb))
        return jnp.transpose(x, perm)

    pbl = jax.tree.map(bl, b)
    em = lambda x: jnp.moveaxis(x, 0, -2)
    return {
        "A": em(pbl.A), "B": em(pbl.B), "f": em(pbl.f), "q": em(pbl.q),
        "r": em(pbl.r), "Qdiag": em(pbl.Qdiag), "Rdiag": em(pbl.Rdiag),
    }, pbl.x0


def main():
    print(f"backend={jax.default_backend()} s={S}", flush=True)
    prob = rt.random_problem(jax.random.PRNGKey(1), N, NX, NU, jnp.float32)
    batch = rt.batch_problems(prob, jax.random.split(jax.random.PRNGKey(0), B))
    jax.block_until_ready(batch)
    pem, x0 = em_problem(batch)
    pem = jax.tree.map(jnp.asarray, pem)
    jax.block_until_ready(pem)
    C = N // S

    ctx = lambda: (la.block_threshold(8), la.pallas_ctx("auto"))

    # 1. full solve
    def full(K, b):
        import dataclasses

        def body(i, c):
            p2 = dataclasses.replace(b, Qdiag=b.Qdiag + c[0])
            s = jnp.sum(pscan.solve_pscan_kkt(p2))
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(full, (batch,), label="full_solve")

    # 2. value scan + fused gains (the whole backward half)
    def vscan(K, pem):
        def body(i, c):
            p2 = dict(pem)
            p2["Qdiag"] = dep(pem["Qdiag"], c[0])
            a, b_ = ctx()
            with a, b_:
                P, p, Kg, dg = pscan._value_scan_chunked_em(
                    p2, 2, S, gains=True
                )
            s = jnp.sum(p[:, 0, :1]) + jnp.sum(Kg[0, 0, 0, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(vscan, (pem,), label="value_scan+gains")

    # 3. serial chunk fold only (leaf build + pair + s-2 scanned folds)
    def fold(K, pem):
        def body(i, c):
            p2 = dict(pem)
            p2["Qdiag"] = dep(pem["Qdiag"], c[0])
            a, b_ = ctx()
            with a, b_:
                leaf = pscan._leaf_em(p2, 2)
                Nn = leaf[0].shape[-2]
                Cc = Nn // S

                def chunkify(x):
                    y = x.reshape(x.shape[:-2] + (Cc, S, x.shape[-1]))
                    return jnp.moveaxis(y, -2, 0)

                lc = tuple(chunkify(x) for x in leaf)
                lj = lambda j: tuple(x[j] for x in lc)
                comp = pscan._combine_leaf_pair(lj(S - 2), lj(S - 1), 2)
                rest = tuple(x[: S - 2] for x in lc)

                def fbody(cc, leaf_j):
                    return pscan._combine_leaf_full(leaf_j, cc, 2), None

                comp, _ = jax.lax.scan(fbody, comp, rest, reverse=True)
            s = jnp.sum(comp[4][0, 0, :, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(fold, (pem,), label=f"chunk_fold(s={S})")

    # 4. suffix tree over the C composites
    def suffix(K, _):
        ks = jax.random.split(jax.random.PRNGKey(3), 5)
        n = NX
        F = jax.random.normal(ks[0], (n, n, C, B), jnp.float32) * 0.1
        cc = jax.random.normal(ks[1], (n, C, B), jnp.float32)
        Cm = jax.random.normal(ks[2], (n, n, C, B), jnp.float32) * 0.1
        Cm = Cm + jnp.swapaxes(Cm, 0, 1) + 2.0 * la.beye(n, Cm, 2)
        eta = jax.random.normal(ks[3], (n, C, B), jnp.float32)
        J = jax.random.normal(ks[4], (n, n, C, B), jnp.float32) * 0.1
        J = J + jnp.swapaxes(J, 0, 1) + 2.0 * la.beye(n, J, 2)

        def body(i, c):
            e = (F, dep(cc, c[0]), Cm, eta, J)
            a, b_ = ctx()
            with a, b_:
                eta_a, J_a = pscan._suffix_pj(e, 2, em=True)
            s = jnp.sum(eta_a[0, :, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(suffix, (pem,), label=f"suffix_tree(C={C})")

    # 5. gains down-sweep only (scanned _combine_reduced_leaf at every j)
    def downsweep(K, pem):
        ks = jax.random.split(jax.random.PRNGKey(4), 2)
        n = NX
        eta_v = jax.random.normal(ks[0], (n, C, B), jnp.float32)
        J_v = jax.random.normal(ks[1], (n, n, C, B), jnp.float32) * 0.1
        J_v = J_v + jnp.swapaxes(J_v, 0, 1) + 2.0 * la.beye(n, J_v, 2)

        def body(i, c):
            p2 = dict(pem)
            p2["Qdiag"] = dep(pem["Qdiag"], c[0])
            a, b_ = ctx()
            with a, b_:
                leaf = pscan._leaf_em(p2, 2)
                Nn = leaf[0].shape[-2]
                Cc = Nn // S

                def chunkify(x):
                    y = x.reshape(x.shape[:-2] + (Cc, S, x.shape[-1]))
                    return jnp.moveaxis(y, -2, 0)

                lc = tuple(chunkify(x) for x in leaf)
                rinv_c = chunkify(1.0 / p2["Rdiag"])
                r_c = chunkify(p2["r"])

                def gbody(cv, xs_j):
                    leaf_j, rinv_j, r_j = xs_j
                    eta_j, J_j, K_j, d_j = pscan._combine_reduced_leaf(
                        leaf_j, cv, 2, gains=(rinv_j, r_j)
                    )
                    return (eta_j, J_j), (K_j, d_j)

                _, (Ks_s, ds_s) = jax.lax.scan(
                    gbody, (eta_v, J_v), (lc, rinv_c, r_c), reverse=True
                )
            s = jnp.sum(Ks_s[0, 0, 0, :, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(downsweep, (pem,), label=f"gains_downsweep(s={S})")

    # 6. chunked forward rollout
    def fwd(K, pem):
        ks = jax.random.split(jax.random.PRNGKey(5), 2)
        n, m = NX, NU
        Kg = jax.random.normal(ks[0], (m, n, N - 1, B), jnp.float32) * 0.1
        dg = jax.random.normal(ks[1], (m, N - 1, B), jnp.float32)
        Sf = lambda x, sl: x[(Ellipsis, sl, slice(None))]
        x0e = jnp.zeros((n, 1, B), jnp.float32)

        def body(i, c):
            a, b_ = ctx()
            with a, b_:
                Phi = Sf(pem["A"], slice(0, N - 1)) + la.bgemm(
                    Sf(pem["B"], slice(0, N - 1)), dep(Kg, c[0]), 2
                )
                tv = la.bgemv(Sf(pem["B"], slice(0, N - 1)), dg, 2) + Sf(
                    pem["f"], slice(0, N - 1)
                )
                xs = pscan._prefix_action_chunked_em(Phi, tv, x0e, 2, S)
            s = jnp.sum(xs[0, :, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(fwd, (pem,), label=f"forward_rollout(s={S})")


if __name__ == "__main__":
    main()
