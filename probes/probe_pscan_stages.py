#!/usr/bin/env python
"""Stage-level timing of the quadruped pscan em solve (one chunk shape).

Chained finite-difference timing of: full solve, value scan, the level-0
leaf pair combine, the suffix scan over composites, the finest down-sweep,
gains, forward rollout. Identifies where the 95 ms/chunk goes.
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


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    prob = rt.random_problem(jax.random.PRNGKey(1), N, NX, NU, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    batch = rt.batch_problems(prob, keys)
    jax.block_until_ready(batch)

    nb = 1

    def em_problem(b):
        def bl(x):
            perm = tuple(range(nb, x.ndim)) + tuple(range(nb))
            return jnp.transpose(x, perm)

        pbl = jax.tree.map(bl, b)
        em = lambda x: jnp.moveaxis(x, 0, -2)
        return {
            "A": em(pbl.A), "B": em(pbl.B), "f": em(pbl.f), "q": em(pbl.q),
            "r": em(pbl.r), "Qdiag": em(pbl.Qdiag), "Rdiag": em(pbl.Rdiag),
        }, pbl.x0

    def dep(x, s):
        return x + s * jnp.asarray(1e-38, x.dtype)

    # 1. full solve
    def full(K, b):
        def body(i, c):
            import dataclasses
            p2 = dataclasses.replace(b, x0=b.x0 + c[0])
            s = jnp.sum(pscan.solve_pscan_kkt(p2))
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    with la.block_threshold(8), la.pallas_ctx("auto"):
        timeit(full, (batch,), label="full_solve")

    pem, x0 = em_problem(batch)
    pem = jax.tree.map(jnp.asarray, pem)
    jax.block_until_ready(pem)

    # 2. value scan (leaf build + suffix)
    def vscan(K, pem):
        def body(i, c):
            p2 = dict(pem)
            p2["q"] = dep(pem["q"], c[0])
            with la.block_threshold(8), la.pallas_ctx("auto"):
                P, p = pscan._value_scan_em(p2, 2)
            s = jnp.sum(p[:, 0, :1]) + jnp.sum(P[0, 0, 0, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(vscan, (pem,), label="value_scan")

    # 3. level-0 leaf pair combine only
    def leafpair(K, pem):
        A, Bm = pem["A"], pem["B"]
        n, m = A.shape[0], Bm.shape[1]
        rinv = 1.0 / pem["Rdiag"]
        Brinv = Bm * rinv[None]
        Bt = jnp.swapaxes(Bm, 0, 1)
        S = lambda x, sl: x[(Ellipsis, sl, slice(None))]
        c_dyn = S(pem["f"], slice(0, N - 1)) - la.bgemv(
            S(Brinv, slice(0, N - 1)), S(pem["r"], slice(0, N - 1)), 2
        )
        zc = jnp.zeros((n, n, 1, B), jnp.float32)
        zcm = jnp.zeros((n, m, 1, B), jnp.float32)
        leaf = (
            pscan._cat([S(A, slice(0, N - 1)), zc], em=True),
            pscan._cat([S(Brinv, slice(0, N - 1)), zcm], em=True),
            pscan._cat([S(Bt, slice(0, N - 1)), jnp.swapaxes(zcm, 0, 1)], em=True),
            pscan._cat([c_dyn, jnp.zeros((n, 1, B), jnp.float32)], em=True),
            -pem["q"],
            pem["Qdiag"],
        )
        sp = lambda x: pscan._even_odd(x, em=True)
        l1 = tuple(sp(x)[0] for x in leaf)
        l2 = tuple(sp(x)[1] for x in leaf)

        def body(i, c):
            l1b = (dep(l1[0], c[0]),) + l1[1:]
            with la.block_threshold(8), la.pallas_ctx("auto"):
                comp = pscan._combine_leaf_pair(l1b, l2, 2)
            s = jnp.sum(comp[4][0, 0, :, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(leafpair, (pem,), label="leaf_pair_combine")

    # 4. generic suffix over composites (levels >= 1)
    def suffix_comp(K, pem):
        with la.block_threshold(8), la.pallas_ctx("auto"):
            # Build composites once (constant-folded out of the chain? no —
            # fori carries the dependence through eta).
            A, Bm = pem["A"], pem["B"]
            n, m = A.shape[0], Bm.shape[1]
            L2 = N // 2
            ks = jax.random.split(jax.random.PRNGKey(3), 5)
            F = jax.random.normal(ks[0], (n, n, L2, B), jnp.float32) * 0.1
            cc = jax.random.normal(ks[1], (n, L2, B), jnp.float32)
            C = jax.random.normal(ks[2], (n, n, L2, B), jnp.float32) * 0.1
            C = C + jnp.swapaxes(C, 0, 1) + 2.0 * la.beye(n, C, 2)
            eta = jax.random.normal(ks[3], (n, L2, B), jnp.float32)
            J = jax.random.normal(ks[4], (n, n, L2, B), jnp.float32) * 0.1
            J = J + jnp.swapaxes(J, 0, 1) + 2.0 * la.beye(n, J, 2)

        def body(i, c):
            e = (F, dep(cc, c[0]), C, eta, J)
            with la.block_threshold(8), la.pallas_ctx("auto"):
                eta_a, J_a = pscan._suffix_pj(e, 2, em=True)
            s = jnp.sum(eta_a[0, :, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(suffix_comp, (pem,), label="suffix_over_composites(L=256)")

    # 5. gains
    def gains(K, pem):
        ks = jax.random.split(jax.random.PRNGKey(4), 2)
        n = NX
        Pn = jax.random.normal(ks[0], (n, n, N - 1, B), jnp.float32) * 0.1
        Pn = Pn + jnp.swapaxes(Pn, 0, 1) + 2.0 * la.beye(n, Pn, 2)
        pn = jax.random.normal(ks[1], (n, N - 1, B), jnp.float32)
        S = lambda x, sl: x[(Ellipsis, sl, slice(None))]

        def body(i, c):
            with la.block_threshold(8), la.pallas_ctx("auto"):
                Kk, d = pscan._gains_from(
                    S(pem["A"], slice(0, N - 1)),
                    S(pem["B"], slice(0, N - 1)),
                    S(pem["Rdiag"], slice(0, N - 1)),
                    S(pem["r"], slice(0, N - 1)),
                    S(pem["f"], slice(0, N - 1)),
                    dep(Pn, c[0]), pn, 2, em=True,
                )
            s = jnp.sum(Kk[0, 0, :, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(gains, (pem,), label="gains")

    # 6. forward rollout
    def fwd(K, pem):
        ks = jax.random.split(jax.random.PRNGKey(5), 2)
        n, m = NX, NU
        Kg = jax.random.normal(ks[0], (m, n, N - 1, B), jnp.float32) * 0.1
        dg = jax.random.normal(ks[1], (m, N - 1, B), jnp.float32)
        S = lambda x, sl: x[(Ellipsis, sl, slice(None))]
        x0e = jnp.zeros((n, 1, B), jnp.float32)

        def body(i, c):
            with la.block_threshold(8), la.pallas_ctx("auto"):
                Phi = S(pem["A"], slice(0, N - 1)) + la.bgemm(
                    S(pem["B"], slice(0, N - 1)), dep(Kg, c[0]), 2
                )
                tv = la.bgemv(S(pem["B"], slice(0, N - 1)), dg, 2) + S(
                    pem["f"], slice(0, N - 1)
                )
                xs = pscan._prefix_action_em(Phi, tv, x0e, 2)
            s = jnp.sum(xs[0, :, :1])
            return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

        z = jnp.asarray(0.0, jnp.float32)
        return jax.lax.fori_loop(0, K, body, (z, z))[1]

    timeit(fwd, (pem,), label="forward_rollout")


if __name__ == "__main__":
    main()
