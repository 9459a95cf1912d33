"""Quickstart: solve an LQR problem three ways and check optimality.

Counterpart of the reference's usage walkthroughs (docs/rslqr_usage.dox,
docs/riccati_usage.dox, examples/installexample/main.c). Run with:

    python examples/quickstart.py [path/to/lqr_prob.json]
"""

import sys

import jax
import jax.numpy as jnp

import rslqr_tpu as rt


def main():
    if len(sys.argv) > 1:
        prob, golden = rt.read_lqr_problem_json(sys.argv[1])
        print(f"loaded problem: N={prob.nhorizon} n={prob.nstates} m={prob.ninputs}")
    else:
        prob = rt.double_integrator_problem(64)
        golden = None
        print("built double-integrator problem: N=64 n=6 m=3")

    # 1. rsLQR (recursive Schur complement) — the flagship solver.
    sol = rt.solve(prob)
    vec = sol.kkt_vector()
    print(f"rsLQR    KKT residual: {float(rt.kkt_residual(prob, vec)):.3e}")

    # 2. Serial Riccati recursion — also yields gains and cost-to-go.
    ric = rt.solve_riccati(prob)
    print(f"riccati  KKT residual: "
          f"{float(rt.kkt_residual(prob, ric.kkt_vector())):.3e}")
    print(f"first feedback gain K0 row 0: {ric.K[0][0]}")

    # 3. Parallel-scan Riccati (log-depth associative scan).
    par = rt.solve_pscan(prob)
    print(f"pscan    KKT residual: "
          f"{float(rt.kkt_residual(prob, par.kkt_vector())):.3e}")

    if golden is not None:
        err = float(jnp.max(jnp.abs(vec - jnp.asarray(golden))))
        print(f"max |rsLQR - golden|: {err:.3e}")

    # Batched MPC-style solve: 256 perturbed scenarios in one call.
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    batch = rt.batch_problems(prob, keys)
    vecs = rt.solve_kkt(batch)
    print(f"batched solve: {vecs.shape[0]} instances -> {vecs.shape}")

    # Multi-RHS: reuse the factorization for new costs / initial states.
    import dataclasses
    prob2 = dataclasses.replace(prob, x0=prob.x0 + 0.1)
    fact, _ = rt.factorize(prob)
    sol2 = rt.solve_rhs(prob2, fact, rt.leaf_solve_rhs(prob2))
    print(f"multi-RHS KKT residual: "
          f"{float(rt.kkt_residual(prob2, sol2.kkt_vector())):.3e}")


if __name__ == "__main__":
    main()
