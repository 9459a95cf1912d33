"""Multi-chip example: batch + horizon sharding over a device mesh.

Run on real chips, or simulate on CPU with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py
"""

import jax
import jax.numpy as jnp

import rslqr_tpu as rt
from rslqr_tpu.parallel import make_mesh, solve_batch_sharded
from rslqr_tpu.parallel.seq import solve_seq_sharded


def main():
    jax.config.update("jax_platforms", jax.default_backend())
    devs = jax.devices()
    print(f"{len(devs)} devices: {devs[0].platform}")

    prob = rt.double_integrator_problem(256, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    batch = rt.batch_problems(prob, keys)

    # Pure data parallelism: instances sharded, zero communication.
    dp_mesh = make_mesh((len(devs),), ("dp",))
    sol = jax.jit(lambda b: solve_batch_sharded(b, dp_mesh).kkt_vector())(batch)
    print("dp-sharded batch:", sol.shape)

    # Horizon sharding: knot points distributed; the top log2(D) tree levels
    # exchange boundary blocks via all_gather.
    if len(devs) >= 2:
        ndp = 2 if len(devs) % 2 == 0 else 1
        mesh = make_mesh((ndp, len(devs) // ndp), ("dp", "sp"))
        out = solve_seq_sharded(batch, mesh, "sp", "dp")
        print("dp x sp sharded (tree solver):", out.shape)
        ref = rt.solve_kkt(batch)
        scale = float(jnp.max(jnp.abs(ref)))
        print("rel max diff vs single-device:",
              float(jnp.max(jnp.abs(out - ref))) / scale)

        # Horizon-sharded parallel-scan Riccati: chunk-local scans, one
        # segment all_gather, O(n^2 D) traffic independent of N.
        from rslqr_tpu.parallel.pscan_seq import solve_pscan_sharded

        out2 = solve_pscan_sharded(batch, mesh, "sp", "dp")
        print("dp x sp sharded (pscan):", out2.shape,
              "rel max diff:", float(jnp.max(jnp.abs(out2 - ref))) / scale)


if __name__ == "__main__":
    main()
