"""Device-mesh sharding for batched LQR solves.

TPU-native counterpart of the reference's OpenMP layer (solve.c:48-183):
where the reference fans threads over knot points inside one shared-memory
node, here whole problem *instances* are sharded over a ``jax.sharding.Mesh``
("dp" axis), and — for horizon sharding — knot points over a "sp" axis with
tree-level collectives (see :mod:`rslqr_tpu.parallel.seq` once present).

Batch sharding needs no communication at all: every stage of the solver is
independent across instances, so XLA SPMD partitions every array along the
batch axis and emits zero collectives — the moral equivalent of the
reference's "disjoint static index ranges need no locks" design
(solve.c:27-36).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..problem import LQRProblem
from ..rslqr import RsLqrSolution, solve
from ..tree import TreeTables


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("dp",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices (default: 1-D data-parallel)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def shard_problem_batch(
    prob: LQRProblem, mesh: Mesh, axis: str = "dp"
) -> LQRProblem:
    """Place a leading-batch problem pytree with the batch axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), prob)


def solve_batch_sharded(
    prob: LQRProblem, mesh: Mesh, axis: str = "dp"
) -> RsLqrSolution:
    """Solve a batch of problems sharded over ``mesh[axis]``.

    The batch axis of every input array is partitioned across devices; the
    solve itself is communication-free. Use inside ``jax.jit``.
    """
    spec = P(axis)
    constrained = jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec)),
        prob,
    )
    return solve(constrained)
