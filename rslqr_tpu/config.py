"""Runtime configuration — the reference's CMake-option tier, env-driven.

The reference configures through three tiers (SURVEY §5.6): CMake cache
options (linalg backend, test knobs), compile-time defines, and the runtime
thread count. Here everything is runtime: environment variables read once at
import (overridable programmatically), because under jit the equivalents of
"compile-time" choices are trace-time Python values.

| Env var | Default | Meaning |
|---|---|---|
| RSLQR_TPU_MXU_THRESHOLD | 8  | block size above which linalg uses MXU lowerings |
| RSLQR_TPU_MATMUL_PRECISION | highest | jax matmul precision for f32 solves |
| RSLQR_TPU_REFINE_ITERS | 2  | default iterative-refinement steps |
| RSLQR_TPU_LAYOUT | auto | tree-solver slab layout: auto / em / grid |
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Config:
    mxu_block_threshold: int = int(os.environ.get("RSLQR_TPU_MXU_THRESHOLD", "8"))
    matmul_precision: str = os.environ.get("RSLQR_TPU_MATMUL_PRECISION", "highest")
    refine_iterations: int = int(os.environ.get("RSLQR_TPU_REFINE_ITERS", "2"))
    # "em": element-major slabs (dense [knot, batch] tiles, production TPU
    # path for small blocks); "grid": knot-major [depth, N, n, n, *b] grids
    # (reference-shaped, used by the golden intermediate-factor tests and the
    # MXU large-block regime); "auto": em iff the block dims fit the
    # small-block kernels.
    layout: str = os.environ.get("RSLQR_TPU_LAYOUT", "auto")
    # Pallas Schur-update kernel (ops/schur_pallas.py) on the em path:
    # "auto" = compiled kernel on TPU, XLA elsewhere; "on" = compiled kernel
    # wherever applicable; "interpret" = interpreter-mode kernel (CPU tests);
    # "off" = always the XLA stage.
    pallas: str = os.environ.get("RSLQR_TPU_PALLAS", "auto")
    # Factor-slab storage dtype on the em path: "" (= problem dtype) or
    # "bfloat16" to halve the level sweep's HBM traffic. Solves and
    # separator math stay f32; expect a ~10x KKT-residual hit — pair with
    # refine.solve_refined for accuracy. Experimental (STATUS.md).
    factor_dtype: str = os.environ.get("RSLQR_TPU_FACTOR_DTYPE", "")


config = Config()


def set_layout(layout: str) -> None:
    """Select the tree-solver slab layout ("auto" / "em" / "grid")."""
    if layout not in ("auto", "em", "grid"):
        raise ValueError(f"unknown layout {layout!r}")
    config.layout = layout


def set_mxu_block_threshold(n: int) -> None:
    """Adjust the small-block/MXU dispatch point (see linalg.py)."""
    from . import linalg

    config.mxu_block_threshold = n
    linalg.MXU_BLOCK_THRESHOLD = n


def apply_matmul_precision() -> None:
    """Pin jax's matmul precision to the configured value.

    TPU's default bf16 matmul passes cost ~1e-2 relative error on these
    problems; production f32 solves should run with "highest".
    """
    import jax

    jax.config.update("jax_default_matmul_precision", config.matmul_precision)


def linear_algebra_backend() -> str:
    """Report the active linear-algebra backend (ref linalg.c:223-256,
    MatrixGetLinearAlgebraLibrary / MatrixPrintLinearAlgebraLibrary)."""
    import jax

    return (
        f"jax/XLA on {jax.default_backend()} "
        f"(small blocks: unrolled lane kernels <= {config.mxu_block_threshold}, "
        f"large blocks: MXU dot_general + lax.linalg)"
    )
