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
| RSLQR_TPU_PALLAS | auto | Schur/leaf/RHS Pallas kernels: auto/on/interpret/off |
| RSLQR_TPU_FACTOR_DTYPE | "" | factor-slab storage dtype ("bfloat16" experimental) |

**Staleness contract.** These values are read at *trace* time inside the
solvers, so they are effectively part of every compiled program. Assigning
to any ``config`` attribute (or calling a ``set_*`` helper) therefore
invalidates jax's jit caches (``jax.clear_caches()``): a user who holds an
already-jitted solve and then flips a config value gets a re-trace — the new
value *takes effect* on the next call instead of silently executing the old
compiled path. For per-call control without global state, pass an explicit
:class:`SolveOptions` to the solver entry points instead.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


_LAYOUTS = ("auto", "em", "grid")
_PALLAS_MODES = ("auto", "on", "interpret", "off")


class Config:
    """Mutable global defaults. Attribute assignment clears jit caches (see
    module docstring); the validated fields mirror :class:`SolveOptions`."""

    # Attributes are implemented via __setattr__ so any mutation path
    # (property-style or direct assignment) invalidates jit caches.
    _FIELDS = (
        "mxu_block_threshold",
        "matmul_precision",
        "refine_iterations",
        "layout",
        "pallas",
        "factor_dtype",
    )

    def __init__(self) -> None:
        d = self.__dict__
        d["mxu_block_threshold"] = int(
            os.environ.get("RSLQR_TPU_MXU_THRESHOLD", "8")
        )
        d["matmul_precision"] = os.environ.get(
            "RSLQR_TPU_MATMUL_PRECISION", "highest"
        )
        d["refine_iterations"] = int(os.environ.get("RSLQR_TPU_REFINE_ITERS", "2"))
        # "em": element-major slabs (dense [knot, batch] tiles, production TPU
        # path for small blocks); "grid": knot-major [depth, N, n, n, *b]
        # grids (reference-shaped, used by the golden intermediate-factor
        # tests and the MXU large-block regime); "auto": em iff the block
        # dims fit the small-block kernels.
        d["layout"] = os.environ.get("RSLQR_TPU_LAYOUT", "auto")
        # Pallas kernels (ops/) on the em path: "auto" = compiled kernels on
        # TPU, XLA elsewhere; "on" = compiled wherever applicable;
        # "interpret" = interpreter-mode (CPU tests); "off" = XLA stages.
        d["pallas"] = os.environ.get("RSLQR_TPU_PALLAS", "auto")
        # Factor-slab storage dtype on the em path: "" (= problem dtype) or
        # "bfloat16" to halve the level sweep's HBM traffic. Solves and
        # separator math stay f32. ACCURACY CONTRACT: raw bf16-slab residuals
        # grow with tree depth (~1e+2 at N=256); always pair with
        # refine.solve_refined (tests/test_rslqr_em.py pins the post-refine
        # residual). Excluded from headline benchmarks.
        d["factor_dtype"] = os.environ.get("RSLQR_TPU_FACTOR_DTYPE", "")

    def __setattr__(self, name: str, value) -> None:
        if name not in self._FIELDS:
            raise AttributeError(f"unknown config field {name!r}")
        if name == "layout" and value not in _LAYOUTS:
            raise ValueError(f"unknown layout {value!r} (want one of {_LAYOUTS})")
        if name == "pallas" and value not in _PALLAS_MODES:
            raise ValueError(
                f"unknown pallas mode {value!r} (want one of {_PALLAS_MODES})"
            )
        changed = self.__dict__.get(name) != value
        self.__dict__[name] = value
        if name == "mxu_block_threshold":
            from . import linalg

            linalg.MXU_BLOCK_THRESHOLD = value
        if changed:
            _invalidate_jit_caches()

    def __repr__(self) -> str:
        fields = ", ".join(f"{k}={self.__dict__[k]!r}" for k in self._FIELDS)
        return f"Config({fields})"


def _invalidate_jit_caches() -> None:
    """Drop compiled-program caches so trace-time config reads re-resolve.

    Only acts when jax is already imported (config mutation at import time,
    before any trace exists, must not force the jax import).
    """
    import sys

    jax = sys.modules.get("jax")
    if jax is not None:
        jax.clear_caches()


config = Config()


@dataclasses.dataclass(frozen=True)
class SolveOptions:
    """Per-call, trace-static solver options (the explicit alternative to the
    global :data:`config`).

    Hashable and frozen so it can be passed through ``jax.jit`` as a static
    argument — two different options values are two different compiled
    programs, eliminating the stale-cache hazard entirely. ``from_config``
    snapshots the current global defaults.
    """

    # ``mxu_block_threshold`` reaches BOTH the solver-level layout/kernel
    # routing and linalg's internal small-block/MXU dispatch: entry points
    # scope it via ``linalg.block_threshold`` so every linalg call traced
    # inside a solve sees the per-call value (no global mutation needed).
    layout: str = "auto"
    pallas: str = "auto"
    factor_dtype: str = ""
    mxu_block_threshold: int = 8
    # Two sweep levels per slab pass in the kernel path (rslqr_em
    # _sweep_pair_em); False = one level per pass (A/B + fallback knob).
    level_pairing: bool = True
    # Flat-plane Schur kernel suite (ops/schur_planes.py) for wide batches
    # (B % 1024 == 0). MEASURED SLOWER than the [nn, N, B] suite (625 vs
    # 745 GB/s at L=1/U=6, 17.3 vs 13.6 ms end-to-end — probes/
    # probe_flatkernel.py, probe_flat_ab.py): the round-4 "shuffle-bound
    # 0.44 TF/s" diagnosis that motivated it was a chain artifact (carrying
    # only the multiplier slab forced XLA to copy every donated upper slab
    # per iteration, doubling traffic); the [nn, N, B] kernels were already
    # at ~91% of HBM roofline. Kept as a tested negative-result experiment;
    # True opts in.
    flat_planes: bool = False
    # Chunked hybrid value scan for the mid-block pscan family: serial
    # Woodbury leaf folds build one composite per ``s``-knot chunk (unit
    # slices on a pre-relayouted ``[s, ...]`` leaf slab — no strided
    # even/odd split or interleave glue), the generic suffix tree runs
    # over only N/s composites, and the interior cost-to-gos come from a
    # serial within-chunk Woodbury-Riccati down-sweep. 0 = auto (pick 8
    # when the horizon allows), 1 = force the unchunked leaf-pair scan,
    # >= 2 = explicit chunk size (must divide the horizon).
    pscan_chunk: int = 0
    # Batched interior recovery for the chunked pscan path: the serial
    # within-chunk fold scans EMIT their carries (which ARE the
    # within-chunk suffix/prefix composites), and the interior
    # cost-to-gos / rollout states are then recovered in ONE reduced
    # combine / one gemv at full ``[C*(s-1)*B]`` lane width instead of
    # ``s - 1`` serial steps over ``[C*B]``-lane planes. Trades ~1.4x
    # more FLOPs in the value down-sweep (full-element reduced combines
    # instead of rank-m Woodbury steps, plus a separate full-width gains
    # pass) for the elimination of two kernel-granularity-bound serial
    # stages (measured 30% efficiency, probes/probe_pscan_stages_chunked
    # .log). Gains/rollout outputs are bitwise-independent of the flag's
    # algebra only up to reassociation; parity is tested to f32 tolerance.
    pscan_batched_interior: bool = False

    def __post_init__(self):
        if self.layout not in _LAYOUTS:
            raise ValueError(f"unknown layout {self.layout!r}")
        if self.pallas not in _PALLAS_MODES:
            raise ValueError(f"unknown pallas mode {self.pallas!r}")

    @staticmethod
    def from_config() -> "SolveOptions":
        return SolveOptions(
            layout=config.layout,
            pallas=config.pallas,
            factor_dtype=config.factor_dtype,
            mxu_block_threshold=config.mxu_block_threshold,
        )


def resolve_options(options: Optional[SolveOptions]) -> SolveOptions:
    """``options`` if given, else a snapshot of the global config."""
    return options if options is not None else SolveOptions.from_config()


def set_layout(layout: str) -> None:
    """Select the tree-solver slab layout ("auto" / "em" / "grid")."""
    config.layout = layout


def set_pallas(mode: str) -> None:
    """Select the Pallas kernel mode ("auto" / "on" / "interpret" / "off")."""
    config.pallas = mode


def set_mxu_block_threshold(n: int) -> None:
    """Adjust the small-block/MXU dispatch point (see linalg.py)."""
    config.mxu_block_threshold = n


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
