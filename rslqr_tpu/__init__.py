"""rslqr_tpu — a TPU-native rsLQR / LQR solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of bjack205/rsLQR
(see SURVEY.md): batched recursive Schur-complement ("nested dissection") LQR
solves over a binary tree of knot points, plus the serial Riccati recursion as
a parity oracle, with batch- and horizon-sharding over TPU meshes.
"""

from .problem import (
    LQRProblem,
    batch_problems,
    double_integrator_problem,
    kkt_residual,
    objective,
    pack_solution,
    perturb_problem,
    problem_from_arrays,
    random_problem,
    unpack_solution,
)
from .io import (
    read_lqr_data_json,
    read_lqr_problem_json,
    read_named_matrix,
    write_lqr_problem_json,
)
from .riccati import RiccatiSolution, backward_pass, forward_pass, solve_riccati
from .rslqr import (
    RsLqrFactorization,
    RsLqrSolution,
    factorize,
    leaf_solve_rhs,
    solve,
    solve_kkt,
    solve_rhs,
)
from .rslqr_em import (
    EmFactorization,
    factorize_em,
    leaf_rhs_em,
    solve_em,
    solve_kkt_em,
    solve_rhs_em,
)
from .pscan import solve_pscan, solve_pscan_kkt
from .refine import kkt_apply, kkt_rhs, solve_refined
from .profile import (
    RiccatiProfile,
    SolveProfile,
    print_solve_summary,
    profile_riccati,
    profile_solve,
)
from .tree import TreeTables, build_tree_tables
from .config import (
    SolveOptions,
    config,
    linear_algebra_backend,
    set_layout,
    set_pallas,
)

__version__ = "0.1.0"
