"""Iterative and direct solvers plus preconditioners built on the
sparse ops — the framework's end-to-end "model" layer (conjugate
gradients, BiCGStab, MINRES, GMRES, Chebyshev; least squares via
CGLS/LSQR/LSMR; spectral via Lanczos eigsh / LOBPCG / Golub-Kahan
svds; direct via native sparse LU `splu`/`spsolve` with device
level-sweep triangular solves; Jacobi/block-Jacobi/Neumann
preconditioning) for single-chip and row-partitioned multi-chip
execution."""

from .iterative import (cg_solve, cg_step, pcg_solve, cg_solve_mrhs,
                        bicgstab_solve, cgs_solve, tfqmr_solve, minres_solve,
                        chebyshev_solve, cg_solve_implicit, gmres_solve,
                        lanczos_bounds,
                        jacobi_preconditioner, power_iteration, CGState)
from .precond import (extract_diagonal, extract_diag_blocks,
                      block_jacobi_preconditioner, neumann_preconditioner)
from .lstsq import cgls_solve, lsqr_solve, lsmr_solve
from .spectral import (lanczos_eigsh, arnoldi_eigs, lobpcg_solve,
                       svds_lanczos, funm_multiply, expm_multiply)
from .amg import amg_setup, amg_vcycle, AmgHierarchy, AmgLevel
from .linop import LinearOperator, aslinearoperator, identity_operator
from .norms import onenormest
from .direct import (SparseLU, splu, spilu, spsolve, factorized,
                     spsolve_triangular)
from .matfuncs import inv, expm
from .eigs_api import eigs, eigsh

__all__ = ["cg_solve", "cg_step", "pcg_solve", "cg_solve_mrhs",
           "bicgstab_solve", "cgs_solve", "tfqmr_solve", "minres_solve",
           "chebyshev_solve", "cg_solve_implicit", "gmres_solve",
           "lanczos_bounds",
           "jacobi_preconditioner", "power_iteration",
           "CGState", "extract_diagonal", "extract_diag_blocks",
           "block_jacobi_preconditioner", "neumann_preconditioner",
           "cgls_solve", "lsqr_solve", "lsmr_solve",
           "lanczos_eigsh", "arnoldi_eigs", "lobpcg_solve", "svds_lanczos",
           "funm_multiply", "expm_multiply",
           "amg_setup", "amg_vcycle", "AmgHierarchy", "AmgLevel",
           "LinearOperator", "aslinearoperator", "identity_operator",
           "onenormest",
           "SparseLU", "splu", "spilu", "spsolve", "factorized",
           "spsolve_triangular", "inv", "expm", "eigs", "eigsh"]
