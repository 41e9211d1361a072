"""Iterative solvers built on the sparse ops — the framework's end-to-end
"model" layer (conjugate gradients, power iteration) for single-chip and
row-partitioned multi-chip execution."""

from .iterative import (cg_solve, cg_step, pcg_solve,
                        jacobi_preconditioner, power_iteration, CGState)

__all__ = ["cg_solve", "cg_step", "pcg_solve", "jacobi_preconditioner",
           "power_iteration", "CGState"]
