from .qp import solve_qp, solve_qp_batch, QPSolution
from .qp_active import solve_qp_active

__all__ = ["solve_qp", "solve_qp_batch", "solve_qp_active", "QPSolution"]
