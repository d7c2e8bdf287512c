from .qp import solve_qp, solve_qp_batch, QPSolution

__all__ = ["solve_qp", "solve_qp_batch", "QPSolution"]
