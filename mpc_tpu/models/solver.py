"""Fixed-step ODE solvers for NonLinModel (reference: src/model/solver.jl).

The reference implements allocation-free RK4/Euler with ``supersample``
sub-steps (``solver.jl:31-79``).  Here each solver returns a *discrete-time*
update function ``xnext = fd(x, u, d, p)`` built from the continuous
``dx/dt = f(x, u, d, p)``; the supersampling loop is a ``lax.fori_loop`` so it
stays a single fused XLA computation.
"""
from __future__ import annotations

import jax


class DiffSolver:
    """Base class for explicit fixed-step solvers."""

    order: int = 0
    supersample: int = 1

    def discretize(self, f, Ts):
        raise NotImplementedError


class EmptySolver(DiffSolver):
    """Marker for already-discrete ``f`` (reference: nonlinmodel.jl:4-13)."""

    def discretize(self, f, Ts):
        return f


class RungeKutta(DiffSolver):
    """Explicit Runge-Kutta solver, order 1 (Euler) or 4 (solver.jl:1-17)."""

    def __init__(self, order: int = 4, supersample: int = 1):
        if order not in (1, 4):
            raise ValueError("only 1st and 4th order RK are supported")
        if supersample < 1:
            raise ValueError("supersample must be ≥ 1")
        self.order = order
        self.supersample = int(supersample)

    def discretize(self, f, Ts):
        h = Ts / self.supersample
        ns = self.supersample
        if self.order == 1:
            def body1(_, xk, u, d, p):
                return xk + h * f(xk, u, d, p)
            return self._loop(body1, ns)

        def body4(_, xk, u, d, p):
            k1 = f(xk, u, d, p)
            k2 = f(xk + 0.5 * h * k1, u, d, p)
            k3 = f(xk + 0.5 * h * k2, u, d, p)
            k4 = f(xk + h * k3, u, d, p)
            return xk + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return self._loop(body4, ns)

    @staticmethod
    def _loop(body, ns):
        """Supersampling loop: statically UNROLLED for small ns — under a
        vmapped SQP fleet every `lax.fori_loop` op costs per-iteration
        dispatch (op-count × dispatch dominates at B≥1024, CLAUDE.md), and
        the common ns ≤ 8 unrolls into one fused elementwise chain.  Large
        ns keeps the rolled loop (graph-size bound)."""
        if ns <= 8:
            def step(x, u, d, p):
                for i in range(ns):
                    x = body(i, x, u, d, p)
                return x
        else:
            def step(x, u, d, p):
                return jax.lax.fori_loop(
                    0, ns, lambda i, xk: body(i, xk, u, d, p), x)
        return step


def ForwardEuler(supersample: int = 1) -> RungeKutta:
    """Forward Euler solver (solver.jl:59-79)."""
    return RungeKutta(order=1, supersample=supersample)
