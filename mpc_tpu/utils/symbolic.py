"""Symbolic ODE -> NonLinModel bridge (the ModelingToolkit-manual analogue).

The reference's MTK manual (docs/src/manual/mtk.md) shows extracting ``f!``
and ``h!`` from a symbolic acausal model to build a ``NonLinModel``.  The
Python-ecosystem analogue is SymPy: write the plant as symbolic first-order
ODEs and output expressions; :func:`nonlinmodel_from_sympy` lambdifies them
straight into JAX-traceable functions (``jnp`` ufuncs), so the resulting
model jits, vmaps, linearizes, and differentiates like any hand-written one.

Mirrored semantics from the reference bridge:

* the output map must be strictly proper — referencing an input symbol in an
  output expression errors, like the reference's ``h!`` MethodError guard
  (mtk.md "NonLinModel only support strictly proper systems");
* algebraic (non-ODE) state equations are rejected (mtk.md "Systems with
  algebraic equations are not supported");
* parameters become the model's ``p`` vector, with the symbol order reported
  back so the caller knows how ``p`` is sorted (mtk.md ``p_sym``).

SymPy is an optional dependency: importing this module without it raises
only at call time.
"""
from __future__ import annotations

import numpy as np


def nonlinmodel_from_sympy(odes, outputs, Ts, *, inputs, disturbances=(),
                           params=None, solver="rk4"):
    """Build a :class:`~mpc_tpu.models.NonLinModel` from symbolic ODEs.

    Parameters
    ----------
    odes : dict
        ``{state_symbol: dx/dt expression}`` — one first-order ODE per state.
        The state order of the model follows the dict order.
    outputs : sequence of sympy expressions
        Output map ``y = h(x, d)``; must not reference input symbols
        (strictly proper, as in the reference).
    Ts : float
        Sampling time for the RK4/Euler discretization.
    inputs : sequence of sympy symbols
        Manipulated inputs ``u`` (their order fixes the u-vector layout).
    disturbances : sequence of sympy symbols
        Measured disturbances ``d``.
    params : dict, optional
        ``{symbol: value}`` for every remaining free symbol.  Becomes the
        model's ``p`` vector (runtime-swappable without retracing).
    solver : ``"rk4"`` | ``None`` | DiffSolver
        Passed through to ``NonLinModel`` (``None`` = already-discrete).

    Returns
    -------
    model : NonLinModel
    info : dict
        ``x_syms``, ``u_syms``, ``d_syms``, ``p_syms`` — the symbol orderings
        the vectors follow (the reference manual prints the same tables).
    """
    import sympy as sp
    import jax.numpy as jnp
    from ..models import NonLinModel

    x_syms = list(odes.keys())
    f_exprs = [sp.sympify(e) for e in odes.values()]
    h_exprs = [sp.sympify(e) for e in outputs]
    u_syms = list(inputs)
    d_syms = list(disturbances)
    params = dict(params or {})
    p_syms = list(params.keys())
    p0 = np.asarray([float(params[s]) for s in p_syms], float)

    for s in x_syms:
        if not isinstance(s, sp.Symbol):
            raise TypeError(
                f"state {s!r} is not a plain sympy Symbol; higher-order or "
                "algebraic equations are not supported — rewrite as "
                "first-order ODEs (reference: mtk.md rejects algebraic "
                "equations)")

    known = set(x_syms) | set(u_syms) | set(d_syms) | set(p_syms)
    free = set().union(*(e.free_symbols for e in f_exprs + h_exprs)) if \
        (f_exprs or h_exprs) else set()
    missing = free - known
    if missing:
        raise ValueError(
            f"free symbols {sorted(missing, key=str)} are neither states, "
            "inputs, disturbances nor params — give them values via "
            "params={...}")
    improper = set(u_syms) & set().union(*(e.free_symbols for e in h_exprs)) \
        if h_exprs else set()
    if improper:
        raise ValueError(
            f"output expressions reference input(s) {sorted(improper, key=str)}:"
            " only strictly proper systems are supported (reference mtk.md)")

    argsyms = (*x_syms, *u_syms, *d_syms, *p_syms)
    # lambdify against the jnp namespace: sympy emits sin/cos/exp/... which
    # resolve to jax ufuncs, so f/h trace under jit/grad/vmap
    f_fun = sp.lambdify(argsyms, f_exprs, modules=[jnp])
    h_fun = sp.lambdify(argsyms, h_exprs, modules=[jnp])

    nx, nu, nd, ny = len(x_syms), len(u_syms), len(d_syms), len(h_exprs)

    def unpack(x, u, d, p):
        return (*(x[i] for i in range(nx)), *(u[i] for i in range(nu)),
                *(d[i] for i in range(nd)), *(p[i] for i in range(len(p_syms))))

    def f(x, u, d, p):
        return jnp.stack([jnp.asarray(v) for v in f_fun(*unpack(x, u, d, p))])

    def h(x, d, p):
        u = jnp.zeros(nu, x.dtype)
        return jnp.stack([jnp.asarray(v) for v in h_fun(*unpack(x, u, d, p))])

    model = NonLinModel(f, h, Ts, nu, nx, ny, nd=nd, p=p0, solver=solver)
    info = dict(x_syms=x_syms, u_syms=u_syms, d_syms=d_syms, p_syms=p_syms)
    return model, info
