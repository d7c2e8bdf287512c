"""Grouped (distinct × reps) fleet execution — the shared lane mapping.

A fleet of ``n_d`` distinct configurations tiled ``reps`` times executes as
a DOUBLE vmap: the outer axis runs over the distinct configurations
(params ``in_axes=0``), the inner over the replicas (params
``in_axes=None``), so each distinct parameter matrix is read from HBM once
per replica GROUP instead of once per lane — the ``share_params`` win
generalized to many distinct scenarios (see BatchedLinMPC).

The PUBLIC lane order is the tiled one: ``lane = r·n_d + c`` for replica
``r`` of configuration ``c``.  ``grouped_transforms`` returns the
``(regroup, flat)`` pair that maps tiled ``(B, …)`` arrays to grouped
``(n_d, reps, …)`` and back; both fleets (BatchedLinMPC, BatchedKalman)
share this single definition so the lane-order contract lives in one
place.
"""
from __future__ import annotations

import jax.numpy as jnp


def grouped_transforms(n_distinct: int, reps: int):
    """``(regroup, flat)`` for the tiled-lane ↔ grouped-axes mapping.

    ``regroup``: ``(reps·n_d, …) → (n_d, reps, …)``;
    ``flat`` is its exact inverse.
    """

    def regroup(x):
        return jnp.swapaxes(x.reshape((reps, n_distinct) + x.shape[1:]),
                            0, 1)

    def flat(x):
        return jnp.swapaxes(x, 0, 1).reshape((reps * n_distinct,)
                                             + x.shape[2:])

    return regroup, flat
