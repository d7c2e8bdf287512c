#!/usr/bin/env python
"""Batched MPC at scale: thousands of controllers solving in lockstep.

On a TPU chip this pipeline measures ~1.02M solves/s hard-synced (see
bench.py; earlier multi-million figures were a dispatch-rate artifact); this
example runs a small fleet on CPU for illustration.
"""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mpc_tpu.parallel import BatchedLinMPC, random_cstr_controllers  # noqa: E402

B = 64
ctrls = random_cstr_controllers(B, Hp=10, Hc=2, seed=0)
bat = BatchedLinMPC(ctrls)

rng = np.random.default_rng(1)
ym = jnp.asarray(rng.normal(size=(B, 2)) * 0.5)
ry = jnp.asarray(rng.normal(size=(B, 2)) * 2.0)

u, n_conv = bat.step(ym, ry)           # compile
t0 = time.time()
for _ in range(10):
    u, n_conv = bat.step(ym, ry)
jax.block_until_ready(u)
dt = (time.time() - t0) / 10
print(f"{B} controllers/step, {dt * 1000:.1f} ms/step "
      f"({B / dt:,.0f} solves/s on CPU), converged {int(n_conv)}/{B}")
