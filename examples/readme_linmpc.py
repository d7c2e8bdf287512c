#!/usr/bin/env python
"""The reference README example: delayed SISO-to-2-output plant, LinMPC with
an output constraint (README.md:49-76 of ModelPredictiveControl.jl)."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import mpc_tpu as mpc  # noqa: E402

# G(s) = [2e^{-20s}/(10s+1); 10/(4s+1)], Ts = 1 s
G = mpc.tf_matrix([[mpc.tf(2, [10, 1]) * mpc.delay(20)],
                   [mpc.tf(10, [4, 1])]])
model = mpc.LinModel(G, 1.0)
print(model)

# track y1, keep y2 under 35
ctrl = mpc.LinMPC(model, Mwt=[1, 0], Nwt=[0.1])
ctrl.setconstraint(ymax=[np.inf, 35])

res = mpc.sim(ctrl, 40, [5, 0])
res.plot("readme_result.png", ymax=[np.inf, 35])
print(f"y1 final = {res.Y_data[-1, 0]:.3f} (setpoint 5)")
print(f"y2 max   = {res.Y_data[:, 1].max():.3f} (bound 35)")
print("plot saved to readme_result.png")
