"""Constrained state estimation with the MovingHorizonEstimator
(mirrors the reference's MHE documentation examples).

A first-order plant with an unmeasured output disturbance: the MHE's
process-noise bounds let it attribute the offset to its integrator state
while rejecting physically impossible noise explanations, and it is compared
against a SteadyKalmanFilter on the same data.
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import mpc_tpu as mpc


def run(N=60, seed=0):
    model = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(model, He=8, sigmaQ=[0.1], sigmaR=[0.5],
                                     nint_ym=[1])
    # the plant state itself can never be negative in this process
    nx = mhe.nx_hat
    mhe.setconstraint(xhatmin=[0.0] + [-np.inf] * (nx - 1))
    skf = mpc.SteadyKalmanFilter(model, sigmaQ=[0.1], sigmaR=[0.5],
                                 nint_ym=[1])
    plant = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    rng = np.random.default_rng(seed)
    err_mhe = err_skf = 0.0
    for k in range(N):
        y_true = plant.evaloutput()
        offset = 0.8 if k >= 20 else 0.0        # unmeasured step disturbance
        y = y_true + offset + 0.05 * rng.normal(1)
        mhe.preparestate(y)
        skf.preparestate(y)
        if k >= 40:                              # both converged by then
            err_mhe += abs(float(mhe.evaloutput()[0] - (y_true[0] + offset)))
            err_skf += abs(float(skf.evaloutput()[0] - (y_true[0] + offset)))
        u = [1.0]
        mhe.updatestate(u, y)
        skf.updatestate(u, y)
        plant.updatestate(u)
    return err_mhe / 20, err_skf / 20


if __name__ == "__main__":
    e_mhe, e_skf = run()
    print(f"mean |ŷ − y| after convergence: MHE={e_mhe:.4f}  SKF={e_skf:.4f}")
    print("both estimators absorb the unmeasured offset via their "
          "output integrator; the MHE additionally honors x̂ ≥ 0")
