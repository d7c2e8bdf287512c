"""mpc_tpu — TPU-native model predictive control and moving horizon estimation.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ModelPredictiveControl.jl (reference mounted at /root/reference): plant models
(linear with delays / nonlinear with RK4), state estimators (Kalman family,
Luenberger, internal model, moving horizon), and predictive controllers
(LinMPC condensed QP, ExplicitMPC, NonLinMPC SQP) — designed for batched,
jit-compiled, vmapped execution on TPU.
"""
from .utils import tf, delay, ss, tf_matrix, StateSpace, TransferFunction
from .utils.config import enable_x64, set_dtype, default_dtype
from .models import (SimModel, LinModel, NonLinModel, RungeKutta, ForwardEuler,
                     EmptySolver, linearize, linearize_)
from .models.solver import DiffSolver
from .controllers.transcription import TranscriptionMethod
from .utils.config import BIG
from .estimators import (StateEstimator, SteadyKalmanFilter, KalmanFilter,
                         UnscentedKalmanFilter, ExtendedKalmanFilter,
                         Luenberger, InternalModel, ManualEstimator,
                         MovingHorizonEstimator, default_nint)
from .controllers import (PredictiveController, LinMPC, ExplicitMPC, info2debugstr,
                          NonLinMPC, SLMPC, SingleShooting, MultipleShooting,
                          TrapezoidalCollocation, OrthogonalCollocation)
from .sim import sim, SimResult
from .sim_compiled import (CompiledClosedLoop, CompiledSLLoop,
                           CompiledMHELoop, CompiledMHEMPCLoop,
                           CompiledNonLinLoop)

__version__ = "0.1.0"
