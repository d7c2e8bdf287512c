from .batch import BatchedLinMPC, stack_params, estimator_params
from .batch_nonlin import BatchedNonLinMPC
from .batch_mhe import BatchedMHE
from .batch_kf import BatchedKalman
from .batch_explicit import BatchedExplicitMPC
from .scenarios import random_cstr_controllers

__all__ = ["BatchedLinMPC", "BatchedNonLinMPC", "BatchedMHE", "BatchedKalman",
           "BatchedExplicitMPC", "stack_params",
           "estimator_params", "random_cstr_controllers"]
