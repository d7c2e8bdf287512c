from .batch import BatchedLinMPC, stack_params, estimator_params
from .batch_nonlin import BatchedNonLinMPC
from .scenarios import random_cstr_controllers

__all__ = ["BatchedLinMPC", "BatchedNonLinMPC", "stack_params",
           "estimator_params", "random_cstr_controllers"]
