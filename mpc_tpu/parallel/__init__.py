from .batch import BatchedLinMPC, stack_params, estimator_params
from .scenarios import random_cstr_controllers

__all__ = ["BatchedLinMPC", "stack_params", "estimator_params",
           "random_cstr_controllers"]
