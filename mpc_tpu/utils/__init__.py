from . import config, linalg, lti
from .lti import tf, delay, ss, tf_matrix, StateSpace, TransferFunction

__all__ = ["config", "linalg", "lti", "tf", "delay", "ss", "tf_matrix",
           "StateSpace", "TransferFunction"]
