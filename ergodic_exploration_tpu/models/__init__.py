from ergodic_exploration_tpu.models.base import KinematicModel, make_model
from ergodic_exploration_tpu.models.cart import Cart
from ergodic_exploration_tpu.models.omni import Omni

__all__ = ["KinematicModel", "make_model", "Cart", "Omni"]
