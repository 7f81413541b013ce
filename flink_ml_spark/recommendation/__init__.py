from .als import ALS, ALSModel
from .swing import Swing

__all__ = ["ALS", "ALSModel", "Swing"]
