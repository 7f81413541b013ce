from .swing import Swing

__all__ = ["Swing"]
