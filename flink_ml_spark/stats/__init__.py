from .correlation import CorrelationMatrix
from .tests import ANOVATest, ChiSqTest, FValueTest

__all__ = ["ChiSqTest", "ANOVATest", "FValueTest", "CorrelationMatrix"]
