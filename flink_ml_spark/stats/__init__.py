from .correlation import CorrelationMatrix, MutualInformation
from .tests import ANOVATest, ChiSqTest, FValueTest

__all__ = ["ChiSqTest", "ANOVATest", "FValueTest", "CorrelationMatrix", "MutualInformation"]
