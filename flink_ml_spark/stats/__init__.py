from .correlation import CorrelationMatrix, MutualInformation, SpearmanCorrelation
from .tests import ANOVATest, ChiSqTest, FValueTest, KolmogorovSmirnovTest

__all__ = ["ChiSqTest", "ANOVATest", "FValueTest", "KolmogorovSmirnovTest",
           "CorrelationMatrix", "MutualInformation", "SpearmanCorrelation"]
