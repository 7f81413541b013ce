from .correlation import CorrelationMatrix, MutualInformation, SpearmanCorrelation
from .tests import (ANOVATest, ChiSqTest, FValueTest, KolmogorovSmirnovTest,
                    PairedTTest)

__all__ = ["ChiSqTest", "ANOVATest", "FValueTest", "KolmogorovSmirnovTest",
           "PairedTTest", "CorrelationMatrix", "MutualInformation",
           "SpearmanCorrelation"]
