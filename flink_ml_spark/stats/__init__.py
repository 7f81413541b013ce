from .correlation import CorrelationMatrix, MutualInformation, SpearmanCorrelation
from .tests import (ANOVATest, ChiSqTest, FValueTest, KolmogorovSmirnovTest,
                    PairedTTest, TwoProportionZTest)

__all__ = ["ChiSqTest", "ANOVATest", "FValueTest", "KolmogorovSmirnovTest",
           "PairedTTest", "TwoProportionZTest", "CorrelationMatrix", "MutualInformation",
           "SpearmanCorrelation"]
