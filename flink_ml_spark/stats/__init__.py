from .correlation import CorrelationMatrix, MutualInformation, SpearmanCorrelation
from .tests import (ANOVATest, ChiSqTest, FValueTest, KolmogorovSmirnovTest,
                    CohenKappaTest, MannWhitneyUTest,
                    PairedTTest, TwoProportionZTest)

__all__ = ["ChiSqTest", "ANOVATest", "FValueTest", "KolmogorovSmirnovTest",
           "PairedTTest", "TwoProportionZTest", "MannWhitneyUTest", "CohenKappaTest", "CorrelationMatrix", "MutualInformation",
           "SpearmanCorrelation"]
