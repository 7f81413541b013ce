"""RandomSplitter — split a table into N tables by weights, seeded.

Reference: feature/randomsplitter/RandomSplitter.java:47.
Spark-first: ``DataFrame.randomSplit`` (per-partition Bernoulli split, no
shuffle, scales linearly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..api import AlgoOperator
from ..param import FloatArrayParam, HasSeed, ParamValidators


class RandomSplitter(AlgoOperator, HasSeed):
    weights = FloatArrayParam("weights", "Split weights.", [1.0, 1.0],
                              ParamValidators.non_empty_array())

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        seed = self.get_("seed")
        return df.randomSplit(list(self.get_("weights")), seed=seed)
