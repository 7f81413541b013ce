"""Pipeline / PipelineModel (ml/builder/Pipeline.java:45, PipelineModel.java:66).

Same semantics as the reference: ``Pipeline.fit`` walks stages in order,
fitting each Estimator and transforming the inputs forward only while an
Estimator remains downstream (Pipeline.java:100-103); ``PipelineModel``
chains transforms sequentially.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .api import AlgoOperator, Estimator, Model, Stage


def _last_estimator_index(stages: Sequence[Stage]) -> int:
    last = -1
    for i, s in enumerate(stages):
        if isinstance(s, Estimator):
            last = i
    return last


class Pipeline(Estimator):
    def __init__(self, stages: Sequence[Stage] | None = None, **kwargs):
        super().__init__(**kwargs)
        self.stages = list(stages or [])

    def fit(self, *inputs: DataFrame) -> "PipelineModel":
        last_est = _last_estimator_index(self.stages)
        fitted: list[Stage] = []
        cur = list(inputs)
        for i, stage in enumerate(self.stages):
            if isinstance(stage, Estimator):
                node: Stage = stage.fit(*cur)
            else:
                node = stage
            fitted.append(node)
            if i < last_est:  # Pipeline.java:100-103
                cur = node.transform(*cur)  # type: ignore[union-attr]
        return PipelineModel(fitted)

    def save(self, path: str) -> None:
        _save_stages(self, self.stages, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Pipeline":
        return cls(_load_stages(spark, path))


class PipelineModel(Model):
    def __init__(self, stages: Sequence[Stage] | None = None, **kwargs):
        super().__init__(**kwargs)
        self.stages = list(stages or [])

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        cur = list(inputs)
        for stage in self.stages:  # PipelineModel.java:66-73
            cur = stage.transform(*cur)  # type: ignore[union-attr]
        return cur

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.transform(df)[0]

    def transform_local(self, pdf):
        for stage in self.stages:
            pdf = stage.transform_local(pdf)  # type: ignore[union-attr]
        return pdf

    def save(self, path: str) -> None:
        _save_stages(self, self.stages, path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PipelineModel":
        return cls(_load_stages(spark, path))

    @classmethod
    def load_local(cls, path: str) -> "PipelineModel":
        """Engine-free load (PipelineModelServable.java:40-62): restore
        every child via Stage.load_local; serves transform_local only."""
        with open(os.path.join(path, "metadata")) as f:
            meta = json.load(f)
        return cls([
            Stage.load_local(os.path.join(path, "stages", f"{i:04d}"))
            for i in range(meta["numStages"])
        ])


def _save_stages(owner: Stage, stages: Sequence[Stage], path: str) -> None:
    os.makedirs(path, exist_ok=True)
    meta = {
        "className": f"{type(owner).__module__}.{type(owner).__qualname__}",
        "paramMap": {},
        "numStages": len(stages),
    }
    with open(os.path.join(path, "metadata"), "w") as f:
        json.dump(meta, f)
    for i, s in enumerate(stages):
        s.save(os.path.join(path, "stages", f"{i:04d}"))


def _load_stages(spark: SparkSession, path: str) -> list[Stage]:
    with open(os.path.join(path, "metadata")) as f:
        meta = json.load(f)
    return [
        Stage.load(spark, os.path.join(path, "stages", f"{i:04d}"))
        for i in range(meta["numStages"])
    ]
