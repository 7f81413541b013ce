"""Core stage API: Stage / AlgoOperator / Transformer / Estimator / Model.

Re-expression of the reference API layer
(flink-ml-core/src/main/java/org/apache/flink/ml/api/{Stage,AlgoOperator,
Transformer,Estimator,Model}.java) on PySpark DataFrames.  The reference's
``Table`` maps to ``pyspark.sql.DataFrame``; ``Model`` carries its fitted
state both as a small driver-side dict (Spark-first: fit IS an action, see
SURVEY §3.1 design note) and as a model-data DataFrame for parity with
``Model.getModelData()`` (ml/api/Model.java:38-48).

Persistence follows ReadWriteUtils (flink-ml-core/.../ml/util/
ReadWriteUtils.java:80-100): ``<path>/metadata`` holds
``{className, timestamp, paramMap}`` JSON; model data goes to
``<path>/data/*.parquet``.
"""

from __future__ import annotations

import importlib
import json
import os
import time
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession

from .param import WithParams


class Stage(WithParams):
    """Base of every pipeline node: params + save/load (ml/api/Stage.java:44)."""

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        meta = {
            "className": f"{type(self).__module__}.{type(self).__qualname__}",
            "timestamp": int(time.time() * 1000),
            "paramMap": self.params_json(),
        }
        extra = self._extra_metadata()
        if extra:
            meta["extra"] = extra
        with open(os.path.join(path, "metadata"), "w") as f:
            json.dump(meta, f)
        self._save_model_data(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Stage":
        with open(os.path.join(path, "metadata")) as f:
            meta = json.load(f)
        module, _, name = meta["className"].rpartition(".")
        klass = getattr(importlib.import_module(module), name)
        # composite stages (Pipeline/PipelineModel/Graph) override load() to
        # restore their children — defer to it instead of the generic path
        if klass.load.__func__ is not cls.load.__func__:
            return klass.load(spark, path)
        stage = klass()
        stage.load_params_json(meta["paramMap"])
        stage._load_extra_metadata(meta.get("extra") or {})
        stage._load_model_data(spark, path)
        return stage

    @classmethod
    def load_local(cls, path: str) -> "Stage":
        """Servable load: rebuild a saved stage with NO SparkSession —
        metadata JSON plus pandas/pyarrow for parquet model data, mirroring
        the reference's engine-free ``PipelineModelServable.load``
        (flink-ml-servable-core/.../builder/PipelineModelServable.java:40-62).
        The result serves ``transform_local`` (pandas in → pandas out);
        ``transform`` still needs a Spark-loaded stage."""
        with open(os.path.join(path, "metadata")) as f:
            meta = json.load(f)
        module, _, name = meta["className"].rpartition(".")
        klass = getattr(importlib.import_module(module), name)
        # composite stages (PipelineModel) override load_local to restore
        # their children — defer to it instead of the generic path
        if klass.load_local.__func__ is not cls.load_local.__func__:
            return klass.load_local(path)
        # a stage with a custom load() but no load_local() stores structure
        # the generic path cannot restore (Pipeline/Graph wiring) — fail
        # loudly instead of returning a hollow stage
        if klass.load.__func__ is not Stage.load.__func__:
            raise NotImplementedError(
                f"{klass.__name__} is not servable without an engine "
                "(no load_local override)")
        stage = klass()
        stage.load_params_json(meta["paramMap"])
        stage._load_extra_metadata(meta.get("extra") or {})
        stage._load_model_data_local(path)
        return stage

    # hooks for Models / stages with fitted state
    def _extra_metadata(self) -> dict[str, Any]:
        return {}

    def _load_extra_metadata(self, extra: dict[str, Any]) -> None:
        pass

    def _save_model_data(self, path: str) -> None:
        pass

    def _load_model_data(self, spark: SparkSession, path: str) -> None:
        pass

    def _load_model_data_local(self, path: str) -> None:
        """Engine-free counterpart of _load_model_data (pandas/pyarrow)."""
        pass


class AlgoOperator(Stage):
    """Multi-in/multi-out relational op (ml/api/AlgoOperator.java:31-38)."""

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        raise NotImplementedError


class Transformer(AlgoOperator):
    """Single-table convenience: subclasses implement _transform(df) -> df."""

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        if len(inputs) != 1:
            raise ValueError(f"{type(self).__name__} expects 1 input table")
        return [self._transform(inputs[0])]

    def _transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError


class Model(Transformer):
    """Transformer with fitted model data (ml/api/Model.java:31-48).

    ``model_data`` is a small driver-held dict of JSON-able values and/or
    numpy arrays; ``get_model_data`` exposes it as DataFrame(s) for parity.
    """

    def __init__(self, **kwargs: Any):
        super().__init__(**kwargs)
        self.model_data: dict[str, Any] = {}

    def set_model_data(self, *tables: DataFrame) -> "Model":
        """Inverse of get_model_data (ml/api/Model.java:38-48): read the
        single model-data row back into driver-held state.  Works for every
        model whose state round-trips through get_model_data's one-row
        DataFrame; models with table-shaped state override."""
        (df,) = tables
        row = df.first()
        if row is None:
            raise ValueError("empty model data table")
        self.model_data = {k: (list(v) if isinstance(v, (list, tuple)) else v)
                           for k, v in row.asDict(recursive=True).items()}
        return self

    def get_model_data(self, spark: SparkSession) -> list[DataFrame]:
        import pandas as pd
        row = {k: _to_jsonable(v) for k, v in self.model_data.items()}
        return [spark.createDataFrame(pd.DataFrame([row]))]

    # persistence: model_data dict → JSON in metadata "extra" (small state
    # only — fixed-size statistics/coefficients, never raw data; SURVEY §7)
    def _extra_metadata(self) -> dict[str, Any]:
        return {"modelData": {k: _to_jsonable(v) for k, v in self.model_data.items()}}

    def _load_extra_metadata(self, extra: dict[str, Any]) -> None:
        self.model_data = dict(extra.get("modelData") or {})

    # cluster-free inference (servable path, SURVEY §1.5): override in
    # models that support it.
    def transform_local(self, pdf):
        raise NotImplementedError(
            f"{type(self).__name__} has no local (servable) inference path")


class Estimator(Stage):
    """fit(DataFrame...) -> Model (ml/api/Estimator.java:31-39).

    Spark-first: fit triggers the aggregation action(s) immediately and
    returns a Model holding driver-side fitted state; Model.transform stays
    lazy Column expressions (SURVEY §3.1 design note).
    """

    def fit(self, *inputs: DataFrame) -> Model:
        raise NotImplementedError


def _to_jsonable(v: Any) -> Any:
    import numpy as np
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, dict):
        return {k: _to_jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_to_jsonable(x) for x in v]
    return v
