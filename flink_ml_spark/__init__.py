"""flink_ml_spark — a PySpark-native ML pipeline + feature engineering engine
with the capabilities of Apache Flink ML (reference: apache/flink-ml @
2024-11-08), built Spark-first: DataFrame/Column expressions, driver-loop
iteration, Structured Streaming for online stages.  See SURVEY.md."""

from .api import AlgoOperator, Estimator, Model, Stage, Transformer
from .io import BucketedTableSink, read_table, write_bucketed
from .graph import (Graph, GraphAlgoOperator, GraphBuilder, GraphModel,
                    TableId)
from .param import Param, ParamValidators, WithParams
from .pipeline import Pipeline, PipelineModel
from .tuning import (CrossValidator, CrossValidatorModel,
                     ParamGridBuilder, TrainValidationSplit)

__version__ = "0.1.0"
