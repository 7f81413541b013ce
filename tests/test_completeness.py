"""Completeness tests — mirror of the reference's
flink-ml-python/pyflink/ml/tests/test_ml_lib_completeness.py:31-147,
which asserts every Java stage has a Python wrapper.  Here: every
reference stage (SURVEY §2 inventory) has an implementation exported
from flink_ml_spark, constructs with defaults, and (for Stages)
round-trips its params through the ReadWriteUtils-style metadata JSON.
"""

import importlib

import pytest

from flink_ml_spark.api import AlgoOperator, Estimator, Model, Stage, Transformer

# SURVEY §2 operator -> (module, class).  One entry per reference stage
# (Models listed only where the reference has a separately-loadable
# model class with its own behavior, §2.3/2.5).
REFERENCE_STAGES = {
    # §2.2 stateless transformers
    "Binarizer": "feature", "Bucketizer": "feature", "DCT": "feature",
    "ElementwiseProduct": "feature", "FeatureHasher": "feature",
    "HashingTF": "feature", "Interaction": "feature", "NGram": "feature",
    "Normalizer": "feature", "PolynomialExpansion": "feature",
    "RegexTokenizer": "feature", "Tokenizer": "feature",
    "StopWordsRemover": "feature", "VectorAssembler": "feature",
    "VectorSlicer": "feature", "SQLTransformer": "feature",
    # §2.3 aggregate-fit estimators (+ their models)
    "CountVectorizer": "feature", "CountVectorizerModel": "feature",
    "IDF": "feature", "IDFModel": "feature",
    "Imputer": "feature", "ImputerModel": "feature",
    "KBinsDiscretizer": "feature", "KBinsDiscretizerModel": "feature",
    "MaxAbsScaler": "feature", "MaxAbsScalerModel": "feature",
    "MinMaxScaler": "feature", "MinMaxScalerModel": "feature",
    "StandardScaler": "feature", "StandardScalerModel": "feature",
    "RobustScaler": "feature", "RobustScalerModel": "feature",
    "OneHotEncoder": "feature", "OneHotEncoderModel": "feature",
    "StringIndexer": "feature", "StringIndexerModel": "feature",
    "IndexToStringModel": "feature",
    "VectorIndexer": "feature", "VectorIndexerModel": "feature",
    "UnivariateFeatureSelector": "feature",
    "UnivariateFeatureSelectorModel": "feature",
    "VarianceThresholdSelector": "feature",
    "VarianceThresholdSelectorModel": "feature",
    "MinHashLSH": "feature", "MinHashLSHModel": "feature",
    # §2.4
    "RandomSplitter": "feature",
    "OnlineStandardScaler": "streaming", "OnlineStandardScalerModel": "streaming",
    # §2.5
    "LogisticRegression": "classification",
    "LogisticRegressionModel": "classification",
    "OnlineLogisticRegression": "streaming",
    "LinearSVC": "classification", "LinearSVCModel": "classification",
    "LinearRegression": "regression", "LinearRegressionModel": "regression",
    "NaiveBayes": "classification", "NaiveBayesModel": "classification",
    "Knn": "classification", "KnnModel": "classification",
    "KMeans": "clustering", "KMeansModel": "clustering",
    "OnlineKMeans": "streaming",
    "AgglomerativeClustering": "clustering",
    "Swing": "recommendation",
    # §2.6 / §2.7
    "BinaryClassificationEvaluator": "evaluation",
    "ChiSqTest": "stats", "ANOVATest": "stats", "FValueTest": "stats",
    # north-star extensions (BASELINE.json)
    "ExactDeduplicator": "llmdata", "MinHashSignature": "llmdata",
    "MinHashLSHDeduplicator": "llmdata", "SimHashDeduplicator": "llmdata",
    "NGramJaccardDeduplicator": "llmdata", "SnapshotDiff": "llmdata",
    "EmbeddingCosineDeduplicator": "llmdata",
    "BruteForceKNNJoin": "llmdata", "IVFIndex": "llmdata",
    "IVFIndexModel": "llmdata", "RandomHyperplaneLSH": "llmdata",
    "SemanticDeduplicator": "llmdata",
    "LanguageIdentifier": "llmdata", "TextQualityScorer": "llmdata",
    "TokenCounter": "llmdata", "DocumentFingerprinter": "llmdata",
    "MediaFeatureExtractor": "llmdata", "ImageResizer": "llmdata",
    "VideoFrameSampler": "llmdata",
    "IncrementalMinHashDeduplicator": "llmdata",
    "BigramLMScorer": "llmdata", "BigramLMScorerModel": "llmdata",
    "UnigramLMScorer": "llmdata", "UnigramLMScorerModel": "llmdata",
    "BpeTokenizerTrainer": "llmdata", "BpeTokenizerModel": "llmdata",
    "CorpusShuffler": "llmdata", "GopherQualityFilter": "llmdata",
    "TemperatureMixtureSampler": "llmdata", "LineDeduplicator": "llmdata",
    "NGramProfiler": "llmdata", "PCAWhitener": "llmdata",
    "Decontaminator": "llmdata", "DuplicateSpanDetector": "llmdata",
    "DuplicateResolver": "llmdata", "ContaminationScorer": "llmdata",
    "ConnectedComponents": "llmdata", "EmbeddingQuantizer": "llmdata",
    "DomainMixtureSampler": "llmdata", "SequencePacker": "llmdata",
    "DocumentChunker": "llmdata", "Bm25Scorer": "llmdata",
    "RepetitionScorer": "llmdata", "PIIRedactor": "llmdata",
    "TextNormalizer": "llmdata",
    "StratifiedBudgetSampler": "llmdata", "CharEntropyScorer": "llmdata",
    "DuplicateSpanRemover": "llmdata",
}


@pytest.mark.parametrize("name", sorted(REFERENCE_STAGES))
def test_stage_exists_and_constructs(name):
    mod = importlib.import_module(f"flink_ml_spark.{REFERENCE_STAGES[name]}")
    cls = getattr(mod, name)
    inst = cls()
    assert isinstance(inst, (Stage, AlgoOperator, Transformer, Estimator, Model))


@pytest.mark.parametrize("name", sorted(REFERENCE_STAGES))
def test_stage_params_json_roundtrip(name):
    """Every declared param JSON-encodes and decodes unchanged — the
    save/load metadata contract (ReadWriteUtils.java:80-100 layout)."""
    mod = importlib.import_module(f"flink_ml_spark.{REFERENCE_STAGES[name]}")
    inst = getattr(mod, name)()
    encoded = inst.params_json()
    other = getattr(mod, name)()
    other.load_params_json(encoded)
    assert other.params_json() == encoded


def test_pipeline_composition_api():
    from flink_ml_spark.graph import Graph, GraphBuilder, GraphModel
    from flink_ml_spark.pipeline import Pipeline, PipelineModel
    assert Pipeline and PipelineModel and GraphBuilder and Graph and GraphModel


def test_dataflow_primitives_exist():
    from flink_ml_spark.common import dataflow
    for fn in ("map_partition", "reduce_rows", "aggregate_keyed", "sample_n",
               "all_reduce_sum", "co_group", "window_all_and_process",
               "generate_batch_data", "with_broadcast", "numpy_block_rdd"):
        assert callable(getattr(dataflow, fn)), fn


import os


@pytest.mark.skipif(not os.path.isdir(
    "/root/reference/flink-ml-lib/src/main/resources/org/apache/flink/ml/feature/stopwords"),
    reason="reference corpus not available")
@pytest.mark.parametrize("lang", [
    "english", "danish", "dutch", "finnish", "french", "german", "hungarian",
    "italian", "norwegian", "portuguese", "russian", "spanish", "swedish",
    "turkish"])
def test_stopwords_corpus_parity(lang):
    """The bundled per-language defaults equal the reference's corpus
    (flink-ml-lib/src/main/resources/.../stopwords/, 14 languages)."""
    from flink_ml_spark.feature.stopwordsremover import load_default_stop_words
    ref = set(open(
        "/root/reference/flink-ml-lib/src/main/resources/org/apache/flink/ml/"
        f"feature/stopwords/{lang}.txt").read().splitlines())
    assert set(load_default_stop_words(lang)) == ref


def test_servable_transform_local_matches_spark(spark):
    """Servable path parity (TransformerServable.java:38-48 equivalent):
    a fitted pipeline's transform_local(pandas) output matches the Spark
    transform on the same rows — no cluster needed for inference."""
    import pandas as pd
    from flink_ml_spark.feature import StandardScaler
    from flink_ml_spark.classification import LogisticRegression
    from flink_ml_spark.pipeline import Pipeline

    data = [([float(i), float(i % 3)], float(i % 2)) for i in range(40)]
    df = spark.createDataFrame(data, "features array<double>, label double")
    pm = Pipeline(stages=[
        StandardScaler(inputCol="features", outputCol="scaled"),
        LogisticRegression(featuresCol="scaled", labelCol="label", maxIter=3,
                           globalBatchSize=1 << 40, tol=0.0)]).fit(df)
    spark_out = pm.transform(df)[0].select("prediction").toPandas()
    pdf = pd.DataFrame({"features": [d[0] for d in data],
                        "label": [d[1] for d in data]})
    local_out = pm.transform_local(pdf)
    assert list(local_out["prediction"]) == list(spark_out["prediction"])
