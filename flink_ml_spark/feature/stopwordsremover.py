"""StopWordsRemover — filter stop words from a token array.

Reference: feature/stopwordsremover/StopWordsRemover.java:52 (+Utils).
Default corpora: the same public Snowball/spark stop-word lists the
reference bundles (flink-ml-lib/src/main/resources/.../stopwords/) — we
load them via the public PySpark API
``pyspark.ml.feature.StopWordsRemover.loadDefaultStopWords``.
Filtering itself is a JVM-side higher-order expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import Transformer
from ..param import BoolParam, HasInputCols, HasOutputCols, StringArrayParam


def load_default_stop_words(language: str = "english") -> list[str]:
    from pyspark.ml.feature import StopWordsRemover as _S
    return list(_S.loadDefaultStopWords(language))


class StopWordsRemover(Transformer, HasInputCols, HasOutputCols):
    stopWords = StringArrayParam("stopWords", "The words to filter out.", None)
    caseSensitive = BoolParam("caseSensitive", "Case-sensitive comparison.", False)

    def _transform(self, df: DataFrame) -> DataFrame:
        words = self.get_("stopWords")
        if words is None:
            words = load_default_stop_words("english")
        cs = self.get_("caseSensitive")
        if not cs:
            words = [w.lower() for w in words]
        stop = F.array(*[F.lit(w) for w in words])
        for ic, oc in zip(self.get_("inputCols"), self.get_("outputCols")):
            toks = F.col(ic)
            if cs:
                out = F.filter(toks, lambda t: ~F.array_contains(stop, t))
            else:
                out = F.filter(toks, lambda t: ~F.array_contains(stop, F.lower(t)))
            df = df.withColumn(oc, out)
        return df
