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


# Default English corpus, embedded statically so no JVM is needed at import
# time (the oracle-SQL registry builds literals from it before any
# SparkSession exists).  Identical to Spark's / the reference's bundled list
# (flink-ml-lib/src/main/resources/org/apache/flink/ml/feature/stopwords/english).
ENGLISH_STOP_WORDS = [
    'i', 'me', 'my', 'myself', 'we', 'our', 'ours', 'ourselves', 'you',
    'your', 'yours', 'yourself', 'yourselves', 'he', 'him', 'his', 'himself',
    'she', 'her', 'hers', 'herself', 'it', 'its', 'itself', 'they', 'them',
    'their', 'theirs', 'themselves', 'what', 'which', 'who', 'whom', 'this',
    'that', 'these', 'those', 'am', 'is', 'are', 'was', 'were', 'be', 'been',
    'being', 'have', 'has', 'had', 'having', 'do', 'does', 'did', 'doing',
    'a', 'an', 'the', 'and', 'but', 'if', 'or', 'because', 'as', 'until',
    'while', 'of', 'at', 'by', 'for', 'with', 'about', 'against', 'between',
    'into', 'through', 'during', 'before', 'after', 'above', 'below', 'to',
    'from', 'up', 'down', 'in', 'out', 'on', 'off', 'over', 'under', 'again',
    'further', 'then', 'once', 'here', 'there', 'when', 'where', 'why',
    'how', 'all', 'any', 'both', 'each', 'few', 'more', 'most', 'other',
    'some', 'such', 'no', 'nor', 'not', 'only', 'own', 'same', 'so', 'than',
    'too', 'very', 's', 't', 'can', 'will', 'just', 'don', 'should', 'now',
    "i'll", "you'll", "he'll", "she'll", "we'll", "they'll", "i'd", "you'd",
    "he'd", "she'd", "we'd", "they'd", "i'm", "you're", "he's", "she's",
    "it's", "we're", "they're", "i've", "we've", "you've", "they've",
    "isn't", "aren't", "wasn't", "weren't", "haven't", "hasn't", "hadn't",
    "don't", "doesn't", "didn't", "won't", "wouldn't", "shan't", "shouldn't",
    "mustn't", "can't", "couldn't", 'cannot', 'could', "here's", "how's",
    "let's", 'ought', "that's", "there's", "what's", "when's", "where's",
    "who's", "why's", 'would'
]


def load_default_stop_words(language: str = "english") -> list[str]:
    """Default corpus per language — the same Snowball lists the reference
    bundles (flink-ml-lib/src/main/resources/.../stopwords/, 14 languages,
    identical to Spark MLlib's).  Read straight from the spark-mllib jar
    resource so no SparkSession is needed (servable/local path)."""
    if language == "english":
        return list(ENGLISH_STOP_WORDS)
    import glob
    import os
    import zipfile

    import pyspark
    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                                  "jars", "spark-mllib_*.jar"))
    for jar in jars:
        with zipfile.ZipFile(jar) as z:
            name = f"org/apache/spark/ml/feature/stopwords/{language}.txt"
            try:
                with z.open(name) as f:
                    return f.read().decode("utf-8").splitlines()
            except KeyError:
                continue
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

    def transform_local(self, pdf):
        words = self.get_("stopWords")
        if words is None:
            words = load_default_stop_words("english")
        cs = self.get_("caseSensitive")
        stop = set(words if cs else [w.lower() for w in words])
        out = pdf.copy()
        for ic, oc in zip(self.get_("inputCols"), self.get_("outputCols")):
            out[oc] = [[t for t in toks
                        if (t if cs else t.lower()) not in stop]
                       for toks in pdf[ic]]
        return out
