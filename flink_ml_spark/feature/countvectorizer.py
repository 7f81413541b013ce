"""CountVectorizer / CountVectorizerModel and IDF / IDFModel.

Reference:
- feature/countvectorizer/CountVectorizer.java:53 — vocabulary of terms
  with document frequency within [minDF, maxDF] (values >=1 are absolute
  counts, <1 are fractions), top ``vocabSize`` by term frequency; model
  transform → token-count sparse vector, ``binary`` option, ``minTF``
  filter (per-document count or fraction).
- feature/idf/IDF.java:56 — idf = ln((m+1)/(df+1)), ``minDocFreq``.

Fit plans: explode + groupBy(term) with map-side combine (shuffles at most
|vocab| rows per partition); vocabulary order = count desc, term asc
(deterministic — reference breaks ties arbitrarily, SURVEY §7).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (BoolParam, FloatParam, HasInputCol, HasOutputCol,
                     IntParam, ParamValidators)


class CountVectorizer(Estimator, HasInputCol, HasOutputCol):
    vocabularySize = IntParam("vocabularySize", "Max vocabulary size.", 1 << 18,
                              ParamValidators.gt(0))
    minDF = FloatParam("minDF", "Min doc frequency (count if >=1 else fraction).", 1.0,
                       ParamValidators.gt_eq(0))
    maxDF = FloatParam("maxDF", "Max doc frequency (count if >=1 else fraction).",
                       float(2 ** 63 - 1), ParamValidators.gt_eq(0))
    minTF = FloatParam("minTF", "Min term frequency per document.", 1.0,
                       ParamValidators.gt_eq(0))
    binary = BoolParam("binary", "Binary output toggles.", False)

    def fit(self, *inputs: DataFrame) -> "CountVectorizerModel":
        (df,) = inputs
        min_df, max_df = self.get_("minDF"), self.get_("maxDF")
        # n_docs only matters when a bound is fractional — skip the extra
        # scan in the (default) absolute-count case
        n_docs = df.count() if (min_df < 1.0 or max_df < 1.0) else 0
        min_df_n = min_df if min_df >= 1.0 else min_df * n_docs
        max_df_n = max_df if max_df >= 1.0 else max_df * n_docs
        # doc frequency: dedup terms within each doc first (array_distinct is
        # row-local), then one groupBy(term) — map-side combine keeps the
        # shuffle at |vocab| rows per partition.
        df_counts = (df.select(F.explode(F.array_distinct(F.col(self.get_("inputCol")))).alias("term"))
                     .groupBy("term").agg(F.count("*").alias("df")))
        tf_counts = (df.select(F.explode(F.col(self.get_("inputCol"))).alias("term"))
                     .groupBy("term").agg(F.count("*").alias("tf")))
        joined = tf_counts.join(df_counts, "term")
        filtered = joined.filter((F.col("df") >= F.lit(min_df_n)) &
                                 (F.col("df") <= F.lit(max_df_n)))
        rows = (filtered.orderBy(F.desc("tf"), F.asc("term"))
                .limit(self.get_("vocabularySize")).collect())
        vocab = [r["term"] for r in rows]
        model = CountVectorizerModel()
        model.set_(inputCol=self.get_("inputCol"), outputCol=self.get_("outputCol"),
                   minTF=self.get_("minTF"), binary=self.get_("binary"))
        model.model_data = {"vocabulary": vocab}
        return model


class CountVectorizerModel(Model, HasInputCol, HasOutputCol):
    minTF = FloatParam("minTF", "Min term frequency per document.", 1.0)
    binary = BoolParam("binary", "Binary output toggles.", False)

    def _transform(self, df: DataFrame) -> DataFrame:
        # Arrow UDF, fully vectorized: the batch's tokens are flattened
        # once, resolved against the SORTED vocab with searchsorted (no
        # per-token Python), then (row, term) pairs are counted with one
        # np.unique over composite int keys and sliced back into per-row
        # ListArrays.  Same broadcast-vocab design as Spark MLlib's
        # CountVectorizerModel, minus the per-row Counter loop.
        from pyspark.sql.functions import pandas_udf
        vocabulary = list(self.model_data["vocabulary"])
        size = len(vocabulary)
        order = np.argsort(np.asarray(vocabulary, dtype=object))
        vocab_sorted = np.asarray(vocabulary, dtype=object)[order]
        sorted_to_orig = np.asarray(order, dtype=np.int64)
        min_tf = float(self.get_("minTF"))
        binary = self.get_("binary")

        @pandas_udf("struct<size:int,indices:array<int>,values:array<double>>")
        def to_sparse(tokens):
            import pandas as pd
            import pyarrow as pa
            from flink_ml_spark.llmdata.dedup import flat_tokens
            flat, lens, starts = flat_tokens(tokens)
            m = len(lens)
            if len(flat):
                pos = np.searchsorted(vocab_sorted, flat)
                pos_c = np.clip(pos, 0, len(vocab_sorted) - 1)
                hit = vocab_sorted[pos_c] == flat if len(vocab_sorted) \
                    else np.zeros(len(flat), dtype=bool)
                row_of = np.repeat(np.arange(m, dtype=np.int64), lens)
                rows_h = row_of[hit]
                terms_h = sorted_to_orig[pos_c[hit]]
                keys, counts = np.unique(rows_h * size + terms_h,
                                         return_counts=True)
                krow, kterm = keys // size, keys % size
                thr = (np.full(len(keys), min_tf) if min_tf >= 1.0
                       else min_tf * lens[krow])
                keep = counts >= thr
                krow, kterm, counts = krow[keep], kterm[keep], counts[keep]
            else:
                krow = np.empty(0, dtype=np.int64)
                kterm = counts = krow
            per_row = np.bincount(krow, minlength=m)
            offsets = np.zeros(m + 1, dtype=np.int32)
            np.cumsum(per_row, out=offsets[1:])
            vals = (np.ones(len(kterm)) if binary
                    else counts.astype(np.float64))
            ind = pa.ListArray.from_arrays(pa.array(offsets),
                                           pa.array(kterm.astype(np.int32)))
            val = pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals))
            return pd.DataFrame({"size": np.full(m, size, dtype=np.int32),
                                 "indices": ind.to_pandas(),
                                 "values": val.to_pandas()})

        return df.withColumn(self.get_("outputCol"),
                             to_sparse(F.col(self.get_("inputCol"))))

    def transform_local(self, pdf):
        """Sparse struct rows as dicts — the same shape Arrow toPandas
        yields for the distributed output."""
        vocabulary = list(self.model_data["vocabulary"])
        index = {t: i for i, t in enumerate(vocabulary)}
        size = len(vocabulary)
        min_tf = float(self.get_("minTF"))
        binary = self.get_("binary")
        rows = []
        for toks in pdf[self.get_("inputCol")]:
            counts: dict[int, float] = {}
            for t in toks or []:
                i = index.get(t)
                if i is not None:
                    counts[i] = counts.get(i, 0.0) + 1.0
            thr = min_tf if min_tf >= 1.0 else min_tf * len(toks or [])
            items = sorted((i, c) for i, c in counts.items() if c >= thr)
            rows.append({"size": size,
                         "indices": [i for i, _ in items],
                         "values": [1.0 if binary else c for _, c in items]})
        out = pdf.copy()
        out[self.get_("outputCol")] = rows
        return out


class IDF(Estimator, HasInputCol, HasOutputCol):
    minDocFreq = IntParam("minDocFreq", "Min doc frequency to keep a term's idf.", 0,
                          ParamValidators.gt_eq(0))

    def fit(self, *inputs: DataFrame) -> "IDFModel":
        (df,) = inputs
        col = self.get_("inputCol")
        # ONE action computes n_docs + dim + per-term doc-freq together: a
        # sentinel pos=-1 element appended per doc counts documents, and
        # max(size) rides along the same groupBy.  The input is typically a
        # CountVectorizer Arrow-UDF output, so every extra action would
        # re-execute that UDF over the whole corpus (measured 3.3s -> 19s
        # at sf0.1 when fit ran count/max/doc-freq as separate jobs).
        dtype = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[col]
        c = F.col(col)
        if dtype.startswith("struct"):
            # doc-freq straight from the sparse indices — never densify
            # (a dense explode of |vocab|-dim vectors is vocab x docs rows)
            nz = F.filter(F.arrays_zip(c["indices"].alias("i"),
                                       c["values"].alias("v")),
                          lambda e: e["v"] != 0.0)
            pos_arr = F.transform(nz, lambda e: e["i"].cast("long"))
            sz = c["size"].cast("long")
        else:
            pos_arr = F.filter(
                F.transform(c, lambda x, i: F.when(x != 0.0, i.cast("long"))
                            .otherwise(F.lit(-2).cast("long"))),
                lambda p: p != -2)
            sz = F.size(c).cast("long")
        # NULL vectors still count as documents (df.count() semantics):
        # coalesce to an empty position list so the sentinel survives
        aug = F.concat(F.coalesce(pos_arr, F.array().cast("array<long>")),
                       F.array(F.lit(-1).cast("long")))
        rows = (df.select(F.explode(aug).alias("pos"), sz.alias("sz"))
                .groupBy("pos")
                .agg(F.count("*").alias("cnt"), F.max("sz").alias("mx"))
                .collect())
        n_docs = sum(r["cnt"] for r in rows if r["pos"] == -1)
        dim = max((int(r["mx"] or 0) for r in rows), default=0)
        dfreq = np.zeros(dim, dtype=float)
        for r in rows:
            if r["pos"] >= 0:
                dfreq[r["pos"]] = r["cnt"]
        idf = np.log((n_docs + 1.0) / (dfreq + 1.0))
        idf = np.where(dfreq >= self.get_("minDocFreq"), idf, 0.0)
        model = IDFModel()
        model.set_(inputCol=col, outputCol=self.get_("outputCol"))
        model.model_data = {"idf": idf.tolist(), "docFreq": dfreq.tolist(),
                            "numDocs": n_docs}
        return model


class IDFModel(Model, HasInputCol, HasOutputCol):
    def _transform(self, df: DataFrame) -> DataFrame:
        idf = self.model_data["idf"]
        idf_arr = F.array(*[F.lit(float(x)) for x in idf])
        col = self.get_("inputCol")
        dtype = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[col]
        if dtype.startswith("struct"):
            c = F.col(col)
            vals = F.zip_with(c["values"],
                              F.transform(c["indices"], lambda i: F.element_at(idf_arr, i + 1)),
                              lambda v, w: v * w)
            out = F.struct(c["size"].alias("size"), c["indices"].alias("indices"),
                           vals.alias("values"))
        else:
            out = F.zip_with(F.col(col), idf_arr, lambda v, w: v * w)
        return df.withColumn(self.get_("outputCol"), out)

    def transform_local(self, pdf):
        idf = np.asarray(self.model_data["idf"], dtype=float)
        col = pdf[self.get_("inputCol")]
        rows = []
        for v in col:
            if isinstance(v, dict):
                rows.append({"size": v["size"],
                             "indices": list(v["indices"]),
                             "values": [float(x) * idf[int(i)]
                                        for i, x in zip(v["indices"], v["values"])]})
            else:
                rows.append(list(np.asarray(v, dtype=float) * idf[:len(v)]))
        out = pdf.copy()
        out[self.get_("outputCol")] = rows
        return out
