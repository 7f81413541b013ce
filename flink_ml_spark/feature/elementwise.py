"""ElementwiseProduct, Normalizer, VectorSlicer, Interaction, NGram.

Reference files:
- feature/elementwiseproduct/ElementwiseProduct.java:52 (Hadamard with scalingVec)
- feature/normalizer/Normalizer.java:46 (unit p-norm)
- feature/vectorslicer/VectorSlicer.java:55 (select indices, no duplicates)
- feature/interaction/Interaction.java:57 (all value combinations)
- feature/ngram/NGram.java:45 (space-joined n-grams)

All pure higher-order-function expressions: JVM-side, no shuffle added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType

from ..api import Transformer
from ..common import vector as V
from ..param import (FloatArrayParam, FloatParam, HasInputCol, HasInputCols,
                     HasOutputCol, IntArrayParam, IntParam, ParamValidators)


class ElementwiseProduct(Transformer, HasInputCol, HasOutputCol):
    scalingVec = FloatArrayParam("scalingVec", "Vector to multiply element-wise.", None)

    def _transform(self, df: DataFrame) -> DataFrame:
        scaling = F.array(*[F.lit(float(x)) for x in self.get_("scalingVec")])
        return df.withColumn(
            self.get_("outputCol"),
            F.zip_with(F.col(self.get_("inputCol")), scaling, lambda x, s: x * s))

    def transform_local(self, pdf):
        import numpy as np
        v = np.asarray(self.get_("scalingVec"), dtype=float)
        out = pdf.copy()
        out[self.get_("outputCol")] = [
            list(np.asarray(x, dtype=float) * v)
            for x in pdf[self.get_("inputCol")]]
        return out


class Normalizer(Transformer, HasInputCol, HasOutputCol):
    p = FloatParam("p", "The p of p-norm.", 2.0, ParamValidators.gt_eq(1.0))

    def _transform(self, df: DataFrame) -> DataFrame:
        col = F.col(self.get_("inputCol"))
        norm = V.p_norm(col, self.get_("p"))
        return df.withColumn(
            self.get_("outputCol"),
            F.transform(col, lambda x: x / norm))

    def transform_local(self, pdf):
        import numpy as np
        p = self.get_("p")
        out_rows = []
        for x in pdf[self.get_("inputCol")]:
            a = np.asarray(x, dtype=float)
            norm = (np.abs(a).max() if np.isinf(p)
                    else float((np.abs(a) ** p).sum()) ** (1.0 / p))
            out_rows.append(list(a / norm))
        out = pdf.copy()
        out[self.get_("outputCol")] = out_rows
        return out


class VectorSlicer(Transformer, HasInputCol, HasOutputCol):
    indices = IntArrayParam("indices", "Indices to select (no duplicates).", None,
                            ParamValidators.non_empty_array())

    def _transform(self, df: DataFrame) -> DataFrame:
        idx = self.get_("indices")
        if len(set(idx)) != len(idx):
            raise ValueError("VectorSlicer indices must not contain duplicates")
        col = F.col(self.get_("inputCol"))
        out = F.array(*[F.element_at(col, int(i) + 1) for i in idx])
        return df.withColumn(self.get_("outputCol"), out)

    def transform_local(self, pdf):
        idx = [int(i) for i in self.get_("indices")]
        out = pdf.copy()
        out[self.get_("outputCol")] = [
            [x[i] for i in idx] for x in pdf[self.get_("inputCol")]]
        return out


class Interaction(Transformer, HasInputCols, HasOutputCol):
    """Output vector of products of every combination across input columns;
    result[i*len(b)+j] = a[i]*b[j] fold over inputs (Interaction.java:57)."""

    def _transform(self, df: DataFrame) -> DataFrame:
        schema = {f.name: f.dataType for f in df.schema.fields}
        arrays = []
        for c in self.get_("inputCols"):
            if isinstance(schema[c], ArrayType):
                arrays.append(F.col(c))
            else:
                arrays.append(F.array(F.col(c).cast("double")))
        def _cross(nxt):
            # closure factory: 2-arg lambdas receive the array index
            return lambda x: F.transform(nxt, lambda y: x * y)

        acc = arrays[0]
        for nxt in arrays[1:]:
            acc = F.flatten(F.transform(acc, _cross(nxt)))
        return df.withColumn(self.get_("outputCol"), acc)

    def transform_local(self, pdf):
        import numpy as np
        cols = self.get_("inputCols")
        out_rows = []
        for _, row in pdf.iterrows():
            acc = None
            for c in cols:
                v = row[c]
                a = (np.asarray(v, dtype=float) if hasattr(v, "__len__")
                     else np.asarray([v], dtype=float))
                acc = a if acc is None else np.outer(acc, a).ravel()
            out_rows.append(list(acc))
        out = pdf.copy()
        out[self.get_("outputCol")] = out_rows
        return out


class NGram(Transformer, HasInputCol, HasOutputCol):
    n = IntParam("n", "Number of elements per n-gram (>=1).", 2, ParamValidators.gt(0))

    def _transform(self, df: DataFrame) -> DataFrame:
        n = self.get_("n")
        toks = F.col(self.get_("inputCol"))
        # fold zip_with over n shifted slices — stays vectorized/codegen'd.
        # (transform+sequence with per-position element lookup is ~10×
        # slower under a downstream explode: the positional lookup path
        # falls out of codegen)
        m = F.size(toks) - n + 1
        acc = F.slice(toks, 1, m)
        for j in range(1, n):
            acc = F.zip_with(acc, F.slice(toks, j + 1, m),
                             lambda a, b: F.concat_ws(" ", a, b))
        grams = F.when(F.size(toks) >= n, acc).otherwise(
            F.array().cast("array<string>"))
        return df.withColumn(self.get_("outputCol"), grams)

    def transform_local(self, pdf):
        n = self.get_("n")
        out = pdf.copy()
        out[self.get_("outputCol")] = [
            [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
            if len(t) >= n else []
            for t in pdf[self.get_("inputCol")]]
        return out
