"""VectorAssembler — concatenate numeric/array columns into one vector.

Reference: feature/vectorassembler/VectorAssembler.java:67.  handleInvalid:
error | skip (drop rows with null/NaN/size-mismatch) | keep (null scalar →
NaN; null array → NaN-fill using the declared ``inputSizes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType

from ..api import Transformer
from ..param import (HasHandleInvalid, HasInputCols, HasOutputCol,
                     IntArrayParam)


class VectorAssembler(Transformer, HasInputCols, HasOutputCol, HasHandleInvalid):
    inputSizes = IntArrayParam("inputSizes", "Declared size of each input column (needed for keep).", None)

    def _transform(self, df: DataFrame) -> DataFrame:
        in_cols = self.get_("inputCols")
        sizes = self.get_("inputSizes") or [None] * len(in_cols)
        mode = self.get_("handleInvalid")
        schema = {f.name: f.dataType for f in df.schema.fields}

        parts = []
        invalid = F.lit(False)
        for c, size in zip(in_cols, sizes):
            col = F.col(c)
            if isinstance(schema[c], ArrayType):
                arr = col.cast("array<double>")
                bad = col.isNull()
                if size:
                    bad = bad | (F.size(col) != F.lit(size))
                if mode == "keep":
                    fill = F.array_repeat(F.lit(float("nan")), int(size or 1))
                    arr = F.when(bad, fill).otherwise(arr)
            else:
                x = col.cast("double")
                bad = col.isNull() | F.isnan(x)
                if mode == "keep":
                    arr = F.array(F.coalesce(x, F.lit(float("nan"))))
                else:
                    arr = F.array(x)
            parts.append(arr)
            invalid = invalid | bad

        out = F.concat(*parts) if len(parts) > 1 else parts[0]
        if mode == "skip":
            df = df.filter(~invalid)
        elif mode == "error":
            out = F.when(
                invalid,
                F.raise_error(F.lit("VectorAssembler: invalid (null/NaN/size-mismatch) input"))
                .cast("array<double>")
            ).otherwise(out)
        return df.withColumn(self.get_("outputCol"), out)

    def transform_local(self, pdf):
        import math

        import numpy as np
        in_cols = self.get_("inputCols")
        sizes = self.get_("inputSizes") or [None] * len(in_cols)
        mode = self.get_("handleInvalid")
        rows, keep = [], []
        for _, r in pdf.iterrows():
            vec, bad = [], False
            for c, size in zip(in_cols, sizes):
                v = r[c]
                if v is None:
                    # a NULL array column must fill its declared width,
                    # not a single NaN (None has no __len__, so it would
                    # otherwise fall to the scalar branch)
                    bad = True
                    vec.extend([float("nan")] * int(size or 1))
                elif hasattr(v, "__len__"):
                    if size and len(v) != size:
                        bad = True
                        vec.extend([float("nan")] * int(size))
                    else:
                        vec.extend(float(x) for x in v)
                else:
                    fv = float(v)
                    if math.isnan(fv):
                        bad = True
                    vec.append(fv)
            if bad and mode == "error":
                raise ValueError("VectorAssembler: invalid input")
            rows.append(vec)
            keep.append(not bad)
        out = pdf.copy()
        out[self.get_("outputCol")] = rows
        if mode == "skip":
            out = out[np.array(keep, dtype=bool)].reset_index(drop=True)
        return out
