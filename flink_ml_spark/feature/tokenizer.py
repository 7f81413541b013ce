"""Tokenizer / RegexTokenizer.

Reference: feature/tokenizer/Tokenizer.java:41 (lowercase + whitespace
split), feature/regextokenizer/RegexTokenizer.java:54 (regex split/match,
minTokenLength, gaps, toLowercase).  Pure Column expressions — JVM-side,
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import Transformer
from ..param import (BoolParam, HasInputCol, HasOutputCol, IntParam,
                     ParamValidators, StringParam)


class Tokenizer(Transformer, HasInputCol, HasOutputCol):
    """Lowercase then split on single whitespace; drops empty tokens."""

    def _transform(self, df: DataFrame) -> DataFrame:
        # array_remove == filter(t != "") but stays inside whole-stage
        # codegen (HOF lambdas also compile ~8x slower)
        toks = F.array_remove(
            F.split(F.lower(F.col(self.get_("inputCol"))), r"\s"), "")
        return df.withColumn(self.get_("outputCol"), toks)

    def transform_local(self, pdf):
        import re
        ws = re.compile("[ \t\n\x0b\f\r]")  # Java \s (ASCII-only)
        out = pdf.copy()
        out[self.get_("outputCol")] = [
            [t for t in ws.split((x or "").lower()) if t]
            for x in pdf[self.get_("inputCol")]]
        return out


class RegexTokenizer(Transformer, HasInputCol, HasOutputCol):
    """RegexTokenizer.java:54 semantics: optionally lowercase, then either
    split on ``pattern`` (gaps=True) or emit regex matches (gaps=False);
    keep tokens with length >= minTokenLength."""

    pattern = StringParam("pattern", "Regex pattern used for tokenizing.", r"\s+")
    gaps = BoolParam("gaps", "Pattern matches gaps (split) or tokens (findall).", True)
    minTokenLength = IntParam("minTokenLength", "Minimum token length.", 1,
                              ParamValidators.gt_eq(0))
    toLowercase = BoolParam("toLowercase", "Lowercase before tokenizing.", True)

    def _transform(self, df: DataFrame) -> DataFrame:
        col = F.col(self.get_("inputCol"))
        if self.get_("toLowercase"):
            col = F.lower(col)
        if self.get_("gaps"):
            toks = F.split(col, self.get_("pattern"))
        else:
            toks = F.regexp_extract_all(col, F.lit(self.get_("pattern")), 0)
        min_len = self.get_("minTokenLength")
        toks = F.filter(toks, lambda t: F.length(t) >= F.lit(min_len))
        return df.withColumn(self.get_("outputCol"), toks)

    def transform_local(self, pdf):
        import re
        pat = re.compile(self.get_("pattern"))
        gaps = self.get_("gaps")
        min_len = self.get_("minTokenLength")
        lower = self.get_("toLowercase")
        rows = []
        for text in pdf[self.get_("inputCol")]:
            t = (text or "")
            if lower:
                t = t.lower()
            toks = pat.split(t) if gaps else pat.findall(t)
            rows.append([x for x in toks if len(x) >= min_len])
        out = pdf.copy()
        out[self.get_("outputCol")] = rows
        return out
