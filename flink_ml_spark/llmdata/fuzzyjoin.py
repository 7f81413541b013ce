"""Blocked fuzzy string join (edit distance) for entity resolution.

Corpus assembly constantly reconciles near-identical strings across
catalogs — titles, product names, author strings — where exact joins
miss typos and truncations.  The classic shape (Gravano et al. 2001
blocking + verify) is: cheap BLOCKING keys make candidate pairs, an
exact edit-distance verify keeps real matches.

Scale design: candidates come from an EQUI-join on
(first-token, length-bucket) — never a cross join.  The length band
|len_l − len_r| ≤ maxDistance is both a correctness-preserving blocking
dimension (edit distance ≥ length difference, so no true match is
lost by banding) and the bucket width; the probe side fans out to the
3 adjacent buckets, the build side stays single-bucket.  First-token
equality is optional (``firstTokenBlock=0`` keeps only the length band
— higher recall, bigger blocks).  The Levenshtein verify runs only on
candidate pairs, JVM-side (``F.levenshtein``, identical semantics to
DuckDB's ``levenshtein`` so oracles replay it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import AlgoOperator
from ..param import IntParam, ParamValidators, StringParam


class FuzzyStringJoin(AlgoOperator):
    """``transform(left, right)`` → ``(left id, right id, distance)`` for
    every pair with ``levenshtein(left str, right str) ≤ maxDistance``
    AND agreeing on the blocking key (first token when
    ``firstTokenBlock``, always the length band).

    Blocking is recall-lossless w.r.t. the length band (edit distance
    can't be smaller than the length difference); first-token blocking
    trades recall on leading-token typos for block size — the standard
    knob, off by default."""

    leftIdCol = StringParam("leftIdCol", "Left id column.", "left_id")
    rightIdCol = StringParam("rightIdCol", "Right id column.", "right_id")
    leftCol = StringParam("leftCol", "Left string column.", "name")
    rightCol = StringParam("rightCol", "Right string column.", "name")
    maxDistance = IntParam("maxDistance", "Max Levenshtein distance "
                           "(also the length-bucket width).", 5,
                           ParamValidators.gt(0))
    firstTokenBlock = IntParam("firstTokenBlock", "1 = candidates must "
                               "share the first whitespace token.", 0)
    keepBest = IntParam("keepBest", "k > 0 keeps only the k closest left "
                        "matches per right row (distance, then left id) — "
                        "bounds the output at |right|·k instead of all "
                        "qualifying pairs, the entity-resolution default "
                        "shape.  0 emits every pair within maxDistance.",
                        0, ParamValidators.gt_eq(0))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        left, right = inputs
        d = self.get_("maxDistance")
        lid, rid = self.get_("leftIdCol"), self.get_("rightIdCol")
        lc, rc = self.get_("leftCol"), self.get_("rightCol")
        tok1 = (lambda c: F.coalesce(F.split(F.trim(c), r"\s+")
                                     .getItem(0), F.lit("")))
        lbkt = F.floor(F.length(F.col("__ls__")) / d)
        l = left.select(F.col(lid), F.col(lc).alias("__ls__")) \
            .withColumn("__bkt__", lbkt)
        if self.get_("firstTokenBlock"):
            l = l.withColumn("__t1__", tok1(F.col("__ls__")))
        # probe side fans out to the 3 adjacent length buckets so the
        # band |len_l − len_r| ≤ d never crosses more than one boundary
        rbase = right.select(F.col(rid), F.col(rc).alias("__rs__"))
        r = rbase.select(
            "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
            .alias("__off__")).withColumn(
            "__bkt__", F.floor(F.length(F.col("__rs__")) / d)
            + F.col("__off__")).drop("__off__")
        if self.get_("firstTokenBlock"):
            r = r.withColumn("__t1__", tok1(F.col("__rs__")))
        keys = ["__bkt__"] + (["__t1__"]
                              if self.get_("firstTokenBlock") else [])
        cand = l.join(r, keys)
        dist = F.levenshtein(F.col("__ls__"), F.col("__rs__"))
        out = (cand
               .filter(F.abs(F.length("__ls__") - F.length("__rs__")) <= d)
               .withColumn("distance", dist)
               .filter(F.col("distance") <= d)
               .select(lid, rid, "distance"))
        kb = self.get_("keepBest")
        if kb > 0:
            from ..common.dataflow import top_k_per_key
            out = top_k_per_key(out, [rid],
                                [F.asc("distance"), F.asc(lid)], kb,
                                salt_cols=[lid], rank_col="__rk__") \
                .select(lid, rid, "distance")
        return [out]
