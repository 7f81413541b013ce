"""Corpus-composition operators: weighted domain-mixture sampling and
token-budget sequence packing.  North-star extension ops (BASELINE.json):
what a training-data pipeline does between "corpus is clean" and "batches
hit the trainer".
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..api import Transformer
from ..param import IntParam, FloatParam, Param, ParamValidators, StringParam

# the same deterministic 31-bit multiplicative hash the corpus-prep
# pipeline's split uses (queries/llmdata_queries.py llm_prep) — linear
# congruential over the id, reproducible in any SQL engine
HASH_MOD = 2147483648


def _unit_hash(idc, salt: int):
    # reduce the id mod 2^31 BEFORE the multiply: (2^31)·2654435761 < 2^63,
    # so the product never overflows int64 in any engine
    return (((F.col(idc) % HASH_MOD) * 2654435761 + F.lit(salt)) % HASH_MOD) \
        / float(HASH_MOD)


class DomainMixtureSampler(Transformer):
    """Per-domain weighted downsampling: keep a row of domain ``d`` with
    probability ``rates[d]`` (``defaultRate`` for unlisted domains), decided
    by a deterministic per-id hash so the sample is reproducible and
    re-runnable (no RNG state).  This is the mixture-reweighting step of a
    training-data pipeline (e.g. upweight curated sources, downsample web
    crawl) expressed as ONE narrow filter — no shuffle, no UDF; the rate
    map rides the plan as a literal CASE over domain values (domains are
    few; unbounded-cardinality domain columns should be bucketed first).
    """

    idCol = StringParam("idCol", "Unique id column.", "id")
    domainCol = StringParam("domainCol", "Domain/source column.", "source")
    rates = Param("rates", "domain -> keep-rate in [0,1].", {})
    defaultRate = FloatParam("defaultRate", "Rate for unlisted domains.", 1.0,
                             ParamValidators.in_range(0, 1))
    salt = IntParam("salt", "Hash salt.", 7)

    def _transform(self, df: DataFrame) -> DataFrame:
        rates: dict[str, float] = self.get_("rates")
        rate = F.lit(float(self.get_("defaultRate")))
        for dom, r in sorted(rates.items()):
            rate = F.when(F.col(self.get_("domainCol")) == dom,
                          F.lit(float(r))).otherwise(rate)
        u = _unit_hash(self.get_("idCol"), self.get_("salt"))
        return df.filter(u < rate)


class SequencePacker(Transformer):
    """Greedy token-budget packing: assign documents to fixed-budget
    training sequences.  Documents are sharded by ``id % numShards``;
    within a shard (ordered by id) a running greedy scan opens a new
    sequence whenever adding the next document would exceed ``budget``
    tokens (an oversized single document occupies its own sequence).
    Output adds ``shard`` and ``seq`` (sequence index within the shard).

    Plan: one hash shuffle on the shard key, then ``applyInPandas`` per
    shard — packing is inherently sequential *within* a sequence stream,
    so the parallelism axis IS the shard count; at 100 TB you run
    thousands of shards and each task does one linear pass.  The
    shard-then-scan shape is the standard distributed packing layout
    (per-worker streams), not a compromise.
    """

    idCol = StringParam("idCol", "Unique id column.", "id")
    tokenCol = StringParam("tokenCol", "Token-count column.", "n_tokens")
    budget = IntParam("budget", "Max tokens per packed sequence.", 2048,
                      ParamValidators.gt(0))
    numShards = IntParam("numShards", "Parallel packing streams.", 8,
                         ParamValidators.gt(0))

    def _transform(self, df: DataFrame) -> DataFrame:
        idc, tcol = self.get_("idCol"), self.get_("tokenCol")
        budget = int(self.get_("budget"))
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        ) + ", shard int, seq int"
        sharded = df.withColumn(
            "shard", (F.col(idc) % self.get_("numShards")).cast("int"))

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(idc, kind="mergesort")
            seqs = []
            cur, fill = 0, 0
            for t in pdf[tcol].astype(int):
                if fill > 0 and fill + t > budget:
                    cur += 1
                    fill = 0
                fill += t
                seqs.append(cur)
            pdf["seq"] = pd.array(seqs, dtype="int32")
            return pdf

        return (sharded.groupBy("shard")
                .applyInPandas(pack, out_schema))
