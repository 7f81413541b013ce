"""FrequentItemsets — relational Apriori (sizes 1-3) + association rules.

Closes the last named algorithmic boundary next to trees/ALS/tuning
(SURVEY §2.12: "no FPGrowth").  Shallow frequent-itemset mining over
(transaction, items) data — co-purchase baskets, token co-occurrence
sets, tag bundles — done Spark-first as pure relational Apriori
(Agrawal & Srikant 1994), which for bounded itemset size is EXACT,
shuffle-disciplined and SQL-replayable, unlike a ported FP-tree:

- L1 = one explode + groupBy(item); the support threshold is an exact
  rational ceil of ``minSupport·n`` (the RareCategoryCollapser rule).
- L2/L3 candidates come from ONE sorted frequent-item basket array per
  transaction (groupBy(t) + collect_list), with positional i<j(<k)
  combinations exploded in place — the same candidate multiset the
  former 2-/3-way self-joins on the transaction id produced, but the
  corpus is shuffled once instead of once per join side (r09; guide
  §2.4).  Candidate volume is Σ per-basket C(b, 2|3) AFTER infrequent
  items are dropped; ``maxItemsPerTransaction`` fail-fasts pathological
  baskets instead of silently exploding.
- L3 keeps the Apriori prune (both sub-pairs frequent) as semi-joins
  against the frequent-pair relation before counting.
- Association rules (a → b over frequent pairs) carry their integer
  supports; confidence/lift are ratios of those counts.

All supports are exact integer counts — partition-order independent,
and the correctness gate hashes them directly.

``transform(df)`` → ``[itemsets, rules]``:
``itemsets = (items array<string> sorted, size, support)``;
``rules = (antecedent, consequent, support_pair, support_ante,
confidence)``.
"""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import DataFrame, functions as F

from ..api import AlgoOperator
from ..param import (FloatParam, IntParam, ParamValidators, StringParam)


class FrequentItemsets(AlgoOperator):
    transactionCol = StringParam("transactionCol",
                                 "Transaction id column.", "tid")
    itemsCol = StringParam("itemsCol", "Items column (array, or a "
                           "scalar item id per row).", "items")
    minSupport = FloatParam("minSupport", "Minimum itemset support as "
                            "a fraction of transactions.", 0.01,
                            ParamValidators.in_range(
                                0, 1, lower_inclusive=False))
    maxSize = IntParam("maxSize", "Largest itemset size to mine (1-3; "
                       "deeper mining wants PFP-style group mining).",
                       3, ParamValidators.in_range(1, 3))
    maxItemsPerTransaction = IntParam(
        "maxItemsPerTransaction", "Fail fast when a basket exceeds this "
        "many distinct frequent items (candidate volume is C(b, size) "
        "per basket).", 1000, ParamValidators.gt(1))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        spark = df.sparkSession
        tcol, icol = self.get_("transactionCol"), self.get_("itemsCol")
        max_size = int(self.get_("maxSize"))
        items_t = dict(df.dtypes)[icol]
        if items_t.startswith("array"):
            base = df.select(F.col(tcol).alias("t"),
                             F.explode(icol).alias("__it__")) \
                .select("t", F.col("__it__").cast("string").alias("i"))
        else:
            base = df.select(F.col(tcol).alias("t"),
                             F.col(icol).cast("string").alias("i"))
        ti = base.filter(F.col("i").isNotNull()).distinct().persist()
        try:
            n = ti.select("t").distinct().count()
            if n == 0:
                empty_sets = spark.createDataFrame(
                    [], "items array<string>, size int, support long")
                empty_rules = spark.createDataFrame(
                    [], "antecedent string, consequent string, "
                        "support_pair long, support_ante long, "
                        "confidence double")
                return [empty_sets, empty_rules]
            min_cnt = max(1, math.ceil(
                Fraction(str(self.get_("minSupport"))) * n))
            l1 = (ti.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
                  .filter(F.col("c") >= min_cnt).persist())
            sets = l1.select(F.array("i").alias("items"),
                             F.lit(1).alias("size"),
                             F.col("c").cast("long").alias("support"))
            pairs_sup = None
            if max_size >= 2:
                # r09 restructure (guide §2.4 — remove shuffles
                # outright): candidate pairs/triples used to come from
                # 2- and 3-way self-joins of the frequent-item rows on
                # t (each a fresh corpus shuffle per side); a basket is
                # tiny (<= maxItemsPerTransaction by contract), so ONE
                # groupBy(t) builds a sorted frequent-item basket array
                # and combinations explode from it in place — identical
                # candidate multiset (items are distinct and sorted, so
                # positional i<j<k combos == the joins' a.i<b.i<c.i),
                # with the corpus shuffled once instead of 5x.
                # guard BEFORE any basket array exists (ADVICE r09): the
                # size check aggregates counts only — a pathological
                # basket must fail fast without collect_list ever
                # building its whole in-one-row array (executor memory
                # pressure the old post-checkpoint check paid first)
                bask_src = ti.join(l1.select("i"), "i")
                cap = int(self.get_("maxItemsPerTransaction"))
                sizes = bask_src.groupBy("t") \
                    .agg(F.count(F.lit(1)).alias("__n__"))
                if (sizes.agg(F.max("__n__")).first()[0] or 0) > cap:
                    hot = (sizes.filter(F.col("__n__") > cap)
                           .limit(1).collect())[0]
                    raise ValueError(
                        f"FrequentItemsets: transaction {hot['t']!r} has "
                        f"{hot['__n__']} frequent items (> "
                        f"maxItemsPerTransaction={cap}); raise "
                        f"minSupport, trim baskets upstream, or raise "
                        f"the cap")
                bask = (bask_src
                        .groupBy("t")
                        .agg(F.sort_array(F.collect_list("i"))
                             .alias("items"))
                        .localCheckpoint(eager=True))
                pair_combos = F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS x, y AS y))))")
                pairs_sup = (bask
                             .select(F.explode(pair_combos).alias("p"))
                             .select("p.x", "p.y")
                             .groupBy("x", "y")
                             .agg(F.count(F.lit(1)).alias("c"))
                             .filter(F.col("c") >= min_cnt).persist())
                sets = sets.unionByName(pairs_sup.select(
                    F.array("x", "y").alias("items"),
                    F.lit(2).alias("size"),
                    F.col("c").cast("long").alias("support")))
            if max_size >= 3 and pairs_sup is not None:
                tri_combos = F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "flatten(transform(slice(items, i + 2, size(items)),"
                    " (y, j) -> transform("
                    "slice(items, i + j + 3, size(items)), "
                    "z -> struct(x AS x, y AS y, z AS z))))))")
                tri = (bask.select(F.explode(tri_combos).alias("p"))
                       .select("p.x", "p.y", "p.z"))
                fp = pairs_sup.select("x", "y")
                # Apriori prune: every sub-pair must be frequent
                tri = (tri
                       .join(fp, ["x", "y"], "left_semi")
                       .join(fp.select(F.col("x"),
                                       F.col("y").alias("z")),
                             ["x", "z"], "left_semi")
                       .join(fp.select(F.col("x").alias("y"),
                                       F.col("y").alias("z")),
                             ["y", "z"], "left_semi"))
                tri_sup = (tri.groupBy("x", "y", "z")
                           .agg(F.count(F.lit(1)).alias("c"))
                           .filter(F.col("c") >= min_cnt))
                sets = sets.unionByName(tri_sup.select(
                    F.array("x", "y", "z").alias("items"),
                    F.lit(3).alias("size"),
                    F.col("c").cast("long").alias("support")))
            # association rules over frequent pairs, both directions
            if pairs_sup is not None:
                sup1 = l1.withColumnRenamed("c", "ca")
                both = pairs_sup.select(
                    F.col("x").alias("antecedent"),
                    F.col("y").alias("consequent"),
                    F.col("c")).unionByName(pairs_sup.select(
                        F.col("y").alias("antecedent"),
                        F.col("x").alias("consequent"),
                        F.col("c")))
                rules = (both.join(sup1,
                                   both["antecedent"] == sup1["i"])
                         .select("antecedent", "consequent",
                                 F.col("c").cast("long")
                                 .alias("support_pair"),
                                 F.col("ca").cast("long")
                                 .alias("support_ante"),
                                 (F.col("c") / F.col("ca"))
                                 .alias("confidence")))
            else:
                rules = spark.createDataFrame(
                    [], "antecedent string, consequent string, "
                        "support_pair long, support_ante long, "
                        "confidence double")
            sets = sets.localCheckpoint(eager=True)
            rules = rules.localCheckpoint(eager=True)
            for cached in (l1, pairs_sup):
                if cached is not None:
                    cached.unpersist()
            return [sets, rules]
        finally:
            ti.unpersist()
