"""FrequentItemsets — relational Apriori (sizes 1-3) + association rules.

Closes the last named algorithmic boundary next to trees/ALS/tuning
(SURVEY §2.12: "no FPGrowth").  Shallow frequent-itemset mining over
(transaction, items) data — co-purchase baskets, token co-occurrence
sets, tag bundles — done Spark-first as pure relational Apriori
(Agrawal & Srikant 1994), which for bounded itemset size is EXACT,
shuffle-disciplined and SQL-replayable, unlike a ported FP-tree:

- L1 = one explode + groupBy(item); the support threshold is an exact
  rational ceil of ``minSupport·n`` (the RareCategoryCollapser rule).
- L2 = self-join of frequent-item transactions on the transaction id
  with ``item_a < item_b`` — candidate volume is Σ per-basket C(b, 2)
  AFTER infrequent items are dropped; ``maxItemsPerTransaction``
  fail-fasts pathological baskets instead of silently exploding.
- L3 = pairs ⋈ items on the transaction id with both sub-pairs
  frequent (the Apriori prune, applied as broadcast semi-joins before
  counting).
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
            # transactions restricted to frequent items
            tf = ti.join(l1.select("i"), "i").persist()
            cap = int(self.get_("maxItemsPerTransaction"))
            hot = (tf.groupBy("t").agg(F.count(F.lit(1)).alias("b"))
                   .filter(F.col("b") > cap).limit(1).collect())
            if hot:
                raise ValueError(
                    f"FrequentItemsets: transaction {hot[0]['t']!r} has "
                    f"{hot[0]['b']} frequent items (> "
                    f"maxItemsPerTransaction={cap}); raise minSupport, "
                    f"trim baskets upstream, or raise the cap")
            sets = l1.select(F.array("i").alias("items"),
                             F.lit(1).alias("size"),
                             F.col("c").cast("long").alias("support"))
            pairs_sup = None
            if max_size >= 2:
                a, b = tf.alias("a"), tf.alias("b")
                pairs = (a.join(b, "t")
                         .filter(F.col("a.i") < F.col("b.i"))
                         .select(F.col("a.i").alias("x"),
                                 F.col("b.i").alias("y")))
                pairs_sup = (pairs.groupBy("x", "y")
                             .agg(F.count(F.lit(1)).alias("c"))
                             .filter(F.col("c") >= min_cnt).persist())
                sets = sets.unionByName(pairs_sup.select(
                    F.array("x", "y").alias("items"),
                    F.lit(2).alias("size"),
                    F.col("c").cast("long").alias("support")))
            if max_size >= 3 and pairs_sup is not None:
                a, b, c3 = tf.alias("a"), tf.alias("b"), tf.alias("c")
                tri = (a.join(b, "t").filter(F.col("a.i") < F.col("b.i"))
                       .join(c3, "t").filter(F.col("b.i") < F.col("c.i"))
                       .select(F.col("a.i").alias("x"),
                               F.col("b.i").alias("y"),
                               F.col("c.i").alias("z")))
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
            for cached in (l1, tf, pairs_sup):
                if cached is not None:
                    cached.unpersist()
            return [sets, rules]
        finally:
            ti.unpersist()
