"""Link-graph quality signals for web-crawl corpora: PageRank.

Crawl-scale pretraining pipelines rank hosts/pages by link centrality to
prioritize fetching and weight sources (the CommonCrawl ecosystem
publishes exactly these rankings; OPIC/PageRank is the classic choice —
Page et al. 1999).  Connected components (``dedup.py``) covers the
clustering half of graph analytics; PageRank covers the ranking half.

Scale design: the rank vector stays DISTRIBUTED (node-sized — billions
of rows for a web graph, never collected).  Each power iteration is
  contribs = edges ⋈ ranks on src  →  groupBy(dst).sum
one shuffle join + one aggregation with map-side combine; out-degrees
are computed once and ride the edge relation.  The only driver values
are two scalars per iteration (dangling mass, node count).  Lineage is
cut with ``localCheckpoint`` per iteration, the iterative-relation rule
every driver-loop operator in this package follows (KMeans, pointer
jumping).  Dangling-node mass is redistributed uniformly, so total rank
is conserved at every step (Σr = 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import AlgoOperator
from ..param import FloatParam, IntParam, ParamValidators, StringParam


class PageRank(AlgoOperator):
    """``transform(edges)`` → ``(node, rank)`` over the distinct-edge
    graph (parallel edges collapse; weighted graphs should pre-aggregate
    into weights and split contributions upstream).

    r⁰(v) = 1/n;  rᵗ⁺¹(v) = (1−d)/n + d·(Σ_{(u,v)∈E} rᵗ(u)/deg(u) + D/n)

    where D is the total rank sitting on dangling (no-out-edge) nodes —
    conserved mass, Σr = 1 exactly at every iteration."""

    srcCol = StringParam("srcCol", "Edge source column.", "src")
    dstCol = StringParam("dstCol", "Edge destination column.", "dst")
    maxIter = IntParam("maxIter", "Power iterations.", 10,
                       ParamValidators.gt(0))
    damping = FloatParam("damping", "Damping factor d.", 0.85,
                         ParamValidators.in_range(0, 1))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        sc_, dc = self.get_("srcCol"), self.get_("dstCol")
        d = self.get_("damping")
        edges = (df.select(F.col(sc_).alias("src"), F.col(dc).alias("dst"))
                 .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
                 .distinct()
                 .localCheckpoint(eager=True))
        nodes = (edges.select(F.col("src").alias("v"))
                 .union(edges.select(F.col("dst").alias("v")))
                 .distinct()
                 .localCheckpoint(eager=True))
        n = nodes.count()
        if n == 0:
            return [df.sparkSession.createDataFrame([], "v long, rank double")]
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        # out-degree rides the edge relation once, not once per iteration
        edeg = (edges.join(deg, "src")
                .select("src", "dst", "deg").localCheckpoint(eager=True))
        dangling = (nodes.join(deg, nodes["v"] == deg["src"], "left_anti")
                    .localCheckpoint(eager=True))
        ranks = nodes.select("v", F.lit(1.0 / n).alias("r"))
        for _ in range(self.get_("maxIter")):
            dang = (dangling.join(ranks, "v")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0))).first()[0])
            contrib = (edeg.join(ranks, edeg["src"] == ranks["v"])
                       .groupBy("dst")
                       .agg(F.sum(F.col("r") / F.col("deg")).alias("m")))
            ranks = (nodes.join(contrib, nodes["v"] == contrib["dst"], "left")
                     .select("v",
                             (F.lit((1.0 - d) / n)
                              + d * (F.coalesce(F.col("m"), F.lit(0.0))
                                     + F.lit(dang / n))).alias("r"))
                     .localCheckpoint(eager=True))
        return [ranks.select("v", F.col("r").alias("rank"))]
