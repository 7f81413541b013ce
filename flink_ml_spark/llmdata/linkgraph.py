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
    conserved mass, Σr = 1 exactly at every iteration.

    ``transform(edges, seeds)`` (two inputs) switches to PERSONALIZED
    PageRank / TrustRank (Gyöngyi et al. 2004): the uniform teleport 1/n
    becomes t(v) = 1/|S| on the seed set, 0 elsewhere — trust flows out
    from curated seed sites, the standard crawl-quality complement to
    plain centrality.  r⁰ = t; teleport AND dangling mass go to t, so
    Σr = 1 still holds; unreachable nodes rank 0.  ``seeds`` is a
    one-column relation of node ids (extra columns ignored)."""

    srcCol = StringParam("srcCol", "Edge source column.", "src")
    dstCol = StringParam("dstCol", "Edge destination column.", "dst")
    maxIter = IntParam("maxIter", "Power iterations.", 10,
                       ParamValidators.gt(0))
    damping = FloatParam("damping", "Damping factor d.", 0.85,
                         ParamValidators.in_range(0, 1))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        df = inputs[0]
        seeds = inputs[1] if len(inputs) > 1 else None
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
        if seeds is None:
            # uniform teleport: t(v) = 1/n as a literal — no join needed
            nodes_t = nodes.withColumn("t", F.lit(1.0 / n))
        else:
            sv = seeds.select(F.col(seeds.columns[0]).alias("v")).distinct()
            ns = sv.join(nodes, "v", "left_semi").count()
            if ns == 0:
                raise ValueError("PageRank: no seed id appears in the graph")
            nodes_t = (nodes.join(sv.withColumn("t", F.lit(1.0 / ns)),
                                  "v", "left")
                       .select("v", F.coalesce("t", F.lit(0.0)).alias("t")))
        nodes_t = nodes_t.localCheckpoint(eager=True)
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        # out-degree rides the edge relation once, not once per iteration
        edeg = (edges.join(deg, "src")
                .select("src", "dst", "deg").localCheckpoint(eager=True))
        dangling = (nodes.join(deg, nodes["v"] == deg["src"], "left_anti")
                    .localCheckpoint(eager=True))
        ranks = nodes_t.select("v", F.col("t").alias("r"))
        for _ in range(self.get_("maxIter")):
            dang = (dangling.join(ranks, "v")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0))).first()[0])
            contrib = (edeg.join(ranks, edeg["src"] == ranks["v"])
                       .groupBy("dst")
                       .agg(F.sum(F.col("r") / F.col("deg")).alias("m")))
            m_ = F.coalesce(F.col("m"), F.lit(0.0))
            if seeds is None:
                # keep the uniform-teleport expression in its original
                # floating-point form — the oracle replays it term-exactly
                upd = (F.lit((1.0 - d) / n)
                       + d * (m_ + F.lit(dang / n)))
            else:
                upd = ((F.lit(1.0 - d) + F.lit(d * dang)) * F.col("t")
                       + d * m_)
            ranks = (nodes_t.join(contrib,
                                  nodes_t["v"] == contrib["dst"], "left")
                     .select("v", upd.alias("r"))
                     .localCheckpoint(eager=True))
        return [ranks.select("v", F.col("r").alias("rank"))]
