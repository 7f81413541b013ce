"""Deduplication operators for large-scale training-data pipelines.

These are AlgoOperators beyond the reference's own surface (BASELINE.json
north star): exact dedup, MinHash+LSH near-dedup, SimHash, and n-gram
Jaccard.  Join/shuffle plans are pure DataFrame/SQL, built from the same
machinery as MinHashLSH (reference feature/lsh/LSHModel.java:211-276 uses
the identical explode → equi-join → dedup-pairs → distance-filter shape);
per-row signature computation (minhash/simhash) is Arrow-vectorized numpy
— one (tokens × hashes) pass per row.

Scale notes (100 TB): every plan below shuffles on content-derived keys
(hash / band signature), so work distributes by key cardinality; no
driver-side collection anywhere.  The O(n²)-risk step in near-dedup is the
within-bucket pair join — bounded by LSH band width, and skewed buckets
can be salted or capped upstream.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..api import AlgoOperator, Transformer
from ..param import (BoolParam, HasInputCol, HasOutputCol, IntParam,
                     FloatParam, ParamValidators, StringParam)

# deterministic universal-hash family over a 32-bit-ish prime field:
# h_i(x) = (a_i * x + b_i) mod P — same family the reference's MinHash
# uses (feature/lsh/MinHashLSH.java:37, MinHashLSHModelData.java:46).
MINHASH_PRIME = 2038074743


def _hash_family(num: int, seed: int) -> list[tuple[int, int]]:
    # splitmix-style deterministic params; avoids RNG-library dependence so
    # any SQL engine can reproduce them
    params = []
    s = seed & 0xFFFFFFFF
    for _ in range(num):
        s = (s * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        a = (s >> 33) % (MINHASH_PRIME - 1) + 1
        s = (s * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        b = (s >> 33) % MINHASH_PRIME
        params.append((a, b))
    return params


def poly_token_hash(tok: Column) -> Column:
    """Token → int in [0, P): polynomial rolling hash (cross-engine)."""
    ords = F.transform(F.sequence(F.lit(1), F.length(tok)),
                       lambda i: F.ascii(F.substr(tok, i, F.lit(1))))
    return F.aggregate(ords, F.lit(0).cast("long"),
                       lambda acc, o: (acc * 31 + o) % MINHASH_PRIME)


def np_poly_hash(tokens) -> np.ndarray:
    """Vectorized poly hash of a 1-D sequence of strings: pad to a
    codepoint matrix, fold ``h = (h*31 + ord) mod P`` column-wise — one
    numpy pass per character position over the WHOLE batch, zero Python
    per token.  Padding NULs leave h untouched (tokens never contain
    U+0000)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    u = np.asarray(tokens, dtype="U")
    width = u.dtype.itemsize // 4
    if width == 0:  # every token empty
        return np.zeros(n, dtype=np.int64)
    C = u.view(np.uint32).reshape(n, width).astype(np.int64)
    h = np.zeros(n, dtype=np.int64)
    for j in range(width):
        c = C[:, j]
        h = np.where(c == 0, h, (h * 31 + c) % MINHASH_PRIME)
    return h


def flat_tokens(tokens) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a pandas Series of token lists → (flat array, per-row
    lengths, per-row start offsets)."""
    lens = np.fromiter((len(t) if t is not None else 0 for t in tokens),
                       dtype=np.int64, count=len(tokens))
    parts = [np.asarray(t, dtype=object) for t in tokens
             if t is not None and len(t)]
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=object)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return flat, lens, starts


def shingles(text: Column, n: int) -> Column:
    """Word n-gram shingle set of lowercased text (zip_with over shifted
    slices — the per-position slice+join form is ~8× slower, see NGram)."""
    toks = F.array_remove(F.split(F.lower(text), r"\s"), "")
    m = F.size(toks) - n + 1
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, j + 1, m),
                         lambda a, b: F.concat_ws(" ", a, b))
    grams = F.when(F.size(toks) >= n, acc) \
        .otherwise(F.array(F.array_join(toks, " ")))
    return F.array_distinct(grams)


def token_indices_udf(space: int):
    """text → sorted distinct array<int> of token poly-hashes mod ``space``
    (Arrow UDF; safe to feed into other Python UDFs — higher-order lambda
    expressions cannot appear in a Python UDF argument)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def idxs(texts):
        import pandas as pd
        tok_lists = [(txt or "").lower().split() for txt in texts]
        flat, lens, starts = flat_tokens(tok_lists)
        # ONE vectorized (tokens) numpy pass — np_poly_hash replaces the
        # per-token Python loop
        h = np_poly_hash(flat) % space
        out = [sorted(set(h[s:s + n].tolist()))
               for s, n in zip(starts, lens)]
        return pd.Series(out)

    return idxs


class ExactDeduplicator(Transformer, HasInputCol):
    """Exact dedup: keep one row per distinct value of ``inputCol``
    (winner = smallest ``idCol``).  Plan: groupBy over a fixed-width
    content digest (sha2-256, collision-free in practice) + min(id) +
    semi-join — ONE hash-shuffle whose key is 32 bytes regardless of
    document length, so shuffle volume at 100 TB is rows × 32B, never the
    corpus itself."""

    idCol = StringParam("idCol", "Unique id column.", "id")

    def _transform(self, df: DataFrame) -> DataFrame:
        content, idc = self.get_("inputCol"), self.get_("idCol")
        key = F.sha2(F.col(content).cast("string"), 256)
        with_key = df.withColumn("__exact_key__", key)
        keep = with_key.groupBy("__exact_key__").agg(F.min(idc).alias(idc))
        return (with_key.join(keep, ["__exact_key__", idc], "left_semi")
                .drop("__exact_key__"))


class LineDeduplicator(Transformer, HasInputCol, HasOutputCol):
    """C4-style corpus-wide exact LINE dedup (public literature: Raffel
    et al. 2020 §2.2 — "we discarded all but one of any three-sentence
    span occurring more than once", here at line granularity): a line is
    kept only at its first global occurrence (smallest ``(idCol, line
    position)``), every later copy is dropped, and documents are
    reassembled from their surviving lines in order.

    Plan: posexplode lines → the first occurrence per 32-byte line
    digest via ``groupBy(digest).min(struct(id, pos))`` — an AGGREGATE,
    not a window, so a hot line duplicated across millions of documents
    partial-combines map-side instead of sorting every copy in one
    window partition — then a semi-join keeps the winners and documents
    re-aggregate their surviving lines by position (one shuffle keyed on
    the id).  Shuffle volume is the corpus once plus digests — the
    minimum for an operator that must rewrite document text.
    ``minLineChars`` exempts short lines (blank lines, separators) from
    deduplication so formatting survives; they bypass the digest shuffle
    entirely.

    ``separator`` generalizes the dedup granularity: "\\n" (default) =
    lines, "\\n\\n" = paragraphs — the same first-global-occurrence rule
    at whatever unit the corpus is segmented into.
    """

    idCol = StringParam("idCol", "Unique id column.", "id")
    minLineChars = IntParam(
        "minLineChars", "Lines shorter than this are always kept.", 10)
    separator = StringParam(
        "separator", "LITERAL segment separator: \\n = lines, \\n\\n = "
        "paragraphs.  Quoted for the split so regex metacharacters are "
        "safe and the split/rejoin round-trips.", "\n")

    def _transform(self, df: DataFrame) -> DataFrame:
        content, idc = self.get_("inputCol"), self.get_("idCol")
        min_chars = int(self.get_("minLineChars"))
        sep = self.get_("separator")
        out_col = self.get_("outputCol")
        # \Q...\E quotes the separator for the Java regex engine, so a
        # metachar-bearing separator (e.g. '|') splits literally instead
        # of corrupting every document
        lines = df.select(
            idc,
            F.posexplode(F.split(F.col(content), "\\Q" + sep + "\\E"))
            .alias("__pos", "__ln"))
        short = lines.where(F.length("__ln") < min_chars)
        longl = (lines.where(F.length("__ln") >= min_chars)
                 .withColumn("__d", F.sha2(F.col("__ln"), 256)))
        winners = (longl.groupBy("__d")
                   .agg(F.min(F.struct(F.col(idc).alias("i"),
                                       F.col("__pos").alias("p")))
                        .alias("w"))
                   .select("__d", F.col("w.i").alias(idc),
                           F.col("w.p").alias("__pos")))
        survivors = (longl.join(winners, ["__d", idc, "__pos"], "left_semi")
                     .drop("__d")
                     .unionByName(short))
        agg = (survivors.groupBy(idc)
               .agg(F.concat_ws(
                   sep, F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("__pos"), F.col("__ln")))),
                       lambda s: s["__ln"])).alias(out_col)))
        # documents whose every line was deduplicated away survive as ""
        return (df.join(agg, idc, "left")
                .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(""))))


class MinHashSignature(Transformer, HasInputCol, HasOutputCol):
    """tokens → minhash signature array<long> of ``numHashes``; the
    shingle→minhash step of the dedup pipeline.  Pure expressions: the
    hash family is folded into the plan as literals.

    ``inputIsTokens=True`` takes RAW token arrays instead of shingle
    strings and hashes the ``shingleSize``-gram windows compositionally
    (``np_shingle_hashes``) — same signatures, but the shingle strings
    (≈3× the token bytes) never materialize in the plan or cross Arrow;
    this is the production path for corpus-scale dedup."""

    numHashes = IntParam("numHashes", "Signature length.", 32, ParamValidators.gt(0))
    seed = IntParam("seed", "Hash family seed.", 42)
    inputIsTokens = BoolParam(
        "inputIsTokens", "Input column holds raw tokens (shingle hashes "
        "computed compositionally) instead of shingle strings.", False)
    shingleSize = IntParam("shingleSize", "Words per shingle (only with "
                           "inputIsTokens).", 3, ParamValidators.gt(0))

    def _transform(self, df: DataFrame) -> DataFrame:
        # vectorized Arrow UDF: token hashes are computed ONCE per row and
        # all hash functions applied as one (tokens × hashes) numpy matmul-
        # style pass.  (A pure-expression plan re-evaluates the per-char
        # token hash fold per hash function — no CSE across higher-order
        # lambdas — which is numHashes× the work.)  int64-safe: a, h < 2^31.
        from pyspark.sql.functions import pandas_udf
        fam = _hash_family(self.get_("numHashes"), self.get_("seed"))
        A = np.array([a for a, _ in fam], dtype=np.int64)[None, :]
        B = np.array([b for _, b in fam], dtype=np.int64)[None, :]
        empty_sig = list(((0 * A + B) % MINHASH_PRIME)[0])

        empty_row = np.array(empty_sig, dtype=np.int64)
        from_tokens = bool(self.get_("inputIsTokens"))
        gram_n = int(self.get_("shingleSize"))

        @pandas_udf("array<long>")
        def signature(tokens):
            import pandas as pd
            if from_tokens:
                rows = np_shingle_hashes(tokens, gram_n)
                hs = np.concatenate(rows) if rows else \
                    np.empty(0, dtype=np.int64)
                lens = np.fromiter((len(r) for r in rows), dtype=np.int64,
                                   count=len(rows))
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            else:
                flat, lens, starts = flat_tokens(tokens)
                hs = None
            n = len(lens)
            sigs = np.tile(empty_row, (n, 1))
            nonempty = lens > 0
            if nonempty.any():
                if hs is None:
                    hs = np_poly_hash(flat)
                M = (hs[:, None] * A + B) % MINHASH_PRIME  # (T, k)
                # zero-length rows contribute no elements, so reduceat over
                # the nonempty rows' starts yields exactly one segment per
                # nonempty row
                sigs[nonempty] = np.minimum.reduceat(M, starts[nonempty],
                                                     axis=0)
            return pd.Series(list(sigs))

        return df.withColumn(self.get_("outputCol"),
                             signature(F.col(self.get_("inputCol"))))

    def transform_local(self, pdf):
        import pandas as pd
        fam = _hash_family(self.get_("numHashes"), self.get_("seed"))
        A = np.array([a for a, _ in fam], dtype=np.int64)[None, :]
        B = np.array([b for _, b in fam], dtype=np.int64)[None, :]
        empty_sig = list(((0 * A + B) % MINHASH_PRIME)[0])
        rows = []
        for toks in pdf[self.get_("inputCol")]:
            if toks is None or not len(toks):
                rows.append(list(empty_sig))
                continue
            hs = np_poly_hash(list(toks))
            M = (hs[:, None] * A + B) % MINHASH_PRIME
            rows.append([int(x) for x in M.min(axis=0)])
        out = pdf.copy()
        out[self.get_("outputCol")] = rows
        return out


class ContaminationScorer(AlgoOperator):
    """Graded benchmark decontamination: instead of Decontaminator's
    binary any-overlap gate, score every training document by the
    FRACTION of its distinct word n-grams that appear anywhere in the
    benchmark corpus — the graded form large-scale pipelines use to set
    partial-contamination cutoffs (public literature: Chowdhery et al.
    2022 §8, seeing >70% of 8-grams marks a document contaminated).

    ``transform(train, bench)`` -> ``[(idCol, n_grams, n_matched,
    overlap)]`` with one row per training document; ``overlap`` =
    n_matched / n_grams (0.0 for gramless documents).  Thresholding is
    the caller's policy; ``Decontaminator`` remains the binary split.

    Plan: identical digest machinery to Decontaminator — grams travel as
    (id, 32-byte sha2), the (tiny, pre-aggregated) benchmark gram
    relation reaches the join broadcast-ready, and the per-doc counts
    are one map-side-combining aggregation keyed on the id.
    """

    idCol = StringParam("idCol", "Unique id column (train side).", "id")
    textCol = StringParam("textCol", "Text column (train side).", "text")
    benchmarkTextCol = StringParam(
        "benchmarkTextCol", "Text column on the benchmark table "
        "(None = same as textCol).", None)
    shingleSize = IntParam("shingleSize", "Words per overlap n-gram.", 8,
                           ParamValidators.gt(0))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        train, bench = inputs
        idc, n = self.get_("idCol"), self.get_("shingleSize")
        bcol = self.get_("benchmarkTextCol") or self.get_("textCol")
        digest = lambda c: F.sha2(c, 256)  # noqa: E731 — fixed-width key
        bench_grams = (bench.select(
            F.explode(shingles(F.col(bcol), n)).alias("g"))
            .select(digest(F.col("g")).alias("gd")).distinct()
            .withColumn("__hit__", F.lit(1)))
        tg = (train.select(
            F.col(idc).alias("__id__"),
            F.explode(shingles(F.col(self.get_("textCol")), n)).alias("g"))
            .filter(F.col("g").isNotNull())  # NULL text -> one null gram
            .select("__id__", digest(F.col("g")).alias("gd")))
        stats = (tg.join(bench_grams, "gd", "left")
                 .groupBy("__id__")
                 .agg(F.count("*").alias("n_grams"),
                      F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
                      .alias("n_matched")))
        out = (train.select(idc)
               .join(stats.withColumnRenamed("__id__", idc), idc, "left"))
        n_g = F.coalesce(F.col("n_grams"), F.lit(0)).cast("int")
        n_m = F.coalesce(F.col("n_matched"), F.lit(0)).cast("int")
        overlap = F.when(n_g > 0, n_m.cast("double") / n_g.cast("double")) \
            .otherwise(F.lit(0.0))
        return [out.select(idc, n_g.alias("n_grams"), n_m.alias("n_matched"),
                           overlap.alias("overlap"))]


def band_keys(sig_df: DataFrame, n_hashes: int, band: int) -> DataFrame:
    """(id, sig) -> (id, band, bsig): one row per LSH band, the band's
    signature slice rendered as a single string join key.  Shared by the
    batch self-join and the incremental store join so the bucketing can
    never drift between them."""
    n_bands = n_hashes // band
    return sig_df.select(
        "id",
        F.posexplode(F.array(*[
            F.array_join(F.slice("sig", b * band + 1, band), "_")
            for b in range(n_bands)])).alias("band", "bsig"))


def blocked_self_pairs(rel: DataFrame, key_cols: list[str],
                       num_blocks: int) -> DataFrame:
    """All intra-bucket id pairs of ``rel`` (id, *key_cols) via the
    blocked (triangle) self-join: row → hash block blk ∈ [0, S); the
    unordered block pair (b1 ≤ b2) joins block-b1 rows against block-b2
    rows, so every id pair appears in exactly one join group (twice for
    b1 = b2, folded by the caller's dropDuplicates) and no single task
    materializes a whole hot bucket — a df-D bucket's D² candidate work
    spreads over S(S+1)/2 join groups at ~S× replication of its rows.
    Shared by the skew-safe hot-bucket strategies of
    MinHashLSHDeduplicator and EmbeddingCosineDeduplicator."""
    S = int(num_blocks)
    rel = rel.withColumn("blk", F.pmod(F.hash("id"), F.lit(S)).cast("int"))
    left = rel.select(
        F.col("id").alias("id_a"), *key_cols,
        F.col("blk").alias("b1"),
        F.explode(F.sequence(F.col("blk"), F.lit(S - 1))).alias("b2"))
    right = rel.select(
        F.col("id").alias("id_b"), *key_cols,
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("b1"),
        F.col("blk").alias("b2"))
    return (left.join(right, [*key_cols, "b1", "b2"])
            .filter(F.col("id_a") != F.col("id_b"))
            .select(F.least("id_a", "id_b").alias("id_a"),
                    F.greatest("id_a", "id_b").alias("id_b")))


class MinHashLSHDeduplicator(AlgoOperator):
    """Near-dup detection: shingle → minhash → band → bucket-join.

    transform(df) -> [pairs] where pairs = (id_a, id_b, jaccard) for
    candidate pairs sharing ≥1 LSH band whose exact shingle-Jaccard ≥
    ``threshold``.  id_a < id_b, deduped.  Mirrors the reference's
    approxSimilarityJoin plan shape (LSHModel.java:211-276): explode band
    signatures → equi-join on (band, sig) → dropDuplicates → filter.

    The band explode and equi-join carry ids ONLY; the (large) shingle
    sets are joined back by id after the pair dedup for the exact-Jaccard
    filter, so shuffle volume through the ×n_bands explode is a few longs
    per row, never the document shingles (the reference likewise dedups
    pairs first and computes distance after).
    """

    idCol = StringParam("idCol", "Unique id column.", "id")
    textCol = StringParam("textCol", "Text column.", "text")
    shingleSize = IntParam("shingleSize", "Words per shingle.", 3, ParamValidators.gt(0))
    numHashes = IntParam("numHashes", "Total minhash functions.", 32, ParamValidators.gt(0))
    bandSize = IntParam("bandSize", "Hashes per LSH band.", 4, ParamValidators.gt(0))
    threshold = FloatParam("threshold", "Jaccard similarity threshold.", 0.7,
                           ParamValidators.in_range(0, 1))
    seed = IntParam("seed", "Hash family seed.", 42)
    maxBandDocFreq = IntParam(
        "maxBandDocFreq",
        "LSH buckets whose document frequency exceeds this cap are handled "
        "by hotBucketStrategy instead of the plain self-join (None = no "
        "special handling).  A df-D bucket alone contributes D² candidate "
        "rows, so one degenerate bucket (e.g. every empty or boilerplate "
        "doc sharing a band signature) turns the join quadratic.", None)
    hotBucketStrategy = StringParam(
        "hotBucketStrategy",
        "'drop': exclude over-cap buckets from the join entirely — capped "
        "docs keep their other bands, so near-dup pairs still surface "
        "through any non-degenerate band (the recall trade of "
        "NGramJaccardDeduplicator.maxShingleDocFreq).  'block': keep them "
        "but generate their pairs with a blocked self-join — rows split "
        "into numBlocks hash blocks and the join key extends to the block "
        "pair, so a df-D bucket spreads its D² work over "
        "numBlocks(numBlocks+1)/2 join groups instead of ONE task; exact "
        "recall at ~numBlocks× replication of hot rows only.", "drop",
        ParamValidators.in_array(["drop", "block"]))
    numBlocks = IntParam(
        "numBlocks", "Block count for hotBucketStrategy='block' (size to "
        "~sqrt(expected hot df / target rows-per-task)).", 16,
        ParamValidators.gt(0))

    def _blocked_self_pairs(self, hot: DataFrame) -> DataFrame:
        return blocked_self_pairs(hot, ["band", "bsig"],
                                  int(self.get_("numBlocks")))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        idc = self.get_("idCol")
        n_hashes, band = self.get_("numHashes"), self.get_("bandSize")

        # signatures straight from the token arrays (compositional
        # shingle hashing): the shingle STRINGS — ~3x the token bytes,
        # built by an interpreted zip_with fold and shipped whole through
        # Arrow — never materialize corpus-wide; they are only computed
        # later for the candidate-sized verification set
        toks = df.select(
            F.col(idc).alias("id"),
            F.array_remove(F.split(F.lower(F.col(self.get_("textCol"))),
                                   r"\s"), "").alias("__toks__"))
        sig = MinHashSignature(inputCol="__toks__", outputCol="sig",
                               numHashes=n_hashes, seed=self.get_("seed"),
                               inputIsTokens=True,
                               shingleSize=self.get_("shingleSize")) \
            .transform(toks)[0]
        # materialize (id, sig) once — numHashes longs/row — so the band
        # self-join doesn't run tokenizing + the signature UDF twice (no
        # CSE across a self-join)
        sig = sig.select("id", "sig").localCheckpoint(eager=True)
        bands = band_keys(sig, n_hashes, band)
        cap = self.get_("maxBandDocFreq")
        hot_pairs = None
        if cap is not None:
            # the hot-key relation is tiny (over-cap buckets only) and
            # feeds two branch joins — materialize it once
            hot_keys = (bands.groupBy("band", "bsig")
                        .agg(F.count("*").alias("__df__"))
                        .filter(F.col("__df__") > cap).select("band", "bsig")
                        .localCheckpoint(eager=True))
            if self.get_("hotBucketStrategy") == "block":
                hot_pairs = self._blocked_self_pairs(
                    bands.join(hot_keys, ["band", "bsig"], "left_semi"))
            bands = bands.join(hot_keys, ["band", "bsig"], "left_anti")
        left = bands.select(F.col("id").alias("id_a"), "band", "bsig")
        right = bands.select(F.col("id").alias("id_b"), "band", "bsig")
        pairs = (left.join(right, ["band", "bsig"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b"))
        if hot_pairs is not None:
            pairs = pairs.unionByName(hot_pairs)
        # ids-only (16 bytes/row), candidate-bounded; materialized once
        # because it feeds BOTH the candidate-id semi-join and the final
        # verification join — without this the band self-join runs twice
        pairs = pairs.dropDuplicates(["id_a", "id_b"]) \
            .localCheckpoint(eager=True)
        # shingles rejoin by id AFTER the dedup — and only for CANDIDATE
        # documents: shingling is per-token expression work and the
        # arrays are wide, so re-deriving `base` corpus-wide on both join
        # sides (no CSE across joins) evaluated + shuffled the full
        # corpus's shingles twice — measured 95s -> 27s at 500k docs.
        # Semi-join the candidate ids first, shingle once, checkpoint the
        # candidate-sized relation, and feed both sides from it.
        cand_ids = (pairs.select(F.col("id_a").alias("id"))
                    .unionByName(pairs.select(F.col("id_b").alias("id")))
                    .distinct())
        # semi-join the RAW docs first, then shingle — written explicitly
        # rather than trusting the optimizer to push the semi-join below
        # the shingle projection (measured: it doesn't, and re-shingled
        # the full corpus)
        cand_docs = (df.select(F.col(idc).alias("id"),
                               F.col(self.get_("textCol")).alias("__t__"))
                     .join(cand_ids, "id", "left_semi"))
        cand_sh = (cand_docs.select(
            "id", shingles(F.col("__t__"),
                           self.get_("shingleSize")).alias("sh"))
            .localCheckpoint(eager=True))
        pairs = (pairs
                 .join(cand_sh.select(F.col("id").alias("id_a"),
                                      F.col("sh").alias("sh_a")), "id_a")
                 .join(cand_sh.select(F.col("id").alias("id_b"),
                                      F.col("sh").alias("sh_b")), "id_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        jacc = F.when(union > 0, inter / union).otherwise(0.0)
        out = (pairs.withColumn("jaccard", jacc)
               .filter(F.col("jaccard") >= self.get_("threshold"))
               .select("id_a", "id_b", "jaccard"))
        return [out]


class ConnectedComponents(AlgoOperator):
    """Transitive closure over near-dup pairs → duplicate-cluster labels.

    ``transform(pairs)`` -> ``[(id, component)]`` with one row per
    distinct node in the pair relation; ``component`` is the smallest id
    reachable through the pair graph, so every member of a duplicate
    cluster gets the same label and the label itself is the natural
    surviving representative (keep ``id == component``).

    Plan: iterative min-label propagation with pointer jumping, a driver
    loop like KMeans / the reference's iteration bodies.  Per round each
    node takes ``min(own label, neighbours' labels)`` (one labels⋈edges
    join + one ``groupBy`` min over the edge destination, both shuffles
    keyed on node id with map-side combine), then follows its new label
    one step through the label table (``comp ← comp(comp)``, pointer
    jumping), which halves label-chain depth every round — a diameter-d
    component converges in O(log d) rounds instead of d.  The loop stops
    when a round changes nothing; each round's label table is
    ``localCheckpoint``-ed, truncating the logical plan so the lineage
    never compounds across rounds.

    100 TB notes: labels and edges distribute by id hash; per-round
    driver traffic is ONE aggregated counter (the changed-label count) —
    no node data ever reaches the driver.  A hot node (one document
    near-dup to millions) bounds its own work by degree, the same skew
    AQE's skew-join split handles; labels only ever decrease, so
    convergence is monotone and the fixpoint is exactly the per-component
    minimum.
    """

    srcCol = StringParam("srcCol", "Pair source id column.", "id_a")
    dstCol = StringParam("dstCol", "Pair destination id column.", "id_b")
    maxIter = IntParam("maxIter", "Max propagation rounds.", 50,
                       ParamValidators.gt(0))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (pairs,) = inputs
        a, b = self.get_("srcCol"), self.get_("dstCol")
        # symmetric closure once, cached for every round
        fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        edges = (fwd.union(pairs.select(F.col(b).alias("src"),
                                        F.col(a).alias("dst")))
                 .distinct().persist())
        labels = (edges.select(F.col("src").alias("id"))
                  .distinct()
                  .withColumn("comp", F.col("id"))
                  .localCheckpoint(eager=True))
        try:
            for _ in range(self.get_("maxIter")):
                cand = (edges.join(labels.withColumnRenamed("id", "src"), "src")
                        .groupBy(F.col("dst").alias("id"))
                        .agg(F.min("comp").alias("cand")))
                m = (labels.join(cand, "id", "left")
                     .select("id", "comp",
                             F.least("comp", F.coalesce("cand", "comp"))
                             .alias("m")))
                # pointer jump: comp(v) ← comp(comp(v)) — the label table
                # looked up at the freshly-computed label
                lookup = m.select(F.col("id").alias("jid"),
                                  F.col("m").alias("jm"))
                upd = (m.withColumn("jid", F.col("m"))
                       .join(lookup, "jid", "left")
                       .select("id", "comp",
                               F.least("m", F.coalesce("jm", "m"))
                               .alias("new_comp")))
                # one checkpoint materializes the round and truncates lineage
                upd = upd.localCheckpoint(eager=True)
                changed = upd.filter(F.col("new_comp") < F.col("comp")).count()
                labels = upd.select("id", F.col("new_comp").alias("comp"))
                if changed == 0:
                    break
            return [labels.select("id", F.col("comp").alias("component"))]
        finally:
            edges.unpersist()


class SimHashDeduplicator(AlgoOperator):
    """SimHash near-dup: ``bits``-wide fingerprint from token hashes; pairs
    whose hamming distance ≤ ``maxDistance``.  Candidate generation splits
    the fingerprint into disjoint bit pieces and joins on (piece index,
    piece value).  By pigeonhole, recall is EXACT iff the piece count is
    ≥ maxDistance + 1 — the default (``numPieces=None``) derives exactly
    that, so small-distance dedup (the production setting) never misses a
    pair.  Setting ``numPieces`` below maxDistance + 1 is an explicit
    approximation: only pairs agreeing on some one of the pieces are
    candidates (recall guaranteed for hamming ≤ numPieces - 1, best-effort
    beyond) — the standard knob when a large maxDistance would otherwise
    force bit-width pieces and a near-quadratic candidate join.  bits ≤ 60
    so the fingerprint fits a signed 64-bit integer."""

    idCol = StringParam("idCol", "Unique id column.", "id")
    textCol = StringParam("textCol", "Text column.", "text")
    bits = IntParam("bits", "Fingerprint width (<=60).", 48,
                    ParamValidators.in_range(4, 60))
    maxDistance = IntParam("maxDistance", "Max hamming distance.", 3,
                           ParamValidators.in_range(0, 59))
    numPieces = IntParam(
        "numPieces",
        "Candidate pieces; None derives maxDistance + 1 (exact recall); "
        "smaller values trade recall beyond numPieces - 1 for a cheaper "
        "candidate join.", None,
        # None = derive; an explicit value must be positive (0 or a
        # negative would silently produce zero candidate rows)
        lambda v: v is None or v > 0)
    maxPieceDocFreq = IntParam(
        "maxPieceDocFreq",
        "(piece, value) buckets over this document frequency are handled "
        "by hotPieceStrategy instead of the plain self-join (None = no "
        "special handling) — a df-D bucket alone contributes D² candidate "
        "rows; with fixed piece width (≤ bits/pieces ≤ 15 bits → ≤ 32768 "
        "bucket values) mean bucket df grows LINEARLY with corpus size, "
        "so at scale the cap is what keeps the candidate join linear.",
        None)
    hotPieceStrategy = StringParam(
        "hotPieceStrategy",
        "'drop': exclude over-cap buckets (pairs may still surface "
        "through another piece); 'block': blocked self-join spreads the "
        "hot bucket's pair generation over block-pair join groups — "
        "exact recall, ~numBlocks× replication of hot rows.", "drop",
        ParamValidators.in_array(["drop", "block"]))
    numBlocks = IntParam("numBlocks",
                         "Block count for hotPieceStrategy='block'.", 16,
                         ParamValidators.gt(0))
    seed = IntParam("seed", "Per-bit hash-family seed.", 7)

    def fingerprint(self, text: Column) -> Column:
        # bit b weight = Σ_tok (bit_b(tok) ? 1 : -1) with bit_b(tok) =
        # parity((a_b·h(tok) + b_b) mod P) — one random affine hash PER
        # BIT from the same family MinHash uses.  A small odd multiplier
        # (the first design, (h·(2b+1) mod P) mod 2) barely wraps for
        # short tokens, so parity(h·odd) == parity(h) and every bit
        # collapses to bit 0 (measured popcount σ ≈ 13 vs 3.5 for
        # independent bits; fingerprints degenerated to {0, 2^bits−1} and
        # the candidate join went quadratic).  a_b ~ U[1, P) wraps the
        # product thousands of times, decorrelating bits pairwise.  One
        # vectorized (tokens × bits) pass per row in an Arrow UDF.
        from pyspark.sql.functions import pandas_udf
        bits = self.get_("bits")
        ab = _hash_family(bits, int(self.get_("seed")))
        A = np.array([a for a, _ in ab], dtype=np.int64)[None, :]
        B = np.array([b for _, b in ab], dtype=np.int64)[None, :]
        weights = np.array([1 << b for b in range(bits)], dtype=np.int64)

        @pandas_udf("long")
        def simhash(texts):
            import pandas as pd
            toks_per_row = texts.fillna("").str.lower().str.split()
            flat, lens, starts = flat_tokens(toks_per_row)
            n = len(lens)
            fp = np.zeros(n, dtype=np.int64)
            nonempty = lens > 0
            if nonempty.any():
                hs = np_poly_hash(flat)
                pm = ((hs[:, None] * A + B) % MINHASH_PRIME) % 2  # (T, bits)
                contrib = (2 * pm - 1).astype(np.int64)
                bsum = np.add.reduceat(contrib, starts[nonempty], axis=0)
                fp[nonempty] = (bsum > 0).astype(np.int64) @ weights
            return pd.Series(fp)

        return simhash(text)

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        idc = self.get_("idCol")
        fp = df.select(F.col(idc).alias("id"),
                       self.fingerprint(F.col(self.get_("textCol"))).alias("fp"))
        # materialize the (id, fp) relation once — 16 bytes/row — so the
        # self-join below doesn't run the fingerprint UDF over the corpus
        # twice (no CSE across a self-join)
        fp = fp.localCheckpoint(eager=True)
        # pigeonhole pieces: hamming ≤ pieces-1 ⇒ some one of the disjoint
        # bit pieces identical (widths differ by at most 1 when pieces ∤
        # bits); pieces defaults to maxDistance+1 = exact recall
        bits, d = self.get_("bits"), int(self.get_("maxDistance"))
        np_ = self.get_("numPieces")
        pieces = int(np_) if np_ is not None else d + 1
        if pieces > bits:
            raise ValueError(
                f"{pieces} candidate pieces (maxDistance={d}) but the "
                f"fingerprint is only {bits} bits wide")
        base, rem = divmod(bits, pieces)
        widths = [base + 1 if q < rem else base for q in range(pieces)]
        offsets = [sum(widths[:q]) for q in range(pieces)]
        quarters = fp.select(
            "id", "fp",
            F.posexplode(F.array(*[
                F.shiftrightunsigned(F.col("fp"), offsets[q])
                .bitwiseAND(F.lit((1 << widths[q]) - 1))
                for q in range(pieces)])).alias("q", "qv"))
        ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        cap = self.get_("maxPieceDocFreq")
        hot_cand = None
        if cap is not None:
            hot_keys = (quarters.groupBy("q", "qv")
                        .agg(F.count("*").alias("__df__"))
                        .filter(F.col("__df__") > int(cap)).select("q", "qv")
                        .localCheckpoint(eager=True))
            if self.get_("hotPieceStrategy") == "block":
                # ids-only blocked pairs; fingerprints join back by id
                # (16-byte rows against the checkpointed fp relation)
                hc = blocked_self_pairs(
                    quarters.join(hot_keys, ["q", "qv"], "left_semi"),
                    ["q", "qv"], int(self.get_("numBlocks")))
                hot_cand = (hc
                            .join(fp.select(F.col("id").alias("id_a"),
                                            F.col("fp").alias("fp_a")), "id_a")
                            .join(fp.select(F.col("id").alias("id_b"),
                                            F.col("fp").alias("fp_b")), "id_b")
                            .filter(ham <= self.get_("maxDistance"))
                            .select("id_a", "id_b", ham.alias("hamming")))
            quarters = quarters.join(hot_keys, ["q", "qv"], "left_anti")
        a = quarters.select(F.col("id").alias("id_a"), F.col("fp").alias("fp_a"), "q", "qv")
        b = quarters.select(F.col("id").alias("id_b"), F.col("fp").alias("fp_b"), "q", "qv")
        # the hamming gate runs INSIDE the candidate join (codegen xor +
        # popcount on columns the join already carries), so the pair-dedup
        # exchange shuffles match-count rows, not candidate-count rows —
        # at 500k docs with 12-bit pieces that is ~50k rows vs ~240M
        pairs = (a.join(b, ["q", "qv"])
                 .filter((F.col("id_a") < F.col("id_b"))
                         & (ham <= self.get_("maxDistance")))
                 .select("id_a", "id_b", ham.alias("hamming")))
        if hot_cand is not None:
            pairs = pairs.unionByName(hot_cand)
        return [pairs.dropDuplicates(["id_a", "id_b"])]


class NGramJaccardDeduplicator(AlgoOperator):
    """Exact all-pairs n-gram Jaccard above a threshold via token-postings
    join (inverted index): explode distinct shingles → self-join on shingle
    → count shared / sizes.  Distributes by shingle key.

    ``maxShingleDocFreq`` is the 100 TB hot-shingle guard: shingles whose
    document frequency exceeds the cap are dropped from the INDEX before
    the self-join (a df-D shingle alone contributes D² join rows).  The
    intersection then undercounts by at most the capped shingles, making
    the reported jaccard a LOWER BOUND — near-dup pairs, which share many
    rare shingles, still surface; this is the standard prefix/df-filter
    trade.  ``None`` (default) keeps exact semantics."""

    idCol = StringParam("idCol", "Unique id column.", "id")
    textCol = StringParam("textCol", "Text column.", "text")
    shingleSize = IntParam("shingleSize", "Words per shingle.", 3)
    threshold = FloatParam("threshold", "Jaccard threshold.", 0.5)
    maxShingleDocFreq = IntParam(
        "maxShingleDocFreq",
        "Drop shingles with document frequency above this from the index "
        "(None = exact).", None)

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        idc = self.get_("idCol")
        sh = df.select(
            F.col(idc).alias("id"),
            shingles(F.col(self.get_("textCol")), self.get_("shingleSize")).alias("sh"))
        sizes = sh.select("id", F.size("sh").alias("n"))
        postings = sh.select("id", F.explode("sh").alias("g"))
        max_df = self.get_("maxShingleDocFreq")
        if max_df is not None:
            keep = (postings.groupBy("g").agg(F.count("*").alias("__df__"))
                    .filter(F.col("__df__") <= max_df).select("g"))
            postings = postings.join(keep, "g", "left_semi")
        shared = (postings.alias("a")
                  .join(postings.alias("b"), "g")
                  .filter(F.col("a.id") < F.col("b.id"))
                  .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
                  .agg(F.count("*").alias("inter")))
        out = (shared
               .join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
               .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
               .withColumn("jaccard",
                           F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
               .filter(F.col("jaccard") >= self.get_("threshold"))
               .select("id_a", "id_b", "jaccard"))
        return [out]


# multiplier for combining per-token hashes into a window hash (distinct
# from the 31 used inside the per-token char hash so "ab c" vs "a bc"
# collide only by chance)
SPAN_MULT = 100003


def np_shingle_hashes(tokens, n: int):
    """Per-row word-n-gram shingle HASHES straight from token arrays —
    no shingle strings ever materialize.  The char-level poly fold is
    compositional, h(x ∥ y) = (h(x)·31^len(y) + h(y)) mod P, so the hash
    of "t1 t2 ... tn" assembles from per-token hashes and lengths:
    acc ← (acc·31^(1+len_j) + 32·31^len_j + h_j) mod P per joined token
    (32 = ord(' ')).  Bit-identical to np_poly_hash over the shingle
    strings (property-tested); skipping the string build-and-Arrow-ship
    is the point — the strings are ~3x the bytes of the tokens and were
    the dominant cost of the signature stage at 500k docs.  Rows with
    fewer than n tokens hash their full joined text (the shingles()
    contract); int64-exact (P < 2^31, products < 2^62)."""
    flat, lens, offs = flat_tokens(tokens)
    th = np_poly_hash(flat)
    tl = np.char.str_len(np.asarray(flat, dtype="U")) if len(flat) \
        else np.empty(0, dtype=np.int64)
    tl = tl.astype(np.int64)
    max_l = int(tl.max()) + 2 if len(tl) else 2
    pow31 = np.empty(max_l, dtype=np.int64)
    pow31[0] = 1
    for j in range(1, max_l):
        pow31[j] = (pow31[j - 1] * 31) % MINHASH_PRIME
    n_rows = len(lens)
    out = []
    m = np.maximum(np.minimum(lens, lens - n + 1), np.minimum(lens, 1))
    # m = windows per row: lens-n+1 when lens >= n, 1 when 1 <= lens < n
    # (single full-text gram), 0 when empty... except shingles() maps an
    # EMPTY token list to the single gram "" (hash 0)
    m = np.where(lens == 0, 1, m)
    total = int(m.sum())
    width = np.where(lens >= n, n, lens)  # tokens joined per window
    bounds = np.cumsum(m)
    starts_w = np.concatenate(([0], bounds[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(starts_w, m)
    start = np.repeat(offs, m) + within
    wwidth = np.repeat(width, m)
    acc = np.zeros(total, dtype=np.int64)
    maxw = int(width.max()) if n_rows else 0
    for j in range(maxw):
        live = wwidth > j
        idx = start[live] + j
        first = j == 0
        h_j, l_j = th[idx], tl[idx]
        if first:
            acc[live] = h_j
        else:
            acc[live] = (((acc[live] * pow31[1 + l_j]) % MINHASH_PRIME
                          + (32 * pow31[l_j]) % MINHASH_PRIME
                          + h_j) % MINHASH_PRIME)
    return np.split(acc, bounds[:-1])


def np_span_hashes(tokens, k: int):
    """Vectorized rolling window hashes: per-token poly hashes via
    ``np_poly_hash`` (one numpy pass per char position over the whole
    batch), then the (a*SPAN_MULT + h) mod P window fold as k numpy
    passes over ALL windows of the batch at once — zero Python per
    token/window.  Products stay < 2^49 (P < 2^31, SPAN_MULT < 2^17), so
    the int64 math is exact.  Returns a list of per-row int64 arrays
    (window i ↔ 1-based token position i+1)."""
    flat, lens, offs = flat_tokens(tokens)
    fh = np_poly_hash(flat)
    m = np.maximum(lens - k + 1, 0)
    total = int(m.sum())
    n = len(lens)
    if total == 0:
        return [np.empty(0, dtype=np.int64)] * n
    bounds = np.cumsum(m)
    starts_w = np.concatenate(([0], bounds[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(starts_w, m)
    start = np.repeat(offs, m) + within
    acc = np.zeros(total, dtype=np.int64)
    for j in range(k):
        acc = (acc * SPAN_MULT + fh[start + j]) % MINHASH_PRIME
    return np.split(acc, bounds[:-1])


def span_hash_arrays(text: Column, k: int) -> Column:
    """Arrow-UDF window hashes of ``text`` (array<long>, index i ↔
    1-based position i+1) — the production path for the span operators:
    bit-identical to the expression fold in ``pos_span_structs`` (the
    spec, property-tested against this) but vectorized; the interpreted
    HOF fold measures ~6x slower at 50k docs and grows linearly."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _udf(toks):
        import pandas as pd
        return pd.Series(np_span_hashes(toks, k))

    # lowercase JVM-side (locale semantics match the expression path);
    # original-case split has identical boundaries so positions align
    return _udf(F.array_remove(F.split(F.lower(text), r"\s"), ""))


def pos_span_structs(text: Column, k: int) -> Column:
    """(pos, h) structs for every ``k``-token window (stride 1): 1-based
    token position plus the rolling hash of the window, folded over the
    LOWERCASED tokens (original-case tokens define the positions, so
    removers can cut case-preserving text).  Empty when the doc is
    shorter than ``k`` tokens.  The single shared fold — detector and
    remover hashes are bit-identical by construction."""
    toks = F.array_remove(F.split(text, r"\s"), "")
    th = F.transform(toks, lambda t: poly_token_hash(F.lower(t)))
    m = F.size(th) - k + 1
    roll = F.transform(
        F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.aggregate(
                F.slice(th, i, F.lit(k)), F.lit(0).cast("long"),
                lambda a, h: (a * SPAN_MULT + h) % MINHASH_PRIME)
            .alias("h")))
    return F.when(m >= 1, roll) \
        .otherwise(F.array().cast("array<struct<pos:int,h:long>>"))


def span_hashes(text: Column, k: int) -> Column:
    """Distinct window hashes (no positions) — the detector's view of
    ``pos_span_structs``."""
    return F.array_distinct(
        F.transform(pos_span_structs(text, k), lambda s: s["h"]))


class DuplicateSpanDetector(AlgoOperator):
    """Exact duplicate-span detection at token-window granularity — the
    dedup that document-level exact/minhash passes miss: passages copied
    between otherwise-distinct documents (boilerplate headers, licenses,
    quoted blocks).  Suffix-array substring dedup ("Deduplicating Training
    Data Makes Language Models Better", Lee et al., ACL 2022, finds
    >=50-token repeated substrings) re-expressed for a shared-nothing
    cluster: hash every ``spanTokens``-token window (stride 1) with a
    polynomial rolling hash and surface window hashes present in
    >= ``minDocFreq`` distinct documents.  A repeated substring of length
    >= spanTokens always contains a repeated window, so recall at the
    span granularity is exact (collisions aside, ~n²/P).

    Outputs ``[stats, index]``:
      stats: id, n_spans (distinct window hashes in the doc), dup_spans
      (those shared with >= minDocFreq docs), dup_frac (dup/total);
      index: span_hash, span_df — the hot-span inventory (df >= minDocFreq).

    Plan (100 TB): per-token char hashes fold once (O(chars)), window
    hashes roll in codegen (O(tokens x spanTokens) long ops, no Python),
    and within-doc duplicates collapse via array_distinct BEFORE the
    explode — so only fixed-width (id, hash) pairs ever cross a shuffle,
    never text.  Three hash-partitioned exchanges: per-hash doc frequency
    (map-side combined), the hash-keyed semi-join back, the per-doc
    count.  minDocFreq filters the index before the join back, so the
    join's right side is only the duplicated-span subset; boilerplate
    hot keys skew the df aggregation at worst (AQE skew-split handles a
    hash-cardinality-1 key; the per-doc side is bounded by doc length).
    """

    idCol = StringParam("idCol", "Unique id column.", "id")
    textCol = StringParam("textCol", "Text column.", "text")
    spanTokens = IntParam("spanTokens", "Window length in tokens.", 32,
                          ParamValidators.gt(0))
    minDocFreq = IntParam(
        "minDocFreq", "Distinct-document count at which a span counts as "
        "duplicated.", 2, ParamValidators.gt_eq(2))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        idc = self.get_("idCol")
        base = df.select(
            F.col(idc).alias("id"),
            F.array_distinct(
                span_hash_arrays(F.col(self.get_("textCol")),
                                 self.get_("spanTokens"))).alias("spans"))
        pairs = base.select("id", F.explode("spans").alias("span_hash"))
        # pairs is already distinct per (id, hash) via array_distinct
        index = (pairs.groupBy("span_hash")
                 .agg(F.count("*").alias("span_df"))
                 .filter(F.col("span_df") >= self.get_("minDocFreq")))
        dup = (pairs.join(index.select("span_hash"), "span_hash", "left_semi")
               .groupBy("id").agg(F.count("*").alias("dup_spans")))
        stats = (base.select("id", F.size("spans").alias("n_spans"))
                 .join(dup, "id", "left")
                 .select(
                     "id", F.col("n_spans").cast("long").alias("n_spans"),
                     F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long")
                     .alias("dup_spans"))
                 .withColumn(
                     "dup_frac",
                     F.when(F.col("n_spans") > 0,
                            F.col("dup_spans") / F.col("n_spans"))
                     .otherwise(F.lit(0.0))))
        return [stats, index]


class DuplicateSpanRemover(AlgoOperator):
    """Duplicate-span REMOVAL — the surgical counterpart to
    ``DuplicateSpanDetector``: instead of scoring documents, cut the
    duplicated passages out of the text while keeping exactly one
    canonical copy corpus-wide (Lee et al., ACL 2022 remove repeated
    substrings outright; keeping the first occurrence is the common
    production variant so no content is lost entirely).

    Semantics: every ``spanTokens``-token window (stride 1, lowercased
    rolling hash) present in >= ``minDocFreq`` distinct documents is a
    duplicated span; its OWNER is the minimum id among those documents.
    In every non-owner document, all tokens covered by any occurrence of
    the span are removed; the owner's copy (and all unique text) is kept
    verbatim.  Output columns: ``outputCol`` (cleaned text, original
    case, single-space joined) and ``n_tokens_removed``.

    Plan (100 TB): window hashes roll in codegen with their 1-based
    positions; only fixed-width (id, pos, hash) triples cross a shuffle,
    never text.  The hash-keyed index aggregation is map-side combined;
    the postings->index join carries only duplicated hashes (index is
    pre-filtered), with AQE skew-split handling boilerplate hot hashes;
    covered positions collapse to one int array per doc before the final
    id-keyed join back.  Token filtering is one codegen'd
    exists-per-token scan, O(tokens x covered_spans) per row.
    """

    idCol = StringParam("idCol", "Unique id column.", "id")
    textCol = StringParam("textCol", "Text column.", "text")
    outputCol = StringParam("outputCol", "Cleaned-text column.",
                            "clean_text")
    spanTokens = IntParam("spanTokens", "Window length in tokens.", 32,
                          ParamValidators.gt(0))
    minDocFreq = IntParam(
        "minDocFreq", "Distinct-document count at which a span counts as "
        "duplicated.", 2, ParamValidators.gt_eq(2))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        (df,) = inputs
        idc = self.get_("idCol")
        k = int(self.get_("spanTokens"))

        text = F.col(self.get_("textCol"))
        # materialize the fixed-width postings ONCE: they feed two jobs
        # (the df/owner index and the covered-position join), and the
        # rolling-hash fold is interpreted HOF work worth not repeating —
        # same signature-checkpoint pattern as the MinHash deduplicators
        pairs = (df.select(F.col(idc).alias("id"),
                           F.posexplode(span_hash_arrays(text, k))
                           .alias("pos0", "h"))
                 .select("id", (F.col("pos0") + 1).cast("int").alias("pos"),
                         "h")
                 .localCheckpoint(eager=True))
        index = (pairs.groupBy("h")
                 .agg(F.count_distinct("id").alias("span_df"),
                      F.min("id").alias("owner"))
                 .filter(F.col("span_df") >= self.get_("minDocFreq")))
        covered = (pairs.join(index.select("h", "owner"), "h")
                   .filter(F.col("id") != F.col("owner"))
                   .groupBy("id")
                   .agg(F.collect_set("pos").alias("__starts__")))
        toks = F.array_remove(F.split(text, r"\s"), "")
        keep = F.filter(
            toks, lambda t, i: ~F.exists(
                F.col("__starts__"),
                lambda s: (s <= i + 1) & (i + 1 < s + k)))
        clean = F.when(F.col("__starts__").isNull(), toks).otherwise(keep)
        out = (df.join(covered.withColumnRenamed("id", "__rid__"),
                       F.col(idc) == F.col("__rid__"), "left")
               .withColumn("__clean__", clean)
               .withColumn("n_tokens_removed",
                           (F.size(toks) - F.size(F.col("__clean__")))
                           .cast("long"))
               .withColumn(self.get_("outputCol"),
                           F.array_join(F.col("__clean__"), " "))
               .drop("__rid__", "__starts__", "__clean__"))
        return [out]


class Decontaminator(AlgoOperator):
    """Benchmark decontamination: split a training corpus into (clean,
    contaminated) by word-n-gram overlap with an evaluation/benchmark
    corpus — the GPT-3/PaLM-style decontamination step every large-scale
    training-data pipeline runs before training.

    ``transform(train, benchmark)`` -> ``[clean, contaminated]`` where a
    training document is contaminated iff it shares at least one
    ``shingleSize``-gram with any benchmark document.

    Plan: benchmark text → distinct n-gram digests (sha2-256, fixed
    width); training docs explode to the same digests; a semi-join marks
    contaminated ids; full doc rows then split by id.  Shuffle volume is
    ids + 32-byte digests — never document text — and the (typically
    tiny) benchmark gram relation reaches the join pre-aggregated, so AQE
    broadcasts it.  ``shingleSize`` defaults to 8, the GPT-3
    decontamination n-gram length.
    """

    idCol = StringParam("idCol", "Unique id column (train side).", "id")
    textCol = StringParam("textCol", "Text column (train side).", "text")
    benchmarkTextCol = StringParam(
        "benchmarkTextCol", "Text column on the benchmark table "
        "(None = same as textCol).", None)
    shingleSize = IntParam("shingleSize", "Words per overlap n-gram.", 8,
                           ParamValidators.gt(0))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        train, bench = inputs
        idc, n = self.get_("idCol"), self.get_("shingleSize")
        bcol = self.get_("benchmarkTextCol") or self.get_("textCol")
        digest = lambda c: F.sha2(c, 256)  # noqa: E731 — fixed-width key
        bench_grams = (bench.select(
            F.explode(shingles(F.col(bcol), n)).alias("g"))
            .select(digest(F.col("g")).alias("gd")).distinct())
        train_grams = train.select(
            F.col(idc).alias("__id__"),
            F.explode(shingles(F.col(self.get_("textCol")), n)).alias("g"))
        hit_ids = (train_grams.select("__id__", digest(F.col("g")).alias("gd"))
                   .join(bench_grams, "gd", "left_semi")
                   .select("__id__").distinct())
        # materialize the (tiny) contaminated-id relation once: consuming
        # BOTH outputs would otherwise run the dominant gram explode +
        # digest + join twice (no CSE across the two output plans)
        hit_ids = hit_ids.localCheckpoint(eager=True)             .withColumnRenamed("__id__", idc)
        clean = train.join(hit_ids, idc, "left_anti")
        contaminated = train.join(hit_ids, idc, "left_semi")
        return [clean, contaminated]


class IncrementalMinHashDeduplicator(AlgoOperator):
    """Near-dup detection of a NEW document batch against a persisted
    signature store — the incremental form of MinHashLSHDeduplicator for
    growing corpora: the historical corpus is represented only by its
    (id, minhash signature) relation (numHashes longs per document), so a
    daily increment never re-reads, re-shingles, or re-hashes history.

    ``transform(new_df, store_df)`` -> ``[matches, updated_store]``:

    - ``matches`` = (id, match_id, est_jaccard): new documents sharing at
      least one LSH band with a stored signature, scored by the standard
      MinHash estimate of Jaccard (fraction of equal signature positions)
      and kept at ``est_jaccard >= threshold``.  The store keeps no text,
      so the exact-shingle rescoring of the batch operator is impossible
      by construction; the estimator's standard error is
      sqrt(J(1-J)/numHashes) — size numHashes accordingly.
    - ``updated_store`` = store ∪ signatures of the non-matched new
      documents, the input for the next increment.  Store rows pass
      through byte-identical; on a match the stored id wins.

    The new batch is assumed internally deduplicated first (compose
    MinHashLSHDeduplicator over the batch — it is tiny relative to the
    store, which is the point of the incremental path).

    Scale (100 TB store): both band relations carry (id, short string)
    only and equi-join on (band, bsig), so work is proportional to
    matching buckets, never |store| × |batch|; the store itself is
    numHashes longs/doc — ~0.1% of corpus bytes at numHashes=16 — and can
    live bucketed on its band keys so only the batch side shuffles.
    ``maxBandDocFreq`` caps degenerate buckets by combined (store+batch)
    document frequency, as in the batch operator.
    """

    idCol = StringParam("idCol", "Unique id column (both inputs).", "id")
    textCol = StringParam("textCol", "Text column on the new batch.", "text")
    sigCol = StringParam("sigCol", "Signature column on the store.", "sig")
    shingleSize = IntParam("shingleSize", "Words per shingle.", 3, ParamValidators.gt(0))
    numHashes = IntParam("numHashes", "Total minhash functions (must match "
                         "the store's signatures).", 32, ParamValidators.gt(0))
    bandSize = IntParam("bandSize", "Hashes per LSH band.", 4, ParamValidators.gt(0))
    threshold = FloatParam("threshold", "Estimated-Jaccard threshold.", 0.7,
                           ParamValidators.in_range(0, 1))
    seed = IntParam("seed", "Hash family seed (must match the store's).", 42)
    maxBandDocFreq = IntParam(
        "maxBandDocFreq", "Drop LSH buckets whose combined store+batch "
        "document frequency exceeds this cap (None = exact).", None)

    def _band_scheme(self) -> str:
        """Fingerprint of every parameter the band keys depend on; stored
        as a constant column so a persisted relation can be validated
        against the consuming deduplicator's configuration."""
        return (f"sh{self.get_('shingleSize')}"
                f"mh{self.get_('numHashes')}b{self.get_('bandSize')}"
                f"s{self.get_('seed')}")

    def store_band_relation(self, store_df: DataFrame) -> DataFrame:
        """The store's exploded LSH band relation (idCol, band, bsig,
        scheme) — the thing to PERSIST BUCKETED on (band, bsig) between
        increments (``io.write_bucketed``): a bucketed band table
        satisfies the candidate join's hash distribution straight from
        the scan, so at 100 TB only the (tiny) batch side shuffles while
        the corpus-sized store side plans with zero Exchange.  Pass the
        re-read table to ``transform`` as the third input.  ``scheme``
        records the (shingle, hash, band, seed) configuration; the
        consumer raises loudly on a mismatched table instead of silently
        missing every duplicate."""
        idc = self.get_("idCol")
        store = store_df.select(F.col(idc).alias("id"),
                                F.col(self.get_("sigCol")).alias("sig"))
        return (band_keys(store, self.get_("numHashes"),
                          self.get_("bandSize"))
                .withColumnRenamed("id", idc)
                .withColumn("scheme", F.lit(self._band_scheme())))

    def _plan(self, new_df: DataFrame, store_df: DataFrame,
              store_bands_df: DataFrame | None = None
              ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(matches, batch signatures, normalized store) — exposed so the
        streaming wrapper can materialize ``matches`` once and derive the
        store update from the checkpointed result instead of re-running
        the candidate join.  ``store_bands_df`` (from
        ``store_band_relation``, usually persisted bucketed) substitutes
        for deriving the band relation from the store's signatures."""
        idc = self.get_("idCol")
        n_hashes, band = self.get_("numHashes"), self.get_("bandSize")

        base = new_df.select(
            F.col(idc).alias("id"),
            F.array_remove(F.split(F.lower(F.col(self.get_("textCol"))),
                                   r"\s"), "").alias("__toks__"))
        sig = MinHashSignature(inputCol="__toks__", outputCol="sig",
                               numHashes=n_hashes, seed=self.get_("seed"),
                               inputIsTokens=True,
                               shingleSize=self.get_("shingleSize")) \
            .transform(base)[0]
        # the batch signatures feed two branches (band join + estimator
        # rejoin) — materialize the numHashes-longs-per-row relation once
        sig = sig.select("id", "sig").localCheckpoint(eager=True)
        # a wrong-length stored signature would otherwise fail SILENTLY
        # (null-padded zip_with -> null estimate -> filtered out, dups
        # folded into the store undetected) — fail loudly per row instead;
        # the check lives INSIDE the sig expression so pruning can't drop it
        sc = F.col(self.get_("sigCol"))
        sig_checked = F.when(F.size(sc) == n_hashes, sc).otherwise(
            F.raise_error(F.lit(
                f"store signature length != numHashes={n_hashes}")))
        store = store_df.select(F.col(idc).alias("id"),
                                sig_checked.alias("sig"))

        new_bands = band_keys(sig, n_hashes, band)
        if store_bands_df is not None:
            if "scheme" in store_bands_df.columns:
                # a persisted band table from a different (shingle, hash,
                # band, seed) configuration would silently miss every
                # duplicate.  The check must NOT wrap the bsig column
                # (any projection over the bucketed scan's key forfeits
                # its hash distribution and re-introduces the store-side
                # Exchange), so validate the constant column driver-side
                # with a one-row read instead
                want = self._band_scheme()
                got = store_bands_df.select("scheme").first()
                if got is not None and got[0] != want:
                    raise ValueError(
                        f"store band relation was built with scheme "
                        f"{got[0]!r} but this deduplicator is configured "
                        f"as {want!r}")
            store_bands = store_bands_df.select(
                F.col(idc).alias("id"), "band", "bsig")
        else:
            store_bands = band_keys(store, n_hashes, band)
        cap = self.get_("maxBandDocFreq")
        if cap is not None:
            both = (new_bands.select("band", "bsig")
                    .unionByName(store_bands.select("band", "bsig")))
            keep = (both.groupBy("band", "bsig")
                    .agg(F.count("*").alias("__df__"))
                    .filter(F.col("__df__") <= cap).select("band", "bsig"))
            new_bands = new_bands.join(keep, ["band", "bsig"], "left_semi")
            store_bands = store_bands.join(keep, ["band", "bsig"], "left_semi")
        pairs = (new_bands
                 .join(store_bands.withColumnRenamed("id", "match_id"),
                       ["band", "bsig"])
                 # ids share one space; a replayed batch whose signatures
                 # already committed to the store must not self-match
                 .filter(F.col("id") != F.col("match_id"))
                 .select("id", "match_id").dropDuplicates(["id", "match_id"]))
        # signatures rejoin by id AFTER the pair dedup, once per candidate
        scored = (pairs
                  .join(sig.withColumnRenamed("sig", "sig_a"), "id")
                  .join(store.select(F.col("id").alias("match_id"),
                                     F.col("sig").alias("sig_b")), "match_id"))
        n_eq = F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
            F.lit(0), lambda acc, x: acc + x)
        matches = (scored
                   .withColumn("est_jaccard",
                               n_eq.cast("double") / F.lit(float(n_hashes)))
                   .filter(F.col("est_jaccard") >= self.get_("threshold"))
                   .select("id", "match_id", "est_jaccard"))
        return matches, sig, store

    def updated_store(self, matches: DataFrame, sig: DataFrame,
                      store: DataFrame) -> DataFrame:
        """store ∪ non-matched batch signatures, from ``_plan``'s pieces
        (pass a materialized ``matches`` to avoid re-running its join).
        The anti-join against existing store ids makes a replayed batch
        idempotent: already-committed signatures are not re-unioned."""
        idc = self.get_("idCol")
        survivors = (sig.join(matches.select("id").distinct(), "id", "left_anti")
                     .join(store.select("id"), "id", "left_anti"))
        return (store.unionByName(survivors)
                .withColumnRenamed("id", idc)
                .withColumnRenamed("sig", self.get_("sigCol")))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        """(new_batch, store[, store_bands]) -> [matches, updated_store];
        the optional third input is a pre-derived band relation from
        ``store_band_relation`` (persist it bucketed on (band, bsig) so
        the candidate join's store side scans exchange-free)."""
        new_df, store_df, *rest = inputs
        matches, sig, store = self._plan(new_df, store_df,
                                         rest[0] if rest else None)
        # updated store stays lazy: a consumer reading only `matches` (the
        # common path) must not pay the candidate join twice, and `sig` —
        # the expensive part — is already checkpointed above
        return [matches, self.updated_store(matches, sig, store)]


class DuplicateResolver(AlgoOperator):
    """Duplicate RESOLUTION policy: given the corpus and a near-dup pair
    relation, decide which copy of each duplicate cluster survives.
    Detection (the deduplicators) and resolution are separate decisions —
    production pipelines keep the highest-quality copy, not an arbitrary
    one, because near-dup clusters mix clean originals with truncated or
    boilerplate-wrapped variants.

    ``transform(docs, pairs)`` -> ``[kept]``: documents outside any
    cluster pass through; inside a cluster exactly one row survives —
    the max of ``scoreCol`` (ties broken by smallest id, so the choice is
    deterministic), or the smallest id when ``scoreCol`` is None (the
    classic policy, equal to keeping the component label).

    Plan: ConnectedComponents labels the clusters (O(log d) rounds,
    ids-only); the per-cluster argmax is one aggregation of
    ``min(struct(-score, id))`` — model-free, shuffle keyed on the
    component id; the winner relation (ids only) semi-joins the corpus.
    """

    idCol = StringParam("idCol", "Unique id column on the corpus.", "id")
    srcCol = StringParam("srcCol", "Pair source id column.", "id_a")
    dstCol = StringParam("dstCol", "Pair destination id column.", "id_b")
    scoreCol = StringParam(
        "scoreCol", "Quality column to maximize within a cluster "
        "(None = keep the smallest id).", None)

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        docs, pairs = inputs
        idc = self.get_("idCol")
        labels = ConnectedComponents(srcCol=self.get_("srcCol"),
                                     dstCol=self.get_("dstCol")) \
            .transform(pairs)[0]  # (id, component), clustered ids only
        score = self.get_("scoreCol")
        if score is None:
            winners = labels.filter(F.col("id") == F.col("component")) \
                .select("id")
        else:
            scored = labels.join(
                docs.select(F.col(idc).alias("id"),
                            F.col(score).alias("__s__")), "id")
            # min(struct(-score, id)) = max score, ties -> smallest id
            winners = (scored.groupBy("component")
                       .agg(F.min(F.struct((-F.col("__s__")).alias("n"),
                                           F.col("id").alias("id")))
                            .alias("w"))
                       .select(F.col("w.id").alias("id")))
        clustered = labels.select("id").withColumnRenamed("id", idc)
        keep_ids = winners.withColumnRenamed("id", idc)
        outside = docs.join(clustered, idc, "left_anti")
        kept_in = docs.join(keep_ids, idc, "left_semi")
        return [outside.unionByName(kept_in)]


class SnapshotDiff(AlgoOperator):
    """Corpus snapshot diff: classify every document id across two corpus
    versions as ``added`` / ``removed`` / ``changed`` / ``unchanged`` by
    comparing fixed-width content digests — the change-detection step in
    front of an incremental pipeline run.  Only ``added`` + ``changed``
    ids need re-processing (feed them to IncrementalMinHashDeduplicator /
    the quality gates); ``removed`` ids are retired from downstream
    stores.  This is what turns a daily 100 TB crawl refresh into an
    O(delta) job instead of an O(corpus) one.

    ``transform(old, new)`` -> ``[diff]`` with columns (idCol, status).
    ``includeUnchanged=0`` (default) drops unchanged rows so the output
    is change-proportional.  Ids are assumed unique within each snapshot
    (the corpus contract everywhere else in this package).

    Plan: each side reduces to (id, sha2-256(content)) at scan time —
    column pruning means only idCol+contentCol are read — so the single
    full-outer id join shuffles rows x 40 B regardless of document size.
    With both snapshots' digest relations persisted bucketed on id
    (io.write_bucketed), the join plans with zero Exchange; the digest
    relation is also exactly what IncrementalMinHashDeduplicator's store
    update wants to keep between runs.
    """

    idCol = StringParam("idCol", "Unique id column (both sides).", "id")
    contentCol = StringParam("contentCol", "Content column to compare "
                             "(digested; never shuffled raw).", "text")
    includeUnchanged = IntParam(
        "includeUnchanged", "1 = keep unchanged rows in the output; 0 "
        "(default) = emit only added/removed/changed.", 0,
        ParamValidators.in_array([0, 1]))

    def transform(self, *inputs: DataFrame) -> list[DataFrame]:
        old, new = inputs
        idc, c = self.get_("idCol"), self.get_("contentCol")
        # \x00 sentinel keeps NULL content distinct from the string 'None'
        dig = lambda df: df.select(  # noqa: E731
            F.col(idc).alias("__id__"),
            F.sha2(F.coalesce(F.col(c).cast("string"), F.lit("\x00")), 256)
            .alias("__d__"))
        o = dig(old).withColumnRenamed("__d__", "__d_old__")
        n = dig(new).withColumnRenamed("__d__", "__d_new__")
        joined = o.join(n, "__id__", "full_outer")
        status = (F.when(F.col("__d_old__").isNull(), "added")
                  .when(F.col("__d_new__").isNull(), "removed")
                  .when(F.col("__d_old__") == F.col("__d_new__"), "unchanged")
                  .otherwise("changed"))
        out = joined.select(F.col("__id__").alias(idc),
                            status.alias("status"))
        if not self.get_("includeUnchanged"):
            out = out.filter(F.col("status") != "unchanged")
        return [out]
