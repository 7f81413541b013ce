"""Property-based tests (hypothesis) for the deterministic kernels the
oracle gate leans on.  These are pure-Python/numpy — no SparkSession —
so they run in milliseconds and cover the input space the example-based
tests cannot.  (Beyond the reference's test strategy, which has no
property testing — SURVEY §5.)
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from flink_ml_spark.common.hashing import POLY_MOD, poly_hash31, spark_murmur3_32
from flink_ml_spark.feature.hashingtf import _np_poly31
from flink_ml_spark.llmdata.dedup import (MINHASH_PRIME, flat_tokens,
                                          np_poly_hash)

token = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
    min_size=0, max_size=24)


@given(st.lists(token, min_size=1, max_size=50))
def test_np_poly_hash_matches_scalar(tokens):
    """Vectorized codepoint-matrix fold == per-char Python fold (mod P)."""
    vec = np_poly_hash(np.asarray(tokens, dtype=object))
    for t, h in zip(tokens, vec):
        expect = 0
        for ch in t:
            expect = (expect * 31 + ord(ch)) % MINHASH_PRIME
        assert h == expect


@given(st.lists(token, min_size=1, max_size=50))
def test_np_poly31_matches_poly_hash31(tokens):
    vec = _np_poly31(np.asarray(tokens, dtype=object))
    for t, h in zip(tokens, vec):
        assert h == poly_hash31(t), t


@given(st.lists(st.lists(token, max_size=8) | st.none(), min_size=1,
                max_size=30))
def test_flat_tokens_roundtrip(rows):
    flat, lens, starts = flat_tokens(rows)
    assert len(flat) == sum(len(r) for r in rows if r is not None)
    for i, r in enumerate(rows):
        want = list(r) if r is not None else []
        assert list(flat[starts[i]:starts[i] + lens[i]]) == want


@given(st.text(min_size=0, max_size=64))
@settings(max_examples=200)
def test_murmur3_is_signed_32bit_and_deterministic(s):
    h1, h2 = spark_murmur3_32(s), spark_murmur3_32(s)
    assert h1 == h2
    assert -(1 << 31) <= h1 < (1 << 31)


def test_murmur3_known_spark_values():
    """Bit-exact against Spark's F.hash, captured from a live session
    (hash(lit('x')) etc.) — pins the tail/sign handling."""
    assert spark_murmur3_32("") == 142593372
    assert spark_murmur3_32("a") == 1485273170
    assert spark_murmur3_32("ab") == -97053317
    assert spark_murmur3_32("abc") == 1322437556
    assert spark_murmur3_32("abcd") == -396302900


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=2, max_size=200),
       st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
                min_size=1, max_size=5))
def test_order_statistic_interpolation_matches_numpy(values, probs):
    """The driver-side interpolation in _exact_quantiles is
    percentile_cont: value at rank h=(n-1)p with linear interpolation —
    numpy's 'linear' percentile is the same definition."""
    arr = np.asarray(values, dtype=float)
    srt = np.sort(arr)
    n = len(srt)
    for p in probs:
        h = (n - 1) * p
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        got = srt[lo] + (h - lo) * (srt[hi] - srt[lo])
        want = np.percentile(arr, p * 100, method="linear")
        assert abs(got - want) <= 1e-9 * max(1.0, abs(want))


word = st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FF),
               min_size=1, max_size=12)


@given(st.lists(st.tuples(word, st.integers(1, 50)), min_size=1, max_size=30),
       st.integers(0, 60))
@settings(max_examples=60, deadline=None)
def test_bpe_encode_roundtrips_every_word(word_counts, n_merges):
    """Concatenating a word's BPE subwords and stripping the end-of-word
    marker reconstructs the word exactly, for ANY learned merge table —
    the lossless-segmentation invariant of BPE."""
    from flink_ml_spark.llmdata.bpe import _encode_word, _learn_merges
    eow = "</w>"
    # dedupe words (the trainer sees a count table keyed by word)
    wc = list({w: c for w, c in word_counts}.items())
    merges = _learn_merges(wc, n_merges, eow)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w, _ in wc:
        toks = _encode_word(w, ranks, eow)
        joined = "".join(toks)
        assert joined.endswith(eow)
        assert joined[: -len(eow)] == w
        # every non-final symbol is marker-free (the marker only ends words)
        assert all(eow not in t for t in toks[:-1])


@given(st.lists(st.integers(min_value=-2**40, max_value=2**40), min_size=1,
                max_size=300, unique=True),
       st.integers(0, 5))
@settings(max_examples=40, deadline=None)
def test_corpus_shuffler_key_is_injective_per_epoch(ids, epoch):
    """The epoch-masked multiplicative hash is a bijection mod 2^31: ids
    within one modulus class never collide, so the training order is a
    true permutation (collisions would make order nondeterministic)."""
    HASH_MOD = 2147483648
    mask = (epoch * 2654435761) % HASH_MOD
    keys = {}
    for i in ids:
        base = ((i % HASH_MOD + HASH_MOD) % HASH_MOD * 2654435761 + 13) \
            % HASH_MOD
        k = base ^ mask
        prev = keys.get(k)
        assert prev is None or (prev % HASH_MOD) == (i % HASH_MOD)
        keys[k] = i


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
               min_size=0, max_size=200))
@settings(max_examples=200)
def test_char_entropy_local_bounds_and_invariance(text):
    import math

    import pandas as pd
    from flink_ml_spark.llmdata import CharEntropyScorer
    s = CharEntropyScorer(inputCol="t")
    out = s.transform_local(pd.DataFrame({"t": [text]}))
    ent = out["char_entropy"][0]
    ratio = out["distinct_char_ratio"][0]
    distinct = len(set(text))
    # entropy bounded by log2(alphabet actually used); ratio in [0, 1]
    assert -1e-9 <= ent <= (math.log2(distinct) + 1e-9 if distinct > 1 else 1e-9)
    assert 0.0 <= ratio <= 1.0
    # permutation invariance: reversing the text changes nothing
    rev = s.transform_local(pd.DataFrame({"t": [text[::-1]]}))
    assert abs(rev["char_entropy"][0] - ent) < 1e-9
    # doubling the text preserves the distribution, hence the entropy
    dbl = s.transform_local(pd.DataFrame({"t": [text + text]}))
    assert abs(dbl["char_entropy"][0] - ent) < 1e-9


@given(st.lists(st.tuples(st.integers(-2**40, 2**40), st.sampled_from("abcd")),
                min_size=0, max_size=80, unique_by=lambda t: t[0]),
       st.integers(0, 6), st.integers(0, 6))
@settings(max_examples=100, deadline=None)
def test_stratified_budget_local_exact_counts(rows, b_a, b_def):
    import pandas as pd
    from flink_ml_spark.llmdata import StratifiedBudgetSampler
    pdf = pd.DataFrame(rows, columns=["id", "dom"])
    s = StratifiedBudgetSampler(idCol="id", domainCol="dom",
                                budgets={"a": b_a}, defaultBudget=b_def)
    out = s.transform_local(pdf)
    # exact per-domain counts: min(budget_d, n_d)
    for dom, grp in pdf.groupby("dom"):
        budget = b_a if dom == "a" else b_def
        assert (out["dom"] == dom).sum() == min(budget, len(grp))
    # output is a subset of the input rows (ids preserved)
    assert set(out["id"]).issubset(set(pdf["id"]) if len(pdf) else set())
    # deterministic
    out2 = s.transform_local(pdf)
    assert list(out["id"]) == list(out2["id"])


@given(st.lists(st.lists(st.text(alphabet="abcXYZ ", min_size=0, max_size=6),
                         min_size=0, max_size=30), min_size=1, max_size=8),
       st.integers(2, 5))
@settings(max_examples=60, deadline=None)
def test_np_span_hashes_matches_reference_fold(docs, k):
    # the vectorized window-hash kernel equals the scalar spec fold
    import pandas as pd
    from flink_ml_spark.llmdata.dedup import (MINHASH_PRIME, SPAN_MULT,
                                              np_poly_hash, np_span_hashes)

    def scalar(toks):
        th = [int(np_poly_hash([t])[0]) for t in toks]
        out = []
        for i in range(max(len(th) - k + 1, 0)):
            a = 0
            for h in th[i:i + k]:
                a = (a * SPAN_MULT + h) % MINHASH_PRIME
            out.append(a)
        return out

    got = np_span_hashes(pd.Series(docs), k)
    for row, toks in zip(got, docs):
        assert list(row) == scalar(toks)


@given(st.lists(st.lists(st.text(alphabet="abcXYZ09", min_size=1, max_size=7),
                         min_size=0, max_size=25), min_size=1, max_size=8),
       st.integers(1, 4))
@settings(max_examples=80, deadline=None)
def test_np_shingle_hashes_matches_string_path(docs, n):
    # compositional shingle hashing == np_poly_hash over the joined
    # shingle strings (the shingles() contract, incl. the short-doc gram)
    import pandas as pd
    from flink_ml_spark.llmdata.dedup import np_poly_hash, np_shingle_hashes

    got = np_shingle_hashes(pd.Series(docs), n)
    for row, toks in zip(got, docs):
        if len(toks) >= n:
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
        else:
            grams = [" ".join(toks)]
        want = list(np_poly_hash(grams)) if grams else []
        assert list(row) == want


def test_simhash_fingerprint_bits_decorrelated(spark):
    # Regression guard for the degeneracy class that broke the first
    # fingerprint design: with a small odd per-bit multiplier the product
    # (h * mult) barely wraps mod P for SHORT tokens, so every bit equals
    # parity(h) and fingerprints collapse to {0, 2^bits - 1} (measured
    # popcount sigma ~13, two distinct fingerprints, quadratic candidate
    # joins).  Short structured tokens are exactly this corpus; the fixed
    # per-bit affine family must keep the bits near-independent.
    import numpy as np
    from pyspark.sql import functions as F
    from flink_ml_spark.llmdata import SimHashDeduplicator

    n, bits = 400, 48
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda i: F.concat(F.lit("w"),
                               F.pmod(F.hash(F.col("id"), i), F.lit(3000))
                               .cast("string")))).alias("text"))
    d = SimHashDeduplicator(idCol="doc_id", textCol="text", bits=bits)
    fps = np.array([r["fp"] for r in docs.select(
        d.fingerprint(F.col("text")).alias("fp")).collect()], dtype=np.int64)

    assert len(np.unique(fps)) > 0.95 * n  # broken design: exactly 2
    pc = np.array([bin(x).count("1") for x in fps])
    # independent bits: sigma = sqrt(48 * 0.25) = 3.46; broken: ~13
    assert pc.std() < 6.0
    # every bit position carries signal (broken: all bits identical, so
    # each bit's set-fraction is bit 0's -- typically ~0 or ~1)
    frac = np.array([((fps >> b) & 1).mean() for b in range(bits)])
    assert ((frac > 0.15) & (frac < 0.85)).all()


@given(st.lists(st.one_of(st.none(),
                          st.lists(token, max_size=6).map(" ".join)),
                min_size=1, max_size=12),
       st.integers(1, 3))
@settings(max_examples=80, deadline=None)
def test_dsir_bincount_and_logw_agree(texts, ngram_max):
    """The DSIR fit kernel (_bucket_bincount) and score kernel
    (_bucket_logw) must see the identical feature multiset: scoring with
    lr = one-hot(bucket j) must return, per doc, exactly doc j-count —
    and summed over docs, the corpus bincount."""
    import numpy as np
    from flink_ml_spark.llmdata.sampling import (_bucket_bincount,
                                                 _bucket_logw)
    b = 32
    total = _bucket_bincount(texts, b, ngram_max)
    per_doc = [_bucket_bincount([t], b, ngram_max) for t in texts]
    assert (total == np.sum(per_doc, axis=0)).all()
    for j in np.nonzero(total)[0]:
        lr = np.zeros(b)
        lr[j] = 1.0
        scores = _bucket_logw(texts, lr, b, ngram_max)
        assert (scores == np.array([c[j] for c in per_doc])).all()
    # empty/None docs carry no features at any ngram setting
    for t, c in zip(texts, per_doc):
        if not (t or "").split():
            assert c.sum() == 0


# --- Misra-Gries sketch invariants (llmdata/profiler.py) -----------------

mg_items = st.lists(st.integers(min_value=0, max_value=40),
                    min_size=1, max_size=400)
mg_cap = st.integers(min_value=1, max_value=16)
mg_parts = st.integers(min_value=1, max_value=5)


@given(mg_items, mg_cap, mg_parts)
@settings(max_examples=200)
def test_mg_merge_guarantee(items, cap, n_parts):
    """The mergeable-summaries bound (Agarwal et al. 2012): the TIGHT
    n/(cap+1) error bound survives arbitrary partition splits and
    merges — every decrement of amount d removes d x (cap+1) from the
    total retained mass, so total decrements across the whole merge
    tree are <= n/(cap+1) per item.  This is exactly the superset
    property FrequentItemsProfiler's ``guaranteed`` flag relies on."""
    from collections import Counter
    from flink_ml_spark.llmdata.profiler import _mg_shrink

    truth = Counter(items)
    n = len(items)
    # partition split: round-robin into n_parts, sketch each, merge
    sketches = []
    for p in range(n_parts):
        c: dict = {}
        for x in items[p::n_parts]:
            c[x] = c.get(x, 0) + 1
            _mg_shrink(c, cap)
        sketches.append(c)
    merged: dict = {}
    for s in sketches:
        for k, v in s.items():
            merged[k] = merged.get(k, 0) + v
    _mg_shrink(merged, cap)
    # kept counts never exceed the truth (under-estimates only)
    for k, v in merged.items():
        assert 0 < v <= truth[k]
    bound = n / (cap + 1)
    for k, t in truth.items():
        if t > bound:
            assert k in merged, (k, t, bound, merged)
        # and the under-estimate is itself within the bound
        if k in merged:
            assert t - merged[k] <= bound + 1e-9


@given(mg_items, mg_cap)
@settings(max_examples=200)
def test_mg_single_level_bound(items, cap):
    """Single sketch (no merge): classic MG — any item with true count
    > n/(cap+1) survives, and the sketch holds at most cap counters."""
    from collections import Counter
    from flink_ml_spark.llmdata.profiler import _mg_shrink

    c: dict = {}
    for x in items:
        c[x] = c.get(x, 0) + 1
        _mg_shrink(c, cap)
    assert len(c) <= cap
    truth = Counter(items)
    n = len(items)
    for k, t in truth.items():
        if t > n / (cap + 1):
            assert k in c


finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)
posw = st.floats(min_value=1e-3, max_value=1e3,
                 allow_nan=False, allow_infinity=False)


@given(st.lists(st.tuples(finite, posw), min_size=1, max_size=60))
@settings(max_examples=200)
def test_pava_properties(pairs):
    """Isotonic PAVA invariants on arbitrary weighted inputs:
    monotone output, weighted-mean preservation, idempotence, and
    already-monotone inputs pass through unchanged."""
    from flink_ml_spark.regression.isotonic import _pava
    y = np.array([p[0] for p in pairs])
    w = np.array([p[1] for p in pairs])
    out = _pava(y, w)
    # non-decreasing
    assert np.all(np.diff(out) >= -1e-9)
    # weighted mean preserved (PAVA projects within each pool)
    assert abs(float(np.dot(out, w) - np.dot(y, w))) \
        <= 1e-6 * (1 + abs(float(np.dot(y, w))))
    # idempotent: re-fitting the fit changes nothing
    assert np.allclose(_pava(out, w), out, atol=1e-9)
    # sorted input is its own isotonic fit
    ys = np.sort(y)
    assert np.allclose(_pava(ys, w), ys, atol=1e-12)


@given(st.lists(st.integers(min_value=1, max_value=10_000),
                min_size=1, max_size=200),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=100)
def test_bloom_bit_indices_deterministic_and_in_range(hs, i):
    """Double-hash index derivation: pure, deterministic, in [0, m)."""
    from flink_ml_spark.llmdata.bloom import _bit_indices
    m = 1 << 13
    h1 = np.array(hs, dtype=np.int64).view(np.uint64)
    h2 = (np.array(hs, dtype=np.int64) * 31 + 7).view(np.uint64)
    a = _bit_indices(h1, h2, i, m)
    b = _bit_indices(h1, h2, i, m)
    assert np.array_equal(a, b)
    assert a.max() < m and a.min() >= 0
