"""Distributed BPE tokenizer training (public literature: Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword Units").

Word frequency is a sufficient statistic for BPE, so production trainers
(subword-nmt, HF tokenizers) reduce the corpus to a (word, count) table
and learn merges over that.  The 100 TB part of training is therefore
exactly ONE distributed aggregation — tokenize → word counts with a
frequency cutoff and a deterministic top-``maxWords`` cap — and the merge
loop runs driver-side on the model-sized count table, which is how every
real trainer works.  Encoding returns to executors as an Arrow UDF
carrying the merge ranks (zero-shuffle at any corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..api import Estimator, Model
from ..param import (HasInputCol, HasOutputCol, IntParam, ParamValidators,
                     StringParam)
from .textanalysis import _local_tokens, _tokens


def _learn_merges(word_counts: list[tuple[str, int]], n_merges: int,
                  eow: str) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over (word, count) rows.  Deterministic:
    the best pair is max by (count, then lexicographically smallest pair)
    so ties never depend on dict order.

    Pair counts are maintained INCREMENTALLY (the subword-nmt trainer
    architecture): only the words that contain the merged pair — tracked
    in an occurrence index — have their pair contributions re-derived, so
    a merge step costs O(symbols in affected words), not O(total corpus
    symbols).  Counts after every step equal a from-scratch recount, so
    the learned merge sequence is identical to the naive loop."""
    seqs: list[tuple[list[str], int]] = []
    for w, c in word_counts:
        if not w:
            continue
        sym = list(w[:-1]) + [w[-1] + eow]
        seqs.append((sym, c))
    pairs: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, (sym, c) in enumerate(seqs):
        for p in zip(sym, sym[1:]):
            pairs[p] = pairs.get(p, 0) + c
            where.setdefault(p, set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break  # merging hapax pairs only memorizes the corpus
        merges.append((a, b))
        ab = a + b
        # occurrence sets are maintained lazily (a word that no longer
        # contains a pair may linger in its set); subtract-current /
        # re-add-current makes a stale visit a net no-op
        for i in where.pop((a, b), ()):
            sym, c = seqs[i]
            for p in zip(sym, sym[1:]):
                pairs[p] -= c
            j = 0
            while j < len(sym) - 1:
                if sym[j] == a and sym[j + 1] == b:
                    sym[j:j + 2] = [ab]
                else:
                    j += 1
            for p in zip(sym, sym[1:]):
                pairs[p] = pairs.get(p, 0) + c
                where.setdefault(p, set()).add(i)
        for p in [p for p, c in pairs.items() if c <= 0]:
            del pairs[p]
            where.pop(p, None)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int],
                 eow: str) -> list[str]:
    if not word:
        return []
    sym = list(word[:-1]) + [word[-1] + eow]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeTokenizerTrainer(Estimator, HasInputCol, HasOutputCol):
    """fit(corpus) -> BpeTokenizerModel: learn ``vocabSize`` BPE merges
    from the corpus's word-frequency table.

    fit = one explode + count shuffle (the only corpus-sized work), with
    ``minWordFreq`` cutoff and a deterministic top-``maxWords`` cap
    (count desc, word asc) pushed into TakeOrderedAndProject; the merge
    loop is driver-side over the capped table, per the standard trainer
    architecture.  Merges stop early when no pair repeats (count < 2).
    """

    numMerges = IntParam("numMerges", "Max merge operations to learn "
                         "(subword vocab beyond characters).", 200,
                         ParamValidators.gt(0))
    minWordFreq = IntParam("minWordFreq", "Drop words rarer than this "
                           "from the training table.", 1,
                           ParamValidators.gt(0))
    maxWords = IntParam("maxWords", "Cap on distinct training words.",
                        1_000_000, ParamValidators.gt(0))
    endOfWord = StringParam("endOfWord", "End-of-word marker suffix.", "</w>")

    def fit(self, *inputs: DataFrame) -> "BpeTokenizerModel":
        (df,) = inputs
        wc = (df.select(F.explode(_tokens(F.col(self.get_("inputCol"))))
                        .alias("w"))
              .groupBy("w").count()
              .filter(F.col("count") >= self.get_("minWordFreq"))
              .orderBy(F.col("count").desc(), F.col("w"))
              .limit(self.get_("maxWords")))
        rows = [(r["w"], int(r["count"])) for r in wc.collect()]
        merges = _learn_merges(rows, self.get_("numMerges"),
                               self.get_("endOfWord"))
        model = BpeTokenizerModel()
        model.set_(inputCol=self.get_("inputCol"),
                   outputCol=self.get_("outputCol"),
                   endOfWord=self.get_("endOfWord"))
        model.model_data = {"merges": [list(m) for m in merges]}
        return model


class BpeTokenizerModel(Model, HasInputCol, HasOutputCol):
    """text -> array<string> of BPE subword tokens (greedy lowest-rank
    merge application, the standard BPE encoder)."""

    endOfWord = StringParam("endOfWord", "End-of-word marker suffix.", "</w>")

    def _make_encoder(self):
        # resolve params/model driver-side: Param lookups are identity-
        # keyed and do not survive pickling to workers
        eow = self.get_("endOfWord")
        ranks = {tuple(m): i for i, m in
                 enumerate(self.model_data["merges"])}

        def encode_texts(texts):
            out = []
            cache: dict[str, list[str]] = {}
            for t in texts:
                toks: list[str] = []
                for w in _local_tokens(t):
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks, eow)
                        cache[w] = enc
                    toks.extend(enc)
                out.append(toks)
            return out
        return encode_texts

    def _transform(self, df: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        encode_texts = self._make_encoder()

        def enc(texts):
            return pd.Series(encode_texts(texts))

        enc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        enc = pandas_udf(enc, "array<string>")
        return df.withColumn(self.get_("outputCol"),
                             enc(F.col(self.get_("inputCol"))))

    def transform_local(self, pdf):
        out = pdf.copy()
        out[self.get_("outputCol")] = self._make_encoder()(
            pdf[self.get_("inputCol")])
        return out
