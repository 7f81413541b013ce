"""Web-corpus extraction & cleaning: the stages every public web-scale
training-data pipeline (C4, Raffel et al. 2020; RefinedWeb, Penedo et al.
2023; FineWeb) runs BEFORE quality scoring and dedup — HTML→text
extraction, C4-style line filtering, URL normalization / registered-domain
extraction, and page-level word-blocklist gating.

All four operators are pure Column expression chains (JVM codegen, zero
shuffle, no UDF) so at 100 TB they ride the scan: filters stay
pushdown-friendly and the extraction cost is one codegen'd projection.
Every regex is written in the common Java-regex ∩ RE2 dialect (inline
``(?is)`` flags, lazy quantifiers, NO backreferences) so the DuckDB oracle
replays the identical pattern strings.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from ..api import Transformer
from ..param import (BoolParam, HasInputCol, HasOutputCol, IntParam,
                     ParamValidators, StringArrayParam, StringParam)

# ---------------------------------------------------------------------------
# shared regex fragments (Java ∩ RE2 dialect — no backreferences)
# ---------------------------------------------------------------------------

# script/style blocks spelled out separately: a single `<(script|style)...
# </\1>` needs a backreference, which RE2 (the oracle engine) lacks
RE_SCRIPT = r"(?is)<script[^>]*>.*?</script\s*>"
RE_STYLE = r"(?is)<style[^>]*>.*?</style\s*>"
# whole <head> block: title/meta are not body text (C4 extracts body only);
# (\s[^>]*)? keeps <header>/<heading> tags from matching the <head prefix
RE_HEAD = r"(?is)<head(\s[^>]*)?>.*?</head\s*>"
RE_COMMENT = r"(?s)<!--.*?-->"
# closing block-level tags + <br> become newlines so the line structure
# C4LineFilter needs survives extraction
RE_BLOCK = r"(?i)<(br|/p|/div|/li|/h1|/h2|/h3|/h4|/h5|/h6|/tr|/table)[^>]*>"
RE_TAG = r"<[^>]+>"

# (entity, replacement); ``&amp;`` decoded LAST so double-escaped text
# decodes exactly one level (HTML semantics)
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
            ("&amp;", "&")]


class HtmlTextExtractor(Transformer, HasInputCol, HasOutputCol):
    """HTML → plain text: drop ``<script>``/``<style>``/comment blocks,
    turn closing block tags into newlines (preserving line structure for
    the downstream line filters), strip remaining tags, decode the common
    named entities, and collapse whitespace.

    Reference scope: the reference engine has no web-extraction stage;
    this follows the public C4/CCNet preprocessing recipe.  Numeric
    character references beyond ``&#39;`` are left as-is (decoding
    arbitrary ``&#NNNN;`` needs a codepoint→char kernel; plug a pandas
    UDF in front for corpora where they matter — the common named
    entities cover the bulk of real-web text).

    100 TB: one codegen'd projection, zero shuffle, no UDF.
    """

    decodeEntities = BoolParam(
        "decodeEntities", "Decode common named HTML entities.", True)

    def _transform(self, df: DataFrame) -> DataFrame:
        # NULL input behaves as "" (matches transform_local; avoids
        # Spark's size(NULL) = -1 legacy surfacing in derived counts)
        t = F.coalesce(F.col(self.get_("inputCol")), F.lit(""))
        t = F.regexp_replace(t, RE_SCRIPT, " ")
        t = F.regexp_replace(t, RE_STYLE, " ")
        t = F.regexp_replace(t, RE_HEAD, " ")
        t = F.regexp_replace(t, RE_COMMENT, " ")
        t = F.regexp_replace(t, RE_BLOCK, "\n")
        t = F.regexp_replace(t, RE_TAG, " ")
        if self.get_("decodeEntities"):
            for ent, rep in ENTITIES:
                t = F.replace(t, F.lit(ent), F.lit(rep))
        # collapse horizontal whitespace; tidy space around newlines;
        # squeeze blank-line runs; trim
        t = F.regexp_replace(t, r"[ \t\x0B\f\r]+", " ")
        t = F.regexp_replace(t, r" ?\n ?", "\n")
        t = F.regexp_replace(t, r"\n+", "\n")
        t = F.trim(t)
        return df.withColumn(self.get_("outputCol"), t)

    def transform_local(self, pdf):
        rows = []
        for text in pdf[self.get_("inputCol")]:
            t = text or ""
            t = re.sub(r"(?is)<script[^>]*>.*?</script\s*>", " ", t)
            t = re.sub(r"(?is)<style[^>]*>.*?</style\s*>", " ", t)
            t = re.sub(RE_HEAD, " ", t)
            t = re.sub(r"(?s)<!--.*?-->", " ", t)
            t = re.sub(RE_BLOCK, "\n", t)
            t = re.sub(RE_TAG, " ", t)
            if self.get_("decodeEntities"):
                for ent, rep in ENTITIES:
                    t = t.replace(ent, rep)
            t = re.sub(r"[ \t\x0B\f\r]+", " ", t)
            t = re.sub(r" ?\n ?", "\n", t)
            t = re.sub(r"\n+", "\n", t)
            rows.append(t.strip())
        out = pdf.copy()
        out[self.get_("outputCol")] = rows
        return out


class C4LineFilter(Transformer, HasInputCol, HasOutputCol):
    """C4-style line-level cleanup (Raffel et al. 2020 §2.2): keep only
    lines with ≥ ``minWordsPerLine`` words, (optionally) ending in a
    terminal punctuation mark, and containing none of the
    ``blockedSubstrings`` (case-insensitive).  Emits the cleaned text plus
    ``<outputCol>_n_lines`` (kept-line count) so a page-level gate
    (e.g. C4's ≥3-sentence rule) is one pushdown-friendly filter away.

    100 TB: per-row array ops inside codegen, zero shuffle; the kept-line
    count rides the same projection.
    """

    minWordsPerLine = IntParam(
        "minWordsPerLine", "Minimum words for a line to be kept.", 3,
        ParamValidators.gt_eq(0))
    requireTerminalPunct = BoolParam(
        "requireTerminalPunct",
        "Keep only lines ending in . ! ? or a closing quote.", True)
    blockedSubstrings = StringArrayParam(
        "blockedSubstrings",
        "Case-insensitive substrings that disqualify a line.",
        ["javascript", "lorem ipsum", "cookie policy"])

    def _line_keep(self, l: Column) -> Column:
        words = F.array_remove(F.split(F.trim(l), r"[ \t]+"), "")
        keep = F.size(words) >= self.get_("minWordsPerLine")
        if self.get_("requireTerminalPunct"):
            keep = keep & F.rtrim(l).rlike(r'[.!?"”]$')
        for s in self.get_("blockedSubstrings"):
            keep = keep & ~F.contains(F.lower(l), F.lit(s.lower()))
        return keep

    def _transform(self, df: DataFrame) -> DataFrame:
        text = F.coalesce(F.col(self.get_("inputCol")), F.lit(""))
        kept = F.filter(F.split(text, r"\n"), self._line_keep)
        out = self.get_("outputCol")
        return (df.withColumn(out, F.array_join(kept, "\n"))
                  .withColumn(f"{out}_n_lines", F.size(kept)))

    def transform_local(self, pdf):
        blocked = [s.lower() for s in self.get_("blockedSubstrings")]
        min_w = self.get_("minWordsPerLine")
        texts, counts = [], []
        for text in pdf[self.get_("inputCol")]:
            kept = []
            for l in (text or "").split("\n"):
                if len([w for w in re.split(r"[ \t]+", l.strip()) if w]) < min_w:
                    continue
                if self.get_("requireTerminalPunct") and not re.search(
                        r'[.!?"”]$', l.rstrip()):
                    continue
                low = l.lower()
                if any(s in low for s in blocked):
                    continue
                kept.append(l)
            texts.append("\n".join(kept))
            counts.append(len(kept))
        out = pdf.copy()
        out[self.get_("outputCol")] = texts
        out[f"{self.get_('outputCol')}_n_lines"] = counts
        return out


# second-level labels under which a 2-letter ccTLD hosts registrations
# (tiny public-suffix approximation; swap in the full PSL as a broadcast
# map for production)
_SECOND_LEVEL = ["co", "com", "net", "org", "ac", "gov", "edu"]
# anchored to the parameter boundary ([?&], re-emitted via group 1) so
# suffix matches can't fire: '?xgclid=abc' / '?myutm_source=1' are NOT
# tracking params and must survive (ADVICE r04 — the unanchored form
# mangled them, corrupting URLs used as dedup keys)
_TRACKING = (r"(?i)([?&])"
             r"(?:utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_cid|mc_eid)=[^&#]*")


class UrlNormalizer(Transformer, HasInputCol):
    """URL canonicalization + host / registered-domain extraction — the
    key for URL-level dedup and per-domain corpus accounting (RefinedWeb
    §3.1 runs exactly this before its URL filter).

    Emits ``<inputCol>_norm`` (scheme+host lowercased, fragment gone,
    userinfo credentials stripped, tracking params — utm_* / gclid /
    fbclid / msclkid / mc_[ce]id — stripped, dangling ``?``/``&`` tidied,
    default ports dropped),
    ``<inputCol>_host``, and ``<inputCol>_domain`` (registered domain via
    a small public-suffix approximation: last-2 labels, or last-3 when
    the 2nd-level label is co/com/net/org/ac/gov/edu under a 2-letter
    ccTLD).

    100 TB: pure codegen projection, zero shuffle.
    """

    def _transform(self, df: DataFrame) -> DataFrame:
        c = self.get_("inputCol")
        u = F.coalesce(F.col(c), F.lit(""))
        # lowercase the scheme://host authority prefix only (paths are
        # case-sensitive); [^/?#]* cannot over-run into the path
        auth = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
        rest = F.substr(u, F.length(auth) + F.lit(1))
        u = F.concat(F.lower(auth), rest)
        u = F.regexp_replace(u, r"#.*$", "")          # fragment
        # strip userinfo: credentials must never survive into corpus keys
        u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)[^/@?#]*@", r"$1")
        u = F.regexp_replace(u, _TRACKING, r"$1")     # tracking params
        # tidy the holes the param strip leaves (?&x / a=1&&b=2 / tails);
        # no lookaheads anywhere — RE2 (the oracle engine) lacks them
        u = F.regexp_replace(u, r"&&+", "&")
        u = F.regexp_replace(u, r"\?&", "?")
        u = F.regexp_replace(u, r"[?&]+$", "")        # dangling tails
        # default ports: before a path/query/frag, then end-of-authority
        u = F.regexp_replace(u, r"^(https?://[^/:?#]+):(80|443)([/?#])",
                             r"$1$3")
        u = F.regexp_replace(u, r"^(https?://[^/:?#]+):(80|443)$", r"$1")
        host = F.regexp_extract(
            u, r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
        bare = F.regexp_replace(host, r"^www\.", "")
        parts = F.split(bare, r"\.")
        n = F.size(parts)
        sld = F.element_at(parts, -2)
        tld = F.element_at(parts, -1)
        slds = F.array(*[F.lit(s) for s in _SECOND_LEVEL])
        dom3 = F.concat_ws(".", F.element_at(parts, -3), sld, tld)
        dom2 = F.concat_ws(".", sld, tld)
        domain = F.when(n <= 1, bare).otherwise(
            F.when((n >= 3) & F.array_contains(slds, sld)
                   & (F.length(tld) == 2), dom3).otherwise(dom2))
        return (df.withColumn(f"{c}_norm", u)
                  .withColumn(f"{c}_host", host)
                  .withColumn(f"{c}_domain", domain))

    def transform_local(self, pdf):
        c = self.get_("inputCol")
        norms, hosts, doms = [], [], []
        for url in pdf[c]:
            u = url or ""
            m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", u)
            if m:
                u = m.group(1).lower() + u[m.end():]
            u = re.sub(r"#.*$", "", u)
            u = re.sub(r"^([a-z][a-z0-9+.-]*://)[^/@?#]*@", r"\1", u)
            u = re.sub(_TRACKING, r"\1", u)
            u = re.sub(r"&&+", "&", u)
            u = re.sub(r"\?&", "?", u)
            u = re.sub(r"[?&]+$", "", u)
            u = re.sub(r"^(https?://[^/:?#]+):(80|443)([/?#])", r"\1\3", u)
            u = re.sub(r"^(https?://[^/:?#]+):(80|443)$", r"\1", u)
            hm = re.match(r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", u)
            host = hm.group(1) if hm else ""
            bare = re.sub(r"^www\.", "", host)
            parts = bare.split(".") if bare else []
            if len(parts) <= 1:
                dom = bare
            elif (len(parts) >= 3 and parts[-2] in _SECOND_LEVEL
                    and len(parts[-1]) == 2):
                dom = ".".join(parts[-3:])
            else:
                dom = ".".join(parts[-2:])
            norms.append(u)
            hosts.append(host)
            doms.append(dom)
        out = pdf.copy()
        out[f"{c}_norm"], out[f"{c}_host"], out[f"{c}_domain"] = \
            norms, hosts, doms
        return out


class WordBlocklistFilter(Transformer, HasInputCol, HasOutputCol):
    """Page-level blocklist gate (C4's "bad words" rule): count
    whitespace-token hits against a word blocklist and either annotate
    (``mode='flag'``: ``<outputCol>`` = hit count, ``<outputCol>_keep`` =
    hits ≤ maxHits) or drop offending pages (``mode='drop'``).

    Token-exact matching (not substring) — "class" never trips a "ass"
    entry, the classic C4 false-positive.  100 TB: the blocklist folds
    into the codegen'd expression (array literal — fine for the ≤1k-word
    public lists); zero shuffle, and in drop mode the gate is a plain
    pushdown-friendly filter.
    """

    blocklist = StringArrayParam(
        "blocklist", "Lowercase words that count as hits.", None,
        ParamValidators.non_empty_array())
    maxHits = IntParam("maxHits", "Max allowed hits in flag mode's keep "
                       "verdict / drop mode's survival.", 0,
                       ParamValidators.gt_eq(0))
    mode = StringParam("mode", "flag | drop.", "flag",
                       ParamValidators.in_array(["flag", "drop"]))

    def _transform(self, df: DataFrame) -> DataFrame:
        toks = F.array_remove(
            F.split(F.lower(F.coalesce(F.col(self.get_("inputCol")),
                                       F.lit(""))), r"\s"), "")
        blocked = F.array(*[F.lit(w.lower())
                            for w in self.get_("blocklist")])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(blocked, t)))
        out = self.get_("outputCol")
        if self.get_("mode") == "drop":
            return df.where(hits <= self.get_("maxHits"))
        return (df.withColumn(out, hits)
                  .withColumn(f"{out}_keep", hits <= self.get_("maxHits")))

    def transform_local(self, pdf):
        blocked = {w.lower() for w in self.get_("blocklist")}
        max_hits = self.get_("maxHits")
        hit_counts = []
        for text in pdf[self.get_("inputCol")]:
            toks = [t for t in re.split("[ \t\n\x0b\f\r]",
                                        (text or "").lower()) if t]
            hit_counts.append(sum(1 for t in toks if t in blocked))
        if self.get_("mode") == "drop":
            return pdf[[h <= max_hits for h in hit_counts]].reset_index(
                drop=True)
        out = pdf.copy()
        out[self.get_("outputCol")] = hit_counts
        out[f"{self.get_('outputCol')}_keep"] = [h <= max_hits
                                                 for h in hit_counts]
        return out
