"""Web-extraction family: HTML→text, C4 line filter, URL normalizer,
word blocklist — Spark/local parity + behavior on real-web fixtures."""

import pandas as pd

from flink_ml_spark.llmdata import (C4LineFilter, HtmlTextExtractor,
                                    UrlNormalizer, WordBlocklistFilter)

HTML = (
    "<html><head><title>T</title>"
    "<style type='text/css'>body { color: red; }</style>"
    "<script>var x = '<p>not text</p>';</script></head>"
    "<body><!-- hidden\ncomment --><h1>Header one.</h1>"
    "<p>First paragraph with &amp;amp; and &lt;tags&gt; and Tom &amp; Co.</p>"
    "<div>Second&nbsp;block line.</div>"
    "<ul><li>item alpha has five words.</li><li>short</li></ul>"
    "JavaScript cookie policy line here ok.</body></html>")


def _extract_df(spark):
    return spark.createDataFrame([(1, HTML), (2, "plain text, no markup."),
                                  (3, None)], "doc_id long, raw string")


def test_html_extractor_spark(spark):
    out = HtmlTextExtractor(inputCol="raw", outputCol="text") \
        .transform(_extract_df(spark))[0]
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    t = got[1]
    assert "var x" not in t and "color: red" not in t  # script/style gone
    assert "hidden" not in t                            # comment gone
    assert "Header one." in t
    # one-level entity decode: &amp;amp; -> &amp;, &amp; -> &
    assert "with &amp; and <tags> and Tom & Co." in t
    assert "Second block line." in t                    # &nbsp;
    # closing block tags became newlines -> line structure survives
    lines = t.split("\n")
    assert "Header one." in lines
    assert "item alpha has five words." in lines
    assert got[2] == "plain text, no markup."
    assert got[3] == ""  # NULL input behaves as empty (local parity)


def test_html_extractor_local_parity(spark):
    ex = HtmlTextExtractor(inputCol="raw", outputCol="text")
    df = _extract_df(spark)  # includes the NULL row: "" both paths
    spark_rows = {r["doc_id"]: r["text"] for r in ex.transform(df)[0].collect()}
    pdf = ex.transform_local(df.toPandas())
    for did, text in zip(pdf["doc_id"], pdf["text"]):
        assert spark_rows[did] == text


def test_c4_line_filter(spark):
    text = ("Good sentence with enough words here.\n"
            "short line.\n"
            "no terminal punctuation on this line\n"
            "Enable JavaScript to view this page.\n"
            "Another keeper line stays in place.")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    f = C4LineFilter(inputCol="text", outputCol="clean", minWordsPerLine=4)
    row = f.transform(df)[0].collect()[0]
    assert row["clean"].split("\n") == [
        "Good sentence with enough words here.",
        "Another keeper line stays in place."]
    assert row["clean_n_lines"] == 2
    # local parity
    pdf = f.transform_local(pd.DataFrame({"doc_id": [1], "text": [text]}))
    assert pdf["clean"][0] == row["clean"]
    assert pdf["clean_n_lines"][0] == 2
    # punctuation requirement off: the bare line comes back
    loose = C4LineFilter(inputCol="text", outputCol="clean",
                         minWordsPerLine=4, requireTerminalPunct=False)
    assert "no terminal punctuation on this line" in \
        loose.transform(df)[0].collect()[0]["clean"]


URLS = [
    (1, "HTTPS://WWW.Shop.Example.COM:443/Items?utm_source=nl&id=7&fbclid=x#top"),
    (2, "http://news.example.co.uk:80/a/b?utm_campaign=c"),
    (3, "https://example.com/?gclid=g"),
    (4, "https://user:pw@files.example.org/d?a=1&utm_medium=m&b=2"),
    (5, "ftp://Mirror.Example.NET/pub"),
    (6, "https://localhost/x"),
]


def test_url_normalizer(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    out = {r["id"]: r for r in
           UrlNormalizer(inputCol="url").transform(df)[0].collect()}
    assert out[1]["url_norm"] == "https://www.shop.example.com/Items?id=7"
    assert out[1]["url_host"] == "www.shop.example.com"
    assert out[1]["url_domain"] == "example.com"
    assert out[2]["url_norm"] == "http://news.example.co.uk/a/b"
    assert out[2]["url_domain"] == "example.co.uk"
    assert out[3]["url_norm"] == "https://example.com/"
    assert out[4]["url_norm"] == "https://files.example.org/d?a=1&b=2"
    assert out[4]["url_host"] == "files.example.org"
    assert out[5]["url_host"] == "mirror.example.net"
    assert out[6]["url_domain"] == "localhost"


def test_url_normalizer_tracking_anchored(spark):
    """The tracking-param strip is anchored to a [?&] boundary: suffix
    matches ('?xgclid=', '?myutm_source=') are NOT tracking params and
    must survive untouched (ADVICE r04 — the unanchored pattern mangled
    them, corrupting URLs used as dedup keys)."""
    rows = [
        (1, "https://a.example.com/p?xgclid=abc"),
        (2, "https://a.example.com/p?myutm_source=1&b=2"),
        (3, "https://a.example.com/p?gclid=abc&utm_source=x"),
        (4, "https://a.example.com/p?a=1&gclid=x&b=2"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    n = UrlNormalizer(inputCol="url")
    out = {r["id"]: r["url_norm"] for r in n.transform(df)[0].collect()}
    assert out[1] == "https://a.example.com/p?xgclid=abc"
    assert out[2] == "https://a.example.com/p?myutm_source=1&b=2"
    assert out[3] == "https://a.example.com/p"
    assert out[4] == "https://a.example.com/p?a=1&b=2"
    # local parity on the same cases
    pdf = n.transform_local(df.toPandas())
    for _, r in pdf.iterrows():
        assert r["url_norm"] == out[r["id"]]


def test_url_normalizer_local_parity(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    n = UrlNormalizer(inputCol="url")
    srows = {r["id"]: r for r in n.transform(df)[0].collect()}
    pdf = n.transform_local(df.toPandas())
    for _, r in pdf.iterrows():
        s = srows[r["id"]]
        for c in ("url_norm", "url_host", "url_domain"):
            assert s[c] == r[c], (r["id"], c)


def test_word_blocklist(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "BADWORD in this class text"),
         (3, "badword badword twice")], "id long, text string")
    f = WordBlocklistFilter(inputCol="text", outputCol="hits",
                            blocklist=["badword", "ass"])
    rows = {r["id"]: r for r in f.transform(df)[0].collect()}
    assert rows[1]["hits"] == 0 and rows[1]["hits_keep"]
    # token-exact: "class" must NOT trip the "ass" entry; case-folded hit
    assert rows[2]["hits"] == 1 and not rows[2]["hits_keep"]
    assert rows[3]["hits"] == 2
    dropped = f.set_(mode="drop").transform(df)[0]
    assert [r["id"] for r in dropped.orderBy("id").collect()] == [1]
    # local parity (flag mode)
    f.set_(mode="flag")
    pdf = f.transform_local(df.toPandas())
    assert list(pdf["hits"]) == [0, 1, 2]


def test_webextract_save_load(spark, tmp_path):
    for stage in (HtmlTextExtractor(inputCol="raw", outputCol="t",
                                    decodeEntities=False),
                  C4LineFilter(inputCol="t", outputCol="c",
                               minWordsPerLine=7,
                               blockedSubstrings=["xyz"]),
                  UrlNormalizer(inputCol="u"),
                  WordBlocklistFilter(inputCol="t", outputCol="h",
                                      blocklist=["a", "b"], maxHits=2)):
        p = str(tmp_path / type(stage).__name__)
        stage.save(p)
        back = type(stage).load(spark, p)
        assert back.params_json() == stage.params_json()
