"""Round-10 tests, part 3: URL canonicalization semantics and the
content-hash split's leakage guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_canonical_url_rules(spark):
    """Each documented rule in isolation: case, explicit port,
    fragment, utm params, param order, trailing index.html — plus a
    URL that needs none of them surviving untouched."""
    from synthea_etl_spark.plans.llm15 import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM/A/b", "https://www.example.com/A/b"),
        ("https://example.com:443/x?a=1", "https://example.com/x?a=1"),
        ("https://example.com/x#frag", "https://example.com/x"),
        (
            "https://example.com/x?utm_source=a&k=v&utm_campaign=b",
            "https://example.com/x?k=v",
        ),
        ("https://example.com/x?b=2&a=1", "https://example.com/x?a=1&b=2"),
        (
            "https://example.com/dir/index.html",
            "https://example.com/dir/",
        ),
        (
            "http://example.com/already/fine?a=1&b=2",
            "http://example.com/already/fine?a=1&b=2",
        ),
        # utm-only query: the '?' disappears entirely
        ("https://example.com/x?utm_source=a", "https://example.com/x"),
        # default port drops per scheme; NON-default ports are
        # distinct resources and survive (round-10 ADVICE)
        ("http://example.com:80/x", "http://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("https://example.com:8443/x?b=2&a=1",
         "https://example.com:8443/x?a=1&b=2"),
        # a param merely STARTING with 'utm' but not 'utm_' is kept
        ("https://example.com/x?utmXsource=1&a=1",
         "https://example.com/x?a=1&utmXsource=1"),
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    out = df.select("expected", canonical_url("url").alias("got")).collect()
    for r in out:
        assert r.got == r.expected, (r.got, r.expected)
    # path case is PRESERVED (paths are case-sensitive; only
    # scheme/host normalize)
    assert out[0].got.endswith("/A/b")


def test_content_hash_split_is_leakage_safe(spark):
    """Byte-identical (after whitespace normalization) documents must
    land in the same split regardless of doc_id — the property a
    doc_id-hash split violates; and the 80/10/10 buckets should be
    roughly honored over distinct contents."""
    from synthea_etl_spark.plans.llm15 import q211_content_hash_split

    import os
    import tempfile

    rows = []
    for i in range(300):
        rows.append((i, "src", f"unique document number {i} body"))
        # a far-away duplicate of every 4th doc, with sloppier spacing
        if i % 4 == 0:
            rows.append(
                (10_000 + i, "src", f"  unique document   number {i} body ")
            )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = q211_content_hash_split(spark, d).collect()
    split = {r.doc_id: r.split for r in out}
    for i in range(0, 300, 4):
        assert split[i] == split[10_000 + i]  # dup pair never straddles
    from collections import Counter

    hist = Counter(split[i] for i in range(300))
    assert hist["train"] > hist["val"] and hist["train"] > hist["test"]
    assert set(hist) == {"train", "val", "test"}
