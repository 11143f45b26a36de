"""URL family behavioral pins beyond the DuckDB oracles: the
normalize_url contract on handcrafted edge URLs, and the designed
four-variant collapse property."""

from __future__ import annotations

from pyspark.sql import functions as F

from firstamerican_etl_spark.plans.webplans import normalize_url


def test_normalize_url_contract(spark):
    cases = [
        # (raw, expected)
        ("https://www.Example.COM/a/b?x=1#frag", "https://example.com/a/b?x=1"),
        ("HTTP://HOST.ORG:80/p", "http://host.org/p"),
        ("https://host.org:443/p", "https://host.org/p"),
        # NON-default port must survive
        ("https://host.org:8443/p", "https://host.org:8443/p"),
        # http with :443 is a real (odd) port - must survive
        ("http://host.org:443/p", "http://host.org:443/p"),
        # utm params dropped, the rest sorted; trailing slash stripped
        (
            "https://a.net/x/?utm_source=tw&b=2&a=1",
            "https://a.net/x?a=1&b=2",
        ),
        # only utm params -> query gone entirely
        ("https://a.net/x?utm_campaign=c", "https://a.net/x"),
        # root path and empty path unify
        ("https://a.net/", "https://a.net"),
        ("https://a.net", "https://a.net"),
        # params are sorted but case-preserved; path case preserved
        ("https://a.net/CaseD?Z=9&a=1", "https://a.net/CaseD?Z=9&a=1"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "raw string")
    got = [
        r["n"]
        for r in df.select(normalize_url(F.col("raw")).alias("n")).collect()
    ]
    for (raw, want), g in zip(cases, got):
        assert g == want, f"{raw}: {g!r} != {want!r}"


def test_four_variant_groups_collapse(spark):
    """Every canonical page at sf0.001 is spelled four ways; the dedup
    must collapse each group to exactly one row with n_docs == 4 and
    keeper == the smallest doc_id of the group."""
    from firstamerican_etl_spark.plans.registry import load_all

    reg = load_all()
    rows = reg["url_normalize_dedup"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 125  # 500 docs / 4 variants
    assert all(r["n_docs"] == 4 for r in rows)
    assert all(r["keeper_doc_id"] % 4 == 0 for r in rows)
    # canonical strings carry none of the junk
    for r in rows:
        u = r["url"]
        assert "#" not in u and "utm" not in u and ":443" not in u
        assert "www." not in u and not u.endswith("/")
        assert u.startswith("https://site")
