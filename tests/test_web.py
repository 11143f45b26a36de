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
        # MULTI-slash tails strip fully (a /$-only strip is not
        # idempotent: 'x//' -> 'x/' -> 'x')
        ("https://a.net/x//", "https://a.net/x"),
        ("https://a.net//", "https://a.net"),
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


def test_normalize_url_properties(spark):
    """Property-based contract (hypothesis): for URLs assembled from
    arbitrary components, (1) normalization is IDEMPOTENT —
    normalize(normalize(u)) == normalize(u) — and (2) invariant under
    every class of injected junk (scheme/host case, www., explicit
    default port, utm_* params, param order, fragment, trailing
    slash). One batched Spark pass over all generated cases."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from pyspark.sql import functions as F

    label = st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=6)
    pathseg = st.text(
        alphabet="abcdefGHIJ0123456789-_", min_size=1, max_size=5
    )
    param = st.tuples(
        st.text(alphabet="abcXYZ", min_size=1, max_size=4),
        st.text(alphabet="abc123", min_size=0, max_size=4),
    )

    cases: list[tuple[str, str]] = []  # (canonical_raw, junked_raw)

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        scheme=st.sampled_from(["http", "https"]),
        host_labels=st.lists(label, min_size=1, max_size=3),
        path=st.lists(pathseg, min_size=0, max_size=3),
        params=st.lists(param, min_size=0, max_size=3, unique_by=lambda p: p[0]),
        junk=st.tuples(
            st.booleans(),  # upper-case scheme/host
            st.booleans(),  # www. prefix
            st.booleans(),  # explicit default port
            st.booleans(),  # utm_ param
            st.booleans(),  # reversed param order
            st.booleans(),  # fragment
            st.booleans(),  # trailing slash (only when path nonempty)
        ),
    )
    def collect(scheme, host_labels, path, params, junk):
        host = ".".join(host_labels) + ".example.com"
        p = "/" + "/".join(path) if path else ""
        q = "&".join(f"{k}={v}" for k, v in params)
        base = f"{scheme}://{host}{p}" + (f"?{q}" if q else "")
        up, www, port, utm, rev, frag, slash = junk
        jh = ("WWW." if www else "") + (host.upper() if up else host)
        jh += (":80" if scheme == "http" else ":443") if port else ""
        jp = p + ("/" if (slash and p) else "")
        qp = [f"{k}={v}" for k, v in (reversed(params) if rev else params)]
        if utm:
            qp.insert(0, "utm_source=junk")
        jq = "&".join(qp)
        junked = (
            (scheme.upper() if up else scheme)
            + f"://{jh}{jp}"
            + (f"?{jq}" if jq else "")
            + ("#frag" if frag else "")
        )
        cases.append((base, junked))

    collect()
    from firstamerican_etl_spark.plans.webplans import normalize_url

    df = spark.createDataFrame(cases, "base string, junked string")
    rows = df.select(
        normalize_url(F.col("base")).alias("n_base"),
        normalize_url(normalize_url(F.col("base"))).alias("n_base2"),
        normalize_url(F.col("junked")).alias("n_junked"),
        "base",
        "junked",
    ).collect()
    for r in rows:
        assert r["n_base"] == r["n_base2"], (r["base"], r["n_base"])
        assert r["n_junked"] == r["n_base"], (r["junked"], r["n_junked"], r["n_base"])
