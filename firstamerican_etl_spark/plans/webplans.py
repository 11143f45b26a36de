"""Web-corpus URL operators: canonicalization-dedup and registrable-
domain profiling — the FIRST dedup stage of every real web-scale
training-data pipeline (C4/CCNet fetch the same page under dozens of
surface URL spellings; URL-level dedup removes the bulk re-crawl mass
before any content hashing runs).

The driver tables carry no URL column, so — same convention as the
geo family's synthetic coordinates and the multimodal family's
gradient rasters — each query derives a deterministic synthetic URL
from ``doc_id`` via integer arithmetic and string concatenation that
both engines compute identically, with DESIGNED surface variation:
groups of four consecutive doc_ids share one canonical page and differ
only in normalization-removable junk (scheme/host case, ``www.``
prefix, explicit default port, a ``utm_*`` tracking parameter,
shuffled query-parameter order, a fragment, a trailing slash). The
operator under test is the normalization plan, not the data.

Normalization contract (``normalize_url``), the C4-ish canon:

1. scheme and host lowercase; path/query case-preserving
2. leading ``www.`` stripped from the host
3. explicit DEFAULT port stripped (``:80`` for http, ``:443`` for
   https); non-default ports survive
4. fragment dropped
5. ``utm_*`` tracking parameters dropped; surviving query parameters
   SORTED (byte order) so parameter order never splits a page
6. trailing slash stripped from non-root paths; the root path ``/``
   and the empty path unify to empty

Everything is regexp/split/sort on both engines — one scan, one
hash aggregate; no UDF, no shuffle beyond the final groupBy.

Scale: URL dedup is the cheapest stage of the pipeline by design —
normalize is scan-side, the dedup aggregate is map-side-partial on the
canonical string, and the domain profile groups on a derived key of
bounded cardinality (registrable domains). All slopes linear.

Reference parity: fa-etl.py has no web surface; this extends the
brief's training-data-pipeline family (dedup × text analysis).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table

#: registrable-domain suffix list (public-suffix style, the handful the
#: synthetic hosts use; production swaps in the full PSL snapshot —
#: it is a broadcast-sized string set either way)
_TWO_LABEL_SUFFIXES = ("co.uk",)

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def _synth_url(doc_id: Column) -> Column:
    """Deterministic raw URL for ``doc_id``: canonical content key =
    doc_id // 4 (groups of four doc_ids are the SAME page), junk
    variant = doc_id % 4. Integer arithmetic + concat only — the SQL
    oracle rebuilds it verbatim."""
    # exact integer floor-div (doc_id is non-negative): shiftright(x,2)
    # == x // 4 in pure int64 math. `(doc_id / 4).cast("long")` went
    # through a double — exact only below 2^53 and truncating rather
    # than flooring — while the DuckDB oracle computes doc_id // 4
    # exactly (r9 ADVICE).
    page = F.shiftright(doc_id, 2)
    variant = doc_id % 4
    scheme = F.when(variant == 1, F.lit("HTTPS")).otherwise(F.lit("https"))
    host = F.concat(
        F.when(variant == 2, F.lit("www.")).otherwise(F.lit("")),
        F.when(variant == 1, F.lit("Site")).otherwise(F.lit("site")),
        (page % 23).cast("string"),
        F.when(page % 5 == 0, F.lit(".example.co.uk")).otherwise(
            F.lit(".example.com")
        ),
        F.when(variant == 3, F.lit(":443")).otherwise(F.lit("")),
    )
    path = F.concat(
        F.lit("/articles/item"),
        page.cast("string"),
        F.when(variant == 2, F.lit("/")).otherwise(F.lit("")),
    )
    # two real params in variant-dependent order + a utm_ tracker
    p_id = F.concat(F.lit("id="), (page % 100).cast("string"))
    p_ref = F.lit("ref=rss")
    query = F.when(
        variant == 1, F.concat(F.lit("?"), p_ref, F.lit("&"), p_id)
    ).otherwise(
        F.concat(
            F.lit("?"),
            p_id,
            F.lit("&"),
            p_ref,
            F.when(variant == 3, F.lit("&utm_source=feed")).otherwise(F.lit("")),
        )
    )
    frag = F.when(variant == 2, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, query, frag)


#: the same construction in DuckDB SQL (string positions match the
#: column expressions above clause for clause)
_SYNTH_URL_SQL = """
  concat(
    CASE WHEN doc_id % 4 = 1 THEN 'HTTPS' ELSE 'https' END, '://',
    CASE WHEN doc_id % 4 = 2 THEN 'www.' ELSE '' END,
    CASE WHEN doc_id % 4 = 1 THEN 'Site' ELSE 'site' END,
    CAST((doc_id // 4) % 23 AS VARCHAR),
    CASE WHEN (doc_id // 4) % 5 = 0 THEN '.example.co.uk'
         ELSE '.example.com' END,
    CASE WHEN doc_id % 4 = 3 THEN ':443' ELSE '' END,
    '/articles/item', CAST(doc_id // 4 AS VARCHAR),
    CASE WHEN doc_id % 4 = 2 THEN '/' ELSE '' END,
    CASE WHEN doc_id % 4 = 1
         THEN concat('?ref=rss&id=', CAST((doc_id // 4) % 100 AS VARCHAR))
         ELSE concat('?id=', CAST((doc_id // 4) % 100 AS VARCHAR), '&ref=rss',
                     CASE WHEN doc_id % 4 = 3 THEN '&utm_source=feed'
                          ELSE '' END) END,
    CASE WHEN doc_id % 4 = 2 THEN '#section-2' ELSE '' END
  )
"""


def normalize_url(url: Column) -> Column:
    """Canonicalize a URL string column (contract in the module
    docstring). Pure built-in string/array expressions — scan-side,
    codegen'd, reusable on any real URL column."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(url, _URL_RE, 2))
    host1 = F.regexp_replace(host0, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host1, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host1, r":443$", ""))
        .otherwise(host1)
    )
    path0 = F.regexp_extract(url, _URL_RE, 3)
    # /+$ not /$: a single-slash strip is NOT idempotent ('x//' ->
    # 'x/' -> 'x') and leaves multi-slash spellings uncollapsed
    path = F.regexp_replace(path0, r"/+$", "")
    q0 = F.regexp_extract(url, _URL_RE, 4)  # includes leading '?', or ''
    params = F.filter(
        F.split(F.regexp_replace(q0, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike("^utm_"),
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, query)


#: the same normalization in DuckDB SQL over a column named raw_url
_NORMALIZE_SQL = f"""
  concat(
    lower(regexp_extract(raw_url, '{_URL_RE}', 1)),
    '://',
    CASE
      WHEN lower(regexp_extract(raw_url, '{_URL_RE}', 1)) = 'http'
      THEN regexp_replace(
             regexp_replace(lower(regexp_extract(raw_url, '{_URL_RE}', 2)),
                            '^www\\.', ''), ':80$', '')
      WHEN lower(regexp_extract(raw_url, '{_URL_RE}', 1)) = 'https'
      THEN regexp_replace(
             regexp_replace(lower(regexp_extract(raw_url, '{_URL_RE}', 2)),
                            '^www\\.', ''), ':443$', '')
      ELSE regexp_replace(lower(regexp_extract(raw_url, '{_URL_RE}', 2)),
                          '^www\\.', '')
    END,
    regexp_replace(regexp_extract(raw_url, '{_URL_RE}', 3), '/+$', ''),
    CASE
      WHEN len([p for p in
                str_split(regexp_replace(regexp_extract(raw_url, '{_URL_RE}', 4),
                                         '^\\?', ''), '&')
                if p <> '' and not regexp_matches(p, '^utm_')]) > 0
      THEN concat('?', array_to_string(
             list_sort([p for p in
                        str_split(regexp_replace(
                          regexp_extract(raw_url, '{_URL_RE}', 4), '^\\?', ''),
                          '&')
                        if p <> '' and not regexp_matches(p, '^utm_')]), '&'))
      ELSE ''
    END
  )
"""


@register(
    "url_normalize_dedup",
    oracle=f"""
WITH raw AS (
  SELECT doc_id, {_SYNTH_URL_SQL} AS raw_url FROM documents
),
norm AS (
  SELECT doc_id, {_NORMALIZE_SQL} AS url FROM raw
)
SELECT url,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS keeper_doc_id
FROM norm
GROUP BY 1
""",
    tags=("web", "url", "dedup", "normalize", "canonicalization"),
)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: normalize every raw URL (designed
    four-variant groups per canonical page) and collapse to one row
    per canonical URL with multiplicity and the min-doc_id keeper —
    the C4/CCNet pre-content dedup stage. One scan + one map-side-
    partial hash aggregate; the four surface variants per page pin
    every normalization clause (case, www, :443, utm strip, param
    sort, fragment, trailing slash) against the SQL oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    raw = docs.select("doc_id", _synth_url(F.col("doc_id")).alias("raw_url"))
    norm = raw.select("doc_id", normalize_url(F.col("raw_url")).alias("url"))
    return norm.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


@register(
    "domain_registrable_profile",
    oracle=f"""
WITH raw AS (
  SELECT d.doc_id, d.n_chars, {_SYNTH_URL_SQL} AS raw_url FROM documents d
),
hosts AS (
  SELECT doc_id, n_chars,
         regexp_replace(
           regexp_replace(lower(regexp_extract(raw_url, '{_URL_RE}', 2)),
                          '^www\\.', ''), ':[0-9]+$', '') AS host
  FROM raw
),
reg AS (
  SELECT doc_id, n_chars, host,
         CASE WHEN host LIKE '%.co.uk'
              THEN regexp_extract(host, '([^.]+\\.co\\.uk)$', 1)
              ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END AS domain
  FROM hosts
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM reg
GROUP BY 1
""",
    tags=("web", "url", "domain", "profile", "public-suffix"),
)
def domain_registrable_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-REGISTRABLE-domain corpus profile: collapse hosts to their
    registrable domain (public-suffix aware — ``a.b.example.co.uk``
    and ``example.co.uk`` are one domain, ``.com`` hosts take the last
    two labels) and aggregate doc count, distinct-host count, and
    total chars. The standard web-corpus governance view: per-domain
    quotas, blocklists, and quality priors all key on the registrable
    domain, never the raw host. Suffix handling is a bounded CASE over
    the (broadcast-sized) suffix list; the aggregate is one hash
    group-by on a bounded-cardinality key."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    raw = docs.select(
        "doc_id", "n_chars", _synth_url(F.col("doc_id")).alias("raw_url")
    )
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(F.col("raw_url"), _URL_RE, 2)),
            r"^www\.",
            "",
        ),
        r":[0-9]+$",
        "",
    )
    hosts = raw.select("doc_id", "n_chars", host.alias("host"))
    # the when-chain is BUILT from the suffix list (swap in the full
    # PSL snapshot there and this expression follows; the SQL oracle
    # mirrors the fixture's one-suffix case by hand)
    domain = F.regexp_extract(F.col("host"), r"([^.]+\.[^.]+)$", 1)
    for suffix in _TWO_LABEL_SUFFIXES:
        pat = "([^.]+\\." + suffix.replace(".", "\\.") + ")$"
        domain = F.when(
            F.col("host").endswith("." + suffix),
            F.regexp_extract(F.col("host"), pat, 1),
        ).otherwise(domain)
    return (
        hosts.select("host", "n_chars", domain.alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
