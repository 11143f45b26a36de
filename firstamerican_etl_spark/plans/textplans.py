"""Text-analysis operators over the ``documents`` table (training-data
pipeline extensions): quality scoring, token counting, language-ID
heuristic, document fingerprinting. All built-in ``F.*`` expressions —
JVM-side, codegen'd, no Python UDFs in the hot path — so they scale to
100 TB of text as a pure map stage (zero shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import stable_round
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table

# Tiny per-language stopword anchors for the n-gram language heuristic.
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "zh": ["de", "shi", "le"],
}


@register(
    "text_quality",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(string_split(text, ' ')) AS n_tokens,
       length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS n_punct,
       floor(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) * 100 + 0.5) / 100 AS avg_token_len,
       CASE WHEN length(text) BETWEEN 50 AND 5000
             AND len(string_split(text, ' ')) >= 10 THEN 1 ELSE 0 END AS quality_pass
FROM documents
""",
    tags=("text", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: char/token counts, punctuation density, and a
    length-window pass flag — the standard pre-training corpus filters."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.col("text"), " ", -1))
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        F.length(F.regexp_replace(F.col("text"), r"[^.!?,;]", "")).alias("n_punct"),
        stable_round(n_chars.cast("double") / n_tokens).alias("avg_token_len"),
        F.when(
            n_chars.between(50, 5000) & (n_tokens >= 10), F.lit(1)
        ).otherwise(F.lit(0)).alias("quality_pass"),
    )


@register(
    "token_count",
    oracle="""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+'))  AS n_word_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_ish_tokens
FROM documents
""",
    tags=("text", "tokenize"),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, alpha word regex,
    and a BPE-ish pre-tokenizer regex (words | single non-space
    punctuation) — the cheap proxy for LLM token budgeting."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+", -1)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), 0)).alias(
            "n_word_tokens"
        ),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).alias("n_bpe_ish_tokens"),
    )


def _marker_hits_spark(col, word: str):
    """Occurrences of ' word ' in ' text ' via length-delta — identical
    non-overlapping-count semantics in Spark and DuckDB replace()."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def _marker_hits_sql(word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((length(' ' || text || ' ') - "
        f"length(replace(' ' || text || ' ', '{needle}', ''))) / {len(needle)} AS INTEGER)"
    )


@register(
    "lang_id_heuristic",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_marker_hits_sql('the')} + {_marker_hits_sql('and')} + {_marker_hits_sql('of')}  AS score_en,
         {_marker_hits_sql('el')} + {_marker_hits_sql('la')} + {_marker_hits_sql('que')}   AS score_es,
         {_marker_hits_sql('le')} + {_marker_hits_sql('la')} + {_marker_hits_sql('et')}    AS score_fr,
         {_marker_hits_sql('der')} + {_marker_hits_sql('und')} + {_marker_hits_sql('die')} AS score_de
  FROM documents
)
SELECT doc_id, lang, score_en, score_es, score_fr, score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
            WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
            WHEN score_fr >= score_de THEN 'fr'
            ELSE 'de' END AS lang_pred
FROM scored
""",
    tags=("text", "langid"),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-anchor language ID: count per-language marker-word hits
    and argmax with a deterministic preference order (en>es>fr>de on
    ties). A real system swaps in fastText/CLD3 via a pandas UDF; the
    Spark-side shape (pure map, no shuffle) is identical."""
    d = load_table(spark, sf_dir, "documents")
    scores = {
        lang: sum(
            (_marker_hits_spark(F.col("text"), w) for w in words[1:]),
            _marker_hits_spark(F.col("text"), words[0]),
        )
        for lang, words in _LANG_MARKERS.items()
        if lang != "zh"
    }
    scored = d.select(
        "doc_id",
        "lang",
        scores["en"].alias("score_en"),
        scores["es"].alias("score_es"),
        scores["fr"].alias("score_fr"),
        scores["de"].alias("score_de"),
    )
    pred = (
        F.when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_fr"))
            & (F.col("score_en") >= F.col("score_de")),
            F.lit("en"),
        )
        .when(
            (F.col("score_es") >= F.col("score_fr"))
            & (F.col("score_es") >= F.col("score_de")),
            F.lit("es"),
        )
        .when(F.col("score_fr") >= F.col("score_de"), F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return scored.withColumn("lang_pred", pred)


@register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 16) AS fingerprint
FROM documents
""",
    tags=("text", "fingerprint"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: whitespace-normalize → lowercase → md5
    prefix. The canonical exact-dedup key at corpus scale (16 hex chars
    = 64 bits; collisions ~ birthday bound 2^32 docs)."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return d.select(
        "doc_id", F.substring(F.md5(normalized), 1, 16).alias("fingerprint")
    )
