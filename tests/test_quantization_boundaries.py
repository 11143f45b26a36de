"""Guard the cross-engine float-quantization discipline.

corpus_drift_psi and dsir_importance_weights quantize a float
expression containing a natural log with floor(x*scale + 0.5). JVM
Math.log and DuckDB's libm ln are not guaranteed correctly rounded, so
a ~1-ULP difference landing within ~1e-7 of a floor boundary would
flip the scaled int64 by 1 and hash-mismatch the oracle. This test
pins the residual risk CLOSED on the shipped test corpora: it computes
every pre-floor value on both scale factors and asserts each one is
bounded away from the nearest integer boundary by far more than any
plausible libm divergence. A data regeneration that lands a term near
a boundary fails here first, locally, instead of flaking in the
driver.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.exists(os.path.join(d, "documents.parquet"))
]

# distance from the nearest floor boundary below which we consider the
# quantization at risk; libm divergence is ~1e-15 relative (≈1e-7
# absolute on 1e9-scaled terms), so 1e-5 gives two orders of margin
# while still being satisfiable by real data
_MIN_MARGIN = 1e-5

# mirrors the PSI oracle's `terms` CTE, exposing the PRE-floor value
_PSI_PREFLOOR = """
WITH c AS (
  SELECT lang, source,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb,
         CAST(count(*) AS BIGINT) AS k
  FROM c
)
SELECT ((na + 1.0) / (ta + k) - (nb + 1.0) / (tb + k))
       * ln(((na + 1.0) / (ta + k)) / ((nb + 1.0) / (tb + k)))
       * 1000000000 + 0.5 AS v
FROM c CROSS JOIN tot
"""

# mirrors the DSIR oracle's `lr` CTE (per-bucket log-ratio), the only
# floored float in that plan
_DSIR_PREFLOOR = """
WITH w AS (
  SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
grams AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(words[i] || ' ' || words[i + 1]), 1, 2)) AS BIGINT) AS bucket
  FROM (SELECT doc_id, lang, words, unnest(generate_series(1, len(words) - 1)) AS i FROM w) t
),
raw AS (SELECT bucket, count(*) AS cr FROM grams GROUP BY 1),
tgt AS (SELECT bucket, count(*) AS ct FROM grams WHERE lang = 'en' GROUP BY 1),
tot AS (
  SELECT CAST(sum(cr) AS BIGINT) AS r,
         CAST(coalesce(sum(CASE WHEN t.bucket IS NOT NULL THEN ct END), 0) AS BIGINT) AS tt
  FROM raw LEFT JOIN tgt t USING (bucket)
)
SELECT ln(((coalesce(ct, 0) + 1.0) * (r + 256)) / ((cr + 1.0) * (tt + 256)))
       * 1000000 + 0.5 AS v
FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
"""


def _min_boundary_margin(sf_dir: str, prefloor_sql: str) -> float:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    row = con.execute(
        f"SELECT min(least(v - floor(v), ceil(v) - v)) FROM ({prefloor_sql})"
    ).fetchone()
    con.close()
    assert row is not None and row[0] is not None, "no quantized terms produced"
    return float(row[0])


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_psi_terms_bounded_away_from_floor_boundaries(sf_dir):
    margin = _min_boundary_margin(sf_dir, _PSI_PREFLOOR)
    assert margin > _MIN_MARGIN, (
        f"a PSI term sits {margin:.2e} from a floor boundary at {sf_dir} — "
        "a ~1-ULP JVM-vs-libm ln() divergence could flip the scaled int64"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dsir_logratios_bounded_away_from_floor_boundaries(sf_dir):
    margin = _min_boundary_margin(sf_dir, _DSIR_PREFLOOR)
    assert margin > _MIN_MARGIN, (
        f"a DSIR log-ratio sits {margin:.2e} from a floor boundary at "
        f"{sf_dir} — a ~1-ULP ln() divergence could flip the scaled int64"
    )


# mirrors char_entropy_quality's per-(doc, char) term, the only floored
# float in that plan (log2 instead of ln — same libm risk class)
_ENTROPY_PREFLOOR = """
WITH chars AS (
  SELECT doc_id, length(text) AS n, g.c AS ch
  FROM documents, LATERAL unnest(string_split(text, '')) AS g(c)
  WHERE length(text) > 0
),
hist AS (
  SELECT doc_id, any_value(n) AS n, ch, count(*) AS cnt
  FROM chars GROUP BY doc_id, ch
)
SELECT (CAST(cnt AS DOUBLE) / n) * log2(CAST(n AS DOUBLE) / cnt)
       * 1000000000 + 0.5 AS v
FROM hist
"""


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_entropy_terms_bounded_away_from_floor_boundaries(sf_dir):
    margin = _min_boundary_margin(sf_dir, _ENTROPY_PREFLOOR)
    assert margin > _MIN_MARGIN, (
        f"a char-entropy term sits {margin:.2e} from a floor boundary at "
        f"{sf_dir} — a ~1-ULP log2() divergence could flip the scaled int64"
    )
