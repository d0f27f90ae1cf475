"""Round-3 flagship composite: the full curation gate in one query, plus
content-addressed IDs.

- ``pipeline_curation_gate`` — the END-TO-END corpus admission decision:
  four independent screens (length bounds, repetition, exact-dup keeper,
  stopword/language sanity) evaluated in ONE pass, packed into a reason
  BITMASK with the final keep verdict. This is the query a data-platform
  user actually ships: per-document, auditable (every rejection carries
  its reasons), and re-runnable on any slice.
- ``fn_uuid_content_id`` — deterministic content-addressed IDs in UUID
  format (md5-based, RFC 4122 version-3 layout): the stable join key a
  pipeline assigns before anything else touches the data.

Determinism: all screens are integer ratios (ppm) or hash equality; the
bitmask is exact; UUID formatting is pure string surgery over md5 hex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load, load_spread

# Gate thresholds (documented constants — the auditable config surface).
_MIN_TOKENS = 10
_MAX_TOKENS = 5000
_MAX_TOP_TOK_PPM = 200_000  # top token > 20% of doc -> repetition reject
_MIN_STOPS = 1  # at least one function word must appear

_GATE_STOPS = "'the', 'a', 'of', 'and', 'to', 'in'"


@register(
    "pipeline_curation_gate",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, md5(text) AS h
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
),
tc AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok
),
per_doc AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(MAX(c) AS BIGINT) AS top_tok_n
  FROM tc GROUP BY doc_id
),
stops AS (
  SELECT t.doc_id AS doc_id,
         len(list_distinct(list_filter(toks, x -> x IN ({_GATE_STOPS}))))
           AS n_stops
  FROM t
),
keeper AS (SELECT h, MIN(doc_id) AS keeper_id FROM t GROUP BY h),
g AS (
  SELECT t.doc_id AS doc_id, n_tokens,
         CAST(top_tok_n * 1000000 // n_tokens AS BIGINT) AS top_tok_ppm,
         n_stops, (t.doc_id <> keeper.keeper_id) AS is_dup,
         (n_tokens < {_MIN_TOKENS} OR n_tokens > {_MAX_TOKENS}) AS r_len,
         (top_tok_n * 1000000 // n_tokens > {_MAX_TOP_TOK_PPM}) AS r_rep,
         (n_stops < {_MIN_STOPS}) AS r_lang
  FROM t JOIN per_doc ON per_doc.doc_id = t.doc_id
         JOIN stops ON stops.doc_id = t.doc_id
         JOIN keeper ON keeper.h = t.h
)
SELECT doc_id, n_tokens, top_tok_ppm, CAST(n_stops AS BIGINT) AS n_stops,
       CAST(CASE WHEN r_len THEN 1 ELSE 0 END
          + CASE WHEN r_rep THEN 2 ELSE 0 END
          + CASE WHEN r_lang THEN 4 ELSE 0 END
          + CASE WHEN is_dup THEN 8 ELSE 0 END AS BIGINT) AS reject_mask,
       (NOT (r_len OR r_rep OR r_lang OR is_dup)) AS keep
FROM g
""",
)
def pipeline_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation gate — what a corpus admission job actually
    ships: every document passes four independent screens in one pipeline
    and leaves with an auditable verdict. Screens: token-count bounds
    (bit 1), single-token repetition dominance > 20% (bit 2), zero
    function words = language/garbage sanity (bit 4), exact-duplicate
    non-keeper (bit 8). The REASON BITMASK is the operational point —
    rejected docs are debuggable and re-admittable per-screen when a
    threshold changes, without re-running the other screens.

    Scale shape: one token-counts reduce per doc feeds both the length
    and repetition screens; the stopword screen is a map-side
    higher-order filter; the dup screen is one hash-keyed min; all joins
    are doc-keyed or hash-keyed — four screens, three keyed shuffles,
    zero Python. Every score is an exact integer (ppm, counts, bitmask),
    so the full verdict table hash-matches across engines."""
    t = load_spread(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.split("text", " ").alias("toks"), F.md5("text").alias("h")
    )
    tc = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.max("c").cast("bigint").alias("top_tok_n"),
    )
    stops = t.select(
        "doc_id",
        F.expr(
            f"size(array_distinct(filter(toks, x -> x IN ({_GATE_STOPS}))))"
        ).alias("n_stops"),
    )
    keeper = t.groupBy("h").agg(F.min("doc_id").alias("keeper_id"))
    g = (
        t.join(per_doc, "doc_id")
        .join(stops, "doc_id")
        .join(keeper, "h")
        .select(
            "doc_id",
            "n_tokens",
            F.expr("CAST(top_tok_n * 1000000 div n_tokens AS BIGINT)").alias(
                "top_tok_ppm"
            ),
            F.col("n_stops").cast("bigint").alias("n_stops"),
            ((F.col("n_tokens") < _MIN_TOKENS) | (F.col("n_tokens") > _MAX_TOKENS)).alias("r_len"),
            (
                F.expr("top_tok_n * 1000000 div n_tokens") > _MAX_TOP_TOK_PPM
            ).alias("r_rep"),
            (F.col("n_stops") < _MIN_STOPS).alias("r_lang"),
            (F.col("doc_id") != F.col("keeper_id")).alias("is_dup"),
        )
    )
    return g.select(
        "doc_id",
        "n_tokens",
        "top_tok_ppm",
        "n_stops",
        (
            F.when(F.col("r_len"), 1).otherwise(0)
            + F.when(F.col("r_rep"), 2).otherwise(0)
            + F.when(F.col("r_lang"), 4).otherwise(0)
            + F.when(F.col("is_dup"), 8).otherwise(0)
        )
        .cast("bigint")
        .alias("reject_mask"),
        (
            ~(F.col("r_len") | F.col("r_rep") | F.col("r_lang") | F.col("is_dup"))
        ).alias("keep"),
    )


@register(
    "fn_uuid_content_id",
    oracle="""
WITH h AS (SELECT doc_id, md5(text) AS x FROM documents)
SELECT doc_id,
       substring(x, 1, 8) || '-' || substring(x, 9, 4) || '-3'
         || substring(x, 14, 3) || '-'
         || CASE WHEN substring(x, 17, 1) IN ('0','1','2','3')
                 THEN '8' WHEN substring(x, 17, 1) IN ('4','5','6','7')
                 THEN '9' WHEN substring(x, 17, 1) IN ('8','9','a','b')
                 THEN 'a' ELSE 'b' END
         || substring(x, 18, 3) || '-' || substring(x, 21, 12) AS content_uuid
FROM h
""",
)
def fn_uuid_content_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed UUIDs — the stable identifier a pipeline assigns
    to each document BEFORE anything else runs, so every later stage
    (dedup decisions, annotations, lineage) joins on an id that never
    changes across re-crawls of identical content. RFC-4122 version-3
    layout over md5: version nibble forced to '3', variant nibble folded
    into 10xx (hex 8/9/a/b) — the same bit surgery the uuid3 spec does,
    expressed as string ops both engines share. Map-only, codegen,
    deterministic forever."""
    h = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("x")
    )
    variant = (
        F.when(F.substring("x", 17, 1).isin("0", "1", "2", "3"), "8")
        .when(F.substring("x", 17, 1).isin("4", "5", "6", "7"), "9")
        .when(F.substring("x", 17, 1).isin("8", "9", "a", "b"), "a")
        .otherwise("b")
    )
    return h.select(
        "doc_id",
        F.concat(
            F.substring("x", 1, 8),
            F.lit("-"),
            F.substring("x", 9, 4),
            F.lit("-3"),
            F.substring("x", 14, 3),
            F.lit("-"),
            variant,
            F.substring("x", 18, 3),
            F.lit("-"),
            F.substring("x", 21, 12),
        ).alias("content_uuid"),
    )
