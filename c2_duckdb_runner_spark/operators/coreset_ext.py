"""Round-3 coreset / novelty / seasonal extensions.

Four more training-data-platform operators (reference reach: the delegated
SQL slot, ``main.cc:181-182``):

- greedy k-center coreset selection (farthest-first traversal) — the
  diversity-pruning pass that picks a small representative subset of an
  embedding corpus for labeling / distillation / eval;
- corpus n-gram novelty scoring — how much of each document is text the
  corpus has never seen before it (the growth-measurement twin of the
  contamination check);
- seasonality-aware anomaly baseline — hour-of-day-conditioned count
  anomalies, the follow-up every team ships after a global z-score pages
  them at 9am daily;
- base64 / hex / digest codec round-trips — the codec scalar family.

Determinism: distances are index-ordered folds (bit-identical doubles),
selection steps are total-ordered, seasonal flags are the integer
rearrangement (no division), codecs are byte-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load, load_spread

# ---------------------------------------------------------------------------
# sample_coreset_kcenter
# ---------------------------------------------------------------------------

_K_CENTERS = 8
_SEED_ID = 0

# squared L2 between row vector v and (broadcast) center vector cv — strict
# left-to-right fold, so Spark and DuckDB produce the same double.
_SPARK_D2 = (
    "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
)


def _kcenter_oracle() -> str:
    """Unroll farthest-first traversal as a DuckDB CTE chain (the
    simsearch_kmeans_train / simsearch_rerank_mmr technique)."""

    def d2(center_cte: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, 65), "
            f"i -> (b.v[i] - {center_cte}.cv[i]) * (b.v[i] - {center_cte}.cv[i])), "
            f"(x, y) -> x + y)"
        )

    parts = [
        f"""
n AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c1 AS (SELECT v AS cv FROM n WHERE vec_id = {_SEED_ID}),
b1 AS (
  SELECT b.vec_id AS vec_id, b.v AS v, {d2('c1')} AS best
  FROM n b, c1
),
s1 AS (SELECT {_SEED_ID} AS vec_id, 1 AS sel_rank, CAST(0.0 AS DOUBLE) AS sel_dist)"""
    ]
    for r in range(2, _K_CENTERS + 1):
        parts.append(
            f"""
s{r} AS (
  SELECT vec_id, {r} AS sel_rank, best AS sel_dist FROM b{r - 1}
  ORDER BY best DESC, vec_id ASC LIMIT 1
),
c{r} AS (
  SELECT n.v AS cv FROM n JOIN s{r} ON n.vec_id = s{r}.vec_id
),
b{r} AS (
  SELECT b.vec_id AS vec_id, b.v AS v, least(b.best, {d2(f'c{r}')}) AS best
  FROM b{r - 1} b, c{r}
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT vec_id, sel_rank, sel_dist FROM s{i}"
        for i in range(1, _K_CENTERS + 1)
    )
    return f"WITH {','.join(parts)}\n{union}"


@register("sample_coreset_kcenter", oracle=_kcenter_oracle())
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (farthest-first traversal): seed with one
    vector, then k−1 times pick the point farthest from everything picked
    so far. The classic diversity-pruning / coreset pass (Sener &
    Savarese's active-learning core-set, dataset distillation seeding) —
    sel_dist is the shrinking coverage radius, the quality certificate
    (2-approximation of the optimal k-center radius).

    Scale shape — the textbook distributed farthest-first: the corpus
    carries a running ``best`` (min squared-L2 to any selected center), so
    each of the k−1 rounds is (1) broadcast the ONE new center, (2)
    map-only ``least(best, d²(v, c))`` update, (3) TakeOrdered(1) argmax —
    no corpus shuffle anywhere, state is one double per row,
    localCheckpoint truncates the k-deep lineage. Distances are
    index-ordered folds, so the DuckDB unrolled-CTE oracle replays every
    pick bit-for-bit."""
    n = (
        load_spread(spark, sf_dir, "embeddings", "vec_id")
        .select(
            "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
        )
    )
    seed = n.filter(F.col("vec_id") == _SEED_ID).select(F.col("v").alias("cv"))
    state = (
        n.crossJoin(F.broadcast(seed))
        .select("vec_id", "v", F.expr(_SPARK_D2).alias("best"))
        .localCheckpoint()
    )
    picks = [(_SEED_ID, 1, 0.0)]
    sel_rows = None
    for r in range(2, _K_CENTERS + 1):
        nxt = (
            state.orderBy(F.desc("best"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", F.lit(r).alias("sel_rank"), F.col("best").alias("sel_dist"))
        )
        sel_rows = nxt if sel_rows is None else sel_rows.union(nxt)
        center = state.join(nxt.select("vec_id"), "vec_id", "semi").select(
            F.col("v").alias("cv")
        )
        state = (
            state.crossJoin(F.broadcast(center))
            .select(
                "vec_id",
                "v",
                F.least(F.col("best"), F.expr(_SPARK_D2)).alias("best"),
            )
            .localCheckpoint()
        )
    seed_row = (
        n.filter(F.col("vec_id") == _SEED_ID)
        .select(
            "vec_id",
            F.lit(1).alias("sel_rank"),
            F.lit(0.0).cast("double").alias("sel_dist"),
        )
    )
    return seed_row.union(sel_rows)


# ---------------------------------------------------------------------------
# text_ngram_novelty
# ---------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
tg AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM t CROSS JOIN UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM tg GROUP BY g)
SELECT tg.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_trigrams,
       CAST(SUM(CASE WHEN first_doc = tg.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN first_doc = tg.doc_id THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
FROM tg JOIN first ON first.g = tg.g
GROUP BY tg.doc_id
""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram novelty — for each document, the share of its distinct
    trigrams that appear for the FIRST time in that document (by ingestion
    order = doc_id). The growth-measurement twin of the contamination
    check: a crawl whose novelty curve collapses toward zero is re-crawling
    itself; documents scoring near zero are recombinations of seen text
    and get down-weighted in curriculum mixtures.

    Shape: distinct (doc, trigram) pairs, a global min-doc per trigram
    (map-side-combinable), then one re-join on the trigram key and a
    per-doc rollup — the same two-keyed-shuffles silhouette as
    text_bigram_logprob, nothing corpus-sized on any single key (trigram
    frequencies are long-tail). Novelty is exact integer ppm."""
    t = load_spread(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    tg = (
        t.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, greatest(size(t) - 2, 0))"),
                    F.expr("slice(t, 2, greatest(size(t) - 2, 0))"),
                    F.expr("slice(t, 3, greatest(size(t) - 2, 0))"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.concat_ws(" ", "p.0", "p.1", "p.2").alias("g"))
        .distinct()
    )
    first = tg.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        tg.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_trigrams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_distinct_trigrams",
            "n_novel",
            F.expr(
                "CAST(n_novel * 1000000 div n_distinct_trigrams AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# ts_seasonal_hour_baseline
# ---------------------------------------------------------------------------


@register(
    "ts_seasonal_hour_baseline",
    oracle="""
WITH d AS (
  SELECT event_type,
         CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
         CAST((epoch_ms(ts) // 3600000) % 24 AS BIGINT) AS hod,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2, 3
),
base AS (
  SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS tot, CAST(SUM(c * c) AS BIGINT) AS sq
  FROM d WHERE day < 19742 GROUP BY event_type, hod
)
SELECT d.event_type AS event_type, d.hod AS hod, d.day AS day,
       CAST(d.c AS BIGINT) AS n_events,
       CAST(d.c * n - tot AS BIGINT) AS dev_n,
       ((d.c * n - tot) * (d.c * n - tot) > 4 * (n * sq - tot * tot))
         AS is_anomaly
FROM d JOIN base ON base.event_type = d.event_type AND base.hod = d.hod
WHERE d.day >= 19742
""",
)
def ts_seasonal_hour_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection — the upgrade every team ships
    after ts_anomaly_zscore pages them at the same hour every morning:
    counts are compared against a baseline conditioned on HOUR-OF-DAY, so
    the daily traffic shape is modeled instead of alarmed on. Baseline =
    per (type, hour-of-day) daily-count statistics from the training
    window (days before epoch-day 19742 = 2024-01-20); evaluation = the
    days after, flagged at |z| > 2 via the same integer rearrangement as
    the global detector ((c·n−T)² > 4(nQ−T²): no division, no float,
    engine-exact).

    Shape: one (type, day, hod) count reduce; the baseline table is
    |types|·24 rows and broadcasts back onto the evaluation slice. The
    train/eval day split is on the partition-prunable time column — on a
    date-partitioned 100 TB table both branches prune to their windows."""
    d = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)").alias("day"),
            F.expr("CAST((unix_millis(ts) div 3600000) % 24 AS BIGINT)").alias(
                "hod"
            ),
        )
        .groupBy("event_type", "day", "hod")
        .agg(F.count("*").alias("c"))
    )
    base = (
        d.filter(F.col("day") < 19742)
        .groupBy("event_type", "hod")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("tot"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq"),
        )
    )
    ev = d.filter(F.col("day") >= 19742)
    return (
        ev.join(F.broadcast(base), ["event_type", "hod"])
        .select(
            "event_type",
            "hod",
            "day",
            F.col("c").cast("bigint").alias("n_events"),
            (F.col("c") * F.col("n") - F.col("tot"))
            .cast("bigint")
            .alias("dev_n"),
            (
                (F.col("c") * F.col("n") - F.col("tot"))
                * (F.col("c") * F.col("n") - F.col("tot"))
                > 4 * (F.col("n") * F.col("sq") - F.col("tot") * F.col("tot"))
            ).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# fn_codec_roundtrip
# ---------------------------------------------------------------------------


@register(
    "fn_codec_roundtrip",
    oracle="""
SELECT doc_id,
       to_base64(encode(text)) AS b64,
       (decode(from_base64(to_base64(encode(text)))) = text) AS b64_ok,
       substr(hex(encode(text)), 1, 16) AS hex16,
       md5(text) AS md5_hex,
       sha256(text) AS sha256_hex
FROM documents
""",
)
def fn_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec scalar family: base64 encode → decode round-trip, hex dump,
    MD5 and SHA-256 digests — the content-addressing primitives under
    every dedup key, cache key, and artifact manifest in a data platform.
    All byte-exact (RFC 4648 base64, uppercase hex, lowercase hex
    digests), so two independent engine implementations must agree
    character-for-character. Map-only projection, whole-stage codegen."""
    d = load(spark, sf_dir, "documents")
    enc = F.encode(F.col("text"), "UTF-8")
    # Spark's base64 is the MIME codec (76-char lines joined with CRLF);
    # RFC-4648 canonical form has no line breaks, so strip them — DuckDB
    # emits the unchunked form natively.
    b64 = F.replace(F.base64(enc), F.lit("\r\n"), F.lit(""))
    return d.select(
        "doc_id",
        b64.alias("b64"),
        (F.decode(F.unbase64(F.base64(enc)), "UTF-8") == F.col("text")).alias(
            "b64_ok"
        ),
        F.substring(F.hex(enc), 1, 16).alias("hex16"),
        F.md5(enc).alias("md5_hex"),
        F.sha2(enc, 256).alias("sha256_hex"),
    )
