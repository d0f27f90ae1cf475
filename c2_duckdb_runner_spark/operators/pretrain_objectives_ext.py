"""Round-4 pretraining-objective / curation-weighting extensions — four
operators from the LLM-training-pipeline papers, all oracled:

- SPAN-CORRUPTION MASK (T5 denoising objective): deterministically mask
  ~15% of tokens in 3-token spans (md5 coin per span slot), emit the
  sentinel-masked input and the target sequence — the map-only
  pretraining-data transform that runs right after curation;
- SOFT DEDUPLICATION (SoftDeDup): instead of DROPPING near-duplicates,
  DOWN-WEIGHT them by 1/cluster-size so the training distribution keeps
  coverage without over-representing boilerplate — weights in exact
  micro integers over head-fingerprint clusters;
- MIXTURE KL DIVERGENCE — KL(short-doc source mix ‖ overall source mix),
  the drift check a data-mixture pipeline runs before re-weighting
  (add-one smoothed, ordered ln fold over the bounded source domain);
- PASS@K ESTIMATOR — the unbiased combinatorial estimator
  1 − C(n−c,k)/C(n,k) (HumanEval's metric) per task, with the binomial
  RATIO expanded to the falling-factorial product so everything is
  integer until one final micro division.

Reference reach: the delegated SQL slot (``main.cc:181-182``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load, load_spread

# ---------------------------------------------------------------------------
# pipeline_span_corruption_mask
# ---------------------------------------------------------------------------

_SPAN_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id, w,
    list_transform(range(1, len(w) + 1),
      i -> CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_s'
                 || CAST((i-1)//3 AS VARCHAR)), 1, 4)) AS INT) < 9830) AS msk
  FROM t
),
built AS (
  SELECT doc_id,
    array_to_string(list_transform(range(1, len(w) + 1),
      i -> CASE WHEN msk[i] AND (i = 1 OR NOT msk[i-1]) THEN '<X>'
                WHEN msk[i] THEN '' ELSE w[i] END), ' ') AS masked_raw,
    COALESCE(array_to_string(list_filter(list_transform(range(1, len(w) + 1),
      i -> CASE WHEN msk[i] THEN w[i] ELSE NULL END),
      x -> x IS NOT NULL), ' '), '') AS targets,
    CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_masked,
    CAST(len(w) AS BIGINT) AS n_tokens
  FROM m
)
SELECT doc_id, trim(regexp_replace(masked_raw, ' +', ' ', 'g')) AS masked_text,
       targets, n_masked, n_tokens
FROM built WHERE doc_id <= 20
"""


@register("pipeline_span_corruption_mask", oracle=_SPAN_ORACLE)
def pipeline_span_corruption_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption: every 3-token span flips an md5 coin at
    p≈15% (9830/65536); masked spans collapse to a single `<X>` sentinel
    in the input and concatenate (in order) into the target sequence.
    Reproducible across engines, partitionings and reruns — the property
    a pretraining pipeline needs so every epoch sees the same objective.
    Output pinned to doc_id ≤ 20 for the differential; the transform
    itself is map-only (per-row array surgery, zero shuffle) and
    scales embarrassingly."""
    d = load_spread(spark, sf_dir, "documents", "doc_id")
    m = d.select(
        "doc_id",
        F.split("text", " ").alias("w"),
    ).select(
        "doc_id",
        "w",
        F.expr(
            "transform(sequence(1, size(w)),"
            " i -> CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '_s',"
            " CAST((i-1) div 3 AS STRING))), 1, 4), 16, 10) AS INT) < 9830)"
        ).alias("msk"),
    )
    built = m.select(
        "doc_id",
        F.expr(
            "array_join(transform(sequence(1, size(w)),"
            " i -> CASE WHEN element_at(msk, i)"
            "            AND (i = 1 OR NOT element_at(msk, i-1)) THEN '<X>'"
            "       WHEN element_at(msk, i) THEN ''"
            "       ELSE element_at(w, i) END), ' ')"
        ).alias("masked_raw"),
        F.expr(
            "COALESCE(array_join(filter(transform(sequence(1, size(w)),"
            " i -> CASE WHEN element_at(msk, i) THEN element_at(w, i)"
            " ELSE NULL END), x -> x IS NOT NULL), ' '), '')"
        ).alias("targets"),
        F.expr("CAST(size(filter(msk, x -> x)) AS BIGINT)").alias("n_masked"),
        F.expr("CAST(size(w) AS BIGINT)").alias("n_tokens"),
    )
    return built.where("doc_id <= 20").select(
        "doc_id",
        F.expr("trim(regexp_replace(masked_raw, ' +', ' '))").alias("masked_text"),
        "targets",
        "n_masked",
        "n_tokens",
    )


# ---------------------------------------------------------------------------
# dedup_soft_weights
# ---------------------------------------------------------------------------

_SOFT_ORACLE = """
WITH h AS (SELECT doc_id,
                  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS hsh
           FROM documents),
c AS (SELECT hsh, CAST(COUNT(*) AS BIGINT) AS csz FROM h GROUP BY 1),
w AS (SELECT h.doc_id, c.csz,
             CAST(1000000 // c.csz AS BIGINT) AS weight_micro
      FROM h JOIN c ON c.hsh = h.hsh)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(weight_micro) AS BIGINT) AS total_weight_micro,
       CAST(SUM(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_dup_clusters,
       CAST(MAX(csz) AS BIGINT) AS max_cluster
FROM w
"""


@register("dedup_soft_weights", oracle=_SOFT_ORACLE)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup: down-weight near-duplicates by 1/cluster-size instead
    of dropping them (keeps coverage, removes over-representation). The
    cluster key is the 8-token head fingerprint (the same head-shingle
    notion dedup_incremental_batch screens on); weights are exact
    micros, so the effective epoch size Σw is itself an exact integer
    the mixture planner can consume.

    One groupBy for cluster sizes + one keyed join back — two shuffles
    on the fingerprint key, O(n) output, no pair enumeration at all
    (the soft scheme never needs pairs, which is exactly why it's the
    cheapest dedup at 100 TB)."""
    d = load(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.expr("md5(concat_ws(' ', slice(split(text, ' '), 1, 8)))").alias("hsh"),
    )
    c = h.groupBy("hsh").agg(F.count("*").cast("bigint").alias("csz"))
    w = h.join(c, "hsh").select(
        "doc_id",
        "csz",
        F.expr("CAST(1000000 DIV csz AS BIGINT)").alias("weight_micro"),
    )
    return w.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("weight_micro").cast("bigint").alias("total_weight_micro"),
        F.sum(F.expr("CASE WHEN csz > 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_in_dup_clusters"),
        F.max("csz").cast("bigint").alias("max_cluster"),
    )


# ---------------------------------------------------------------------------
# mixture_kl_divergence
# ---------------------------------------------------------------------------

_KL_ORACLE = """
WITH a AS (SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_all,
        CAST(SUM(CASE WHEN n_chars < 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
   FROM documents GROUP BY 1),
t AS (SELECT source, n_all, n_short,
             CAST(SUM(n_all) OVER () AS BIGINT) AS tot_all,
             CAST(SUM(n_short) OVER () AS BIGINT) AS tot_short,
             CAST(COUNT(*) OVER () AS BIGINT) AS k
      FROM a),
arr AS (SELECT list((n_short, n_all, tot_short, tot_all, k) ORDER BY source)
               AS cells,
               CAST(MAX(tot_short) AS BIGINT) AS n_short_tot,
               CAST(MAX(k) AS INT) AS n_sources FROM t)
SELECT n_short_tot, n_sources,
  ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list_transform(cells, c ->
      (CAST(c[1]+1 AS DOUBLE)/CAST(c[3]+c[5] AS DOUBLE))
      * ln((CAST(c[1]+1 AS DOUBLE)/CAST(c[3]+c[5] AS DOUBLE))
           / (CAST(c[2]+1 AS DOUBLE)/CAST(c[4]+c[5] AS DOUBLE))))),
    (acc, x) -> acc + x), 6) AS kl_r6
FROM arr
"""


@register("mixture_kl_divergence", oracle=_KL_ORACLE)
def mixture_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(short-doc source mixture ‖ overall source mixture) — does the
    length filter a curation gate applies SKEW the source mix? The
    re-weighting decision input for sample_weighted_mixture. Add-one
    smoothed; the Σp·ln(p/q) reduction is a left-to-right fold over the
    source-ordered bounded array (same determinism contract as PSI/MI).

    One conditional-sum scan builds both distributions; everything after
    runs on the |sources|-row frame."""
    d = load(spark, sf_dir, "documents")
    a = (
        d.select(
            "source",
            F.expr("CASE WHEN n_chars < 250 THEN 1 ELSE 0 END").alias("sh"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_all"),
            F.sum("sh").cast("bigint").alias("n_short"),
        )
    )
    arr = a.agg(
        F.expr(
            "array_sort(collect_list(struct(source, n_short, n_all)))"
        ).alias("ca"),
        F.sum("n_short").cast("bigint").alias("n_short_tot"),
        F.sum("n_all").cast("bigint").alias("tot_all"),
        F.count("*").cast("bigint").alias("k"),
    )
    return arr.select(
        "n_short_tot",
        F.col("k").cast("int").alias("n_sources"),
        F.round(
            F.expr(
                """
                aggregate(ca, CAST(0.0 AS DOUBLE), (acc, c) -> acc +
                  (CAST(c.n_short+1 AS DOUBLE)/CAST(n_short_tot+k AS DOUBLE))
                  * ln((CAST(c.n_short+1 AS DOUBLE)/CAST(n_short_tot+k AS DOUBLE))
                       / (CAST(c.n_all+1 AS DOUBLE)/CAST(tot_all+k AS DOUBLE))))
                """
            ),
            6,
        ).alias("kl_r6"),
    )


# ---------------------------------------------------------------------------
# eval_pass_at_k
# ---------------------------------------------------------------------------

_PASSK_ORACLE = """
WITH a AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r
  FROM events
),
t AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM a WHERE r <= 10 GROUP BY 1
),
f AS (
  SELECT user_id, n, c,
    CASE WHEN n - c >= 3 THEN (n-c)*(n-c-1)*(n-c-2) ELSE 0 END AS fail_num,
    CASE WHEN n >= 3 THEN n*(n-1)*(n-2) ELSE 0 END AS den
  FROM t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tasks,
  CAST(SUM(CASE WHEN den > 0
       THEN 1000000 - (1000000*fail_num) // den ELSE 0 END) AS BIGINT)
    AS sum_pass3_micro,
  CAST(SUM(CASE WHEN den > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
  CAST(SUM(CASE WHEN den > 0
       THEN 1000000 - (1000000*fail_num) // den ELSE 0 END)
       // GREATEST(SUM(CASE WHEN den > 0 THEN 1 ELSE 0 END), 1) AS BIGINT)
    AS pass_at_3_micro
FROM f
"""


@register("eval_pass_at_k", oracle=_PASSK_ORACLE)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@3 with the unbiased estimator 1 − C(n−c,3)/C(n,3) (the
    HumanEval metric): tasks = users, attempts = their first 10 events,
    success = purchase. The binomial RATIO collapses to the
    falling-factorial product (n−c)(n−c−1)(n−c−2) / n(n−1)(n−2), so the
    whole estimator is integer until one final micro division — no
    factorials, no floats.

    One rank window partitioned by task (bounded 10-row heads), one
    keyed aggregate, one constant-size fold."""
    e = load(spark, sf_dir, "events")
    a = e.withColumn(
        "r",
        F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id")),
    ).where("r <= 10")
    t = a.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("c"),
    )
    f = t.select(
        "n",
        "c",
        F.expr(
            "CASE WHEN n - c >= 3 THEN (n-c)*(n-c-1)*(n-c-2) ELSE 0L END"
        ).alias("fail_num"),
        F.expr("CASE WHEN n >= 3 THEN n*(n-1)*(n-2) ELSE 0L END").alias("den"),
    )
    return f.agg(
        F.count("*").cast("bigint").alias("n_tasks"),
        F.sum(
            F.expr(
                "CASE WHEN den > 0 THEN 1000000 - (1000000*fail_num) DIV den"
                " ELSE 0L END"
            )
        )
        .cast("bigint")
        .alias("sum_pass3_micro"),
        F.sum(F.expr("CASE WHEN den > 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_scored"),
    ).select(
        "n_tasks",
        "sum_pass3_micro",
        "n_scored",
        F.expr(
            "CAST(sum_pass3_micro DIV GREATEST(n_scored, 1) AS BIGINT)"
        ).alias("pass_at_3_micro"),
    )
