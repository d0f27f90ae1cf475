"""Round-7 batch C: range similarity search, a k-means training round,
and the LSH S-curve calibration audit.

- RADIUS (range) SEARCH: all corpus vectors with cosine >= tau to the
  probe — the range-query twin of simsearch_topk_bruteforce (top-k asks
  "the closest k", radius asks "everything this similar": the dedup and
  near-duplicate-cluster primitive), with the IVF cell-pruned count
  beside the exact one and the pruned recall in ppm.
- K-MEANS UPDATE ROUND (Lloyd step): one full assign -> re-estimate
  round over the embedding corpus — the training-step companion to
  simsearch_kmeans_assign (which only emits assignments). Centroid
  means are EXACT integer micro via quantized component sums with an
  offset trick that keeps every division non-negative.
- LSH S-CURVE AUDIT: the empirical collision probability of the
  8-band x 2-row OPH signature per exact-Jaccard decile vs the
  analytic 1-(1-s^r)^b curve — the calibration chart that tells you
  whether the banding catches the near-dup band you care about before
  you spend a corpus-sized job on it.

Reference reach: the delegated SQL surface (``main.cc:181-182``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.operators.dedup import (
    _jaccard_pairs_spark,
    _jaccard_pairs_sql,
    _exploded_shingles,
)
from c2_duckdb_runner_spark.operators.round5c_ext import _oph_cols_sql, _OPH_K
from c2_duckdb_runner_spark.operators.simsearch import (
    _DUCK_BASE,
    _DUCK_COS,
    _QUERY_ID,
    _scored,
)
from c2_duckdb_runner_spark.registry import fdoc, register
from c2_duckdb_runner_spark.tables import load

# ---------------------------------------------------------------------------
# simsearch_radius_count
# ---------------------------------------------------------------------------

_RADIUS_TAU = 0.05

_RADIUS_ORACLE = f"""
WITH {_DUCK_BASE},
s AS (
  SELECT n.vec_id, n.label, q.qlabel, {_DUCK_COS} AS cos
  FROM n, q WHERE n.vec_id <> {_QUERY_ID}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(CASE WHEN cos >= {_RADIUS_TAU} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_in_radius,
       CAST(SUM(CASE WHEN cos >= {_RADIUS_TAU} AND label = qlabel
                THEN 1 ELSE 0 END) AS BIGINT) AS n_in_radius_cell,
       CAST((1000000 * SUM(CASE WHEN cos >= {_RADIUS_TAU} AND label = qlabel
                           THEN 1 ELSE 0 END))
            // SUM(CASE WHEN cos >= {_RADIUS_TAU} THEN 1 ELSE 0 END)
            AS BIGINT) AS cell_recall_ppm
FROM s
"""


@register("simsearch_radius_count", oracle=_RADIUS_ORACLE)
@fdoc(f"""Range (radius) similarity search: how many corpus vectors sit
    within cosine >= {_RADIUS_TAU} of the probe — the range-query twin
    of top-k search and the primitive behind near-duplicate clustering
    ("everything this similar", not "the closest k"). Reports the exact
    brute-force count, the IVF-style count restricted to the probe's
    coarse cell (label), and the pruned path's recall in exact ppm —
    the number that says whether single-cell probing is safe at this
    radius. Cosines are the shared ROUND-6 left-fold doubles (bit-
    identical both engines), so the >= tau cut is deterministic.

    Scale shape: one broadcast of the 1-row probe, map-only scoring,
    one global conditional-sum aggregate — zero corpus shuffle; on a
    real cluster the cell-restricted count reads 1/n_cells of the
    corpus via partition pruning (simsearch_ivf_label's layout).""")
def simsearch_radius_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        _scored(spark, sf_dir)
        .filter(F.col("vec_id") != _QUERY_ID)
        .select("cos", "label", "qlabel")
    )
    return s.agg(
        F.count("*").cast("bigint").alias("n_scored"),
        F.sum(F.expr(f"CASE WHEN cos >= {_RADIUS_TAU} THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_in_radius"),
        F.sum(
            F.expr(
                f"CASE WHEN cos >= {_RADIUS_TAU} AND label = qlabel"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_in_radius_cell"),
        F.expr(
            f"CAST((1000000 * SUM(CASE WHEN cos >= {_RADIUS_TAU}"
            " AND label = qlabel THEN 1 ELSE 0 END))"
            f" div SUM(CASE WHEN cos >= {_RADIUS_TAU} THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("cell_recall_ppm"),
    )


# ---------------------------------------------------------------------------
# embed_kmeans_update_round
# ---------------------------------------------------------------------------

_KMU_CENTS = 8  # seed centroids = vec_id < 8 (simsearch_kmeans_assign's)
_KMU_OFF = 10_000_000  # offset > max |component| * 1e6 keeps sums >= 0

_KMU_D2 = (
    "list_reduce(list_transform(range(1, 65),"
    " i -> (n.v[i] - c.cvec[i]) * (n.v[i] - c.cvec[i])), (x, y) -> x + y)"
)

_KMU_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (SELECT vec_id, v FROM e),
c AS (SELECT vec_id AS c_id, v AS cvec FROM e WHERE vec_id < {_KMU_CENTS}),
d2 AS (
  SELECT n.vec_id, c.c_id, {_KMU_D2} AS d2 FROM n CROSS JOIN c
),
cell AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT vec_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
    FROM d2) WHERE rn = 1
),
qv AS (
  SELECT cell.cell, u.i AS dim,
         CAST(round(e.v[CAST(u.i AS INT)] * 1000000) AS BIGINT) AS q
  FROM e JOIN cell ON cell.vec_id = e.vec_id
  CROSS JOIN UNNEST(range(1, 65)) AS u(i)
),
newc AS (
  SELECT cell, dim,
         CAST((SUM(q) + COUNT(*) * {_KMU_OFF}) // COUNT(*)
              - {_KMU_OFF} AS BIGINT) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n_assigned
  FROM qv GROUP BY 1, 2
),
oldc AS (
  SELECT c_id AS cell, u.i AS dim,
         CAST(round(cvec[CAST(u.i AS INT)] * 1000000) AS BIGINT) AS old_mu
  FROM c CROSS JOIN UNNEST(range(1, 65)) AS u(i)
)
SELECT newc.cell, MIN(n_assigned) AS n_assigned,
       CAST(SUM(abs(mu - old_mu)) AS BIGINT) AS shift_l1_micro
FROM newc JOIN oldc ON oldc.cell = newc.cell AND oldc.dim = newc.dim
GROUP BY newc.cell
"""


@register("embed_kmeans_update_round", oracle=_KMU_ORACLE)
@fdoc(f"""One Lloyd iteration over the embedding corpus: assign every
    vector to its nearest of the {_KMU_CENTS} seed centroids (the same
    left-fold double distances as simsearch_ivf_multiprobe — bit-
    identical both engines), then RE-ESTIMATE each centroid and report
    the per-cluster L1 shift — the convergence telemetry a k-means
    trainer watches. New means are exact integer micro: components are
    quantized to round(x*1e6), per-(cell, dim) sums are integer, and
    the mean uses the offset trick (sum + n*{_KMU_OFF}) div n -
    {_KMU_OFF} so the division operand is non-negative even though
    embedding components are signed (DuckDB floor == Spark truncate
    only there).

    Scale shape: broadcast the k-centroid row, map-side argmin (no
    assignment shuffle), posexplode to (cell, dim) — a constant 64x
    map-only expansion — then ONE map-combining aggregate over k*64
    keys and a broadcast join against the old centroids. At 100 TB the
    aggregate output is still k*64 rows.""")
def embed_kmeans_update_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    cents = (
        e.filter(F.col("vec_id") < _KMU_CENTS)
        .select(
            F.struct(
                F.col("vec_id").alias("c_id"), F.col("v").alias("cvec")
            ).alias("c")
        )
        .agg(F.expr("array_sort(collect_list(c))").alias("cents"))
    )
    d2 = (
        "aggregate(zip_with(v, c.cvec, (a, b) -> (a - b) * (a - b)),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .withColumn(
            "cell",
            F.expr(
                f"array_min(transform(cents, c -> struct({d2} AS d2,"
                " c.c_id AS c_id))).c_id"
            ),
        )
        .select("cell", "v")
    )
    qv = assigned.select(
        "cell",
        F.posexplode(
            F.expr("transform(v, x -> CAST(round(x * 1000000) AS BIGINT))")
        ).alias("dim0", "q"),
    ).select("cell", (F.col("dim0") + 1).cast("bigint").alias("dim"), "q")
    newc = qv.groupBy("cell", "dim").agg(
        F.expr(
            f"CAST((SUM(q) + COUNT(*) * {_KMU_OFF}) div COUNT(*)"
            f" - {_KMU_OFF} AS BIGINT)"
        ).alias("mu"),
        F.count("*").cast("bigint").alias("n_assigned"),
    )
    oldc = (
        e.filter(F.col("vec_id") < _KMU_CENTS)
        .select(
            F.col("vec_id").alias("cell"),
            F.posexplode(
                F.expr(
                    "transform(v, x -> CAST(round(x * 1000000) AS BIGINT))"
                )
            ).alias("dim0", "old_mu"),
        )
        .select("cell", (F.col("dim0") + 1).cast("bigint").alias("dim"), "old_mu")
    )
    return (
        newc.join(F.broadcast(oldc), ["cell", "dim"])
        .groupBy("cell")
        .agg(
            F.min("n_assigned").alias("n_assigned"),
            F.sum(F.expr("abs(mu - old_mu)")).cast("bigint").alias(
                "shift_l1_micro"
            ),
        )
    )


# ---------------------------------------------------------------------------
# dedup_lsh_scurve_audit
# ---------------------------------------------------------------------------

_SC_BANDS = 8
_SC_ROWS = 2  # 8 bands x 2 rows over the 16 OPH slots
_SC_SAMPLE_MOD = 2


def _sc_band_collide() -> str:
    """ANY-band-matches predicate over the densified OPH columns —
    generated once, embedded in both engines."""
    bands = []
    for b in range(_SC_BANDS):
        eqs = " AND ".join(
            f"a.d{b * _SC_ROWS + r} = b.d{b * _SC_ROWS + r}"
            for r in range(_SC_ROWS)
        )
        bands.append(f"({eqs})")
    return " OR ".join(bands)


def _sc_expected_ppm(decile_expr: str) -> str:
    """Analytic S-curve 1-(1-s^r)^b at the decile midpoint, micro —
    a pure function of the decile integer, same expression both
    engines."""
    mid = f"((CAST({decile_expr} AS DOUBLE) + 0.5) / 10.0)"
    return (
        f"CAST(round(1000000.0 * (1.0 - power(1.0 - power({mid},"
        f" {_SC_ROWS}), {_SC_BANDS}))) AS BIGINT)"
    )


def _sc_oracle() -> str:
    mins, dens, _ = _oph_cols_sql()
    pairs = _jaccard_pairs_sql("0.0", sample_mod=_SC_SAMPLE_MOD)
    return f"""
WITH pairs AS ({pairs}),
docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % {_SC_SAMPLE_MOD} = 0),
sh0 AS (SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+3], ' ')
                 FOR i IN range(1, greatest(len(toks)-2, 1))])) AS s0
        FROM docs),
slotv AS (SELECT doc_id,
                 CAST(('0x' || substring(md5(s0), 1, 15)) AS BIGINT)
                   % {_OPH_K} AS slot,
                 CAST(('0x' || substring(md5(s0), 1, 15)) AS BIGINT)
                   // {_OPH_K} AS val
          FROM sh0),
sig AS (SELECT doc_id, {mins} FROM slotv GROUP BY doc_id),
dens AS (SELECT doc_id, {dens} FROM sig),
coll AS (
  SELECT CAST(floor(p.jac * 10) AS BIGINT) AS decile,
         CASE WHEN {_sc_band_collide()} THEN 1 ELSE 0 END AS hit
  FROM pairs p
  JOIN dens a ON a.doc_id = p.a_id
  JOIN dens b ON b.doc_id = p.b_id
)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(hit) AS BIGINT) AS n_collide,
       CAST((1000000 * SUM(hit)) // COUNT(*) AS BIGINT) AS collide_ppm,
       {_sc_expected_ppm('decile')} AS expected_ppm
FROM coll GROUP BY decile
"""


@register("dedup_lsh_scurve_audit", oracle=_sc_oracle())
@fdoc(f"""LSH S-curve calibration: empirical collision probability of the
    {_SC_BANDS}-band x {_SC_ROWS}-row banding over the {_OPH_K}-slot OPH
    signature, per EXACT-Jaccard decile, against the analytic
    1-(1-s^r)^b curve — the chart that decides a banding config BEFORE
    the corpus-sized dedup job runs (too-steep = missed near-dups,
    too-flat = candidate-pair explosion). Pairs are the deterministic
    md5-parity sample's co-shingled pairs with exact Jaccard (the
    minhash-audit harness); signatures are the densified OPH columns;
    "collides" = ANY band's {_SC_ROWS} slots all equal — the generated
    predicate text is embedded in both engines. Empirical ppm is exact
    integer; the analytic curve is a pure function of the decile int.

    Scale shape: shingle-blocked pair generation (never all-pairs),
    one signature aggregate per sampled doc, two broadcastable
    signature joins, a 10-row decile reduce.""")
def dedup_lsh_scurve_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _jaccard_pairs_spark(
        spark, sf_dir, thresh=0.0, sample_mod=_SC_SAMPLE_MOD
    )
    # r12: raw stream via _exploded_shingles (inferred-filter dodge)
    sh_raw = _exploded_shingles(spark, sf_dir, sample_mod=_SC_SAMPLE_MOD)
    slotv = sh_raw.select(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(s0), 1, 15), 16, 10) AS BIGINT)"
            f" % {_OPH_K}"
        ).alias("slot"),
        F.expr(
            "CAST(conv(substring(md5(s0), 1, 15), 16, 10) AS BIGINT)"
            f" div {_OPH_K}"
        ).alias("val"),
    )
    sig = slotv.groupBy("doc_id").agg(
        *[
            F.expr(f"MIN(CASE WHEN slot = {j} THEN val END)").alias(f"s{j}")
            for j in range(_OPH_K)
        ]
    )
    # densified columns exactly as _oph_cols_sql generates them for the
    # oracle — one expr per selectExpr arg
    dens_exprs = [
        "COALESCE("
        + ", ".join(f"s{(j + t) % _OPH_K}" for t in range(_OPH_K))
        + f") AS d{j}"
        for j in range(_OPH_K)
    ]
    densified = sig.selectExpr("doc_id", *dens_exprs)
    a = densified.alias("a")
    b = densified.alias("b")
    coll = (
        pairs.join(a, F.col("a.doc_id") == F.col("a_id"))
        .join(b, F.col("b.doc_id") == F.col("b_id"))
        .select(
            F.expr("CAST(floor(jac * 10) AS BIGINT)").alias("decile"),
            F.expr(
                f"CASE WHEN {_sc_band_collide()} THEN 1 ELSE 0 END"
            ).alias("hit"),
        )
    )
    return coll.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("hit").cast("bigint").alias("n_collide"),
        F.expr(
            "CAST((1000000 * SUM(hit)) div COUNT(*) AS BIGINT)"
        ).alias("collide_ppm"),
        F.expr(_sc_expected_ppm("MIN(decile)")).alias("expected_ppm"),
    )
