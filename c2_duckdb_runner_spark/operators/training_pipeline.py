"""Training-data pipeline operators II — the cluster/assignment/packing layer.

dedup.py / simsearch.py / textanalysis.py cover the per-doc and per-pair
primitives; this module adds the ops a 100 TB pretraining-data pipeline
runs on top of them:

- ``dedup_cluster_cc``       : near-dup PAIRS → duplicate CLUSTERS
                               (connected components, iterative min-label
                               propagation; DuckDB recursive-CTE oracle)
- ``simsearch_kmeans_assign``: one Lloyd assignment step (the building
                               block of IVF index training / clustering)
- ``doc_pack_chunks``        : concat-and-chunk sequence packing into
                               fixed context windows (GPT-style)
- ``sample_stratified_exact``: exactly-N-per-stratum deterministic sampling
- ``text_contamination_ngram``: benchmark-contamination check by shared
                               n-gram shingles

Scale notes (100 TB design point):
- Connected components uses min-label propagation over the symmetrized
  edge list: each iteration is ONE shuffle join keyed on node id, and the
  iteration count is the component diameter (near-dup clusters are
  shallow — a handful of rounds), not |V|. Lineage is truncated per round
  with ``localCheckpoint`` so the plan doesn't grow with iterations. The
  oracle computes the same fixpoint as a DuckDB recursive transitive
  closure — exponential in the worst case but exact, which is the point:
  the scalable rewrite is pinned against the textbook definition.
- K-means assignment broadcasts the k centroid vectors and computes all
  N×k distances map-side — zero shuffle until the per-vector argmin (a
  min-of-(d2, c_id)-struct aggregate). Distances fold per-dimension
  squared diffs strictly left-to-right in DOUBLE, and the DuckDB oracles
  fold with list_reduce in the same element order — bit-identical values
  in both engines, so the argmin tie-break (dist, centroid_id) is total
  with no interpreted-decimal cost. Only the centroid MEANS (unordered
  group sums in both engines) still route through DECIMAL.
- Packing and stratified sampling are single-window passes partitioned by
  the stratum key — one shuffle each, no global sort.
- Contamination joins train shingles against the (small) benchmark shingle
  set — at scale the benchmark side broadcasts; the count-distinct pair is
  one partial-distinct aggregate keyed on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.operators.dedup import (
    _SHINGLES_DUCK,
    _exploded_shingles,
    dedup_near_ngram_jaccard,
)
from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.session import scratch_persist, shuffle_width
from c2_duckdb_runner_spark.tables import load, load_spread


# ---------------------------------------------------------------------------
# connected components over near-dup pairs
# ---------------------------------------------------------------------------
@register(
    "dedup_cluster_cc",
    oracle=f"""
WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh0 AS (SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s0 FROM d),
sh AS (SELECT doc_id,
              CAST(('0x' || substring(md5(s0), 1, 15)) AS BIGINT) AS s
       FROM sh0),
n AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
e0 AS (
  SELECT a_id, b_id FROM p
  JOIN n na ON na.doc_id = p.a_id JOIN n nb ON nb.doc_id = p.b_id
  WHERE common * 1.0 / (na.nsh + nb.nsh - common) >= 0.8
),
edges AS (
  SELECT a_id AS a, b_id AS b FROM e0
  UNION SELECT b_id, a_id FROM e0
  UNION SELECT doc_id, doc_id FROM documents
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, MIN(b) AS component_id FROM reach GROUP BY a
""",
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the Jaccard ≥ 0.8
    near-dup pair graph, each doc labeled with the min doc_id reachable
    from it (singletons label themselves).

    Pairs only say A~B; dedup keep/drop decisions need transitive groups
    (A~B, B~C ⇒ {A,B,C} is one cluster even if A~C fails the threshold).
    Min-label propagation: every node starts as its own label; each round
    takes the min of its own and its neighbors' labels; fixpoint = min id
    of the component. Rounds scale with component DIAMETER (shallow for
    dup clusters), each round one shuffle join on node id.
    """
    pairs = dedup_near_ngram_jaccard(spark, sf_dir).select("a_id", "b_id")
    docs = load(spark, sf_dir, "documents").select("doc_id")
    # r12 optimization round: the CC loop's relations are sized FROM THE
    # DATA, not from the session constant (a localCheckpoint also drops
    # its partitioning under AQE — measured UnknownPartitioning(0) — so
    # the standing layout must live in a persist, whose InMemoryRelation
    # keeps it). The pair graph is a few % of the corpus: at fixture
    # scale it is a few hundred rows and a 32-wide shuffle per round is
    # pure stage latency; at 100 TB it is millions of rows and needs the
    # full width. loop_w = ceil(|E| / 200k) clamped to [1, shuffle_width]
    # gives both. The persisted edges carry the standing b-hash layout at
    # loop_w, so each round re-shuffles only the node-sized label
    # relation into it — never the edges.
    sym = (
        pairs.select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
        .unionByName(
            pairs.select(F.col("b_id").alias("a"), F.col("a_id").alias("b"))
        )
        .localCheckpoint(eager=True)  # pairs subtree is expensive; reuse it
    )
    loop_w = max(1, min(shuffle_width(spark), -(-sym.count() // 200_000)))
    edges = scratch_persist(sym.repartition(loop_w, "b"))
    # Iterate ONLY over edge-endpoint nodes: a doc in no near-dup pair is a
    # singleton whose label never changes, so it has no business inside the
    # propagation loop. At corpus scale this is the difference between
    # shuffling |V(edges)| rows per round (dup-cluster members — a few % of
    # docs) and shuffling the whole corpus per round. Singletons rejoin at
    # the end with component_id = their own doc_id.
    # (column renamed node_id so the loop's edges⨝labels self-join lineage
    # stays unambiguous)
    labels = (
        edges.select(F.col("a").alias("node_id"))
        .repartition(loop_w, "node_id")
        .distinct()
        .withColumn("component_id", F.col("node_id"))
        .localCheckpoint(eager=True)
    )
    while True:
        neighbor_min = (
            # shuffle_hash pin: build the node-sized label relation, stream
            # the co-partitioned edges unsorted (an unpinned SMJ would sort
            # the edge relation every round; a broadcast plan cliffs at
            # scale — the graph_bfs_multisource lesson from r10)
            edges.join(labels.hint("shuffle_hash"), edges.b == labels.node_id)
            .groupBy(edges.a.alias("node"))
            .agg(F.min("component_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node_id == neighbor_min.node, "left")
            .select(
                "node_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("nbr_min"), F.col("component_id")),
                ).alias("component_id"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component_id"))
                    < F.col("component_id")
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        n_changed = updated.filter("changed").count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    return docs.join(labels, docs.doc_id == labels.node_id, "left").select(
        "doc_id", F.coalesce("component_id", "doc_id").alias("component_id")
    )


# ---------------------------------------------------------------------------
# one Lloyd assignment step (IVF training building block)
# ---------------------------------------------------------------------------
@register(
    "simsearch_kmeans_assign",
    oracle="""
WITH c AS (SELECT vec_id AS c_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
           FROM embeddings WHERE vec_id < 8),
e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
terms AS (
  SELECT e.vec_id, c.c_id,
         list_reduce(list_transform(range(1, 65),
                       i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i])),
                     (x, y) -> x + y) AS d2
  FROM e CROSS JOIN c
)
SELECT vec_id, c_id AS centroid_id, ROUND(d2, 6) AS dist2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_id) rn
      FROM terms)
WHERE rn = 1
""",
)
def simsearch_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means (Lloyd) assignment step: each embedding assigned to its
    nearest of k=8 deterministic seed centroids (vec_id < 8), with squared
    L2 distance.

    This is the inner loop of IVF index training and embedding clustering.
    Centroids broadcast; each vector computes its k distances map-side via
    a zip_with fold. Distances fold strictly LEFT-TO-RIGHT in double, and
    the oracle folds with list_reduce in the same element order — the
    doubles are bit-identical in both engines (no unordered SUM anywhere),
    so the (dist, centroid_id) argmin order is total without paying
    interpreted-BigDecimal arithmetic in the hot lambda. The argmin is
    min-of-(d2, c_id)-struct — a map-side-combinable aggregate (partial min
    per partition, one narrow shuffle of |corpus| rows), NOT a window sort
    which would shuffle and sort all |corpus|×k scored rows. Same pattern
    as simsearch_pq_assign."""
    emb = load(spark, sf_dir, "embeddings")
    cent = F.broadcast(
        emb.filter(F.col("vec_id") < 8)
        .limit(8)  # bounded codebook: provable build side for the loop join
        .select(
            F.col("vec_id").alias("c_id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("cvec"),
        )
    )
    emb = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    fold = (
        "aggregate(zip_with(v, cvec, (a, b) -> (a - b) * (a - b)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    return (
        emb.crossJoin(cent)
        .select("vec_id", "c_id", F.expr(fold).alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "c_id")).alias("best"))
        .select(
            "vec_id",
            F.col("best.c_id").alias("centroid_id"),
            F.round(F.col("best.d2"), 6).alias("dist2"),
        )
    )


# ---------------------------------------------------------------------------
# concat-and-chunk sequence packing
# ---------------------------------------------------------------------------
@register(
    "doc_pack_chunks",
    oracle="""
SELECT doc_id, lang,
  CAST(FLOOR((SUM(len(string_split(trim(text), ' ')))
                OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING)
              - len(string_split(trim(text), ' '))) / 256.0) AS BIGINT)
    AS pack_id
FROM documents
""",
)
def doc_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (per language, in
    doc_id order) and chunk the token stream into 256-token context
    windows; each doc is labeled with the window its first token lands in.

    floor(prefix_sum / ctx) over a running token count — one window pass
    partitioned by the stratum key, one shuffle. (True greedy bin packing
    — start a new bin when a doc would overflow — is inherently
    sequential per stratum; concat-and-chunk is what large-scale training
    pipelines actually use, and it stays a pure prefix-sum.)"""
    tokens = F.size(F.split(F.trim(F.col("text")), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor((F.sum(tokens).over(w) - tokens) / 256.0)
        .cast("long")
        .alias("pack_id"),
    )


# ---------------------------------------------------------------------------
# exact-N-per-stratum deterministic sampling
# ---------------------------------------------------------------------------
@register(
    "sample_stratified_exact",
    oracle="""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rn
  FROM documents)
WHERE rn <= 5
""",
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 docs per language, chosen by md5(doc_id) order — a
    reproducible stratified sample (same rows on every engine and every
    run, unlike rand()-based sampling).

    One window shuffle keyed on the stratum. At 100 TB, rank-by-hash is
    the standard exact-quota sampler: the hash order is uniform, so the
    quota rows are an unbiased sample of each stratum."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# benchmark-contamination check by shared n-gram shingles
# ---------------------------------------------------------------------------
@register(
    "text_contamination_ngram",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM d),
bench AS (SELECT s, doc_id AS bench_id FROM sh WHERE doc_id % 50 = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
SELECT t.doc_id, COUNT(DISTINCT t.s) AS overlap_shingles,
       COUNT(DISTINCT b.bench_id) AS n_bench_docs
FROM train t JOIN bench b ON t.s = b.s
GROUP BY t.doc_id
""",
)
def text_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: training docs sharing ≥ 1 four-token
    shingle with the benchmark set (here: every 50th doc stands in for the
    held-out benchmark), with how many shingles / benchmark docs overlap.

    The benchmark shingle set is small by construction — broadcast it and
    the whole check is a map-side join plus one count-distinct aggregate
    keyed on doc_id. This is the standard n-gram decontamination pass run
    before pretraining."""
    sh = _exploded_shingles(spark, sf_dir).select(
        "doc_id", F.col("s0").alias("s")
    )
    bench = F.broadcast(
        sh.filter(F.col("doc_id") % 50 == 0).select(
            F.col("s").alias("bs"), F.col("doc_id").alias("bench_id")
        )
    )
    return (
        sh.filter(F.col("doc_id") % 50 != 0)
        .join(bench, F.col("s") == F.col("bs"))
        .groupBy("doc_id")
        .agg(
            F.count_distinct("s").alias("overlap_shingles"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )


# ---------------------------------------------------------------------------
# full k-means training (iterative, exactly oracle-checked)
# ---------------------------------------------------------------------------
_KM_ITERS = 3


def _kmeans_oracle(iters: int = _KM_ITERS) -> str:
    """Unroll the Lloyd loop into DuckDB CTEs, one (distance → argmin →
    decimal-mean) block per iteration. Iterative algorithms are usually
    rows-only; ordered double distance folds + exact DECIMAL mean sums make
    every iteration bit-reproducible across engines, so the full training
    loop is differentially checkable."""
    sql = """WITH emb AS (SELECT vec_id, embedding FROM embeddings),
cent_0 AS (SELECT vec_id AS c_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS cvec
           FROM embeddings WHERE vec_id < 8)"""
    for t in range(1, iters + 2):
        sql += f""",
dist_{t} AS (
  SELECT e.vec_id, c.c_id,
         list_reduce(list_transform(range(1, 65),
             i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
                * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])),
           (x, y) -> x + y) AS d2
  FROM emb e CROSS JOIN cent_{t - 1} c),
asg_{t} AS (
  SELECT vec_id, c_id, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_id) rn
    FROM dist_{t})
  WHERE rn = 1)"""
        if t <= iters:
            sql += f""",
cent_{t} AS (
  SELECT c_id, list(m ORDER BY i) AS cvec FROM (
    SELECT a.c_id, u.i,
           CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(26,18)))
                AS DOUBLE) / COUNT(*) AS m
    FROM asg_{t} a JOIN emb e ON e.vec_id = a.vec_id
    CROSS JOIN UNNEST(range(1, len(e.embedding)+1)) AS u(i)
    GROUP BY a.c_id, u.i)
  GROUP BY c_id)"""
    sql += f"""
SELECT vec_id, c_id AS centroid_id, ROUND(d2, 6) AS dist2
FROM asg_{iters + 1}
"""
    return sql


@register("simsearch_kmeans_train", oracle=_kmeans_oracle())
def simsearch_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-means training: 3 Lloyd iterations (assign → decimal-exact
    centroid means) from the deterministic vec_id < 8 seeds, returning the
    final assignment. The driver-side loop is the idiomatic Spark shape for
    iterative ML: per-iteration plans stay small via localCheckpoint, the
    centroid set (k × dim doubles) broadcasts, and the only wide exchange
    per iteration is the (c_id, dim) mean aggregation.

    Exactly oracle-checked despite being iterative: distances fold strictly
    left-to-right in double (oracle: list_reduce in the same element order
    → bit-identical), centroid MEANS stay exact-decimal sums — group merge
    order is nondeterministic in BOTH engines, so that one sum genuinely
    needs order-independent arithmetic — divided once in DOUBLE, and both
    engines start from identical float32 inputs. Every iteration, and
    therefore the fixpoint trajectory, is bit-identical to the unrolled
    recursive SQL in DuckDB. Empty clusters drop out of both sides
    identically (no rows → no centroid). The per-iteration argmin is a
    min-of-(d2, c_id)-struct aggregate, not a window sort."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = emb.filter(F.col("vec_id") < 8).limit(8).select(
        F.col("vec_id").alias("c_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("cvec"),
    )
    fold = (
        "aggregate(zip_with(embedding, cvec, (a, b) -> "
        "(CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )

    def assign(centroids: DataFrame) -> DataFrame:
        return (
            emb.crossJoin(F.broadcast(centroids))
            .select("vec_id", "c_id", F.expr(fold).alias("d2"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("d2", "c_id")).alias("best"))
            .select(
                "vec_id",
                F.col("best.c_id").alias("c_id"),
                F.col("best.d2").alias("d2"),
            )
        )

    for _ in range(_KM_ITERS):
        asg = assign(cent)
        cent = (
            asg.join(emb, "vec_id")
            .select("c_id", F.posexplode("embedding").alias("i", "val"))
            .groupBy("c_id", "i")
            .agg(
                (
                    F.sum(
                        F.col("val").cast("double").cast("decimal(26,18)")
                    ).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("c_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, m))), x -> x.m)"
                ).alias("cvec")
            )
            .localCheckpoint(eager=True)  # truncate the per-iteration lineage
            # the checkpoint erases the plan's provable k-row bound
            # (RDDScan is an opaque leaf); the limit reasserts it for the
            # loop-join ban at zero cost (<= 8 rows by construction)
            .limit(8)
        )
    return assign(cent).select(
        "vec_id",
        F.col("c_id").alias("centroid_id"),
        F.round(F.col("d2"), 6).alias("dist2"),
    )


# ---------------------------------------------------------------------------
# deterministic three-way split + winsorized length stats + exact Gram
# ---------------------------------------------------------------------------
@register(
    "split_train_val_test",
    oracle="""
WITH s AS (
  SELECT lang, n_chars,
         CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
                   < 'cc' THEN 'train'
              WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
                   < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split, lang
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment: md5 of a salted
    doc key, first hex byte thresholded at 0xcc (204/256) and 0xe6
    (230/256). The split is a pure row expression — stable across runs,
    partitionings, engines, and RE-RUNS AS THE CORPUS GROWS (a given doc
    never migrates between splits when new docs arrive, which rand(seed)
    cannot promise), evaluates in the scan stage, and shuffles nothing
    but the final per-split counts."""
    d = load(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    split = (
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "text_winsorize_lengths",
    oracle="""
WITH b AS (
  SELECT quantile_disc(n_chars, 0.05) AS lo, quantile_disc(n_chars, 0.95) AS hi
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(least(greatest(n_chars, lo), hi)) AS BIGINT) AS wsum,
       CAST(MIN(lo) AS BIGINT) AS lo, CAST(MAX(hi) AS BIGINT) AS hi
FROM documents, b
GROUP BY lang
""",
)
def text_winsorize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized length statistics — outlier-robust corpus profiling: the
    global p5/p95 of n_chars (exact discrete quantiles, so both engines
    agree to the integer) clamp every document's length before summing.
    Two-pass shape: pass 1 reduces to ONE scalar row (percentile_disc),
    which then rides into pass 2 as a broadcast nested-loop of a 1-row
    side — the scalar-subquery pattern; the fact table itself shuffles
    only for the final per-lang aggregate."""
    d = load(spark, sf_dir, "documents")
    bounds = d.agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)").alias(
            "lo"
        ),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)").alias(
            "hi"
        ),
    )
    clamped = d.crossJoin(F.broadcast(bounds)).select(
        "lang",
        F.least(F.greatest(F.col("n_chars"), F.col("lo")), F.col("hi")).alias(
            "w"
        ),
        "lo",
        "hi",
    )
    return clamped.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("w").cast("bigint").alias("wsum"),
        F.min("lo").cast("bigint").alias("lo"),
        F.max("hi").cast("bigint").alias("hi"),
    )


@register(
    "embed_gram_matrix",
    oracle="""
SELECT i, j,
       ROUND(CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE)
                           * CAST(e.embedding[j] AS DOUBLE)
                           AS DECIMAL(30,12))) AS DOUBLE), 6) AS g,
       CAST(COUNT(*) AS BIGINT) AS n
FROM embeddings e
CROSS JOIN UNNEST(range(1, len(e.embedding) + 1)) AS a(i)
CROSS JOIN UNNEST(range(1, len(e.embedding) + 1)) AS b(j)
WHERE j >= i
GROUP BY i, j
""",
)
def embed_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix of the embedding corpus (Σ xᵢxⱼ over all vectors,
    upper triangle of a 64×64) — the reduction under distributed PCA /
    whitening / covariance shift-detection. This formulation explodes
    (i, j) pairs and decimal-sums products so the result is bit-exact and
    oracle-checkable: one shuffle of |V|·d(d+1)/2 skinny rows. The
    PRODUCTION path is the per-partition numpy outer-product partial
    (mapInPandas einsum, d² floats per partition, then one tiny reduce) —
    tests/test_properties.py pins that both paths agree to 1e-6; decimal
    explode is the semantics anchor, einsum is the speed path."""
    e = load(spark, sf_dir, "embeddings")
    # explode twice joined on vec_id would double-shuffle; instead explode
    # ONCE into (vec, i, x) and self-pair within the row via a second
    # posexplode over the same array — one pass, no join
    pairs = e.select(
        F.col("vec_id"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "xi"),
        F.col("embedding").cast("array<double>").alias("arr"),
    ).select(
        (F.col("i0") + 1).alias("i"),
        F.posexplode("arr").alias("j0", "xj"),
        F.col("xi"),
    ).filter(F.col("j0") + 1 >= F.col("i")).select(
        "i",
        (F.col("j0") + 1).alias("j"),
        (F.col("xi") * F.col("xj")).cast("decimal(30,12)").alias("p"),
    )
    return pairs.groupBy("i", "j").agg(
        F.round(F.sum("p").cast("double"), 6).alias("g"),
        F.count("*").alias("n"),
    )


_PCA_ORACLE = """
WITH tri AS (
  SELECT i, j,
         ROUND(SUM(CAST(ROUND(CAST(e.embedding[i] AS DOUBLE)
                              * CAST(e.embedding[j] AS DOUBLE) * 1e12)
                        AS BIGINT)) / 1e12, 6) AS g
  FROM embeddings e
  CROSS JOIN UNNEST(range(1, len(e.embedding) + 1)) AS a(i)
  CROSS JOIN UNNEST(range(1, len(e.embedding) + 1)) AS b(j)
  WHERE j >= i
  GROUP BY i, j
),
gram AS (
  SELECT i, j, g FROM tri
  UNION ALL
  SELECT j AS i, i AS j, g FROM tri WHERE j > i
),
v1 AS (
  SELECT i, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(g ORDER BY j)), (a, b) -> a + b) AS val
  FROM gram GROUP BY i
),
y2 AS (
  SELECT gram.i AS i,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(gram.g * v1.val ORDER BY gram.j)), (a, b) -> a + b) AS val
  FROM gram JOIN v1 ON v1.i = gram.j GROUP BY gram.i
),
nrm AS (
  SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(val * val ORDER BY i)), (a, b) -> a + b)) AS n
  FROM y2
)
SELECT CAST(y2.i AS INTEGER) AS dim, ROUND(y2.val / nrm.n, 6) AS pc1
FROM y2, nrm
"""


@register("embed_pca_power_iter", oracle=_PCA_ORACLE)
def embed_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by power iteration —
    the distributed-PCA shape (Spark MLlib's RowMatrix does the same: one
    Gramian reduce over the data, then constant-size linear algebra). Two
    unrolled iterations from the all-ones seed: v1 = G·1, pc1 = (G·v1)
    normalized. The corpus is touched ONCE (the upper-triangle Gram
    reduce — exact 1e-12-scaled int64 sums, mirrored to the full matrix
    afterward); each iteration is a d×d ⨯ d matvec — 64×64
    rows joined against a 64-row broadcast vector, constant work however
    big the corpus is. More iterations sharpen convergence without
    touching data again; 2 are unrolled so the oracle stays readable.

    Determinism: Gram entries are exact integer sums of 1e-12-scaled
    products rounded to 6 dp (bit-identical to the decimal formulation
    and to DuckDB at every sf, at half the cost), every matvec and the
    final L2 norm are
    index-ordered left-to-right folds — no unordered float SUM anywhere,
    so both engines produce bit-identical doubles.

    r11 optimization round: the corpus scan is load_spread — the d(d+1)/2
    per-vector explode is the expensive map here, and the single-row-group
    fixture file would otherwise run it on one core (no-op at production
    file counts)."""
    e = load_spread(spark, sf_dir, "embeddings", "vec_id")
    pairs = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i0", "xi"
        ),
        F.col("embedding").cast("array<double>").alias("arr"),
    ).select(
        (F.col("i0") + 1).alias("i"),
        F.posexplode("arr").alias("j0", "xj"),
        F.col("xi"),
    ).filter(F.col("j0") + 1 >= F.col("i")).select(
        "i",
        (F.col("j0") + 1).alias("j"),
        # products as 1e-12-scaled int64: the long SUM is codegen'd and
        # order-free (exact integer), ~2x the interpreted-decimal path,
        # and empirically bit-identical to both the decimal formulation
        # and DuckDB's twin at every sf
        F.expr("CAST(ROUND(xi * xj * 1e12) AS BIGINT)").alias("p"),
    )
    tri = pairs.groupBy("i", "j").agg(
        F.round(F.sum("p") / 1e12, 6).alias("g")
    )
    # persist + mirror: only the upper triangle pays the corpus-scale
    # reduce (G is symmetric — half the explode volume); BOTH iteration
    # branches (v1 = G·1 and y2 = G·v1) then reuse the d²-row cached
    # result instead of re-reducing the corpus per matvec (8.0s -> ~2s
    # at sf0.1 from the two changes together).
    gram = scratch_persist(
        tri.unionByName(
            tri.filter(F.col("j") > F.col("i")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "g"
            )
        )
    )

    def _matvec(mat: DataFrame, vec: DataFrame) -> DataFrame:
        """y_i = Σ_j mat_ij · vec_j as an index-ordered fold; vec is d rows
        → broadcast, so the matvec never shuffles the matrix."""
        t = mat.join(
            F.broadcast(vec.select(F.col("i").alias("j"), "val")), "j"
        ).select("i", "j", (F.col("g") * F.col("val")).alias("t"))
        return t.groupBy("i").agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(j, t))), "
                "CAST(0.0 AS DOUBLE), (acc, s) -> acc + s.t)"
            ).alias("val")
        )

    v1 = gram.groupBy("i").agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(j, g))), "
            "CAST(0.0 AS DOUBLE), (acc, s) -> acc + s.g)"
        ).alias("val")
    )
    y2 = _matvec(gram, v1)
    nrm = y2.agg(
        F.expr(
            "sqrt(aggregate(array_sort(collect_list(struct(i, "
            "val * val AS v2))), CAST(0.0 AS DOUBLE), "
            "(acc, s) -> acc + s.v2))"
        ).alias("n")
    )
    return y2.crossJoin(F.broadcast(nrm)).select(
        F.col("i").cast("int").alias("dim"),
        F.round(F.col("val") / F.col("n"), 6).alias("pc1"),
    )


@register(
    "embed_quantize_int8",
    oracle="""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         greatest(list_reduce(list_transform(v, x -> abs(x)),
                              (a, b) -> greatest(a, b)), 1e-12) / 127 AS scale
  FROM e
)
SELECT vec_id,
       ROUND(scale, 9) AS scale,
       list_transform(v, x -> CAST(round(x / scale) AS INTEGER)) AS codes,
       ROUND(sqrt(list_reduce(
         list_transform(v, x -> (x - round(x / scale) * scale)
                              * (x - round(x / scale) * scale)),
         (a, b) -> a + b)), 6) AS recon_err
FROM s
""",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of embeddings — the 4× memory cut that, with
    PQ (simsearch_pq_assign), covers the two production ANN compression
    schemes. Per vector: symmetric scale = max|x|/127, codes =
    round(x/scale), plus the L2 reconstruction error that rerank budgets
    are tuned against.

    Entirely map-side higher-order functions (one scan, zero shuffle, no
    UDF). Scale/error are doubles folded strictly left-to-right in BOTH
    engines and rounded before compare; codes are integers, so the hash
    check is exact."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    s = e.withColumn(
        "scale",
        F.expr(
            "greatest(aggregate(transform(v, x -> abs(x)), "
            "CAST(0.0 AS DOUBLE), (a, b) -> greatest(a, b)), 1e-12d) / 127"
        ),
    )
    return s.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.expr(
            "transform(v, x -> CAST(round(x / scale) AS INT))"
        ).alias("codes"),
        F.round(
            F.expr(
                "sqrt(aggregate(transform(v, x -> (x - round(x / scale) * scale)"
                " * (x - round(x / scale) * scale)), "
                "CAST(0.0 AS DOUBLE), (a, b) -> a + b))"
            ),
            6,
        ).alias("recon_err"),
    )


@register(
    "embed_center_whiten",
    oracle="""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
x AS (
  SELECT i, v[i] AS x FROM e CROSS JOIN UNNEST(range(1, len(v) + 1)) AS u(i)
),
st AS (
  SELECT i,
         CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS mu,
         sqrt(greatest(
           CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*)
           - (CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*))
           * (CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*)),
           1e-24)) AS sd
  FROM x GROUP BY i
),
b AS (
  SELECT list(mu ORDER BY i) AS mus, list(sd ORDER BY i) AS sds FROM st
)
SELECT e.vec_id AS vec_id,
       list_transform(range(1, len(e.v) + 1),
                      i -> round((e.v[i] - b.mus[i]) / b.sds[i], 6)) AS z
FROM e, b
""",
)
def embed_center_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization of the embedding corpus (z-scoring /
    diagonal whitening) — the normalization step before ABTT-style
    postprocessing, cosine-vs-dot alignment, or covariance-shift checks.

    Scale shape: one explode → per-dimension (d=64 keys) decimal-exact
    moment aggregate (map-side combinable; the shuffle carries d rows per
    partition), stats collapse into ONE broadcast row of (mu[], sd[])
    arrays, and the z-transform is a map-only higher-order function over
    the corpus — the corpus itself never shuffles. Determinism: component
    sums and sum-of-squares route through DECIMAL(30,12) (exact, merge-
    order-free, same contract as embed_gram_matrix), mean/variance/sd are
    then identical double expressions in both engines, and z-scores round
    to 6 dp."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    x = e.select(F.posexplode("v").alias("i0", "x")).select(
        (F.col("i0") + 1).alias("i"), "x"
    )
    mu = F.sum(F.col("x").cast("decimal(30,12)")).cast("double") / F.count("*")
    ex2 = (
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,12)")).cast("double")
        / F.count("*")
    )
    st = x.groupBy("i").agg(
        mu.alias("mu"),
        F.sqrt(F.greatest(ex2 - mu * mu, F.lit(1e-24))).alias("sd"),
    )
    b = st.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, mu, sd))), s -> s.mu)"
        ).alias("mus"),
        F.expr(
            "transform(array_sort(collect_list(struct(i, mu, sd))), s -> s.sd)"
        ).alias("sds"),
    )
    return e.crossJoin(F.broadcast(b)).select(
        "vec_id",
        F.expr(
            "transform(sequence(1, size(v)), i -> "
            "round((element_at(v, i) - element_at(mus, i)) "
            "/ element_at(sds, i), 6))"
        ).alias("z"),
    )
