#!/usr/bin/env python
"""Disk-bounded STAGED DuckDB oracles for the graph keys whose monolithic
oracles exceed one box at the 100x replica (round-7 verdict ask #1, plus
two more keys the round-8 sweep caught: rich_club and the backbone LCC).

These keys' monolithic oracles hold the whole 6e8-row edge build plus
every round's intermediate in DuckDB temp space at once and spill past
the box's free disk (CORRECTNESS_sf10_r07.json, IO errors preserved). The
operators themselves are fine at 100x — the Spark side is round-staged by
construction — so this tool re-expresses each ORACLE as the same algebra
executed as a SEQUENCE of bounded DuckDB queries with parquet
intermediates on disk:

- the shared edge build (``SELECT DISTINCT o_custkey, l_suppkey FROM
  orders JOIN lineitem``) is materialized ONCE as ``cs.parquet`` and read
  back by every stage, instead of being re-derived inside each round's
  CTE closure;
- each fixpoint round (BFS relax, PPR contribution+rank, HITS half-round)
  is ONE DuckDB query over {edges parquet, previous-round parquet} whose
  working set is a single hash join + hash aggregate — bounded by the
  round, not the unroll depth;
- the jaccard wedge expansion is SLICED by ``s1 % K``: the (s1, s2) pair
  domain is partitioned exactly, each slice runs the identical
  inter/sdeg/ppm algebra with its own bounded aggregate state and keeps
  its own top-20, and the global top-20 equals the top-20 of the union of
  the per-slice top-20s (the pair space is disjoint across slices; the
  ORDER BY tiebreak (jaccard_ppm DESC, s1, s2) is total).

Every staged decomposition is pure algebra over the SAME integer
arithmetic as the monolithic oracle — ``--check`` proves it by running
both forms at a small scale factor and asserting canon-row equality, and
the test suite pins that proof (tests/test_invariants_r8.py).

Each stage runs in a FRESH duckdb connection with a memory cap and a
spill directory, so a stage can at worst spill its own round — never the
chain. Intermediates live under a scratch dir and are removed on success.

Usage:
  python tools/oracle_staged.py --check [sf_dir]      # staged == monolithic
  (as a library) STAGED_ORACLES[key](sf_dir, workdir) -> pandas.DataFrame
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

_OFFSET = 10_000_000  # graph.py:29 — supplier-node key offset

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# one bounded stage = one fresh connection; never let a single query own
# more than this (the Spark JVM shares the host during sweeps)
_DUCK_MEM = os.environ.get("SPARK_GRAFT_DUCK_MEM", "40GB")
# per-process spill subdir: see sweep_sf1.py — shared temp dirs
# corrupt concurrent lanes via colliding temp-file names
_SPILL = f"/tmp/duck_spill/{os.getpid()}"


def _connect(sf_dir: str, work: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    os.makedirs(_SPILL, exist_ok=True)
    con.execute(f"SET memory_limit='{_DUCK_MEM}'")
    con.execute(f"SET temp_directory='{_SPILL}'")
    con.execute("SET threads=16")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "*.parquet")))
            if files:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet({files!r})"
                )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # staged intermediates become views named after their file stem; a
    # stem colliding with a base table would silently SHADOW it and
    # corrupt every downstream staged query — fail loudly instead
    for p in sorted(glob.glob(os.path.join(work, "*.parquet"))):
        name = os.path.splitext(os.path.basename(p))[0]
        if name in TABLES:
            raise ValueError(
                f"staged intermediate {p!r} would shadow base table "
                f"{name!r}; rename the stage (e.g. stg_{name})"
            )
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _stage(sf_dir: str, work: str, name: str, sql: str) -> None:
    """Run one bounded query and persist its result as <work>/<name>.parquet."""
    con = _connect(sf_dir, work)
    try:
        con.execute(f"COPY ({sql}) TO '{work}/{name}.parquet' (FORMAT PARQUET)")
    finally:
        con.close()


def _fetch(sf_dir: str, work: str, sql: str):
    con = _connect(sf_dir, work)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _stage_cs(sf_dir: str, work: str) -> None:
    """Shared stage: the distinct (customer, supplier) trade edge list —
    the one relation every monolithic oracle re-derives inside its CTE
    closure (the 100x spill source). Materialized once per workdir."""
    if not os.path.exists(f"{work}/cs.parquet"):
        _stage(
            sf_dir,
            work,
            "cs",
            "SELECT DISTINCT o_custkey AS c, l_suppkey AS s "
            "FROM orders JOIN lineitem ON o_orderkey = l_orderkey",
        )


# symmetrized node-graph edges over the staged cs (≡ graph.py _EDGES_SQL:
# the two UNION branches live in disjoint key domains and cs is already
# distinct, so UNION ALL over the mirror equals the original UNION)
_EDGES_OVER_CS = f"""
  SELECT c AS src, {_OFFSET} + s AS dst FROM cs
  UNION ALL
  SELECT {_OFFSET} + s AS src, c AS dst FROM cs
"""


# ---------------------------------------------------------------------------
# graph_bfs_multisource (graph.py:449 _bfs_oracle, 4 rounds)
# ---------------------------------------------------------------------------


def staged_bfs(sf_dir: str, work: str):
    _stage_cs(sf_dir, work)
    _stage(
        sf_dir,
        work,
        "bfs_d0",
        "SELECT c_custkey AS node, 0 AS dist FROM customer "
        "WHERE c_custkey % 100 = 0",
    )
    for k in range(1, 5):
        _stage(
            sf_dir,
            work,
            f"bfs_d{k}",
            f"""SELECT node, MIN(dist) AS dist FROM (
  SELECT node, dist FROM bfs_d{k - 1}
  UNION ALL
  SELECT e.dst AS node, d.dist + 1 AS dist
  FROM ({_EDGES_OVER_CS}) e JOIN bfs_d{k - 1} d ON e.src = d.node
) GROUP BY node""",
        )
    return _fetch(
        sf_dir,
        work,
        "SELECT CAST(node AS BIGINT) AS node, CAST(dist AS INT) AS dist "
        "FROM bfs_d4",
    )


# ---------------------------------------------------------------------------
# graph_ppr_seed_teleport (round5b_ext.py:44 _ppr_oracle, 3 rounds)
# ---------------------------------------------------------------------------

_PPR_SEED_SQL = f"(id % 50 = 0 AND id < {_OFFSET})"


def staged_ppr(sf_dir: str, work: str):
    _stage_cs(sf_dir, work)
    _stage(
        sf_dir,
        work,
        "ppr_nodes",
        f"SELECT DISTINCT src AS id FROM ({_EDGES_OVER_CS}) "
        f"UNION SELECT DISTINCT dst FROM ({_EDGES_OVER_CS})",
    )
    _stage(
        sf_dir,
        work,
        "ppr_deg",
        f"SELECT src, COUNT(*) AS outdeg FROM ({_EDGES_OVER_CS}) GROUP BY src",
    )
    _stage(
        sf_dir,
        work,
        "ppr_r0",
        f"SELECT id, CAST(CASE WHEN {_PPR_SEED_SQL} THEN 1000000 ELSE 0 END "
        "AS BIGINT) AS r FROM ppr_nodes",
    )
    for i in range(1, 4):
        # monolithic c{i}.s is HUGEINT (SUM over BIGINT); parquet stores
        # HUGEINT as lossy double, so the staged form pins BIGINT — exact
        # and equal to the HUGEINT value because per-node contribution
        # mass is bounded by total rank mass <= #nodes * 1e6 (~1.6e12 at
        # 100x), 6 orders of magnitude under int64
        _stage(
            sf_dir,
            work,
            f"ppr_c{i}",
            f"SELECT e.dst AS id, CAST(SUM(r.r // d.outdeg) AS BIGINT) AS s "
            f"FROM ({_EDGES_OVER_CS}) e "
            f"JOIN ppr_r{i - 1} r ON r.id = e.src "
            "JOIN ppr_deg d ON d.src = e.src GROUP BY e.dst",
        )
        _stage(
            sf_dir,
            work,
            f"ppr_r{i}",
            f"SELECT n.id, CAST(CASE WHEN n.id % 50 = 0 AND n.id < {_OFFSET} "
            f"THEN 150000 ELSE 0 END + (850 * COALESCE(c.s, 0)) // 1000 "
            f"AS BIGINT) AS r FROM ppr_nodes n "
            f"LEFT JOIN ppr_c{i} c ON c.id = n.id",
        )
    return _fetch(
        sf_dir,
        work,
        f"""SELECT id AS node, r AS rank_micros,
       CAST(CASE WHEN {_PPR_SEED_SQL} THEN 1 ELSE 0 END AS INT) AS is_seed
FROM ppr_r3
ORDER BY rank_micros DESC, node ASC LIMIT 15""",
    )


# ---------------------------------------------------------------------------
# graph_hits_rounds (round5_ext.py:526 _hits_oracle, 2 rounds)
# ---------------------------------------------------------------------------


def staged_hits(sf_dir: str, work: str):
    _stage_cs(sf_dir, work)
    _stage(
        sf_dir,
        work,
        "hits_h0",
        "SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM cs",
    )
    for i in range(1, 3):
        _stage(
            sf_dir,
            work,
            f"hits_a{i}raw",
            f"SELECT e.s, CAST(SUM(h.h) AS BIGINT) AS a "
            f"FROM cs e JOIN hits_h{i - 1} h ON h.c = e.c GROUP BY e.s",
        )
        _stage(
            sf_dir,
            work,
            f"hits_a{i}",
            f"SELECT s, CAST((a * 1000000) // "
            f"(SELECT MAX(a) FROM hits_a{i}raw) AS BIGINT) AS a "
            f"FROM hits_a{i}raw",
        )
        _stage(
            sf_dir,
            work,
            f"hits_h{i}raw",
            f"SELECT e.c, CAST(SUM(a.a) AS BIGINT) AS h "
            f"FROM cs e JOIN hits_a{i} a ON a.s = e.s GROUP BY e.c",
        )
        _stage(
            sf_dir,
            work,
            f"hits_h{i}",
            f"SELECT c, CAST((h * 1000000) // "
            f"(SELECT MAX(h) FROM hits_h{i}raw) AS BIGINT) AS h "
            f"FROM hits_h{i}raw",
        )
    return _fetch(
        sf_dir,
        work,
        """SELECT hits_a2.s AS supplier,
       CAST(deg.indeg AS BIGINT) AS indeg,
       hits_a2.a AS auth_micro
FROM hits_a2
JOIN (SELECT s, COUNT(*) AS indeg FROM cs GROUP BY s) deg
  ON deg.s = hits_a2.s
ORDER BY auth_micro DESC, supplier ASC LIMIT 10""",
    )


# ---------------------------------------------------------------------------
# graph_jaccard_neighbor_sim (retrieval_ext.py:234, sliced wedge expansion)
# ---------------------------------------------------------------------------

_JAC_DEG_CAP = 64  # retrieval_ext.py:221 — oracle applies it identically
_JAC_TOP = 20
_JAC_SLICES = 32


def staged_jaccard(sf_dir: str, work: str):
    _stage_cs(sf_dir, work)
    _stage(
        sf_dir,
        work,
        "jac_kept",
        f"""SELECT cs.c, cs.s FROM cs
JOIN (SELECT c, COUNT(*) AS cd FROM cs GROUP BY c) cdeg ON cdeg.c = cs.c
WHERE cd <= {_JAC_DEG_CAP}""",
    )
    _stage(
        sf_dir, work, "jac_sdeg",
        "SELECT s, COUNT(*) AS d FROM jac_kept GROUP BY s",
    )
    # exact partition of the (s1, s2) output domain by s1 % K: each slice
    # owns a disjoint pair subset, so its bounded top-20 is a superset of
    # the global top-20's members with s1 in the slice — union + re-sort
    # is exact
    for i in range(_JAC_SLICES):
        _stage(
            sf_dir,
            work,
            f"jac_slice{i}",
            f"""WITH inter AS (
  SELECT a.s AS s1, b.s AS s2, COUNT(*) AS n_shared
  FROM jac_kept a JOIN jac_kept b ON a.c = b.c AND a.s < b.s
  WHERE a.s % {_JAC_SLICES} = {i}
  GROUP BY a.s, b.s
)
SELECT CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST(d1.d + d2.d - n_shared AS BIGINT) AS n_union,
       CAST(n_shared * 1000000 // (d1.d + d2.d - n_shared) AS BIGINT)
         AS jaccard_ppm
FROM inter JOIN jac_sdeg d1 ON d1.s = inter.s1
           JOIN jac_sdeg d2 ON d2.s = inter.s2
ORDER BY jaccard_ppm DESC, s1 ASC, s2 ASC
LIMIT {_JAC_TOP}""",
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM jac_slice{i}" for i in range(_JAC_SLICES)
    )
    return _fetch(
        sf_dir,
        work,
        f"SELECT * FROM ({union}) "
        f"ORDER BY jaccard_ppm DESC, s1 ASC, s2 ASC LIMIT {_JAC_TOP}",
    )


# ---------------------------------------------------------------------------
# graph_rich_club (paired_metrics_ext.py:119 — the monolithic oracle holds
# pairs + symmetrized edges + the degree-annotated edge relation in temp at
# once and spilled past free disk at 100x in the round-8 sweep)
# ---------------------------------------------------------------------------

_RC_KS = (2, 4, 8, 16)


def staged_rich_club(sf_dir: str, work: str):
    _stage_cs(sf_dir, work)
    _stage(
        sf_dir,
        work,
        "rc_deg",
        f"SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d "
        f"FROM ({_EDGES_OVER_CS}) GROUP BY 1",
    )
    # all four thresholds as conditional sums in ONE pass over the edge
    # list joined to the staged degree relation — the row-level annotated
    # edge relation never materializes
    m_exprs = ", ".join(
        f"CAST(SUM(CASE WHEN ds.d > {k} AND dd.d > {k} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS m{k}"
        for k in _RC_KS
    )
    _stage(
        sf_dir,
        work,
        "rc_m",
        f"SELECT {m_exprs} FROM cs p "
        "JOIN rc_deg ds ON ds.v = p.c "
        f"JOIN rc_deg dd ON dd.v = {_OFFSET} + p.s",
    )
    n_exprs = ", ".join(
        f"CAST(SUM(CASE WHEN d > {k} THEN 1 ELSE 0 END) AS BIGINT) AS n{k}"
        for k in _RC_KS
    )
    _stage(sf_dir, work, "rc_n", f"SELECT {n_exprs} FROM rc_deg")
    rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS k, n{k} AS n_k, m{k} AS m_k "
        "FROM rc_m, rc_n"
        for k in _RC_KS
    )
    return _fetch(
        sf_dir,
        work,
        f"""SELECT k, n_k, m_k,
  CAST(CASE WHEN n_k >= 2 THEN (10000*2*m_k) // (n_k*(n_k-1)) ELSE 0 END
       AS BIGINT) AS phi_bp
FROM ({rows})""",
    )


# ---------------------------------------------------------------------------
# graph_local_clustering_topk (round8_ext.py — the monolithic oracle's
# full-width lineitem self-join + 45M-group support aggregate spills past
# free disk at 100x; staged: prune columns first, then aggregate, then the
# constant-size backbone does everything else)
# ---------------------------------------------------------------------------

_LCC_BACKBONE = 5000
_LCC_TOP = 20


def staged_lcc(sf_dir: str, work: str):
    _stage(
        sf_dir, work, "lcc_li",
        "SELECT l_orderkey, l_suppkey FROM lineitem",
    )
    _stage(
        sf_dir,
        work,
        "lcc_w",
        "SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, "
        "CAST(COUNT(*) AS BIGINT) AS w "
        "FROM lcc_li a JOIN lcc_li b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey "
        "GROUP BY 1, 2",
    )
    _stage(
        sf_dir,
        work,
        "lcc_e",
        f"SELECT s1, s2 FROM lcc_w "
        f"ORDER BY w DESC, s1 ASC, s2 ASC LIMIT {_LCC_BACKBONE}",
    )
    return _fetch(
        sf_dir,
        work,
        f"""WITH deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT s1 AS v FROM lcc_e UNION ALL SELECT s2 FROM lcc_e) GROUP BY v
),
tri AS (
  SELECT e1.s1 AS x, e1.s2 AS y, e2.s2 AS z
  FROM lcc_e e1 JOIN lcc_e e2 ON e2.s1 = e1.s2
  JOIN lcc_e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
),
tn AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t
  FROM (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) GROUP BY v
)
SELECT CAST(deg.v AS BIGINT) AS node, deg.d AS degree,
       CAST(COALESCE(tn.t, 0) AS BIGINT) AS n_tri,
       CAST(2 * COALESCE(tn.t, 0) * 1000000 // (deg.d * (deg.d - 1))
            AS BIGINT) AS lcc_ppm
FROM deg LEFT JOIN tn ON tn.v = deg.v
WHERE deg.d >= 2
ORDER BY lcc_ppm DESC, node ASC LIMIT {_LCC_TOP}""",
    )


def staged_scan_dir_enumerate(sf_dir: str, work: str):
    """LAYOUT-AWARE twin of scan_dir_enumerate's registry oracle.

    The registry oracle hardcodes the driver fixtures' one-file-per-table
    layout (``'lineitem.parquet' AS file_name``) because the driver's
    pre-registered views flatten any layout — a view cannot expose
    filenames. The scaled replicas are Spark-written DATASET DIRECTORIES
    (8 part files at 100x), where the per-file enumeration the key exists
    to test (main.cc:297-324) legitimately returns one row per part file.
    This staged form asks DuckDB for the same per-file counts via
    read_parquet(filename=true); on a single-file layout it returns
    exactly the registry oracle's row, pinned by
    tests/test_invariants_r8.py's staged==monolithic parametrization.
    """
    p = os.path.join(sf_dir, "lineitem.parquet")
    src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con = _connect(sf_dir, work)
    try:
        return con.execute(
            f"SELECT parse_filename(filename) AS file_name, "
            f"COUNT(*) AS n FROM read_parquet('{src}', filename=true) "
            f"GROUP BY 1"
        ).fetchdf()
    finally:
        con.close()


def staged_skyline(sf_dir: str, work: str):
    """O(n log n) window-sweep twin of query_skyline_pareto's oracle.

    The registry oracle is the NOT EXISTS all-pairs SPEC — the right
    declaration of skyline, and fine at driver scale, but quadratic: at
    the 100x replica (200k parts) DuckDB's mark-join ran a single core
    for 20+ minutes. This staged form is the same dominance algebra the
    Spark side uses (skyline_linkage_ext.py:93-97): a row survives iff
    its size strictly exceeds the max size over STRICTLY cheaper rows
    AND equals the max size among its equal-price peers. Equivalence to
    the spec is pinned by the staged==monolithic parametrized test.
    """
    return _fetch(
        sf_dir,
        work,
        """WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS INT) AS p_size
  FROM part
), w AS (
  SELECT p_partkey, price_cents, p_size,
         MAX(p_size) OVER (ORDER BY price_cents
                           RANGE BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS m_strict,
         MAX(p_size) OVER (PARTITION BY price_cents) AS m_eq
  FROM p
)
SELECT p_partkey, price_cents, p_size FROM w
WHERE (m_strict IS NULL OR p_size > m_strict) AND p_size = m_eq""",
    )


def staged_scan_file_metadata(sf_dir: str, work: str):
    """Layout-aware twin of scan_file_metadata_cols (same class as
    scan_dir_enumerate: the registry oracle hardcodes the single-file
    fixture layout; dataset directories legitimately yield one row per
    part file)."""
    p = os.path.join(sf_dir, "documents.parquet")
    src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con = _connect(sf_dir, work)
    try:
        return con.execute(
            f"SELECT parse_filename(filename) AS fname, "
            f"CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            f"FROM read_parquet('{src}', filename=true) GROUP BY 1"
        ).fetchdf()
    finally:
        con.close()


STAGED_ORACLES = {
    "graph_bfs_multisource": staged_bfs,
    "graph_ppr_seed_teleport": staged_ppr,
    "graph_hits_rounds": staged_hits,
    "graph_jaccard_neighbor_sim": staged_jaccard,
    "graph_rich_club": staged_rich_club,
    "graph_local_clustering_topk": staged_lcc,
    "scan_dir_enumerate": staged_scan_dir_enumerate,
    "scan_file_metadata_cols": staged_scan_file_metadata,
    "query_skyline_pareto": staged_skyline,
}


def run_staged(key: str, sf_dir: str, work: str | None = None):
    """Run one staged oracle; caller owns the workdir if provided."""
    own = work is None
    if own:
        work = tempfile.mkdtemp(prefix=f"staged_{key}_", dir="/tmp")
    try:
        return STAGED_ORACLES[key](sf_dir, work)
    finally:
        if own:
            shutil.rmtree(work, ignore_errors=True)


def _check(sf_dir: str) -> int:
    """Prove staged == monolithic at a small SF (pure-DuckDB differential)."""
    from tests.compare import canon_frame

    import __spark_entry__ as e

    oracles = e.oracle_sql()
    n_bad = 0
    for key in STAGED_ORACLES:
        work = tempfile.mkdtemp(prefix=f"check_{key}_", dir="/tmp")
        try:
            staged = STAGED_ORACLES[key](sf_dir, work)
            mono = _fetch(sf_dir, work, oracles[key])
        finally:
            shutil.rmtree(work, ignore_errors=True)
        a = [repr(r) for r in canon_frame(staged)]
        b = [repr(r) for r in canon_frame(mono)]
        ok = a == b and sorted(staged.columns) == sorted(mono.columns)
        print(f"{'PASS' if ok else 'FAIL'} {key}: staged {len(staged)} rows "
              f"vs monolithic {len(mono)} rows", flush=True)
        if not ok:
            n_bad += 1
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at {i}:\n  staged: {x}\n  mono:   {y}")
                    break
    return n_bad


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--check" in sys.argv:
        sys.exit(_check(args[0] if args else "/root/testdata/sf0.01"))
    sys.exit("usage: oracle_staged.py --check [sf_dir]")
