"""Round-10 invariants.

1. The 14 keys CORRECTNESS_sf10_r09.json deferred all have staged oracles
   (the parametrized staged==monolithic proof lives in
   test_invariants_r8.py and extends to them automatically; this pin
   makes silently DROPPING one of them a loud failure).
2. The varchar-argmax encoding the staged oracles use instead of DuckDB's
   struct aggregates (which blow past memory_limit at >1M groups —
   measured r10, PERFORMANCE.md) is order-isomorphic to the struct form.
3. Hostile fixture twins are deterministic — a CI failure reproduces
   against byte-identical data.
4. The distinct-name factorization of dedup_editdistance_blocked equals
   the record-pair spec on adversarial duplicate layouts (dup names, the
   min-key record needing the 2nd-min, cross-name ties).
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pytest

from tools.oracle_staged import STAGED_ORACLES

R9_DEFERRED = [
    "agg_mode_exact",
    "dedup_editdistance_blocked",
    "dedup_simhash",
    "embed_pca_power_iter",
    "graph_harmonic_closeness_seeds",
    "graph_kcore_peel",
    "graph_label_propagation_sync",
    "graph_node2vec_biased_walk",
    "graph_pagerank_converged",
    "graph_pagerank_iterations",
    "graph_random_walks_hash",
    "graph_triangle_count",
    "graph_wl_refinement",
    "simsearch_pq_adc",
]


def test_all_r9_deferred_keys_have_staged_oracles():
    missing = [k for k in R9_DEFERRED if k not in STAGED_ORACLES]
    assert not missing, f"staged oracle dropped for: {missing}"


def test_varchar_argmax_isomorphic_to_struct_max():
    """The zero-padded printf encoding orders exactly like the struct
    comparison (count numeric asc, then value lexicographic asc) — on
    equal counts AND across count magnitudes that differ in digit count."""
    con = duckdb.connect()
    rows = con.execute("""
WITH t(g, cnt, p) AS (VALUES
  (1, 3, 'b'), (1, 3, 'a'), (1, 2, 'z'),
  (2, 10, 'a'), (2, 9, 'z'),
  (3, 1, 'x'))
SELECT g,
  (MAX({'c': cnt, 'p': p})).p AS via_struct,
  substring(MAX(printf('%010d|%s', cnt, p)), 12) AS via_varchar
FROM t GROUP BY g ORDER BY g
""").fetchall()
    for g, a, b in rows:
        assert a == b, f"group {g}: struct {a} != varchar {b}"


def test_two_pass_argmin_isomorphic_to_row_min():
    """min-then-tiebreak (the LPA / PQ-ADC staged form) == row MIN."""
    con = duckdb.connect()
    rows = con.execute("""
WITH t(g, d, c) AS (VALUES
  (1, 1.5, 3), (1, 1.5, 2), (1, 2.0, 1),
  (2, 0.0, 9), (2, 0.0, 4))
SELECT a.g, (MIN((d, c)))[2] AS via_row, b.two_pass
FROM t a
JOIN (
  SELECT t.g, MIN(t.c) AS two_pass
  FROM t JOIN (SELECT g, MIN(d) AS md FROM t GROUP BY g) m
    ON m.g = t.g AND t.d = m.md
  GROUP BY t.g
) b ON b.g = a.g
GROUP BY a.g, b.two_pass ORDER BY a.g
""").fetchall()
    for g, a, b in rows:
        assert a == b, f"group {g}: row-min {a} != two-pass {b}"


def test_hostile_fixtures_deterministic(sf_dir, tmp_path):
    from c2_duckdb_runner_spark.hostile import make_hostile_fixtures

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    make_hostile_fixtures(sf_dir, a)
    make_hostile_fixtures(sf_dir, b)
    for t in sorted(os.listdir(a)):
        ha = hashlib.md5(open(os.path.join(a, t), "rb").read()).hexdigest()
        hb = hashlib.md5(open(os.path.join(b, t), "rb").read()).hexdigest()
        assert ha == hb, f"{t} not deterministic"


@pytest.mark.parametrize(
    "names",
    [
        # (key, name): duplicate names, min-key record needs 2nd-min,
        # cross-name candidates at dist 1, isolated name with no match
        [(1, "cold bolt"), (2, "cold bolt"), (3, "cold bolt"),
         (4, "cold bol"), (5, "warm bolt"), (6, "zzzz xxxx")],
        # two names at the same distance — min k2 across names wins
        [(10, "aa bb"), (11, "ab bb"), (12, "ba bb"), (13, "aa bb")],
    ],
)
def test_editdistance_factorization_equals_pair_spec(names):
    """Distinct-name algebra == record-pair spec (the r10 operator
    rewrite), on layouts exercising every branch of the factorization."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE part(p_partkey BIGINT, p_name VARCHAR)"
    )
    con.executemany("INSERT INTO part VALUES (?, ?)", names)
    spec = con.execute("""
WITH p AS (SELECT p_partkey, p_name,
           string_split(p_name, ' ')[2] AS block, length(p_name) AS ln
           FROM part),
cand AS (
  SELECT a.p_partkey AS k1, a.p_name AS name1, b.p_partkey AS k2,
         b.p_name AS name2,
         CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
  FROM p a JOIN p b ON a.block = b.block
   AND a.p_partkey <> b.p_partkey AND abs(a.ln - b.ln) <= 2
  WHERE levenshtein(a.p_name, b.p_name) <= 2
),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY k1
           ORDER BY dist, k2) AS rn FROM cand)
SELECT k1, name1, k2, name2, dist FROM ranked WHERE rn = 1 ORDER BY k1
""").fetchall()
    fact = con.execute("""
WITH nm AS (SELECT p_name, COUNT(*) AS c, MIN(p_partkey) AS k1st
            FROM part GROUP BY 1),
sec AS (SELECT p.p_name, MIN(p.p_partkey) AS k2nd FROM part p
        JOIN nm ON nm.p_name = p.p_name
        WHERE p.p_partkey > nm.k1st GROUP BY 1),
names AS (SELECT nm.p_name, nm.c, nm.k1st, sec.k2nd,
          string_split(nm.p_name, ' ')[2] AS block,
          length(nm.p_name) AS ln
          FROM nm LEFT JOIN sec ON sec.p_name = nm.p_name),
cross_nm AS (
  SELECT a.p_name AS name1,
         CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
         b.k1st AS k2, b.p_name AS name2
  FROM names a JOIN names b ON a.block = b.block
   AND a.p_name <> b.p_name AND abs(a.ln - b.ln) <= 2
  WHERE levenshtein(a.p_name, b.p_name) <= 2
),
rec AS (SELECT p_partkey AS k1, p_name FROM part),
cand AS (
  SELECT r.k1, r.p_name AS name1, c.dist, c.k2, c.name2
  FROM rec r JOIN cross_nm c ON c.name1 = r.p_name
  UNION ALL
  SELECT r.k1, r.p_name, CAST(0 AS INTEGER),
         CASE WHEN r.k1 = n.k1st THEN n.k2nd ELSE n.k1st END, r.p_name
  FROM rec r JOIN names n ON n.p_name = r.p_name AND n.c >= 2
)
SELECT k1, name1, (MIN((dist, k2, name2)))[2] AS k2,
       (MIN((dist, k2, name2)))[3] AS name2,
       (MIN((dist, k2, name2)))[1] AS dist
FROM cand GROUP BY 1, 2 ORDER BY k1
""").fetchall()
    assert spec == fact
