"""Seeded predicate-fuzz generator for the arbitrary-filter slot.

The reference's declared contract is an OPAQUE, user-supplied SQL boolean
expression spliced into a file scan (``main.cc:164-169``, accepted at
``main.cc:209,226``): ``SELECT * FROM '<file>' WHERE <anything>``. A
registry of curated queries cannot substitute for generation on that axis —
a real user types predicates nobody pre-registered, and the known
Spark-vs-DuckDB semantic gaps (ANSI arithmetic, cast rounding, Unicode case
mapping) live exactly in the corners a curated set misses.

This module generates random, TYPED, depth-bounded SQL boolean expressions
over the fixture schemas and renders every node through ONE formatter into
BOTH dialects (Spark SQL and DuckDB SQL). Where the two engines are
measured to diverge, the formatter renders per-dialect text that pins ONE
declared semantics for both (the same discipline as the registry's oracle
pairs), so that any REMAINING count/fingerprint divergence between the two
engines is a real bug, not a dialect artifact.

Measured divergence ledger (every entry probed on this container's
pyspark 4.1.2 [ANSI on, UTC session] vs DuckDB; see PERFORMANCE.md
"FUZZFINDINGS" for the witness expressions):

  rendered per-dialect (same declared semantics both sides):
  D1  x / y         -> Spark ``TRY_DIVIDE(x,y)`` vs Duck ``x / y``
                       (÷0: Duck NULL, Spark ANSI error)
  D2  x % y         -> Spark ``TRY_MOD(x,y)`` vs Duck ``x % y`` (same)
  D3  regexp match  -> Spark ``s RLIKE p`` vs Duck ``regexp_matches(s,p)``
  D4  DAYOFWEEK     -> Duck Sunday=0..6, Spark Sunday=1..7: Duck side
                       rendered ``(DAYOFWEEK(x) + 1)``
  D5  DATEDIFF      -> Spark ``DATEDIFF(end, start)`` vs Duck
                       ``DATEDIFF('day', start, end)``
  D6  JSON extract  -> Spark ``GET_JSON_OBJECT(s, path)`` vs Duck
                       ``json_extract_string(s, path)`` (aligned on
                       scalars, nested paths, arrays, bools, missing keys)
  D7  int -> string -> Spark ``CAST(x AS STRING)`` vs Duck ``AS VARCHAR``
  D8  SPLIT_PART     -> Duck returns '' for a NULL string arg and the whole
                       string for a NULL delimiter (NULL-swallowing); Spark
                       propagates NULL — Duck side rendered with a CASE
                       NULL-guard. FOUND BY THE FUZZER (lineitem seed 2140
                       of the 18k widening run), not by the probe ledger.
  D9  double literal -> BOTH engines parse a bare decimal literal
                       (903.05) as DECIMAL, with per-engine decimal
                       algebras that diverge from double differently
                       (Spark: INT / 903.05 is DECIMAL division rounded
                       to scale 6; Duck: exact decimal +/- but double
                       division). Literals render as '903.05e0' — DOUBLE
                       in both. FOUND BY THE r10 SELECT-SLOT FUZZ (part
                       seed 0 and orders seed 3): WHERE-slot comparisons
                       masked it because a double column in the
                       expression forces double coercion upstream.

  excluded from the grammar (divergence has NO faithful dual rendering;
  each exclusion is itself pinned by tests/test_fuzz_differential.py):
  X1  CONCAT(a, b): Duck skips NULLs ('a'), Spark yields NULL — grammar
      uses ``||`` (NULL-propagating in both).
  X2  SUBSTRING(s, 0, n): Duck consumes length before position 1 ('he'),
      Spark clamps ('hel') — grammar generates start >= 1 only.
  X3  LN/LOG10/LOG2 of <= 0 and SQRT of < 0: Duck raises Out of Range,
      Spark returns NULL/NaN — grammar guards args with ABS(x)+1.
  X4  TRY_CAST(string AS INT): Duck routes via double and ROUNDS
      ('42.7'->43), Spark parses strictly (->NULL); TRY_CAST(double AS
      INT): Duck rounds (42.7->43), Spark truncates (->42) — grammar
      casts strings to DOUBLE only and never casts double->int.
  X5  UPPER/LOWER beyond ASCII: Duck 'ß'->'ẞ', Spark 'ß'->'SS' (locale
      one-to-many mapping) — fixture strings are all-ASCII (verified),
      where the engines agree.
  X6  LIKE escapes: Duck has NO default escape character ('a\\_c' LIKE
      'a\\_c' is false), Spark defaults to backslash — grammar emits
      wildcard patterns without escapes.
  X7  EXP / CBRT: last-ulp libm drift (EXP(1.0): ...4590450 vs ...4590455;
      CBRT(27.0): 3.0000000000000004 vs 3.0) — excluded; SIN/COS/TAN/
      ATAN/ATAN2/ASIN/ACOS/LN/LOG10/LOG2/SQRT measured bit-equal at
      grammar magnitudes (POWER was too at the probe points, but X12
      retired it — the drift is input-dependent).
  X8  HASH(x): engine-defined (different algorithms) — excluded.
  X9  Integer floor division: Duck ``//`` floors, Spark ``div`` truncates
      toward zero (differ on negatives) — excluded from the grammar; the
      registry's offset-trick ledger covers the cases that need it.
  X10 int64 overflow: both ANSI-error (Spark ARITHMETIC_OVERFLOW, Duck Out
      of Range) but an error kills a whole fingerprint batch — integer
      arithmetic is kept provably small (columns <= ~1e5, literals <= 100,
      multiplication only in the double domain).
  X12 POWER: libm pow differs between the JVM and glibc by 1 ulp on some
      inputs; at 1e12+ magnitudes that is a large ABSOLUTE difference
      which survives the mod-2π trig reduction (witness: customer seed
      103, SIN(POWER(c_custkey + c_acctbal, 3))). The grammar renders
      small-integer powers as explicit multiplication chains (IEEE-exact
      in both engines); free-form POWER is excluded.
  X11 ROUND(x, n>0) on doubles: Spark HALF_UPs the SHORTEST-DECIMAL
      representation of the double, DuckDB rounds the binary value —
      witness ROUND(0.285e0, 2): Duck 0.28 (the double is just below
      .285), Spark 0.29. Two-arg ROUND is excluded from the grammar;
      single-arg ROUND is kept (measured parity, incl. boundary probes
      122367.49999999999 / -2.5). The fingerprint uses FLOOR (bit-stable:
      exact in IEEE for any double). Surfaced by the r10 select-slot
      widening (documents seeds 63/104 — the root cause there was D9,
      but the shrink exposed this adjacent 2-arg gap).

Scale note: the fuzz executes at sf0.001 because it is a SEMANTICS gate,
not a throughput gate — each batch compiles ~40 predicates into one
aggregate over one table scan, which is also exactly the shape that would
run at 100 TB (a single filter+aggregate pass, no shuffle beyond the final
1-row partial merge).
"""

from __future__ import annotations

import random
import zlib
from typing import NamedTuple


class Sql(NamedTuple):
    """One expression rendered into both dialects, plus its type tag."""

    duck: str
    spark: str


def same(text: str) -> Sql:
    return Sql(text, text)


# ---------------------------------------------------------------------------
# fixture schema + literal pools (ranges measured from /root/testdata)
# ---------------------------------------------------------------------------

FUZZ_TABLES: dict[str, dict] = {
    "lineitem": {
        "key": "l_orderkey",
        "int": {
            "l_orderkey": (0, 1500),
            "l_partkey": (0, 200),
            "l_suppkey": (0, 10),
            "l_linenumber": (1, 7),
        },
        "double": {
            "l_quantity": (1.0, 50.0),
            "l_extendedprice": (900.0, 105000.0),
            "l_discount": (0.0, 0.1),
            "l_tax": (0.0, 0.08),
        },
        "str": {
            "l_returnflag": ["A", "N", "R"],
            "l_linestatus": ["F", "O"],
        },
        "ts": {"l_shipdate": (1995, 2002)},
        "json": {},
    },
    "orders": {
        "key": "o_orderkey",
        "int": {"o_orderkey": (0, 1500), "o_custkey": (0, 150)},
        "double": {"o_totalprice": (1300.0, 500000.0)},
        "str": {
            "o_orderstatus": ["F", "O", "P"],
            "o_orderpriority": [
                "1-URGENT",
                "2-HIGH",
                "3-MEDIUM",
                "4-NOT SPECIFIED",
                "5-LOW",
            ],
        },
        "ts": {"o_orderdate": (1995, 2002)},
        "json": {},
    },
    "events": {
        "key": "event_id",
        "int": {"event_id": (0, 1000), "user_id": (0, 15)},
        "double": {"value": (0.0, 330.0)},
        "str": {
            "event_type": ["click", "error", "purchase", "signup", "view"],
        },
        "ts": {"ts": (2024, 2024)},
        "json": {"props": ["$.k"]},
    },
    "customer": {
        "key": "c_custkey",
        "int": {"c_custkey": (0, 150), "c_nationkey": (0, 25)},
        "double": {"c_acctbal": (-900.0, 10000.0)},
        "str": {
            "c_mktsegment": [
                "AUTOMOBILE",
                "BUILDING",
                "FURNITURE",
                "HOUSEHOLD",
                "MACHINERY",
            ],
            "c_name": ["Customer#000000042", "Customer#000000007"],
        },
        "ts": {},
        "json": {},
    },
    "part": {
        "key": "p_partkey",
        "int": {"p_partkey": (0, 200), "p_size": (1, 50)},
        "double": {"p_retailprice": (900.0, 920.0)},
        "str": {
            "p_brand": ["Brand#1", "Brand#12", "Brand#23", "Brand#5"],
            "p_type": ["ECONOMY", "PROMO", "STANDARD", "SMALL", "LARGE"],
            "p_name": ["widget", "bolt", "cold", "small", "large"],
        },
        "ts": {},
        "json": {},
    },
    "documents": {
        "key": "doc_id",
        "int": {"doc_id": (0, 500), "n_chars": (40, 560)},
        "double": {},
        "str": {
            "lang": ["de", "en", "es", "fr", "zh"],
            "source": ["src0", "src3", "src7", "src12", "src19"],
            "text": ["table", "scan", "merge", "window", "spark", "batch"],
        },
        "ts": {},
        "json": {},
    },
}

# string fragments for LIKE / regexp / function arguments — drawn from the
# fixture vocabulary so predicates actually select varying row subsets
_FRAGMENTS = ["a", "e", "r", "ur", "ck", "an", "1-", "#1", "s", "o", "N", "c"]

_SAFE_REGEX = [
    "^[a-z]+$",
    "[0-9]+",
    "^[A-Z]",
    "(a|e)n",
    "c.*k",
    "[a-z]{3}",
    "^..[a-z]",
    "(ur|ck|an)",
    "[A-Z]{2,}",
    "t$",
]


def _fmt_double(v: float) -> Sql:
    """Double literal, forced to DOUBLE type in BOTH dialects. FOUND BY
    THE r10 SELECT-SLOT FUZZ (part seed 0, then orders seed 3): BOTH
    engines parse a bare decimal literal as DECIMAL, and their decimal
    algebras differ from double algebra differently per operator (Spark:
    decimal division rounded to scale 6; DuckDB: exact decimal +/- but
    double division) — so all-literal subtrees diverge unless the literal
    is pinned to DOUBLE on both sides. Scientific notation ('253469.23e0')
    parses as DOUBLE in both engines; repr() round-trips the value
    exactly. The WHERE-slot fuzz never tripped this (D9 in the ledger):
    every admitted WHERE shape mixes a double column in, which forces
    double coercion upstream."""
    r = repr(float(v))
    t = r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "e0"
    return Sql(t, t)


def _fmt_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


class PredicateGen:
    """Depth-bounded typed expression generator over one fixture table.

    Deterministic for a given (seed, table): every random draw goes through
    one ``random.Random`` — a CI failure reproduces from the seed alone.
    """

    def __init__(self, table: str, seed: int, profile: str = "default"):
        self.t = FUZZ_TABLES[table]
        # zlib.crc32 is process-stable (builtin hash() is salted per run,
        # which would void determinism: a CI failure must reproduce from
        # the (table, seed) pair alone).
        table_salt = zlib.crc32(table.encode("utf-8")) & 0xFFFF
        self.rng = random.Random(table_salt * 1_000_003 + seed)
        self.table = table
        # "hostile": the fixture carries non-ASCII text, so ops whose
        # divergence was excludable only because the data was all-ASCII
        # (X5: UPPER/LOWER locale one-to-many case mapping) leave the
        # grammar — there is no faithful dual rendering for them.
        self.profile = profile

    # -- helpers ------------------------------------------------------------
    def _pick(self, options):
        """Weighted choice: options = [(weight, thunk), ...]."""
        total = sum(w for w, _ in options)
        x = self.rng.uniform(0, total)
        acc = 0.0
        for w, thunk in options:
            acc += w
            if x <= acc:
                return thunk()
        return options[-1][1]()

    # -- integer-valued expressions -----------------------------------------
    def gen_int(self, depth: int) -> Sql:
        cols = self.t["int"]
        leafs = [
            (3.0, lambda: same(self.rng.choice(list(cols)))),
            (2.0, lambda: same(str(self.rng.randint(-20, 100)))),
        ]
        if depth <= 0:
            return self._pick(leafs)
        r = self.rng
        comps = [
            (1.5, lambda: self._binop_int("+", depth)),
            (1.5, lambda: self._binop_int("-", depth)),
            # D2: modulo by (possibly zero) int -> NULL in both renderings
            (1.0, lambda: self._mod(depth)),
            (1.0, lambda: Sql(*(f"LENGTH({s})" for s in self.gen_str(depth - 1)))),
            (0.8, lambda: self._instr(depth)),
            (0.6, lambda: Sql(
                *(f"GREATEST({a}, {b})" for a, b in zip(
                    self.gen_int(depth - 1), self.gen_int(depth - 1))))),
            (0.6, lambda: Sql(
                *(f"LEAST({a}, {b})" for a, b in zip(
                    self.gen_int(depth - 1), self.gen_int(depth - 1))))),
            (0.8, lambda: self._case_of(self.gen_int, depth)),
            (0.6, lambda: Sql(
                *(f"NULLIF({a}, {b})" for a, b in zip(
                    self.gen_int(depth - 1), self.gen_int(depth - 1))))),
            (0.6, lambda: Sql(
                *(f"COALESCE(NULLIF({a}, {b}), {c})" for a, b, c in zip(
                    self.gen_int(depth - 1), self.gen_int(depth - 1),
                    self.gen_int(depth - 1))))),
            (0.8, lambda: Sql(*(f"ABS({s})" for s in self.gen_int(depth - 1)))),
        ]
        if self.t["ts"]:
            comps += [
                (0.8, self._ts_part_factory(depth)),
                (0.6, lambda: self._datediff(depth)),  # D5
            ]
        return self._pick(leafs + comps)

    def _binop_int(self, op: str, depth: int) -> Sql:
        a, b = self.gen_int(depth - 1), self.gen_int(depth - 1)
        return Sql(f"({a.duck} {op} {b.duck})", f"({a.spark} {op} {b.spark})")

    def _mod(self, depth: int) -> Sql:
        a, b = self.gen_int(depth - 1), self.gen_int(depth - 1)
        # D2: Duck `%` yields NULL on zero divisor; Spark needs TRY_MOD
        return Sql(f"({a.duck} % {b.duck})", f"TRY_MOD({a.spark}, {b.spark})")

    def _instr(self, depth: int) -> Sql:
        s = self.gen_str(depth - 1)
        frag = _fmt_str(self.rng.choice(_FRAGMENTS))
        return Sql(f"INSTR({s.duck}, {frag})", f"INSTR({s.spark}, {frag})")

    def _ts_part_factory(self, depth: int):
        def gen():
            ts = self.gen_ts(depth - 1)
            part = self.rng.choice(
                ["YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "QUARTER", "DOW"]
            )
            if part == "DOW":
                # D4: Duck Sunday=0, Spark Sunday=1
                return Sql(
                    f"(DAYOFWEEK({ts.duck}) + 1)", f"DAYOFWEEK({ts.spark})"
                )
            return Sql(f"{part}({ts.duck})", f"{part}({ts.spark})")

        return gen

    def _datediff(self, depth: int) -> Sql:
        a, b = self.gen_ts(depth - 1), self.gen_ts(depth - 1)
        # D5: argument order differs between the dialects
        return Sql(
            f"DATEDIFF('day', {a.duck}, {b.duck})",
            f"DATEDIFF({b.spark}, {a.spark})",
        )

    # -- double-valued expressions -------------------------------------------
    def gen_num(self, depth: int) -> Sql:
        cols = self.t["double"]
        leafs = [
            (2.0, lambda: _fmt_double(self._num_literal())),
            (1.5, lambda: self.gen_int(0)),
        ]
        if cols:
            leafs.append((3.0, lambda: same(self.rng.choice(list(cols)))))
        if depth <= 0:
            return self._pick(leafs)
        comps = [
            (1.2, lambda: self._binop_num("+", depth)),
            (1.2, lambda: self._binop_num("-", depth)),
            (1.0, lambda: self._binop_num("*", depth)),
            # D1: division by (possibly zero) value -> NULL in both
            (1.0, lambda: self._div(depth)),
            (0.8, lambda: Sql(*(f"ABS({s})" for s in self.gen_num(depth - 1)))),
            # X11: single-arg ROUND only (2-arg diverges cross-engine)
            (0.6, lambda: Sql(*(f"ROUND({s})" for s in self.gen_num(depth - 1)))),
            (0.5, lambda: self._ceilfloor("FLOOR", depth)),
            (0.5, lambda: self._ceilfloor("CEIL", depth)),
            # X3: transcendental args guarded non-negative / positive
            (0.5, lambda: Sql(*(f"SQRT(ABS({s}))" for s in self.gen_num(depth - 1)))),
            (0.5, lambda: Sql(
                *(f"LN(ABS({s}) + 1.0)" for s in self.gen_num(depth - 1)))),
            (0.4, lambda: Sql(
                *(f"LOG10(ABS({s}) + 1.0)" for s in self.gen_num(depth - 1)))),
            (0.4, lambda: self._trig("SIN", depth)),
            (0.4, lambda: self._trig("COS", depth)),
            (0.3, lambda: Sql(*(f"ATAN({s})" for s in self.gen_num(depth - 1)))),
            (0.4, lambda: self._power(depth)),
            (0.5, lambda: Sql(*(f"(- {s})" for s in self.gen_num(depth - 1)))),
            (0.6, lambda: Sql(
                *(f"GREATEST({a}, {b})" for a, b in zip(
                    self.gen_num(depth - 1), self.gen_num(depth - 1))))),
            (0.6, lambda: Sql(
                *(f"LEAST({a}, {b})" for a, b in zip(
                    self.gen_num(depth - 1), self.gen_num(depth - 1))))),
            (0.8, lambda: self._case_of(self.gen_num, depth)),
            (0.5, lambda: Sql(
                *(f"NULLIF({a}, {b})" for a, b in zip(
                    self.gen_num(depth - 1), self.gen_num(depth - 1))))),
            # X4: strings cast to DOUBLE only (never to INT)
            (0.4, lambda: Sql(
                *(f"TRY_CAST({s} AS DOUBLE)" for s in self.gen_str(depth - 1)))),
        ]
        return self._pick(leafs + comps)

    def _num_literal(self) -> float:
        cols = self.t["double"]
        if cols and self.rng.random() < 0.7:
            lo, hi = self.rng.choice(list(cols.values()))
            return round(self.rng.uniform(lo, hi), 2)
        return round(self.rng.uniform(-100, 100), 2)

    def _binop_num(self, op: str, depth: int) -> Sql:
        a, b = self.gen_num(depth - 1), self.gen_num(depth - 1)
        if op == "*":
            # X10's 'multiplication only in the double domain', made
            # structural: gen_num subtrees can be all-integer-typed, and
            # int64 * int64 over the hostile fixture's ±1e15 values ANSI-
            # overflows in Spark (found by the r10 hostile select leg).
            # The cast is exact for |x| < 2^53 and forces double multiply
            # in both engines.
            return Sql(
                f"(CAST({a.duck} AS DOUBLE) * {b.duck})",
                f"(CAST({a.spark} AS DOUBLE) * {b.spark})",
            )
        return Sql(f"({a.duck} {op} {b.duck})", f"({a.spark} {op} {b.spark})")

    def _div(self, depth: int) -> Sql:
        a, b = self.gen_num(depth - 1), self.gen_num(depth - 1)
        # D1: Duck ÷0 -> NULL natively; Spark ANSI needs TRY_DIVIDE
        return Sql(
            f"({a.duck} / {b.duck})", f"TRY_DIVIDE({a.spark}, {b.spark})"
        )

    def _ceilfloor(self, fn: str, depth: int) -> Sql:
        """CEIL/FLOOR. H2 (hostile-fixture fuzz, r10): Spark's
        CEIL/FLOOR(double) returns BIGINT — NaN maps to 0, ±inf and
        |x| >= 2^63 saturate at the int64 bounds — while DuckDB keeps
        DOUBLE. Exact dual rendering: any double with |x| >= 2^53 is
        already integral, so the Spark side passes NaN/±inf/big values
        through unchanged and casts the BIGINT result back to DOUBLE
        only in the always-exact |x| < 2^53 range."""
        a = self.gen_num(depth - 1)
        spark_r = (
            f"CASE WHEN isnan({a.spark}) OR "
            f"abs({a.spark}) >= 9.007199254740992E15D THEN ({a.spark}) "
            f"ELSE CAST({fn}({a.spark}) AS DOUBLE) END"
        )
        return Sql(f"{fn}({a.duck})", spark_r)

    def _trig(self, fn: str, depth: int) -> Sql:
        """SIN/COS with the argument reduced mod 2π on BOTH sides.

        Two measured reasons (r10):
        - H1 (hostile leg): DuckDB raises Out of Range on ±inf trig
          arguments where Spark returns NaN. fmod maps ±inf to NaN in
          BOTH engines, and both agree SIN(NaN) = NaN — the reduction IS
          the guard.
        - X12 (select-slot widening, customer seed 103): sin/cos of HUGE
          arguments (POWER chains reach 1e12) depend on the libm's
          argument-reduction strategy — glibc (DuckDB) and the JVM
          (Spark) disagree far beyond 1 ulp there. fmod is EXACT in IEEE
          (same bits both sides), and over the reduced principal range
          the implementations are measured bit-stable.
        The declared semantics is therefore 'trig over the principal
        range', pinned identically in both dialects."""
        a = self.gen_num(depth - 1)
        two_pi = "6.283185307179586e0"
        return Sql(
            f"{fn}(({a.duck} % {two_pi}))",
            f"{fn}(({a.spark} % {two_pi}))",
        )

    def _power(self, depth: int) -> Sql:
        """Small-integer power as an EXPLICIT multiplication chain.

        X12 (r10 select-slot widening, customer seed 103 et al.): libm
        pow differs between the JVM and glibc by 1 ulp on some inputs,
        and at 1e12+ magnitudes that is a LARGE absolute difference —
        which then survives the mod-2π trig reduction and flips
        fingerprint grid cells. ((a)*(a))*(a) is plain IEEE multiply,
        bit-identical across engines; POWER itself leaves the grammar."""
        a = self.gen_num(depth - 1)
        # draw the exponent ONCE — a draw inside the dual-render loop would
        # silently hand each dialect a different expression
        n = self.rng.randint(1, 3)

        def chain(t: str) -> str:
            # CAST the head to DOUBLE: gen_num subtrees can be all-int,
            # and int64 chains overflow ANSI Spark on hostile ±1e15
            # values (X10) — POWER's contract returns double anyway
            e = f"(CAST({t} AS DOUBLE))"
            for _ in range(n - 1):
                e = f"({e} * ({t}))"
            return e

        return Sql(chain(a.duck), chain(a.spark))

    # -- string-valued expressions --------------------------------------------
    def gen_str(self, depth: int) -> Sql:
        cols = self.t["str"]
        pool = [v for vs in cols.values() for v in vs] + _FRAGMENTS
        leafs = [
            (3.0, lambda: same(self.rng.choice(list(cols)))),
            (1.5, lambda: same(_fmt_str(self.rng.choice(pool)))),
        ]
        if depth <= 0:
            return self._pick(leafs)
        r = self.rng
        comps = [
            (0.5, lambda: Sql(*(f"TRIM({s})" for s in self.gen_str(depth - 1)))),
            # X1: `||` propagates NULL in both; CONCAT() does not in Duck
            (0.8, lambda: Sql(
                *(f"({a} || {b})" for a, b in zip(
                    self.gen_str(depth - 1), self.gen_str(depth - 1))))),
            # X2: start >= 1 only
            (0.8, lambda: self._substring(depth)),
            (0.5, lambda: self._leftright(depth)),
            (0.5, lambda: self._replace(depth)),
            (0.4, lambda: self._pad(depth)),
            (0.4, lambda: self._split_part(depth)),
            (0.4, lambda: self._regexp_extract(depth)),
            (0.7, lambda: self._case_of(self.gen_str, depth)),
            # D7: int-to-string cast type name differs
            (0.4, lambda: Sql(*(
                f"CAST({s} AS {t})" for s, t in zip(
                    self.gen_int(depth - 1), ("VARCHAR", "STRING"))))),
            (0.4, lambda: Sql(
                *(f"NULLIF({a}, {b})" for a, b in zip(
                    self.gen_str(depth - 1), self.gen_str(depth - 1))))),
        ]
        if self.profile != "hostile":
            # X5: only the all-ASCII default fixture keeps case mapping in
            # the grammar; 'ß' etc. have no faithful dual rendering
            comps = [
                (0.8, lambda: Sql(
                    *(f"UPPER({s})" for s in self.gen_str(depth - 1)))),
                (0.8, lambda: Sql(
                    *(f"LOWER({s})" for s in self.gen_str(depth - 1)))),
            ] + comps
        if self.t["json"]:
            comps.append((1.0, lambda: self._json(depth)))
        return self._pick(leafs + comps)

    def _substring(self, depth: int) -> Sql:
        s = self.gen_str(depth - 1)
        start = self.rng.randint(1, 5)
        n = self.rng.randint(0, 8)
        return Sql(
            f"SUBSTRING({s.duck}, {start}, {n})",
            f"SUBSTRING({s.spark}, {start}, {n})",
        )

    def _leftright(self, depth: int) -> Sql:
        s = self.gen_str(depth - 1)
        fn = self.rng.choice(["LEFT", "RIGHT"])
        n = self.rng.randint(0, 6)
        return Sql(f"{fn}({s.duck}, {n})", f"{fn}({s.spark}, {n})")

    def _replace(self, depth: int) -> Sql:
        s = self.gen_str(depth - 1)
        a = _fmt_str(self.rng.choice(_FRAGMENTS))
        b = _fmt_str(self.rng.choice(_FRAGMENTS + [""]))
        return Sql(f"REPLACE({s.duck}, {a}, {b})", f"REPLACE({s.spark}, {a}, {b})")

    def _pad(self, depth: int) -> Sql:
        s = self.gen_str(depth - 1)
        fn = self.rng.choice(["LPAD", "RPAD"])
        n = self.rng.randint(1, 12)
        p = _fmt_str(self.rng.choice(["x", "ab", "_"]))
        return Sql(f"{fn}({s.duck}, {n}, {p})", f"{fn}({s.spark}, {n}, {p})")

    def _split_part(self, depth: int) -> Sql:
        s = self.gen_str(depth - 1)
        d = _fmt_str(self.rng.choice(["-", " ", "#", "r"]))
        n = self.rng.randint(1, 3)
        # D8: Duck SPLIT_PART(NULL, d, n) returns '' (non-NULL!); Spark
        # propagates NULL — pin Spark's NULL-propagation with a CASE guard
        # on the Duck side (delimiter is always a literal here, never NULL)
        return Sql(
            f"CASE WHEN ({s.duck}) IS NULL THEN NULL "
            f"ELSE SPLIT_PART({s.duck}, {d}, {n}) END",
            f"SPLIT_PART({s.spark}, {d}, {n})",
        )

    def _regexp_extract(self, depth: int) -> Sql:
        s = self.gen_str(depth - 1)
        p = _fmt_str(self.rng.choice(_SAFE_REGEX))
        # group 0 = whole match, accepted by both engines (measured)
        return Sql(
            f"REGEXP_EXTRACT({s.duck}, {p}, 0)",
            f"REGEXP_EXTRACT({s.spark}, {p}, 0)",
        )

    def _json(self, depth: int) -> Sql:
        col = self.rng.choice(list(self.t["json"]))
        path = self.rng.choice(self.t["json"][col] + ["$.missing"])
        # D6: function names differ; semantics measured identical on valid
        # JSON. H3 (hostile-fixture fuzz, r10): on MALFORMED input DuckDB's
        # json_extract_string raises Invalid Input where Spark's
        # GET_JSON_OBJECT returns NULL — the Duck side carries a
        # json_valid guard (a no-op on well-formed data).
        return Sql(
            f"CASE WHEN json_valid({col}) "
            f"THEN json_extract_string({col}, '{path}') END",
            f"GET_JSON_OBJECT({col}, '{path}')",
        )

    # -- timestamp-valued expressions ------------------------------------------
    def gen_ts(self, depth: int) -> Sql:
        cols = self.t["ts"]
        leafs = [
            (3.0, lambda: same(self.rng.choice(list(cols)))),
            (1.5, lambda: same(self._ts_literal())),
        ]
        if depth <= 0:
            return self._pick(leafs)
        comps = [
            (1.0, lambda: self._ts_interval(depth)),
            (0.8, lambda: self._date_trunc(depth)),
            (0.5, lambda: Sql(
                *(f"GREATEST({a}, {b})" for a, b in zip(
                    self.gen_ts(depth - 1), self.gen_ts(depth - 1))))),
            (0.5, lambda: Sql(
                *(f"LEAST({a}, {b})" for a, b in zip(
                    self.gen_ts(depth - 1), self.gen_ts(depth - 1))))),
            (0.6, lambda: self._case_of(self.gen_ts, depth)),
        ]
        return self._pick(leafs + comps)

    def _ts_literal(self) -> str:
        lo, hi = next(iter(self.t["ts"].values()))
        y = self.rng.randint(lo, hi)
        mo = self.rng.randint(1, 12) if lo != hi else 1
        d = self.rng.randint(1, 28)
        h, mi = self.rng.randint(0, 23), self.rng.randint(0, 59)
        return f"TIMESTAMP '{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:00'"

    def _ts_interval(self, depth: int) -> Sql:
        ts = self.gen_ts(depth - 1)
        n = self.rng.randint(1, 400)
        unit = self.rng.choice(["DAY", "HOUR", "MINUTE"])
        op = self.rng.choice(["+", "-"])
        return Sql(
            f"({ts.duck} {op} INTERVAL {n} {unit})",
            f"({ts.spark} {op} INTERVAL {n} {unit})",
        )

    def _date_trunc(self, depth: int) -> Sql:
        ts = self.gen_ts(depth - 1)
        g = self.rng.choice(["year", "month", "week", "day", "hour"])
        return Sql(
            f"DATE_TRUNC('{g}', {ts.duck})", f"DATE_TRUNC('{g}', {ts.spark})"
        )

    # -- shared ---------------------------------------------------------------
    def _case_of(self, gen, depth: int) -> Sql:
        b = self.gen_bool(depth - 1)
        a, c = gen(depth - 1), gen(depth - 1)
        return Sql(
            f"CASE WHEN {b.duck} THEN {a.duck} ELSE {c.duck} END",
            f"CASE WHEN {b.spark} THEN {a.spark} ELSE {c.spark} END",
        )

    # -- boolean expressions ----------------------------------------------------
    def gen_bool(self, depth: int) -> Sql:
        r = self.rng
        cmps = ["<", "<=", ">", ">=", "=", "<>"]

        def num_cmp():
            a, b = self.gen_num(depth - 1), self.gen_num(depth - 1)
            op = r.choice(cmps)
            return Sql(f"({a.duck} {op} {b.duck})", f"({a.spark} {op} {b.spark})")

        def int_cmp():
            a, b = self.gen_int(depth - 1), self.gen_int(depth - 1)
            op = r.choice(cmps)
            return Sql(f"({a.duck} {op} {b.duck})", f"({a.spark} {op} {b.spark})")

        def str_cmp():
            a, b = self.gen_str(depth - 1), self.gen_str(depth - 1)
            op = r.choice(cmps)
            return Sql(f"({a.duck} {op} {b.duck})", f"({a.spark} {op} {b.spark})")

        def ts_cmp():
            a, b = self.gen_ts(depth - 1), self.gen_ts(depth - 1)
            op = r.choice(cmps)
            return Sql(f"({a.duck} {op} {b.duck})", f"({a.spark} {op} {b.spark})")

        def like():
            s = self.gen_str(depth - 1)
            frag = r.choice(_FRAGMENTS)
            pat = r.choice([f"%{frag}%", f"{frag}%", f"%{frag}", f"%{frag}%e%"])
            neg = "NOT " if r.random() < 0.3 else ""
            # X6: no escaped wildcards (Duck has no default escape char)
            return Sql(
                f"({s.duck} {neg}LIKE {_fmt_str(pat)})",
                f"({s.spark} {neg}LIKE {_fmt_str(pat)})",
            )

        def regex():
            s = self.gen_str(depth - 1)
            p = _fmt_str(r.choice(_SAFE_REGEX))
            # D3: match predicate spelling differs
            return Sql(
                f"regexp_matches({s.duck}, {p})", f"({s.spark} RLIKE {p})"
            )

        def is_null():
            # H4: no gen_ts here — DuckDB 1.0.0 mis-evaluates IS NULL over
            # DATE_TRUNC chains in SEVERAL optimizer paths (WHERE pushdown,
            # CASE folding, and common-subexpression-eliminated FILTER
            # pairs — all pinned by tests/test_fuzz_hostile.py). The
            # oracle engine is unsound for that shape, so it cannot be
            # differentially tested on this DuckDB version.
            gen = r.choice([self.gen_num, self.gen_str])
            e = gen(depth - 1)
            neg = " NOT" if r.random() < 0.5 else ""
            return Sql(f"({e.duck} IS{neg} NULL)", f"({e.spark} IS{neg} NULL)")

        def between():
            if self.t["double"] and r.random() < 0.6:
                col = r.choice(list(self.t["double"]))
                lo0, hi0 = self.t["double"][col]
            else:
                col = r.choice(list(self.t["int"]))
                lo0, hi0 = self.t["int"][col]
            a = self.rng.uniform(lo0, hi0)
            b = self.rng.uniform(lo0, hi0)
            lo, hi = sorted([round(a, 2), round(b, 2)])
            lo_l, hi_l = _fmt_double(lo), _fmt_double(hi)
            return Sql(
                f"({col} BETWEEN {lo_l.duck} AND {hi_l.duck})",
                f"({col} BETWEEN {lo_l.spark} AND {hi_l.spark})",
            )

        def in_list():
            if self.t["str"] and r.random() < 0.6:
                col = r.choice(list(self.t["str"]))
                vals = self.t["str"][col] + _FRAGMENTS[:2]
                k = r.randint(1, min(4, len(vals)))
                lits = ", ".join(_fmt_str(v) for v in r.sample(vals, k))
            else:
                col = r.choice(list(self.t["int"]))
                lo, hi = self.t["int"][col]
                k = r.randint(1, 5)
                lits = ", ".join(str(r.randint(lo, hi)) for _ in range(k))
            neg = "NOT " if r.random() < 0.3 else ""
            return same(f"({col} {neg}IN ({lits}))")

        def logical():
            a, b = self.gen_bool(depth - 1), self.gen_bool(depth - 1)
            op = r.choice(["AND", "OR"])
            return Sql(f"({a.duck} {op} {b.duck})", f"({a.spark} {op} {b.spark})")

        def negation():
            a = self.gen_bool(depth - 1)
            return Sql(f"(NOT {a.duck})", f"(NOT {a.spark})")

        leafs = [(2.0, num_cmp), (1.5, int_cmp), (1.2, str_cmp),
                 (1.0, between), (1.0, in_list), (0.8, like)]
        if self.t["ts"]:
            leafs.append((1.0, ts_cmp))
        if depth <= 0:
            return self._pick(leafs)
        comps = [(1.2, logical), (0.6, negation), (0.7, regex), (0.7, is_null)]
        return self._pick(leafs + comps)


def gen_predicate(
    table: str, seed: int, depth: int = 4, profile: str = "default"
) -> Sql:
    """One seeded boolean predicate over `table`, rendered for both engines."""
    return PredicateGen(table, seed, profile=profile).gen_bool(depth)


def fingerprint_sql(table: str, preds: list[Sql], dialect: str) -> str:
    """Compile a batch of predicates into ONE aggregate query.

    Per predicate i: c{i} = matching row count, s{i} = sum of the table key
    over matching rows (order-insensitive set fingerprint — catches row-set
    differences that happen to preserve the count). Key sums are bounded
    (max key * rows ~ 1e10 at sf0.01) so BIGINT is exact in both engines;
    the DuckDB cast also pins SUM's HUGEINT result back to int64 so pandas
    doesn't degrade it to float64.

    H4 (hostile-fixture fuzz, r10 — an ORACLE-ENGINE bug, pinned by
    tests/test_fuzz_hostile.py): DuckDB 1.0.0 mis-folds
    ``SUM(CASE WHEN <pred containing DATE_TRUNC(col) IS NULL> THEN ...)``
    to constant 0 (the equivalent FILTER form evaluates correctly, so two
    equivalent queries disagree inside DuckDB itself). The Duck dialect
    therefore renders the fingerprint through FILTER clauses.
    """
    key = FUZZ_TABLES[table]["key"]
    cols = []
    for i, p in enumerate(preds):
        if dialect == "duck":
            cols.append(
                f"CAST(COUNT(*) FILTER (({p.duck})) AS BIGINT) AS c{i}"
            )
            cols.append(
                f"CAST(COALESCE(SUM({key}) FILTER (({p.duck})), 0) "
                f"AS BIGINT) AS s{i}"
            )
        else:
            cols.append(
                f"CAST(SUM(CASE WHEN ({p.spark}) THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS c{i}"
            )
            cols.append(
                f"CAST(SUM(CASE WHEN ({p.spark}) THEN {key} ELSE 0 END) "
                f"AS BIGINT) AS s{i}"
            )
    return "SELECT " + ",\n       ".join(cols) + f"\nFROM {table}"


# ===========================================================================
# Round-10 widening: the reference's declared contract is ANY DuckDB SQL
# through con.SendQuery (main.cc:181-182), not just the WHERE slot. Three
# more generated slots — SELECT-list scalar expressions, single-key
# GROUP BY + aggregate, ORDER BY + LIMIT — each compiled to a ONE-ROW
# order-insensitive fingerprint so a whole batch is one query per engine.
#
# Fingerprint discipline (SURVEY §5.4 / memory ledger): everything that
# crosses the compare boundary is routed to BIGINT. Doubles are clamped to
# ±1e9 (LEAST/GREATEST skip NULLs identically in both engines; NaN/Inf
# clamp to the bound in both) then ROUND(x*1000) — per-row double
# arithmetic is bit-identical across the engines for every op the grammar
# admits (X7 pins the exceptions out), so the clamp+round is the same
# function of the same bits. Strings fingerprint through md5 (same
# algorithm both sides; D7 covers int->string casts inside group keys).
# Timestamps fingerprint as epoch microseconds mod 1e9.
# ===========================================================================


def _md5_int(s: Sql, nhex: int = 10) -> Sql:
    """First `nhex` hex chars of md5(s) as a BIGINT, dual-rendered.
    nhex=10 -> 40 bits: sums over 60k rows stay far inside int64."""
    return Sql(
        f"CAST(('0x' || substring(md5({s.duck}), 1, {nhex})) AS BIGINT)",
        f"CAST(CONV(SUBSTRING(md5(CAST({s.spark} AS BINARY)), 1, {nhex}), "
        f"16, 10) AS BIGINT)",
    )


def _fp_terms(kind: str, e: Sql, i: int) -> list[tuple[str, str, str]]:
    """Fingerprint columns for one SELECT-list expression: a list of
    (alias, duck_expr, spark_expr) one-row aggregates."""
    cols = [(
        f"c{i}",
        f"CAST(COUNT(*) FILTER ((({e.duck}) IS NOT NULL)) AS BIGINT)",
        f"CAST(SUM(CASE WHEN ({e.spark}) IS NOT NULL THEN 1 ELSE 0 END) "
        f"AS BIGINT)",
    )]
    if kind == "int":
        cols.append((
            f"s{i}",
            f"CAST(SUM(COALESCE({e.duck}, 0)) AS BIGINT)",
            f"CAST(SUM(COALESCE({e.spark}, 0)) AS BIGINT)",
        ))
    elif kind == "double":
        # FLOOR, not ROUND: X11 — ROUND on doubles is not cross-engine
        # bit-stable; FLOOR is exact in IEEE for every double. Duck side
        # renders through FILTER (H4: DuckDB mis-folds CASE over
        # DATE_TRUNC-IS-NULL predicates).
        clamp_d = f"LEAST(GREATEST({e.duck}, -1e9), 1e9)"
        clamp_s = f"LEAST(GREATEST({e.spark}, -1e9), 1e9)"
        cols.append((
            f"s{i}",
            f"CAST(COALESCE(SUM(CAST(FLOOR({clamp_d} * 1000) AS BIGINT)) "
            f"FILTER ((({e.duck}) IS NOT NULL)), 0) AS BIGINT)",
            f"CAST(SUM(CASE WHEN ({e.spark}) IS NOT NULL THEN "
            f"CAST(FLOOR({clamp_s} * 1000) AS BIGINT) ELSE 0 END) AS BIGINT)",
        ))
    elif kind == "str":
        h = _md5_int(e)
        cols.append((
            f"s{i}",
            f"CAST(SUM({h.duck}) AS BIGINT)",
            f"CAST(SUM({h.spark}) AS BIGINT)",
        ))
    else:  # ts
        cols.append((
            f"s{i}",
            f"CAST(SUM(epoch_us({e.duck}) % 1000000000) AS BIGINT)",
            # fixture timestamps are TIMESTAMP_NTZ on the Spark side; the
            # session is UTC, so CAST .. AS TIMESTAMP == DuckDB's naive
            # epoch_us interpretation
            f"CAST(SUM(unix_micros(CAST(({e.spark}) AS TIMESTAMP)) "
            f"% 1000000000) AS BIGINT)",
        ))
    return cols


def gen_select_batch(
    table: str, seed: int, n_exprs: int = 8, profile: str = "default"
) -> Sql:
    """One dual-rendered one-row query fingerprinting `n_exprs` generated
    SELECT-list scalar expressions over `table` (the projection slot)."""
    g = PredicateGen(table, seed + 1_000_000, profile=profile)
    cols: list[tuple[str, str, str]] = []
    kinds = ["int", "double", "str", "ts"]
    for i in range(n_exprs):
        kind = g.rng.choice(kinds if g.t["ts"] else kinds[:3])
        e = {
            "int": g.gen_int,
            "double": g.gen_num,
            "str": g.gen_str,
            "ts": g.gen_ts,
        }[kind](3)
        cols.extend(_fp_terms(kind, e, i))
    duck = "SELECT " + ", ".join(f"{d} AS {a}" for a, d, _ in cols)
    spark = "SELECT " + ", ".join(f"{s} AS {a}" for a, _, s in cols)
    return Sql(f"{duck} FROM {table}", f"{spark} FROM {table}")


def gen_groupagg(table: str, seed: int, profile: str = "default") -> Sql:
    """Single-key GROUP BY over a generated key expression with COUNT(*)
    plus SUM over a generated int expression, fingerprinted order-
    insensitively: md5 each (key, count, sum) group row rendered through
    exact BIGINT->string casts (D7: identical text both engines), then
    COUNT + SUM of the row hashes."""
    g = PredicateGen(table, seed + 2_000_000, profile=profile)
    r = g.rng
    if r.random() < 0.5:
        # low-cardinality integer key: fuzzed int expr mod small k
        # (D2: TRY_MOD on the Spark side, % on the Duck side)
        k = r.randint(2, 9)
        e = g.gen_int(2)
        key = Sql(f"(({e.duck}) % {k})", f"TRY_MOD(({e.spark}), {k})")
        key_s = Sql(
            f"COALESCE(CAST({key.duck} AS VARCHAR), 'N')",
            f"COALESCE(CAST({key.spark} AS STRING), 'N')",
        )
    else:
        e = g.gen_str(2)
        key = e
        key_s = Sql(
            f"COALESCE({key.duck}, 'N')", f"COALESCE({key.spark}, 'N')"
        )
    agg = g.gen_int(2)
    inner_d = (
        f"SELECT {key_s.duck} AS k, CAST(COUNT(*) AS BIGINT) AS c, "
        f"CAST(SUM(COALESCE({agg.duck}, 0)) AS BIGINT) AS s "
        f"FROM {table} GROUP BY {key.duck}, {key_s.duck}"
    )
    inner_s = (
        f"SELECT {key_s.spark} AS k, CAST(COUNT(*) AS BIGINT) AS c, "
        f"CAST(SUM(COALESCE({agg.spark}, 0)) AS BIGINT) AS s "
        f"FROM {table} GROUP BY {key.spark}, {key_s.spark}"
    )
    rowtxt_d = "k || '|' || CAST(c AS VARCHAR) || '|' || CAST(s AS VARCHAR)"
    rowtxt_s = "k || '|' || CAST(c AS STRING) || '|' || CAST(s AS STRING)"
    h_d = _md5_int(Sql(rowtxt_d, rowtxt_s)).duck
    h_s = _md5_int(Sql(rowtxt_d, rowtxt_s)).spark
    return Sql(
        f"SELECT CAST(COUNT(*) AS BIGINT) AS ng, "
        f"CAST(SUM({h_d}) AS BIGINT) AS hsum FROM ({inner_d})",
        f"SELECT CAST(COUNT(*) AS BIGINT) AS ng, "
        f"CAST(SUM({h_s}) AS BIGINT) AS hsum FROM ({inner_s})",
    )


def gen_orderlimit(table: str, seed: int, profile: str = "default") -> Sql:
    """ORDER BY a generated expression + LIMIT, fingerprinted as the
    position-weighted key sum of the top-n rows. NULL placement is pinned
    EXPLICITLY (Spark defaults NULLS FIRST on ASC, DuckDB NULLS LAST), and
    the table key breaks ties so the order is total — the rank-discipline
    rule from the oracle-parity ledger."""
    g = PredicateGen(table, seed + 3_000_000, profile=profile)
    r = g.rng
    # hostile profile: no ts ORDER keys — DuckDB 1.0.0's broken
    # non-null inference for DATE_TRUNC (H4) also misplaces NULL rows
    # under explicit NULLS FIRST/LAST when the sort key is a ts
    # expression over a NULL-bearing column (measured: lineitem seeds
    # 37/57/65 rank sums), so the oracle cannot order that shape
    kinds = ["int", "double", "str"]
    if g.t["ts"] and profile != "hostile":
        kinds.append("ts")
    kind = r.choice(kinds)
    e = {
        "int": g.gen_int,
        "double": g.gen_num,
        "str": g.gen_str,
        "ts": g.gen_ts,
    }[kind](3)
    key = FUZZ_TABLES[table]["key"]
    direction = r.choice(["ASC", "DESC"])
    nulls = r.choice(["NULLS FIRST", "NULLS LAST"])
    n = r.randint(5, 50)

    def q(expr: str) -> str:
        return (
            f"SELECT CAST(SUM(rn * k) AS BIGINT) AS f, "
            f"CAST(COUNT(*) AS BIGINT) AS c FROM ("
            f"SELECT {key} AS k, ROW_NUMBER() OVER (ORDER BY ({expr}) "
            f"{direction} {nulls}, {key} ASC) AS rn FROM {table}"
            f") WHERE rn <= {n}"
        )

    return Sql(q(e.duck), q(e.spark))


# ===========================================================================
# Round-11 widening: the MULTI-TABLE slots (VERDICT r10 ask #3). The
# declared contract is any DuckDB SQL through con.SendQuery
# (main.cc:181-182); joins, subqueries, and set operations were
# curated-only until now. Every slot fuzzed so far surfaced real
# divergence classes (D8, D9, X11, X12, H1-H4), so these three get the
# same treatment: seeded generation, dual rendering through the ONE
# formatter ledger above, one-row BIGINT fingerprints.
#
# Table pairs: the six fixture tables have pairwise-disjoint column
# namespaces (TPC-H prefixes l_/o_/c_/p_ plus events' and documents'
# distinct names — asserted by tests/test_fuzz_multitable.py), so
# generated predicates stay unqualified and resolve identically in both
# engines; self-joins are excluded rather than qualified.
# ===========================================================================

# (left, right, natural ON pair or None) — the natural FK is weighted but
# random int-column ON pairs are also drawn (the ranges all overlap).
JOIN_PAIRS: list[tuple[str, str, tuple[str, str] | None]] = [
    ("lineitem", "orders", ("l_orderkey", "o_orderkey")),
    ("orders", "customer", ("o_custkey", "c_custkey")),
    ("lineitem", "part", ("l_partkey", "p_partkey")),
    ("customer", "events", ("c_custkey", "user_id")),
    ("part", "documents", ("p_partkey", "doc_id")),
    ("events", "documents", ("event_id", "doc_id")),
    ("customer", "documents", None),
    ("orders", "events", None),
]


def _pair_rng(left: str, right: str, seed: int, offset: int) -> random.Random:
    salt = zlib.crc32(f"{left}|{right}".encode("utf-8")) & 0xFFFF
    return random.Random(salt * 1_000_003 + seed + offset)


def gen_join(
    left: str,
    right: str,
    seed: int,
    natural: tuple[str, str] | None = None,
    profile: str = "default",
    prefix: str = "",
) -> Sql:
    """One dual-rendered two-table equi-join fingerprint query.

    Shape: ``L <join type> R ON lcol = rcol [WHERE residual]`` where the
    ON pair is the natural FK (weight 2) or a random int-column pair
    (ranges overlap across all fixture tables), the join type is INNER or
    LEFT, and the residual predicate is drawn from the WHERE-slot grammar
    over the left table, optionally AND a right-table predicate. The
    one-row fingerprint is (c, sl, sr, nr): row count, left-key sum,
    COALESCEd right-key sum, and matched-right count — sl/sr catch
    row-SET divergence that preserves the count, nr pins LEFT-join
    null-extension. All terms are provably < 2^63 at fuzz scale (max key
    1500 x worst-case many-to-many fanout ~1e6 rows at sf0.001).
    """
    r = _pair_rng(left, right, seed, 4_000_000)
    lt, rt = FUZZ_TABLES[left], FUZZ_TABLES[right]
    choices: list[tuple[str, str]] = []
    if natural:
        choices += [natural, natural]
    choices += [
        (r.choice(list(lt["int"])), r.choice(list(rt["int"])))
        for _ in range(2)
    ]
    lcol, rcol = r.choice(choices)
    jtype = r.choice(["JOIN", "JOIN", "LEFT JOIN"])
    gl = PredicateGen(left, seed + 4_100_000, profile=profile)
    gr = PredicateGen(right, seed + 4_200_000, profile=profile)
    wl = gl.gen_bool(3)
    where_d, where_s = f"({wl.duck})", f"({wl.spark})"
    if r.random() < 0.5:
        wr = gr.gen_bool(2)
        if jtype == "LEFT JOIN":
            # a right-table WHERE pred would collapse LEFT to INNER in
            # both engines (valid but uninteresting); keep the
            # null-extension observable by OR-ing the null case
            where_d += f" AND (({wr.duck}) OR {rcol} IS NULL)"
            where_s += f" AND (({wr.spark}) OR {rcol} IS NULL)"
        else:
            where_d += f" AND ({wr.duck})"
            where_s += f" AND ({wr.spark})"
    lkey, rkey = lt["key"], rt["key"]

    def q(on_l: str, on_r: str, where: str) -> str:
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS c, "
            f"CAST(COALESCE(SUM({lkey}), 0) AS BIGINT) AS sl, "
            f"CAST(COALESCE(SUM(COALESCE({rkey}, 0)), 0) AS BIGINT) AS sr, "
            f"CAST(COUNT({rkey}) AS BIGINT) AS nr "
            f"FROM {prefix}{left} {jtype} {prefix}{right} "
            f"ON {on_l} = {on_r} WHERE {where}"
        )

    return Sql(q(lcol, rcol, where_d), q(lcol, rcol, where_s))


def gen_subquery_batch(
    outer: str,
    inner: str,
    seed: int,
    n: int = 4,
    profile: str = "default",
    prefix: str = "",
) -> Sql:
    """One dual-rendered one-row query fingerprinting `n` generated
    IN / NOT IN / EXISTS / NOT EXISTS membership predicates.

    Each predicate filters the OUTER table through a subquery over the
    INNER table (uncorrelated IN/NOT IN over a generated int expression;
    EXISTS/NOT EXISTS correlated on a random int-column pair, plus an
    inner WHERE from the predicate grammar). Fingerprints are scalar
    subqueries — (count, outer-key sum) per predicate — batched into one
    SELECT so a whole batch is one query per engine. NOT IN keeps the
    standard three-valued NULL semantics (inner NULLs empty the result)
    in BOTH engines; the generated inner expression may be NULL-able on
    purpose — the engines must agree on the emptiness too.
    """
    r = _pair_rng(outer, inner, seed, 5_000_000)
    ot, it = FUZZ_TABLES[outer], FUZZ_TABLES[inner]
    okey = ot["key"]
    cols: list[tuple[str, str, str]] = []
    for i in range(n):
        shape = r.choice(["IN", "NOT IN", "EXISTS", "NOT EXISTS"])
        gi = PredicateGen(inner, seed + 5_100_000 + i * 7919, profile=profile)
        wi = gi.gen_bool(2)
        if shape in ("IN", "NOT IN"):
            ocol = r.choice(list(ot["int"]))
            ie = gi.gen_int(2)
            pred_d = (
                f"{ocol} {shape} (SELECT {ie.duck} FROM {prefix}{inner} "
                f"WHERE {wi.duck})"
            )
            pred_s = (
                f"{ocol} {shape} (SELECT {ie.spark} FROM {prefix}{inner} "
                f"WHERE {wi.spark})"
            )
        else:
            ocol = r.choice(list(ot["int"]))
            icol = r.choice(list(it["int"]))
            pred_d = (
                f"{shape} (SELECT 1 FROM {prefix}{inner} "
                f"WHERE {icol} = {ocol} AND ({wi.duck}))"
            )
            pred_s = (
                f"{shape} (SELECT 1 FROM {prefix}{inner} "
                f"WHERE {icol} = {ocol} AND ({wi.spark}))"
            )
        cols.append((
            f"c{i}",
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {prefix}{outer} "
            f"WHERE {pred_d})",
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {prefix}{outer} "
            f"WHERE {pred_s})",
        ))
        cols.append((
            f"s{i}",
            f"(SELECT CAST(COALESCE(SUM({okey}), 0) AS BIGINT) "
            f"FROM {prefix}{outer} WHERE {pred_d})",
            f"(SELECT CAST(COALESCE(SUM({okey}), 0) AS BIGINT) "
            f"FROM {prefix}{outer} WHERE {pred_s})",
        ))
    duck = "SELECT " + ", ".join(f"{d} AS {a}" for a, d, _ in cols)
    spark = "SELECT " + ", ".join(f"{s} AS {a}" for a, _, s in cols)
    return Sql(duck, spark)


_SETOPS = [
    "UNION", "UNION ALL", "INTERSECT", "EXCEPT",
    "INTERSECT ALL", "EXCEPT ALL",
]


def gen_setop(
    ta: str,
    tb: str,
    seed: int,
    profile: str = "default",
    prefix: str = "",
) -> Sql:
    """One dual-rendered set-operation fingerprint query.

    Two generated branches — each ``SELECT CAST(int_expr AS BIGINT) AS x,
    str_expr AS y FROM t WHERE pred`` over (possibly the same) fixture
    table — combined with a drawn set op incl. the ALL variants (the
    dedup-vs-ALL trap the verdict called out), then fingerprinted
    order-insensitively as (row count, md5 row-hash sum). Branch columns
    are int+string only: set-op equality over doubles has engine-specific
    -0.0/NaN normalization with no faithful dual rendering, while NULL
    grouping in set ops (NULL == NULL) is standard in both.
    """
    r = _pair_rng(ta, tb, seed, 6_000_000)
    op = r.choice(_SETOPS)

    def branch(t: str, g: PredicateGen) -> Sql:
        ie = g.gen_int(2)
        se = g.gen_str(2)
        w = g.gen_bool(2)
        return Sql(
            f"SELECT CAST(({ie.duck}) AS BIGINT) AS x, ({se.duck}) AS y "
            f"FROM {prefix}{t} WHERE {w.duck}",
            f"SELECT CAST(({ie.spark}) AS BIGINT) AS x, ({se.spark}) AS y "
            f"FROM {prefix}{t} WHERE {w.spark}",
        )

    ba = branch(ta, PredicateGen(ta, seed + 6_100_000, profile=profile))
    bb = branch(tb, PredicateGen(tb, seed + 6_200_000, profile=profile))
    # D7: int->string cast spelling differs per dialect
    rowtxt = Sql(
        "COALESCE(CAST(x AS VARCHAR), 'N') || '|' || COALESCE(y, 'N')",
        "COALESCE(CAST(x AS STRING), 'N') || '|' || COALESCE(y, 'N')",
    )
    h = _md5_int(rowtxt)

    def q(b1: str, b2: str, hx: str) -> str:
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS c, "
            f"CAST(COALESCE(SUM({hx}), 0) AS BIGINT) AS hsum "
            f"FROM (({b1}) {op} ({b2}))"
        )

    return Sql(q(ba.duck, bb.duck, h.duck), q(ba.spark, bb.spark, h.spark))
