"""Physical-plan inspection — the engine's self-check for 100 TB readiness.

The reference can't see its engine's plan at all (``main.cc:182`` hands SQL
to a black box; SURVEY.md §3.2). We can — ``df.queryExecution`` exposes every
phase — and this module turns the properties that decide scale behavior into
assertable facts:

- ``pushed_filters``   : predicates that reached the parquet reader
                         (row-group/page skipping — the reference's whole
                         read-bytes experiment, ``main.cc:107-113``, is about
                         observing exactly this).
- ``read_schema``      : column pruning — a 2-column projection must not
                         scan 16 columns.
- ``partition_filters``: hive-partition pruning (directory-level skipping).
- ``shuffle_count``    : every Exchange is a cluster-wide data movement; the
                         plan should carry exactly as many as the semantics
                         require, none extra.
- ``broadcast_joins``  : small dims must broadcast, not shuffle the fact.
- ``codegen_spans``    : whole-stage-codegen coverage — expressions fused
                         into JVM loops instead of interpreted.

tests/test_plans.py pins these for the headline queries, so a regression
that silently de-optimizes a plan (a lost pushdown, an accidental shuffle)
fails CI even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The full `EXPLAIN FORMATTED` text of the physical plan."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def simple_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All predicates pushed into file scans, e.g. 'GreaterThan(value,0.5)'."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            # split on top-level commas (filter reprs contain commas inside parens)
            depth, cur = 0, ""
            for ch in body:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                if ch == "," and depth == 0:
                    out.append(cur.strip())
                    cur = ""
                else:
                    cur += ch
            if cur.strip():
                out.append(cur.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan (column-pruning check)."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))
    ]


def partition_filters(df: DataFrame) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles / broadcasts are separate)."""
    return len(re.findall(r"\(\d+\) Exchange", formatted_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    # match only the numbered detail headers — each operator also appears in
    # the plan tree, which would double-count
    return len(
        re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", formatted_plan(df))
    )


def sortmerge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"\(\d+\) SortMergeJoin", formatted_plan(df)))


def codegen_span_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen regions; wider spans = fewer interpreted
    boundaries. 0 means the plan fell off the codegen path entirely."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))


def scan_count(df: DataFrame) -> int:
    return len(re.findall(r"\(\d+\) Scan parquet", formatted_plan(df)))


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and by hand during tuning."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "partition_filters": partition_filters(df),
        "shuffles": shuffle_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "sortmerge_joins": sortmerge_join_count(df),
        "codegen_spans": codegen_span_count(df),
        "scans": scan_count(df),
    }


# ---------------------------------------------------------------------------
# Repo-wide single-reducer-window guard
# ---------------------------------------------------------------------------

#: Logical nodes that bound the row count flowing into a window. A Limit
#: means a TakeOrdered/driver-merged cut already happened; an Aggregate
#: means the window ranks a grouped relation (key-cardinality-sized, the
#: distinct-value-histogram mechanism), not the raw fact stream.
_BOUNDING_NODES = frozenset(
    {"GlobalLimit", "LocalLimit", "Aggregate", "Sample", "Deduplicate"}
)


def _walk_jplan(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk_jplan(children.apply(i))


#: Physical-plan spellings of the bounding operators, for descending into
#: cached (InMemoryRelation) subtrees where the logical Aggregate/Limit has
#: already been planned.
_BOUNDING_PHYS = frozenset(
    {
        "HashAggregate",
        "SortAggregate",
        "ObjectHashAggregate",
        "GlobalLimit",
        "LocalLimit",
        "TakeOrderedAndProject",
        "CollectLimit",
        "Sample",
        # literal driver-built rows (VALUES / createDataFrame constants):
        # bounded by construction
        "LocalTableScan",
    }
)


def _bounded_phys(node) -> bool:
    """Boundedness over a PHYSICAL plan — used for the cached plan inside
    an InMemoryRelation. Same all-branches rule as the logical walk;
    AdaptiveSparkPlan is a leaf wrapper, so recurse into its initial plan."""
    name = node.nodeName()
    if name in _BOUNDING_PHYS:
        return True
    if name == "Range":
        # literal-bounds generator (spark.range / explode(sequence)):
        # bounded by construction, but only trust SMALL ranges — a
        # broadcast Range of 1e9 rows would be a real scale bug
        try:
            return int(node.numElements()) <= 10_000_000
        except Exception:  # noqa: BLE001 — API drift: stay conservative
            return False
    if name == "AdaptiveSparkPlan":
        return _bounded_phys(node.initialPlan())
    if name.startswith("InMemoryTableScan"):
        return _bounded_phys(node.relation().cachedPlan())
    children = node.children()
    k = children.size()
    if k == 0:
        return False
    return all(_bounded_phys(children.apply(i)) for i in range(k))


def _bounded(node) -> bool:
    """True iff every row path into ``node`` passes through a bounding
    operator. A Limit/Aggregate/Sample/Deduplicate bounds its whole
    subtree. At multi-child nodes (Join, Union) EVERY branch must be
    bounded — a bounded aggregate on ONE side of a join does not bound
    the join's output, so descending into the far branch and finding an
    Aggregate there must not clear the window (the round-5 ADVICE false
    negative: a raw fact stream joined to a tiny aggregate passed).
    Persisted subtrees (InMemoryRelation leaves) are analyzed through
    their cached physical plan instead of being treated as opaque."""
    if node.nodeName() in _BOUNDING_NODES:
        return True
    if node.nodeName() == "InMemoryRelation":
        return _bounded_phys(node.cachedPlan())
    children = node.children()
    k = children.size()
    if k == 0:
        return False
    return all(_bounded(children.apply(i)) for i in range(k))


def unbounded_loop_joins(df: DataFrame) -> list[str]:
    """Nested-loop join shapes that do not scale (round-6 verdict item 6):

    - ``CartesianProduct``: always flagged — an O(n*m) shuffle-side loop
      join of two distributed relations has no 100 TB story.
    - ``BroadcastNestedLoopJoin``: flagged unless the BUILD (broadcast)
      side is provably bounded by an Aggregate/Limit/Sample somewhere on
      every path — a broadcast of a 1-row total or a k-row centroid
      frame compiles to exactly this shape and is fine; broadcasting an
      arbitrary relation into a loop join is not.

    Walks the pre-AQE physical plan (``sparkPlan``) so the node names are
    stable, and reuses ``_bounded_phys`` (which already descends into
    cached plans and AdaptiveSparkPlan wrappers) for the build side.
    """
    plan = df._jdf.queryExecution().sparkPlan()
    bad: list[str] = []
    for node in _walk_jplan(plan):
        name = node.nodeName()
        if name == "CartesianProduct":
            bad.append(node.simpleString(25))
        elif name == "BroadcastNestedLoopJoin":
            build = (
                node.children().apply(0)
                if "BuildLeft" in str(node.buildSide())
                else node.children().apply(1)
            )
            if not _bounded_phys(build):
                bad.append(node.simpleString(25))
    return bad


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec whose input is not provably
    bounded by a Limit/Aggregate on EVERY branch — i.e. a single-reducer
    global sort of a raw, unbounded relation. This is THE shape that kills
    a ranking plan at 100 TB (every row funnels through one WindowExec
    partition); returns the offending nodes' simpleStrings so tests can
    forbid it repo-wide.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    bad: list[str] = []
    for node in _walk_jplan(plan):
        if node.nodeName() != "Window":
            continue
        if node.partitionSpec().size() > 0:
            continue
        if not _bounded(node.children().apply(0)):
            bad.append(node.simpleString(25))
    return bad
