"""c2_duckdb_runner_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
``lanl-future-campaign/c2-duckdb-runner`` (reference read-only at
/root/reference): a parallel query driver that fans filtered scans across
every file in a directory through an embedded SQL engine
(reference ``main.cc:368-409``), plus the full analytical-SQL surface the
reference delegates to that engine (``main.cc:181-182``), re-expressed
idiomatically on Spark DataFrame/SQL + Catalyst.

Layout:
- ``session``   — SparkSession factory pinned for deterministic oracle parity
- ``tables``    — fixture table loading (parquet star schema + events/docs/embeddings)
- ``registry``  — the queries()/oracle_sql() registry the driver consumes
- ``operators`` — query definitions (tier A scan/filter, joins, aggs, windows, ...)
- ``functions`` — scalar/array/json function surface queries
- ``sources``   — csv/json/binary sources, sinks
- ``plans``     — runner + metrics listener (reference report parity)
- ``streaming`` — Structured Streaming over the events schema
"""

from c2_duckdb_runner_spark.registry import REGISTRY, oracle_sql, queries, register

__all__ = ["REGISTRY", "register", "queries", "oracle_sql"]
