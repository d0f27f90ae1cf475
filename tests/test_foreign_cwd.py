"""Regression guard for cwd-sensitive worker pickling.

Python DataSource classes and pandas-UDF closures are cloudpickled into
worker processes; anything referenced by module path silently requires the
worker to ``import c2_duckdb_runner_spark`` — true when pytest runs from
the repo root, FALSE for an external driver running from anywhere else.
This test reproduces the external driver: a fresh interpreter whose cwd is
a temp dir, a plain session, and exactly the queries that ship Python
callables to workers. (The fix pattern under test:
``cloudpickle.register_pickle_by_value`` — see sources/python_datasource.py
and operators/sketches_timeseries.py.)
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every registered query that pickles Python callables/classes to workers
# through a path that could capture module-level references.
_PICKLING_KEYS = [
    "source_python_datasource",
    "stream_python_source",
    "agg_countmin_freq",
    # table-argument UDTF: the Rle class is defined inside the query fn so
    # cloudpickle ships it by value; this guards against a refactor moving
    # it to module level (which would pickle by reference and break)
    "udtf_table_partition_rle",
]

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("foreign-cwd-guard")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e

qs = e.queries()
for key in {keys!r}:
    n = qs[key](spark, {sf!r}).count()
    print(f"OK {{key}} rows={{n}}")
spark.stop()
"""


def test_worker_pickling_survives_foreign_cwd(tmp_path, sf_dir):
    """The pickling-sensitive queries must run from a cwd that cannot
    import the package (fresh interpreter, plain session)."""
    script = _SCRIPT.format(repo=_REPO, keys=_PICKLING_KEYS, sf=sf_dir)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # nothing may leak the repo path
    }
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=tmp_path,  # the point: NOT the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    for key in _PICKLING_KEYS:
        assert f"OK {key}" in proc.stdout, (key, proc.stdout, proc.stderr[-1500:])
