"""Runner/report parity tests — the reference's pipeline (main.cc:368-409):
per-file scans, error isolation, and the five-field report."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from c2_duckdb_runner_spark.runner import run_scan, read_disk_stats


@pytest.fixture(scope="module")
def datadir(tmp_path_factory, sf_dir):
    """A homogeneous data dir, VPIC-campaign style: N same-schema files."""
    d = tmp_path_factory.mktemp("campaign")
    for i in range(3):
        shutil.copy(f"{sf_dir}/events.parquet", d / f"step{i}.parquet")
    return str(d)


def test_run_scan_report_fields(spark, datadir, sf_dir):
    os.environ["Env_ke"] = "0.5"
    report = run_scan(spark, [datadir])
    oracle = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet' WHERE value > 0.5"
    ).fetchone()[0]
    assert report.total_rows == 3 * oracle
    assert report.n_files == 3
    assert report.predicate == "value > 0.5"
    assert report.seconds > 0
    assert report.read_bytes > 0  # engine-requested bytes, post-pushdown
    # main.cc:331-332 reports nonzero read ops; Hadoop's local FS has no op
    # counter, so on Linux the runner substitutes the JVM's kernel
    # read-syscall delta (same per-read semantics). A real scan must have
    # issued at least one read syscall per file.
    if report.ops_from_syscalls:
        assert report.read_ops >= report.n_files
    report.print()


def test_run_scan_isolates_bad_files(spark, datadir, tmp_path, capsys):
    """A corrupt file and a wrong-schema file each log and contribute 0 rows;
    the run continues (main.cc:267-271 semantics)."""
    d = tmp_path / "mixed"
    d.mkdir()
    shutil.copy(f"{datadir}/step0.parquet", d / "good.parquet")
    (d / "corrupt.parquet").write_bytes(b"not a parquet file")
    good = run_scan(spark, [datadir], predicate="value > 0.5")
    mixed = run_scan(spark, [str(d)], predicate="value > 0.5")
    assert mixed.total_rows == good.total_rows // 3
    assert mixed.n_files == 2
    err = capsys.readouterr().err
    assert "error scanning" in err and "corrupt.parquet" in err


def test_run_scan_arbitrary_predicate(spark, datadir):
    """The filter slot takes any Catalyst boolean expression
    (filter_arbitrary_predicate, main.cc:209/226)."""
    r = run_scan(
        spark, [datadir], predicate="event_type IN ('click','view') AND value > 0.9"
    )
    assert r.total_rows > 0


def test_disk_stats_parser():
    """iostats.h parser parity — only asserts shape (CI may lack disks)."""
    disks = os.listdir("/sys/block") if os.path.isdir("/sys/block") else []
    if not disks:
        pytest.skip("no /sys/block")
    s = read_disk_stats(disks[0])
    if s is not None:
        assert s.read_ops >= 0 and s.read_sectors >= 0
