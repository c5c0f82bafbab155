"""The Snakemake-facing job script runs end-to-end as a subprocess —
the exact shape an external orchestrator invokes (SURVEY.md §3.1)."""

from __future__ import annotations

import subprocess
import sys


def test_spark_job_cli_roundtrip(tmp_path, sf_dir):
    out = str(tmp_path / "q1")
    res = subprocess.run(
        [
            sys.executable,
            "integration/spark_job.py",
            "--sf-dir",
            sf_dir,
            "--query",
            "q1_pricing_summary",
            "--out",
            out,
            "--coalesce",
            "1",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    assert n == 6  # q1 groups at sf0.001
