"""curate_job.py CLI: one subprocess smoke over the smallest testdata slice
(own JVM — the job calls spark.stop(), so it must not share the test
session)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_curate_job_cli_end_to_end(tmp_path):
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "curate_job.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out_dir, "--redact"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["n_input"] > 0
    assert stats["n_curated"] <= stats["n_input"]
    assert stats["output"] == out_dir
    assert "n_redacted_docs" in stats
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchone()[0]
    assert n == stats["n_curated"]
