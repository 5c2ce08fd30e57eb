"""sql_job.py CLI: arbitrary sketch SQL via subprocess (own JVM), incl.
the fill-once / regroup-forever contract — run 1 writes a state table
with --output, run 2 regroups it with udds_merge and matches a direct
single-run fill bit-for-bit at m=0."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(args, timeout=300):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "sql_job.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def _rows(stdout: str):
    return [json.loads(line) for line in stdout.strip().splitlines() if line]


def test_sql_job_inline_query():
    r = _run([
        "--view", f"li={SF}/lineitem.parquet",
        "--alpha", "0.005", "--max-buckets", "0",
        "--sql",
        "SELECT l_returnflag, udds_quantile(udds_sketch(l_extendedprice), 0.5D) AS p50, "
        "udds_count(udds_sketch(l_extendedprice)) AS n "
        "FROM li GROUP BY l_returnflag ORDER BY l_returnflag",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    rows = _rows(r.stdout)
    assert [x["l_returnflag"] for x in rows] == ["A", "N", "R"]
    assert all(x["n"] > 0 and x["p50"] > 0 for x in rows)
    assert json.loads(r.stderr.strip().splitlines()[-1])["rows"] == 3


def test_sql_job_state_table_roundtrip(tmp_path):
    """Run 1 fills per-(flag,status) states into parquet; run 2 merges
    them per flag with udds_merge — estimates bit-identical (m=0) to a
    direct per-flag fill in a third run."""
    states = str(tmp_path / "states")
    r1 = _run([
        "--view", f"li={SF}/lineitem.parquet",
        "--alpha", "0.005", "--max-buckets", "0",
        "--output", states,
        "--sql",
        "SELECT l_returnflag, l_linestatus, udds_sketch(l_extendedprice) AS state "
        "FROM li GROUP BY l_returnflag, l_linestatus",
    ])
    assert r1.returncode == 0, r1.stderr[-2000:]

    r2 = _run([
        "--view", f"st={states}",
        "--alpha", "0.005", "--max-buckets", "0",
        "--sql",
        "SELECT l_returnflag, udds_quantile(udds_merge(state), 0.99D) AS p99 "
        "FROM st GROUP BY l_returnflag ORDER BY l_returnflag",
    ])
    assert r2.returncode == 0, r2.stderr[-2000:]

    r3 = _run([
        "--view", f"li={SF}/lineitem.parquet",
        "--alpha", "0.005", "--max-buckets", "0",
        "--sql",
        "SELECT l_returnflag, udds_quantile(udds_sketch(l_extendedprice), 0.99D) AS p99 "
        "FROM li GROUP BY l_returnflag ORDER BY l_returnflag",
    ])
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert _rows(r2.stdout) == _rows(r3.stdout)


def test_sql_job_sql_file_and_prefix(tmp_path):
    f = tmp_path / "q.sql"
    f.write_text(
        "SELECT fine_udds_count(fine_udds_sketch(l_quantity)) AS n "
        "FROM li"
    )
    r = _run([
        "--view", f"li={SF}/lineitem.parquet",
        "--prefix", "fine_", "--alpha", "0.001",
        "--sql-file", str(f),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert _rows(r.stdout)[0]["n"] > 0


def test_sql_job_reads_sketch_job_states(tmp_path):
    """ONE state contract across surfaces: a state table written by
    sketch_job --save-states (Python-API CLI) is consumed by sql_job's
    udds_merge/udds_quantile (SQL CLI), and the regrouped global p50
    matches sketch_job's own --from-states global rollup estimate."""
    states = str(tmp_path / "states")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")

    r1 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "sketch_job.py"),
         "--generate", "200000", "--feature", "text_len",
         "--group-by", "role", "--alpha", "0.01", "--max-buckets", "0",
         "--quantiles", "0.5", "--save-states", states],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert r1.returncode == 0, r1.stderr[-2000:]

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "sketch_job.py"),
         "--from-states", states, "--feature", "text_len",
         "--group-by", "--alpha", "0.01", "--max-buckets", "0",
         "--quantiles", "0.5"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert r2.returncode == 0, r2.stderr[-2000:]
    ref = [json.loads(line) for line in r2.stdout.strip().splitlines()]
    ref_p50 = next(x["est"] for x in ref if x["q"] == 0.5)
    ref_n = next(x["n"] for x in ref if x["q"] == 0.5)

    r3 = _run([
        "--view", f"st={states}",
        "--alpha", "0.01", "--max-buckets", "0",
        "--sql",
        "SELECT udds_quantile(udds_merge(state), 0.5D) AS p50, "
        "udds_count(udds_merge(state)) AS n FROM st",
    ])
    assert r3.returncode == 0, r3.stderr[-2000:]
    got = _rows(r3.stdout)[0]
    assert got["p50"] == ref_p50
    # ~200k: --generate N yields N//8 convs x 1..15 turns
    assert got["n"] == ref_n > 150_000


def test_sql_job_bad_view_spec():
    r = _run(["--view", "nopath", "--sql", "SELECT 1"])
    assert r.returncode != 0
    assert "NAME=PATH" in r.stderr
