"""Driver-style parity check: run every queries() entry on Spark and its
oracle_sql() on DuckDB over sf0.01, compare row count + column names +
order-insensitive values (the CORRECTNESS gate, locally)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_parity(spark, ddb, name):
    q = entry.queries()[name]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    sql = entry.oracle_sql().get(name)
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    res = ddb.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert _rowset(scols, srows) == _rowset(dcols, drows), f"{name}: values differ"

    # Dtype lint: the driver hashes pandas values dtype-sensitively, so a
    # Spark int64 column paired with a DuckDB HUGEINT (materialized float64 —
    # e.g. an uncast SUM(BIGINT)) hash-mismatches even when values agree.
    # Python-level tuple equality above can't see it ((5,) == (5.0,)), so
    # enforce it at the dtype layer: integer on the Spark side must be
    # integer on the oracle side. This caught multimodal_pipeline_stats and
    # dataset_mix_report in rounds 1-2; keep it so the class never recurs.
    # Spark-side integer-ness comes from the LOGICAL schema (free — no
    # re-execution — and stricter: toPandas turns a nullable int column
    # into float64, which would fail-open the lint).
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    int_types = (ByteType, ShortType, IntegerType, LongType)
    spark_int_cols = {f.name for f in sdf.schema.fields
                      if isinstance(f.dataType, int_types)}
    odf = ddb.execute(sql).df()
    for col in spark_int_cols:
        okind = odf[col].dtype.kind
        assert okind in "iu", (
            f"{name}.{col}: Spark integer column but oracle dtype kind "
            f"'{okind}' — likely an uncast integer aggregate in the "
            f"oracle SQL (wrap it in CAST(... AS BIGINT))"
        )


def test_documented_query_count():
    """README's headline query count must equal the registry (VERDICT r3
    found prose drift: docs said 43 while the registry held 42). Every
    query must also carry an oracle — facts oracles included — so the
    two registries can't diverge silently either."""
    import pathlib
    import re

    n = len(entry.queries())
    assert len(entry.oracle_sql()) == n, "queries() and oracle_sql() differ"
    readme = pathlib.Path(__file__).resolve().parents[1] / "README.md"
    m = re.search(r"(\d+) driver-checkable queries", readme.read_text())
    assert m, "README no longer states the driver-query count"
    assert int(m.group(1)) == n, (
        f"README claims {m.group(1)} driver queries but queries() has {n}"
    )


def test_documented_bench_headline_matches_artifact():
    """SURVEY's quoted bench headline must equal the committed
    BENCH/pinned_run.json (r4 item 3: prose drift; r5 item 1: the pin
    first anchored to BENCH/last_run.json, which every bench run —
    including the driver's post-checkout one — overwrites, so the suite
    went red in the as-delivered worktree. pinned_run.json is updated
    only by a deliberate `bench.py --pin` + commit, and last_run.json is
    untracked)."""
    import json
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    survey = (root / "SURVEY.md").read_text()
    m = re.search(r"headline sum ([0-9.]+) s over (\d+) timed entries", survey)
    assert m, "SURVEY no longer quotes the bench headline"
    art = json.loads((root / "BENCH" / "pinned_run.json").read_text())
    assert float(m.group(1)) == art["value"], (
        f"SURVEY quotes {m.group(1)}s but BENCH/pinned_run.json has "
        f"{art['value']}s"
    )
    assert int(m.group(2)) == len(art["queries"])


def test_bench_live_artifact_is_untracked():
    """BENCH/last_run.json must stay gitignored: every bench run (including
    the driver's post-checkout one) overwrites it, so the moment it is
    tracked again, any committed figure pinned to it goes stale on the next
    run — exactly the r5 as-delivered-worktree failure. The committed
    artifact is BENCH/pinned_run.json (updated only via `bench.py --pin`)."""
    import pathlib
    import shutil
    import subprocess

    if shutil.which("git") is None:
        pytest.skip("git not available")
    root = pathlib.Path(__file__).resolve().parents[1]
    if not (root / ".git").exists():
        pytest.skip("not a git checkout")
    rc = subprocess.run(
        ["git", "-C", str(root), "check-ignore", "-q", "BENCH/last_run.json"]
    ).returncode
    assert rc == 0, "BENCH/last_run.json is not gitignored"
    tracked = subprocess.run(
        ["git", "-C", str(root), "ls-files", "--error-unmatch",
         "BENCH/last_run.json"],
        capture_output=True,
    ).returncode
    assert tracked != 0, "BENCH/last_run.json is tracked in git again"


def test_documented_scaling_matches_baseline():
    """README's quoted strong/weak scaling efficiencies must equal the
    committed BENCH/BASELINE.md (this class of prose drift recurred three
    times across rounds; pin it like the bench headline)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    readme = (root / "README.md").read_text()
    baseline = (root / "BENCH" / "BASELINE.md").read_text()
    m = re.search(r"\*\*([0-9.]+) efficiency\*\* in the\s+committed run",
                  readme)
    assert m, "README no longer quotes the committed strong-scaling number"
    b = re.search(r"Scaling efficiency = .* = ([0-9.]+)", baseline)
    assert b, "BASELINE.md no longer states the strong-scaling efficiency"
    assert abs(float(m.group(1)) - float(b.group(1))) < 0.005, (
        f"README quotes {m.group(1)} but BASELINE.md measured {b.group(1)}"
    )
    mw = re.search(r"\*\*([0-9.]+)\s+efficiency\*\*, near-constant", readme)
    bw = re.search(r"Weak-scaling efficiency = .* = ([0-9.]+)", baseline)
    assert mw and bw
    assert abs(float(mw.group(1)) - float(bw.group(1))) < 0.005, (
        f"README quotes weak {mw.group(1)} but BASELINE.md measured {bw.group(1)}"
    )


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["l_returnflag", "q", "est", "n"]
