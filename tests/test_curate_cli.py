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
         "--output", out_dir, "--redact", "--balance-output", "4",
         "--cap-per-source", "3"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["n_input"] > 0
    assert stats["n_curated"] <= stats["n_input"]
    assert stats["output"] == out_dir
    assert "n_redacted_docs" in stats
    assert stats["balance_output_buckets"] == 4
    assert stats["n_after_source_cap"] <= stats["n_curated"]
    import glob

    import duckdb

    caps = duckdb.sql(
        f"SELECT MAX(c) FROM (SELECT source, COUNT(*) c "
        f"FROM read_parquet('{out_dir}/*.parquet') GROUP BY source)"
    ).fetchone()[0]
    assert duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchone()[0] == stats["n_after_source_cap"]  # balancing adds/drops nothing
    assert caps <= 3  # the per-source quota held in the written output
    # the exchange spread survivors over the length buckets -> several files
    assert len(glob.glob(os.path.join(out_dir, "part-*.parquet"))) >= 2


def test_curate_job_shuffle_output_deterministic(tmp_path):
    """--shuffle-output writes a reproducible pseudo-random order: two runs
    with the same seed produce byte-identical row sequences."""
    import duckdb

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    orders = []
    for run in ("a", "b"):
        out_dir = str(tmp_path / f"cur_{run}")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "curate_job.py"),
             "--input", "/root/testdata/sf0.001/documents.parquet",
             "--output", out_dir, "--shuffle-output", "7"],
            capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        stats = json.loads(proc.stdout.strip().splitlines()[-1])
        assert stats["shuffle_seed"] == 7
        orders.append([r[0] for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{out_dir}/part-*.parquet')"
        ).fetchall()])
    assert orders[0] == orders[1]
    assert orders[0] != sorted(orders[0])  # actually shuffled
    # the flag pair that cannot both hold is refused up front
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "curate_job.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(tmp_path / "x"), "--shuffle-output", "7",
         "--balance-output", "4"],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert proc.returncode != 0
    assert "mutually exclusive" in proc.stderr


def test_curate_job_partial_embeddings_keep_unembedded_docs(tmp_path):
    """Review regression: docs with NO embedding row are not semantic
    duplicates and must survive the --embeddings stage (the first cut
    semi-joined on survivors and silently dropped them)."""
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": [f"a sufficiently long unique document body number {i} "
                 "with plenty of ordinary words to pass quality filtering"
                 for i in range(8)],
    })
    docs_path = str(tmp_path / "docs.parquet")
    docs.to_parquet(docs_path)
    # embeddings cover ONLY doc_ids 0-3; 2 and 3 are exact duplicates of 0
    emb = pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 0.0]],
    })
    emb_path = str(tmp_path / "emb.parquet")
    emb.to_parquet(emb_path)

    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "curate_job.py"),
         "--input", docs_path, "--output", out_dir,
         "--embeddings", emb_path, "--semantic-engine", "exact",
         "--semantic-threshold", "0.99", "--quality-threshold", "0.0"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    import duckdb

    ids = sorted(r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchall())
    # 2 and 3 drop (dups of 0); 4-7 survive despite having no embeddings
    assert ids == [0, 1, 4, 5, 6, 7], ids

    # unknown embedding columns fail loudly, not with an opaque plan error
    bad = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "curate_job.py"),
         "--input", docs_path, "--output", str(tmp_path / "c2"),
         "--embeddings", emb_path, "--emb-id-col", "nope"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert bad.returncode != 0 and "no column 'nope'" in bad.stderr
