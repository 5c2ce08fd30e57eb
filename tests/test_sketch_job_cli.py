"""sketch_job.py CLI grouping-sets flags: subprocess runs (own JVM — the
job calls spark.stop(), so it must not share the test session).

Covers: --rollup on a fresh fill (+ --save-states), --grouping-sets on
--from-states (no rescan) with bit-identical global estimates, and the
bad-column refusal.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=300):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "sketch_job.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_sketch_job_rollup_and_from_states_grouping_sets(tmp_path):
    states = str(tmp_path / "states")
    # ROLLUP(role, tool) from one generated fill; m=0 so later state-table
    # merges are bucket-exact and estimates must match bit-for-bit
    proc = _run([
        "--generate", "20000", "--seed", "11", "--feature", "text_len",
        "--group-by", "role", "tool", "--rollup", "--engine", "jvm",
        "--max-buckets", "0", "--quantiles", "0.5", "0.99",
        "--save-states", states,
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(ln) for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")]
    gids = {r["grouping_id"] for r in rows}
    assert gids == {0, 1, 3}  # (role,tool), (role), () — never (tool)
    glob_rows = [r for r in rows if r["grouping_id"] == 3]
    assert len(glob_rows) == 2  # one per quantile
    assert all(r["role"] is None and r["tool"] is None for r in glob_rows)
    finest_n = sum({(r["role"], r["tool"]): r["n"] for r in rows
                    if r["grouping_id"] == 0}.values())
    assert glob_rows[0]["n"] == finest_n  # cells partition the corpus

    # incremental: the SAME grouping sets from the saved states, no rescan
    proc2 = _run([
        "--from-states", states, "--sketch", "udds",
        "--group-by", "role", "tool", "--rollup",
        "--max-buckets", "0", "--quantiles", "0.5", "0.99",
    ])
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    rows2 = [json.loads(ln) for ln in proc2.stdout.strip().splitlines()
             if ln.startswith("{")]

    def keyed(rs):
        return {(r["role"], r["tool"], r["grouping_id"], r["q"]):
                (r["est"], r["n"]) for r in rs}

    assert keyed(rows2) == keyed(rows)  # merge-order invariant, bit-exact

    # bad grouping-set column refused up front
    proc3 = _run([
        "--from-states", states, "--sketch", "udds",
        "--group-by", "role", "--grouping-sets", "nope", "--max-buckets", "0",
    ], timeout=120)
    assert proc3.returncode != 0
    assert "not in --group-by" in proc3.stderr
