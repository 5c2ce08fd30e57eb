"""Head-to-head throughput vs the reference binary on this box.

Compiles the READ-ONLY reference UDDSketch kernel (never copied), emulates
its MPI job shape — P single-core rank processes, each taskset-pinned,
fread-ing its contiguous input slice (readDataSlot semantics) and filling
UDDSketch(alpha, m) — over the SAME values our scaling job sketches, and
prints wall-clock + turns/s per level. Results recorded in
BENCH/REFERENCE_COMPARISON.md.

Usage: python scripts/ref_throughput_bench.py [levels...]   (default 2 8)
Requires g++, /root/reference, and the scaling run's 50M-turn table
(/tmp/puddsketch_bench/transcripts_50m.parquet — scripts/scaling.py
creates it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REF = "/root/reference/psketches/uddsketch"
DATA_PARQUET = "/tmp/puddsketch_bench/transcripts_50m.parquet"
DATA_BIN = "/tmp/puddsketch_bench/text_len_50m.bin"

_MAIN = r"""
#include "uddsketch.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>
int main(int argc, char** argv) {
    const char* path = argv[1];
    long rank = atol(argv[2]), procs = atol(argv[3]);
    FILE* f = fopen(path, "rb");
    fseek(f, 0, SEEK_END); long total = ftell(f) / 8;
    long lo = (long)((rank * (double)total) / procs);
    long hi = (long)(((rank + 1) * (double)total) / procs);
    std::vector<double> vals(hi - lo);
    fseek(f, lo * 8, SEEK_SET);
    if (fread(vals.data(), 8, vals.size(), f) != vals.size()) return 1;
    fclose(f);
    auto t0 = std::chrono::steady_clock::now();
    UDDSketch sk(0.01, 200);
    for (double v : vals) sk.add(v);
    auto t1 = std::chrono::steady_clock::now();
    printf("%.4f %ld %d\n", std::chrono::duration<double>(t1 - t0).count(),
           (long)vals.size(), sk.get_number_buckets());
    return 0;
}
"""


def ensure_bin() -> None:
    if os.path.exists(DATA_BIN):
        return
    import duckdb
    import numpy as np

    con = duckdb.connect()
    vals = con.execute(
        f"SELECT text_len FROM read_parquet('{DATA_PARQUET}/*.parquet')"
    ).fetchnumpy()["text_len"]
    vals.astype("<f8").tofile(DATA_BIN)


def run_level(exe: str, procs: int) -> dict:
    procs_list = []
    t0 = time.time()
    for r in range(procs):
        procs_list.append(
            subprocess.Popen(
                ["taskset", "-c", str(r), exe, DATA_BIN, str(r), str(procs)],
                stdout=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate()[0].split() for p in procs_list]
    wall = time.time() - t0
    assert all(p.returncode == 0 for p in procs_list)
    n = sum(int(o[1]) for o in outs)
    return {
        "procs": procs,
        "wall_incl_read_sec": round(wall, 3),
        "max_rank_fill_sec": max(float(o[0]) for o in outs),
        "n": n,
        "throughput_turns_per_sec": round(n / wall, 1),
    }


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [2, 8]
    ensure_bin()
    with tempfile.TemporaryDirectory() as td:
        cpp = os.path.join(td, "ref_job_bench.cpp")
        with open(cpp, "w") as f:
            f.write(_MAIN)
        exe = os.path.join(td, "ref_job_bench")
        subprocess.run(
            ["g++", "-O3", "-std=c++11", f"-I{REF}", cpp,
             os.path.join(REF, "uddsketch.cpp"), "-o", exe],
            check=True,
        )
        # warm page cache so the comparison is compute-bound on both sides
        with open(DATA_BIN, "rb") as f:
            while f.read(1 << 24):
                pass
        results = [run_level(exe, p) for p in levels]
    print(json.dumps({"metric": "reference-binary emulated throughput",
                      "levels": results}))


if __name__ == "__main__":
    main()
