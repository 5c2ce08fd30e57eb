"""Distributed-path tests: partial/merge pipeline, grouped + global sketches,
skew salting, checkpoint/resume, datagen determinism. (SURVEY.md §5 plan.)"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from puddsketch_spark.core import UDDSketch
from puddsketch_spark.datagen import transcripts
from puddsketch_spark.spark.agg import (
    partial_sketches,
    sketch_global,
    sketch_grouped,
    udds_quantiles,
)
from puddsketch_spark.spark.checkpoint import resume_partials, write_partials
from puddsketch_spark.spark.features import with_inter_turn_latency, with_text_len
from puddsketch_spark.spark.skew import salted_repartition


@pytest.fixture(scope="module")
def tdf(spark):
    return with_text_len(transcripts(spark, n_conv=1500, avg_turns=8, seed=42)).cache()


def _factory():
    return UDDSketch(initial_alpha=0.01, m=200)


def test_datagen_deterministic(spark):
    a = transcripts(spark, n_conv=50, seed=7).orderBy("conv_id", "turn_idx").collect()
    b = transcripts(spark, n_conv=50, seed=7).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    cols = transcripts(spark, n_conv=1, seed=7).columns
    assert cols == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_datagen_beta_length_dist(spark):
    """Beta(2,5) text lengths via the reference's two-gamma construction
    (ParallelDDSketch/src/ParallelSketcher.cc:358-366), Catalyst-only:
    deterministic, in [1,1000], and distribution-shaped (a KS check against
    numpy's beta at the mapped quantiles)."""
    import numpy as np

    df = transcripts(spark, n_conv=400, seed=3, length_dist="beta", with_text=False)
    lens = np.array([r.text_len for r in df.select("text_len").collect()])
    again = np.array(
        [r.text_len
         for r in transcripts(spark, n_conv=400, seed=3, length_dist="beta",
                              with_text=False).select("text_len").collect()]
    )
    assert np.array_equal(np.sort(lens), np.sort(again))
    assert lens.min() >= 1 and lens.max() <= 1000
    ref = 1 + np.floor(np.random.default_rng(0).beta(2, 5, lens.size) * 999)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        got = np.quantile(lens, q)
        want = np.quantile(ref, q)
        assert abs(got - want) <= 0.08 * 999 + 5, (q, got, want)


def test_per_turn_text_equality_under_stable_ordering(spark):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering, regardless of physical partitioning."""
    a = transcripts(spark, n_conv=100, seed=11, partitions=2)
    b = transcripts(spark, n_conv=100, seed=11, partitions=16).repartition(7)
    joined = a.alias("a").join(
        b.alias("b"),
        (F.col("a.conv_id") == F.col("b.conv_id"))
        & (F.col("a.turn_idx") == F.col("b.turn_idx")),
    )
    n = joined.count()
    assert n == a.count() == b.count()
    mismatched = joined.where(F.col("a.text") != F.col("b.text")).count()
    assert mismatched == 0


def test_partials_carry_lineage_metrics(tdf):
    p = partial_sketches(tdf, "text_len", ["role"], _factory)
    rows = p.collect()
    assert {r.partition_id for r in rows} == set(range(tdf.rdd.getNumPartitions()))
    assert all(r.n > 0 and r.buckets > 0 for r in rows)
    total = sum(r.n for r in rows)
    assert total == tdf.count()


def test_grouped_matches_exact_within_alpha(spark, tdf):
    qs = [0.5, 0.9, 0.99]
    est = {
        (r.role, r.q): r.est
        for r in udds_quantiles(tdf, "text_len", ["role"], qs, alpha=0.01, m=1024).collect()
    }
    exact = {
        (r.role, q): r[f"p{i}"]
        for r in tdf.groupBy("role")
        .agg(*[F.expr(f"percentile(text_len, {q})").alias(f"p{i}") for i, q in enumerate(qs)])
        .collect()
        for i, q in enumerate(qs)
    }
    for (role, q), e in est.items():
        x = exact[(role, q)]
        assert abs(e - x) / x <= 0.011, (role, q, e, x)


def test_pre_aggregate_path_bucket_exact(spark, tdf):
    """pre_aggregate=True (Tungsten distinct-count -> weighted kernel fill)
    must produce the SAME sketch as the row-at-a-time path: with no
    collapses (m=0 = unbounded) the bucket stores are bit-identical, since
    update and update_weighted increment the same keys by the same totals."""
    plain = {
        r.role: UDDSketch.from_bytes(bytes(r.state))
        for r in sketch_grouped(
            tdf, "text_len", ["role"],
            lambda: UDDSketch(initial_alpha=0.01, m=0)).collect()
    }
    pre = {
        r.role: UDDSketch.from_bytes(bytes(r.state))
        for r in sketch_grouped(
            tdf, "text_len", ["role"],
            lambda: UDDSketch(initial_alpha=0.01, m=0),
            pre_aggregate=True).collect()
    }
    assert set(plain) == set(pre)
    for role, sk in plain.items():
        assert sk.same_buckets(pre[role]), role
        assert sk.count == pre[role].count


def test_pre_aggregate_hll_and_cms(spark, tdf):
    """HLL ignores weights (duplicate-insensitive) -> identical registers;
    CMS takes counts -> identical frequency estimates."""
    from puddsketch_spark.core import CountMinSketch, HLLSketch

    for fac in (lambda: HLLSketch(p=12), lambda: CountMinSketch()):
        a = {r.role: bytes(r.state)
             for r in sketch_grouped(tdf, "turn_idx", ["role"], fac).collect()}
        b = {r.role: bytes(r.state)
             for r in sketch_grouped(tdf, "turn_idx", ["role"], fac,
                                     pre_aggregate=True).collect()}
        assert a == b  # byte-identical states


def test_pre_aggregate_rejects_rank_kernels(spark, tdf):
    """KLL compaction samples items — no exact weighted form; the
    pre-aggregate path must fail loudly, not silently skew ranks."""
    from puddsketch_spark.core import KLLSketch

    with pytest.raises(Exception, match="does not support weighted update"):
        sketch_grouped(tdf, "text_len", ["role"], lambda: KLLSketch(k=128),
                       pre_aggregate=True).collect()


def test_rollup_states_parquet_roundtrip(spark, tdf):
    """The incremental-rollup contract: per-group sketch states written to
    parquet, reloaded in a FRESH reader, and rolled up (coarser grouping
    AND global) are bit-identical to sketching the raw table directly —
    no-collapse config, so every path lands on the same buckets."""
    import tempfile

    from puddsketch_spark.spark.agg import rollup_states, sketch_grouped_jvm

    fine = sketch_grouped_jvm(tdf, "text_len", ["role", "tool"], 0.01, 0)
    with tempfile.TemporaryDirectory() as td:
        fine.write.mode("overwrite").parquet(td)
        stored = spark.read.parquet(td)

        # rollup to coarser grouping (drop tool)
        by_role = {
            r.role: UDDSketch.from_bytes(bytes(r.state))
            for r in rollup_states(stored, ["role"], UDDSketch.from_bytes).collect()
        }
        direct = {
            r.role: UDDSketch.from_bytes(bytes(r.state))
            for r in sketch_grouped_jvm(tdf, "text_len", ["role"], 0.01, 0).collect()
        }
        assert set(by_role) == set(direct)
        for role, sk in direct.items():
            assert sk.same_buckets(by_role[role]), role
            assert sk.count == by_role[role].count

        # rollup to global
        g = rollup_states(stored, (), UDDSketch.from_bytes)
        from puddsketch_spark.spark.agg import sketch_global

        g_direct = sketch_global(
            tdf, "text_len", lambda: UDDSketch(initial_alpha=0.01, m=0),
            UDDSketch.from_bytes,
        )
        assert g.same_buckets(g_direct) and g.count == g_direct.count


def test_global_treereduce_matches_kernel(spark, tdf):
    sk = sketch_global(tdf, "text_len", _factory)
    vals = np.array([r[0] for r in tdf.select("text_len").collect()])
    local = _factory().update(vals)
    assert sk.count == local.count
    # same resolution & buckets regardless of partitioning
    if sk.num_collapses != local.num_collapses:
        c = max(sk.num_collapses, local.num_collapses)
        sk.collapse(c - sk.num_collapses)
        local.collapse(c - local.num_collapses)
    assert sk.same_buckets(local)


def test_partition_count_invariance(spark, tdf):
    """1 vs 8 vs 32 partitions -> same final buckets (merge-order invariance)."""
    results = []
    for n in [1, 8, 32]:
        sk = sketch_global(tdf.repartition(n), "text_len", _factory)
        results.append(sk)
    base = results[0]
    for other in results[1:]:
        a, b = base.copy(), other.copy()
        c = max(a.num_collapses, b.num_collapses)
        a.collapse(c - a.num_collapses)
        b.collapse(c - b.num_collapses)
        assert a.same_buckets(b)


def test_salted_repartition_spreads_hot_key(spark):
    hot = transcripts(spark, n_conv=200, avg_turns=8, seed=1, skew="zipf")
    salted = salted_repartition(hot, ["conv_id"], ["turn_idx"], 16, salt_buckets=8)
    # the hottest conv must occupy >1 partition after salting
    hottest = hot.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    if hottest["count"] >= 16:
        spread = (
            salted.where(F.col("conv_id") == hottest.conv_id)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert spread > 1
    # and the sketch result is unchanged by salting
    a = sketch_global(with_text_len(hot), "text_len", _factory)
    b = sketch_global(with_text_len(salted), "text_len", _factory)
    assert a.count == b.count
    aa, bb = a.copy(), b.copy()
    c = max(aa.num_collapses, bb.num_collapses)
    aa.collapse(c - aa.num_collapses)
    bb.collapse(c - bb.num_collapses)
    assert aa.same_buckets(bb)


def test_latency_feature(spark):
    t = transcripts(spark, n_conv=300, avg_turns=8, seed=3)
    lat = with_inter_turn_latency(t)
    rows = lat.where("turn_idx = 0").select("latency_s").distinct().collect()
    assert [r[0] for r in rows] == [None]
    vals = np.array(
        [r[0] for r in lat.where("latency_s is not null").select("latency_s").collect()]
    )
    assert (vals > 0).all()
    # exponential(1): median ~ ln 2
    assert abs(np.median(vals) - np.log(2)) < 0.1


def test_checkpoint_resume_equals_uninterrupted(spark, tdf, tmp_path):
    path = str(tmp_path / "ckpt")
    full = partial_sketches(tdf, "text_len", ["role"], _factory)
    n_parts = tdf.rdd.getNumPartitions()
    # simulate a crash: persist only partitions < half
    partial_half = full.where(F.col("partition_id") < n_parts // 2)
    write_partials(partial_half, path, n_parts)
    resumed = resume_partials(spark, tdf, "text_len", ["role"], path, _factory)
    # resumed partials cover every partition exactly once
    per_pid = resumed.groupBy("partition_id", "role").count().collect()
    assert all(r["count"] == 1 for r in per_pid)
    assert {r.partition_id for r in resumed.select("partition_id").distinct().collect()} == set(
        range(n_parts)
    )
    # and the merged result equals the uninterrupted run
    def merge_all(df):
        sk = None
        for r in df.select("state").collect():
            s = UDDSketch.from_bytes(bytes(r[0]))
            sk = s if sk is None else sk.merge(s)
        return sk

    a, b = merge_all(resumed), merge_all(full)
    c = max(a.num_collapses, b.num_collapses)
    a.collapse(c - a.num_collapses)
    b.collapse(c - b.num_collapses)
    assert a.same_buckets(b)


def test_jvm_engine_bit_parity(spark, tdf):
    """JVM Tungsten fill vs Arrow/numpy fill: identical estimates (m=0)."""
    a = {
        (r.role, r.q): r.est
        for r in udds_quantiles(tdf, "text_len", ["role"], [0.5, 0.9, 0.99],
                                alpha=0.005, m=0, engine="jvm").collect()
    }
    b = {
        (r.role, r.q): r.est
        for r in udds_quantiles(tdf, "text_len", ["role"], [0.5, 0.9, 0.99],
                                alpha=0.005, m=0, engine="python").collect()
    }
    assert a == b


def test_jvm_engine_zero_bucket_and_global(spark):
    df = spark.createDataFrame(
        [(0.0,), (-5.0,), (1.0,), (2.0,), (float("nan"),)], "v double"
    )
    out = {r.q: r.est for r in
           udds_quantiles(df, "v", (), [0.0, 0.5, 1.0], alpha=0.01, m=0, engine="jvm").collect()}
    # population 4 (NaN dropped): {zero, zero, ~1, ~2}
    assert out[0.0] == 0.0
    assert out[1.0] == pytest.approx(2.0, rel=0.02)


def test_resume_noop_when_complete(spark, tdf, tmp_path):
    path = str(tmp_path / "ckpt2")
    first = resume_partials(spark, tdf, "text_len", [], path, _factory)
    n1 = first.count()
    second = resume_partials(spark, tdf, "text_len", [], path, _factory)
    assert second.count() == n1


def _merge_all(df):
    sk = None
    for r in df.select("state").collect():
        s = UDDSketch.from_bytes(bytes(r[0]))
        sk = s if sk is None else sk.merge(s)
    return sk


def test_checkpoint_file_lineage_scans_only_missing_files(spark, tmp_path):
    """File-backed input: resume must build its scan from ONLY the files
    absent from the manifest (a 99%-done job re-reads ~1%, not 100%)."""
    import json

    src = str(tmp_path / "src")
    t = transcripts(spark, n_conv=400, avg_turns=6, seed=9)
    with_text_len(t).select("role", "text_len").repartition(4).write.parquet(src)
    full_df = spark.read.parquet(src)
    all_files = sorted(full_df.inputFiles())
    assert len(all_files) == 4

    # simulate a crash: checkpoint covers only the first two files
    part_df = spark.read.schema(full_df.schema).parquet(*all_files[:2])
    ckpt = str(tmp_path / "ckpt_files")
    resume_partials(spark, part_df, "text_len", ["role"], ckpt, _factory)

    resumed = resume_partials(spark, full_df, "text_len", ["role"], ckpt, _factory)
    with open(f"{ckpt}/_sketch_manifest.json") as f:
        manifest = json.load(f)
    # the resume run's scan planned exactly the two missing files
    assert sorted(manifest["runs"][-1]["scanned"]) == all_files[2:]
    assert set(manifest["files"]) == set(all_files)
    # per-(partition, group) states appear exactly once (no double-count)
    per_pid = resumed.groupBy("partition_id", "role").count().collect()
    assert all(r["count"] == 1 for r in per_pid)
    # resumed == uninterrupted, bucket-for-bucket
    full = partial_sketches(full_df, "text_len", ["role"], _factory)
    a, b = _merge_all(resumed), _merge_all(full)
    c = max(a.num_collapses, b.num_collapses)
    a.collapse(c - a.num_collapses)
    b.collapse(c - b.num_collapses)
    assert a.same_buckets(b)
    # a second resume is a no-op (no new run appended)
    n_runs = len(manifest["runs"])
    resume_partials(spark, full_df, "text_len", ["role"], ckpt, _factory)
    with open(f"{ckpt}/_sketch_manifest.json") as f:
        assert len(json.load(f)["runs"]) == n_runs


def test_checkpoint_rejects_changed_input_file(spark, tmp_path):
    """A completed file whose fingerprint changed must fail loudly instead of
    silently double-counting or dropping rows (resume-safety invariant)."""
    src = str(tmp_path / "src2")
    t = transcripts(spark, n_conv=100, avg_turns=4, seed=11)
    with_text_len(t).select("role", "text_len").repartition(2).write.parquet(src)
    full_df = spark.read.parquet(src)
    ckpt = str(tmp_path / "ckpt_changed")
    resume_partials(spark, full_df, "text_len", ["role"], ckpt, _factory)
    # perturb one data file's fingerprint (rewritten-in-place scenario)
    import os

    victim = [f for f in sorted(full_df.inputFiles())][0].replace("file:", "")
    st = os.stat(victim)
    os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    with pytest.raises(ValueError, match="changed since checkpoint"):
        resume_partials(spark, spark.read.parquet(src), "text_len", ["role"], ckpt, _factory)


def test_checkpoint_rebuild_scan_for_derived_columns(spark, tmp_path):
    """Inputs with derived columns resume through rebuild_scan: the caller
    reproduces its transformation over the missing-file subset."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src3")
    t = transcripts(spark, n_conv=120, avg_turns=4, seed=13)
    t.select("conv_id", "role", "text").repartition(3).write.parquet(src)

    def load(spark_, paths):
        raw = (spark_.read.schema("conv_id string, role string, text string")
               .parquet(*paths))
        return raw.withColumn("text_len", F.length("text").cast("double"))

    full_raw = spark.read.parquet(src)
    files = sorted(full_raw.inputFiles())
    ckpt = str(tmp_path / "ckpt_derived")
    # seed from 1 of 3 files, using the derived column
    resume_partials(spark, load(spark, files[:1]), "text_len", ["role"], ckpt,
                    _factory, rebuild_scan=load)
    resumed = resume_partials(spark, load(spark, files), "text_len", ["role"],
                              ckpt, _factory, rebuild_scan=load)
    full = partial_sketches(load(spark, files), "text_len", ["role"], _factory)
    a, b = _merge_all(resumed), _merge_all(full)
    c = max(a.num_collapses, b.num_collapses)
    a.collapse(c - a.num_collapses)
    b.collapse(c - b.num_collapses)
    assert a.same_buckets(b)


def test_binary_doubles_rejects_bad_length(spark, tmp_path):
    from puddsketch_spark.sources import read_binary_doubles

    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x00" * 12)  # not a multiple of 8
    import pytest as _pytest

    with _pytest.raises(Exception, match="multiple of 8"):
        read_binary_doubles(spark, str(p)).count()


def test_checkpoint_rejects_shrunk_input(spark, tmp_path):
    """Resume over an input missing previously-checkpointed files must fail
    loudly: the checkpoint's partials would carry data the table no longer
    has (resume is defined for append-only inputs)."""
    import os

    src = str(tmp_path / "src4")
    t = transcripts(spark, n_conv=100, avg_turns=4, seed=17)
    with_text_len(t).select("role", "text_len").repartition(3).write.parquet(src)
    full = spark.read.parquet(src)
    ckpt = str(tmp_path / "ckpt_shrunk")
    resume_partials(spark, full, "text_len", ["role"], ckpt, _factory)
    victim = sorted(full.inputFiles())[0].replace("file:", "")
    os.remove(victim)
    with pytest.raises(ValueError, match="no longer exist"):
        resume_partials(spark, spark.read.parquet(src), "text_len", ["role"],
                        ckpt, _factory)


def test_checkpoint_survives_crash_between_append_and_manifest(spark, tmp_path):
    """A resume that died AFTER appending its partials but BEFORE rewriting
    the manifest must not double-count: its orphan rows sit outside every
    committed partition-id range, the next resume re-runs the files under a
    fresh range, and the merged result equals the uninterrupted run."""
    import json

    from pyspark.sql import functions as F

    src = str(tmp_path / "src5")
    t = transcripts(spark, n_conv=300, avg_turns=5, seed=19)
    with_text_len(t).select("role", "text_len").repartition(3).write.parquet(src)
    full_df = spark.read.parquet(src)
    files = sorted(full_df.inputFiles())
    ckpt = str(tmp_path / "ckpt_crash")
    part_df = spark.read.schema(full_df.schema).parquet(*files[:2])
    resume_partials(spark, part_df, "text_len", ["role"], ckpt, _factory)

    # emulate the crashed resume: append the third file's partials with the
    # pid offset a real resume would use, but leave the manifest untouched
    with open(f"{ckpt}/_sketch_manifest.json") as f:
        manifest = json.load(f)
    base = manifest["next_pid_base"]
    crashed_df = spark.read.schema(full_df.schema).parquet(files[2])
    orphans = partial_sketches(crashed_df, "text_len", ["role"], _factory).withColumn(
        "partition_id", (F.col("partition_id") + F.lit(base)).cast("int")
    )
    orphans.write.mode("append").parquet(ckpt)

    resumed = resume_partials(spark, full_df, "text_len", ["role"], ckpt, _factory)
    full = partial_sketches(full_df, "text_len", ["role"], _factory)
    a, b = _merge_all(resumed), _merge_all(full)
    assert a.count == b.count  # no double count despite the orphan rows
    c = max(a.num_collapses, b.num_collapses)
    a.collapse(c - a.num_collapses)
    b.collapse(c - b.num_collapses)
    assert a.same_buckets(b)
    # the recovery run re-used a FRESH id range above the orphans
    with open(f"{ckpt}/_sketch_manifest.json") as f:
        m2 = json.load(f)
    assert m2["committed_ranges"][-1][0] > base


def test_checkpoint_default_rebuild_rejects_hive_partitions(spark, tmp_path):
    src = str(tmp_path / "src6")
    t = transcripts(spark, n_conv=60, avg_turns=4, seed=23)
    (with_text_len(t).select("role", "text_len")
     .write.partitionBy("role").parquet(src))
    full = spark.read.parquet(src)
    ckpt = str(tmp_path / "ckpt_hive")
    # seed a checkpoint missing some files, then resume without rebuild_scan
    part_files = sorted(full.inputFiles())[:1]
    part = spark.read.schema(
        spark.read.parquet(*part_files).schema
    ).parquet(*part_files)
    # the seeding itself is fine (rebuild only triggers on MISSING files)
    resume_partials(spark, part, "text_len", [], ckpt, _factory)
    with pytest.raises(ValueError, match="hive-partitioned"):
        resume_partials(spark, full, "text_len", [], ckpt, _factory)


def test_salted_join_equals_plain_join(spark):
    """salted_join: identical rows to the plain join under a hot key (99%
    of fact rows on one key), both inner and left, and each fact row
    matched exactly once (no salt-induced duplication)."""
    from puddsketch_spark.spark.skew import salted_join

    rows = [(0 if j % 100 else j % 7 + 1, j, float(j)) for j in range(10_000)]
    fact = spark.createDataFrame(rows, "k long, rid long, v double")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(6)], "k long, name string"
    )
    for how in ("inner", "left"):
        plain = sorted(fact.join(dim, "k", how).collect())
        salted = sorted(
            salted_join(fact, dim, "k", salt_cols=["rid"], salt_buckets=8,
                        how=how).collect()
        )
        assert salted == plain and len(plain) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", salt_cols=["rid"], how="right")


def test_checkpoint_with_theta_and_moments_kernels(spark, tmp_path):
    """Kernel-generic checkpointing: theta and moments states resumable
    from disk produce the same result as an uninterrupted run."""
    from puddsketch_spark.core import MomentsSketch, ThetaSketch
    from puddsketch_spark.spark.checkpoint import checkpointed_sketch_grouped

    src = str(tmp_path / "ckpt_src")
    t = transcripts(spark, n_conv=400, avg_turns=8, seed=23)
    with_text_len(t).select("role", "conv_id", "text_len").coalesce(4).write.mode(
        "overwrite").parquet(src)
    df = spark.read.parquet(src)

    for kernel, col in ((lambda: ThetaSketch(k=256), "conv_id"),
                        (MomentsSketch, "text_len")):
        fb = type(kernel()).from_bytes
        direct = {
            r.role: r.state
            for r in sketch_grouped(df, col, ["role"], kernel, fb).collect()
        }
        ck = str(tmp_path / f"ck_{col}")
        resumed = {
            r.role: r.state
            for r in checkpointed_sketch_grouped(
                spark, df, col, ["role"], ck, kernel, fb).collect()
        }
        # second call resumes purely from the stored partials
        resumed2 = {
            r.role: r.state
            for r in checkpointed_sketch_grouped(
                spark, df, col, ["role"], ck, kernel, fb).collect()
        }
        for role in direct:
            d, r1, r2 = fb(direct[role]), fb(resumed[role]), fb(resumed2[role])
            if col == "conv_id":  # theta: bit-deterministic across paths
                assert d.same_buckets(r1) and r1.same_buckets(r2), role
            else:  # moments: merge order shifts the last ulp (documented)
                for other in (r1, r2):
                    assert d.n == other.n and d.vmin == other.vmin
                    assert abs(d.mean - other.mean) <= 1e-9 * abs(d.mean)
                    assert abs(d.m2 - other.m2) <= 1e-9 * abs(d.m2)


def test_dd_jvm_fill_bit_parity_with_arrow(spark):
    """The JVM (Tungsten histogram) DD-pair fill is bucket-identical to the
    Arrow-engine fill at m=0 over a mixed-sign column with zeros, and the
    one-shot m-bound fold produces a valid bounded uniform-mode sketch."""
    import numpy as np

    from puddsketch_spark.core import DDSketchPair
    from puddsketch_spark.spark.agg import dd_sketch_global_jvm

    rng = np.random.default_rng(29)
    vals = np.concatenate([
        rng.normal(0, 40, 40_000), np.zeros(13), -rng.lognormal(2, 1, 5_000)
    ])
    df = spark.createDataFrame([(float(v),) for v in vals], "v double").repartition(8)

    jvm = dd_sketch_global_jvm(df, "v", alpha=0.01, m=0)
    arrow = sketch_global(df, "v", lambda: DDSketchPair(initial_alpha=0.01, m=0),
                          DDSketchPair.from_bytes)
    assert jvm.zero_count == arrow.zero_count == 13
    assert np.array_equal(jvm.pos_keys, arrow.pos_keys)
    assert np.array_equal(jvm.pos_counts, arrow.pos_counts)
    assert np.array_equal(jvm.neg_keys, arrow.neg_keys)
    assert np.array_equal(jvm.neg_counts, arrow.neg_counts)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        assert jvm.quantile(q) == arrow.quantile(q), q

    bounded = dd_sketch_global_jvm(df, "v", alpha=0.01, m=64)
    assert bounded.num_buckets + 1 <= 64  # B* occupies a slot
    assert bounded.count == jvm.count
    sv = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        exact = sv[int(np.floor(q * (len(sv) - 1)))]
        assert abs(bounded.quantile(q) - exact) <= bounded.alpha * abs(exact) + 1e-9


def test_dd_grouped_jvm_matches_arrow(spark):
    """Grouped JVM DD fill: per-group states bucket-identical to the Arrow
    engine at m=0, min/max carried, and metrics columns populated."""
    import numpy as np

    from puddsketch_spark.core import DDSketchPair
    from puddsketch_spark.spark.agg import dd_states_grouped_jvm

    rng = np.random.default_rng(33)
    rows = [("a", float(v)) for v in rng.normal(0, 30, 20_000)] + [
        ("b", float(v)) for v in -rng.lognormal(1, 1, 10_000)
    ] + [("a", 0.0)] * 3
    df = spark.createDataFrame(rows, "grp string, v double").repartition(8)
    jvm = {
        r.grp: DDSketchPair.from_bytes(r.state)
        for r in dd_states_grouped_jvm(df, "v", ["grp"], alpha=0.01, m=0).collect()
    }
    arrow = {
        r.grp: DDSketchPair.from_bytes(r.state)
        for r in sketch_grouped(
            df, "v", ["grp"], lambda: DDSketchPair(initial_alpha=0.01, m=0),
            DDSketchPair.from_bytes).collect()
    }
    for g in ("a", "b"):
        j, a = jvm[g], arrow[g]
        assert j.zero_count == a.zero_count
        assert np.array_equal(j.pos_keys, a.pos_keys)
        assert np.array_equal(j.pos_counts, a.pos_counts)
        assert np.array_equal(j.neg_keys, a.neg_keys)
        assert np.array_equal(j.neg_counts, a.neg_counts)
        for q in (0.1, 0.5, 0.9):
            assert j.quantile(q) == a.quantile(q), (g, q)
    assert jvm["a"].zero_count == 3


def test_dd_grouped_jvm_keeps_null_group(spark):
    """Review regression: a NULL group key keeps its state row (null-safe
    min/max join), matching the Arrow engine's result set."""
    from puddsketch_spark.core import DDSketchPair
    from puddsketch_spark.spark.agg import dd_states_grouped_jvm

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 5.0), (None, -7.0)], "grp string, v double"
    )
    jvm = {r.grp: DDSketchPair.from_bytes(r.state)
           for r in dd_states_grouped_jvm(df, "v", ["grp"], alpha=0.01, m=0).collect()}
    assert set(jvm) == {"a", None}
    assert jvm[None].count == 2 and jvm[None].min_value == -7.0


# --------------------------------------------------------------------------
# grouping sets / cube / rollup over sketch states
# --------------------------------------------------------------------------
def _gs_fixture(spark):
    """Small 2-key table with a NULL data key in `tool` so rollup NULLs and
    data NULLs collide and only grouping_id can separate them."""
    rows = [
        ("user", "search", 10.0), ("user", "search", 20.0),
        ("user", None, 5.0), ("assistant", "search", 40.0),
        ("assistant", "code", 80.0), ("assistant", "code", 160.0),
        ("user", "code", 320.0),
    ]
    return spark.createDataFrame(rows, "role string, tool string, v double")


def test_grouping_sets_cells_bit_identical_to_direct_fill(spark):
    """Every grouping-set cell merged from the finest states must be
    bucket-for-bucket identical (m=0: no collapses, merge = exact bucket
    sum) to a direct sketch_grouped fill on that slice."""
    from puddsketch_spark.spark.agg import rollup_grouping_sets

    df = _gs_fixture(spark)
    fac = lambda: UDDSketch(initial_alpha=0.01, m=0)  # noqa: E731
    states = sketch_grouped(df, "v", ["role", "tool"], fac,
                            UDDSketch.from_bytes).persist()
    out = rollup_grouping_sets(
        states, [("role", "tool"), ("role",), ("tool",), ()],
        UDDSketch.from_bytes,
    ).collect()
    states.unpersist()
    assert {r.grouping_id for r in out} == {0, 1, 2, 3}

    # direct fills per set
    for gid, cols in ((0, ["role", "tool"]), (1, ["role"]), (2, ["tool"])):
        direct = {
            tuple(r[c] for c in cols): UDDSketch.from_bytes(r.state)
            for r in sketch_grouped(df, "v", cols, fac,
                                    UDDSketch.from_bytes).collect()
        }
        got = {r for r in out if r.grouping_id == gid}
        assert len(got) == len(direct)
        for r in got:
            d = direct[tuple(r[c] for c in cols)]
            m = UDDSketch.from_bytes(r.state)
            assert m.count == d.count == r.n
            assert m.to_bytes() == d.to_bytes()  # bucket-for-bucket
    # global cell
    (g,) = [r for r in out if r.grouping_id == 3]
    direct_g = sketch_global(df, "v", fac, UDDSketch.from_bytes)
    assert g.role is None and g.tool is None
    assert UDDSketch.from_bytes(g.state).to_bytes() == direct_g.to_bytes()
    assert g.n == df.count()


def test_grouping_sets_gid_matches_spark_cube(spark):
    """grouping_id must follow Spark's own grouping_id() bit convention,
    cell-for-cell, on a full cube (counts as the comparable metric)."""
    from puddsketch_spark.spark.agg import rollup_cube

    df = _gs_fixture(spark)
    fac = lambda: UDDSketch(initial_alpha=0.01, m=0)  # noqa: E731
    states = sketch_grouped(df, "v", ["role", "tool"], fac,
                            UDDSketch.from_bytes).persist()
    ours = {
        (r.role, r.tool, r.grouping_id): r.n
        for r in rollup_cube(states, ["role", "tool"],
                             UDDSketch.from_bytes).collect()
    }
    states.unpersist()
    sparks = {
        (r.role, r.tool, r.gid): r.cnt
        for r in df.cube("role", "tool")
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("cnt"))
        .collect()
    }
    assert ours == sparks  # data-NULL vs rollup-NULL separated identically


def test_rollup_hierarchy_prefix_chain(spark):
    from puddsketch_spark.spark.agg import rollup_hierarchy

    df = _gs_fixture(spark)
    fac = lambda: UDDSketch(initial_alpha=0.01, m=0)  # noqa: E731
    states = sketch_grouped(df, "v", ["role", "tool"], fac,
                            UDDSketch.from_bytes).persist()
    out = rollup_hierarchy(states, ["role", "tool"], UDDSketch.from_bytes)
    rows = out.collect()
    states.unpersist()
    # ROLLUP(role, tool) -> gids {0 (role,tool), 1 (role), 3 ()} — never 2
    assert {r.grouping_id for r in rows} == {0, 1, 3}
    spark_rollup = df.rollup("role", "tool").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("cnt")).collect()
    assert len(rows) == len(spark_rollup)


def test_grouping_sets_guards_and_one_scan_plan(spark):
    """Bad inputs raise; and with a persisted finest-state table the result
    plan references the cache (InMemory scan), never a fresh source scan —
    the one-scan contract the operator exists for."""
    from puddsketch_spark.spark.agg import rollup_grouping_sets

    df = _gs_fixture(spark)
    fac = lambda: UDDSketch(initial_alpha=0.01, m=0)  # noqa: E731
    states = sketch_grouped(df, "v", ["role", "tool"], fac,
                            UDDSketch.from_bytes).persist()
    states.count()  # materialize the cache

    with pytest.raises(ValueError, match="no grouping sets"):
        rollup_grouping_sets(states, [], UDDSketch.from_bytes)
    with pytest.raises(ValueError, match="duplicate column"):
        rollup_grouping_sets(states, [("role", "role")], UDDSketch.from_bytes)
    with pytest.raises(ValueError, match="lacks grouping columns"):
        rollup_grouping_sets(states, [("nope",)], UDDSketch.from_bytes)

    out = rollup_grouping_sets(states, [("role",), ()], UDDSketch.from_bytes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    assert "Scan ExistingRDD" not in plan or "InMemoryTableScan" in plan
    states.unpersist()


def test_fused_jvm_quantile_table_bit_parity(spark):
    """udds_quantile_table_jvm (one fused Python stage) must reproduce
    sketch_grouped_jvm + quantile_table(extra_cols=['n']) bit-for-bit —
    the r7 gate queries ride the fused path. Covers m=0 and a collapsing
    m=8 bound, with zero/negative/NaN/NULL values in the mix."""
    from puddsketch_spark.spark.agg import (
        quantile_table,
        sketch_grouped_jvm,
        udds_quantile_table_jvm,
    )

    rows = []
    for i in range(2000):
        rows.append(("g%d" % (i % 3), float(i % 97) * 1.37 - 5.0))
    rows += [("g0", 0.0), ("g1", float("nan")), ("g2", None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    qs = [0.5, 0.9, 0.99]
    for m in (0, 8):
        fused = {
            (r.grp, r.q): (r.est, r.n)
            for r in udds_quantile_table_jvm(df, "v", ["grp"], qs, 0.01, m).collect()
        }
        merged = sketch_grouped_jvm(df, "v", ["grp"], 0.01, m)
        two_stage = {
            (r.grp, r.q): (r.est, r.n)
            for r in quantile_table(merged, ["grp"], qs, UDDSketch.from_bytes,
                                    extra_cols=["n"]).collect()
        }
        assert fused == two_stage, m
