"""Corpus-level line deduplication (boilerplate removal).

Removes lines that occur in more than ``max_doc_count`` distinct documents
— headers, footers, navigation chrome, license banners — while keeping
every line's first-class position inside its document (the CCNet /
RefinedWeb cleaning step, applied corpus-wide rather than per-doc).

Scale shape:
  * The document-frequency count explodes lines but shuffles ONLY
    (64-bit line hash, doc_id) pairs — never line text.
  * Hot lines are rare by construction (df > threshold), so the hot set
    broadcasts.
  * ``method="join"``: anti-join exploded lines against the hot set and
    reassemble per doc (ORDER-PRESERVING via position sort) — fully
    SQL-expressible, one extra shuffle to rebuild documents.
  * ``method="broadcast"``: the hot hashes ship to executors as one sorted
    numpy array; an Arrow-vectorized probe filters each doc's line array
    in place — ZERO shuffle of document text. Identical output.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["line_doc_freq", "dedup_lines"]

_HOT_BROADCAST_CAP = 5_000_000  # 40 MB of int64 hashes; beyond this, join


def _lines_col(df: DataFrame, text_col: str, delim: str):
    """Line-array column: ``text_col`` may be the document string (split on
    ``delim``) or an already-materialized array<string> of lines — callers
    that re-line documents upstream pass the array straight through instead
    of paying an array_join + re-split round trip per pass."""
    if dict(df.dtypes)[text_col].startswith("array"):
        return F.col(text_col)
    return F.split(F.col(text_col), delim)


def line_doc_freq(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", delim: str = "\n"
) -> DataFrame:
    """DataFrame[line_hash, df] — number of DISTINCT docs containing each
    line. Shuffles (hash, id) pairs only; line text never leaves the map
    side."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_lines_col(df, text_col, delim))).alias("line"),
    )
    return (
        lines.select(id_col, F.xxhash64("line").alias("line_hash"))
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def dedup_lines(
    df: DataFrame,
    max_doc_count: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    method: str = "broadcast",
) -> DataFrame:
    """DataFrame[id_col, clean_text, n_kept, n_removed]: documents with
    every line that occurs in more than ``max_doc_count`` distinct docs
    removed, remaining lines rejoined by ``delim`` in original order.

    ``method="broadcast"`` probes a broadcast sorted-hash array per Arrow
    batch (no shuffle of text); falls back to "join" automatically when
    the hot set exceeds the broadcast cap. Both methods byte-identical.
    """
    hot = line_doc_freq(df, text_col, id_col, delim).where(
        F.col("df") > max_doc_count
    )

    if method == "broadcast":
        hot_rows = hot.select("line_hash").limit(_HOT_BROADCAST_CAP + 1).collect()
        if len(hot_rows) > _HOT_BROADCAST_CAP:
            method = "join"
        else:
            hot_arr = np.sort(np.array([r[0] for r in hot_rows], dtype=np.int64))
            bc = df.sparkSession.sparkContext.broadcast(hot_arr)

            id_type = dict(df.dtypes)[id_col]  # don't hardcode bigint ids
            out_schema = (
                f"{id_col} {id_type}, clean_text string, n_kept long, n_removed long"
            )

            def clean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                hot_local = bc.value
                for pdf in batches:
                    kept_join, n_kept, n_rm = [], [], []
                    for lines, hashes in zip(pdf["lines"], pdf["hashes"]):
                        lines = np.asarray(lines, dtype=object)
                        h = np.asarray(hashes, dtype=np.int64)
                        bad = np.zeros(len(h), dtype=bool)
                        if hot_local.size and len(h):
                            idx = np.searchsorted(hot_local, h)
                            inb = idx < hot_local.size
                            bad[inb] = hot_local[idx[inb]] == h[inb]
                        kept = lines[~bad]
                        kept_join.append(delim.join(kept))
                        n_kept.append(len(kept))
                        n_rm.append(int(bad.sum()))
                    yield pd.DataFrame(
                        {
                            id_col: pdf[id_col],
                            "clean_text": kept_join,
                            "n_kept": n_kept,
                            "n_removed": n_rm,
                        }
                    )

            arr = _lines_col(df, text_col, delim)
            prepared = df.select(
                F.col(id_col),
                arr.alias("lines"),
                F.transform(arr, lambda l: F.xxhash64(l)).alias("hashes"),
            )
            return prepared.mapInPandas(clean, schema=out_schema)

    # join path: positions keep order through the rebuild
    exploded = df.select(
        F.col(id_col),
        F.posexplode(_lines_col(df, text_col, delim)).alias("pos", "line"),
    ).withColumn("line_hash", F.xxhash64("line"))
    kept = exploded.join(F.broadcast(hot), "line_hash", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            delim,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col), F.size(_lines_col(df, text_col, delim)).alias("n_total")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )
