"""Corpus-level line dedup: hand-computed removals, order preservation,
method equivalence (broadcast probe vs SQL-style join), boundary df."""

from puddsketch_spark.ops.boilerplate import dedup_lines, line_doc_freq


def _corpus(spark):
    boiler = "COPYRIGHT 2024 ACME"
    nav = "home | about | contact"
    docs = [
        (1, f"{boiler}\nunique first doc line\n{nav}\nanother unique line"),
        (2, f"{boiler}\nsecond doc content\n{nav}"),
        (3, f"{boiler}\nthird doc content"),
        (4, "totally clean document\nwith two lines"),
        (5, f"{boiler}\n{boiler}\nrepeated boiler inside one doc"),
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_line_doc_freq_distinct_docs(spark):
    df = _corpus(spark)
    freqs = {r.line_hash: r.df for r in line_doc_freq(df).collect()}
    # boiler appears in 4 docs (doc 5's duplicate counts once), nav in 2
    assert sorted(freqs.values(), reverse=True)[:2] == [4, 2]


def test_dedup_lines_semantics_and_order(spark):
    df = _corpus(spark)
    out = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in dedup_lines(df, max_doc_count=2, method="join").collect()
    }
    # boiler (df=4) removed everywhere incl. BOTH copies in doc 5;
    # nav (df=2) kept: threshold is strict 'more than'
    assert out[1] == (
        "unique first doc line\nhome | about | contact\nanother unique line",
        3,
        1,
    )
    assert out[2] == ("second doc content\nhome | about | contact", 2, 1)
    assert out[3] == ("third doc content", 1, 1)
    assert out[4] == ("totally clean document\nwith two lines", 2, 0)
    assert out[5] == ("repeated boiler inside one doc", 1, 2)


def test_dedup_lines_methods_identical(spark):
    df = _corpus(spark)
    j = sorted(dedup_lines(df, 2, method="join").collect())
    b = sorted(dedup_lines(df, 2, method="broadcast").collect())
    assert j == b


def test_dedup_lines_fully_removed_doc(spark):
    df = _corpus(spark)
    out = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in dedup_lines(df, max_doc_count=1, method="broadcast").collect()
    }
    # at threshold 1 both boiler (df=4) and nav (df=2) go; content stays
    assert out[3] == ("third doc content", 1, 1)
    # a doc whose every line is hot comes back empty, not missing
    df2 = dedup_lines(
        df.where("doc_id in (1, 2, 3)").selectExpr(
            "doc_id", "split(text, '\\n')[0] as text"
        ),
        max_doc_count=1,
        method="join",
    )
    got = {r.doc_id: (r.clean_text, r.n_kept) for r in df2.collect()}
    assert got == {1: ("", 0), 2: ("", 0), 3: ("", 0)}
