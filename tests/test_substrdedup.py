"""Exact substring dedup (functions/substrdedup.py) — k-gram span
marking re-expression of Lee et al. 2022 ExactSubstr."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_py_spark.functions.substrdedup import (
    duplicated_kgram_positions,
    duplicated_span_stats,
    strip_duplicated_spans,
)

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_known_cross_doc_span(spark):
    """One 6-token span shared verbatim by two docs, k=4: the span's
    positions (and ONLY those) are marked in both docs; stats and strip
    agree with the hand computation."""
    span = "the quick brown fox jumps high"
    rows = [
        (1, f"alpha beta {span} gamma delta"),
        (2, f"zero {span} one two three four"),
        (3, "nothing here is repeated at all ever"),
    ]
    df = _docs(spark, rows)
    pos = {
        (r["doc_id"], r["pos"])
        for r in duplicated_kgram_positions(df, k=4).collect()
    }
    # doc 1: span tokens at 2..7 -> k-grams at 2,3,4; doc 2: span at 1..6
    assert pos == {(1, 2), (1, 3), (1, 4), (2, 1), (2, 2), (2, 3)}
    stats = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"])
        for r in duplicated_span_stats(df, k=4).collect()
    }
    assert stats == {1: (10, 6, 1), 2: (11, 6, 1), 3: (7, 0, 0)}
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in strip_duplicated_spans(df, k=4).collect()
    }
    assert out[1] == "alpha beta gamma delta"
    assert out[2] == "zero one two three four"
    assert out[3] == rows[2][1]


def test_within_doc_repeat_counts(spark):
    """Multiplicity inside ONE document counts as duplication (the
    paper's count is corpus-wide occurrences, not distinct docs)."""
    df = _docs(spark, [(1, "a b c d e X Y a b c d e"), (2, "unrelated "
                       "words only in this row")])
    stats = {
        r["doc_id"]: (r["dup_tokens"], r["n_spans"])
        for r in duplicated_span_stats(df, k=5).collect()
    }
    assert stats[1] == (10, 2)  # both copies of "a b c d e"
    assert stats[2] == (0, 0)


def test_long_span_merges_overlapping_grams(spark):
    """A repeated span of length m > k yields ONE merged span of m
    marked tokens, not m-k+1 fragments."""
    span = " ".join(f"t{i}" for i in range(12))
    df = _docs(spark, [(1, f"{span} tail-one"), (2, f"head-two {span}")])
    stats = {
        r["doc_id"]: (r["dup_tokens"], r["n_spans"])
        for r in duplicated_span_stats(df, k=4).collect()
    }
    assert stats == {1: (12, 1), 2: (12, 1)}


def test_short_docs_emit_nothing(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])  # 3 tokens < k=4
    assert duplicated_kgram_positions(df, k=4).count() == 0
    stats = duplicated_span_stats(df, k=4).collect()
    assert all(r["dup_tokens"] == 0 and r["n_spans"] == 0 for r in stats)


def test_hash_mode_equals_text_mode_on_real_docs(spark):
    """The 8-byte-shuffle-key mode must agree with the exact-text mode
    on the real documents fixture (collisions at this scale would be a
    generator bug worth hearing about)."""
    docs = spark.read.parquet(SF_DOCS)
    h = duplicated_span_stats(docs, k=8, by="hash")
    t = duplicated_span_stats(docs, k=8, by="text")
    assert h.exceptAll(t).isEmpty() and t.exceptAll(h).isEmpty()
    # fixture really contains duplication
    assert h.where("dup_tokens > 0").count() > 0


def test_strip_removes_exactly_the_marked_tokens(spark):
    docs = spark.read.parquet(SF_DOCS)
    joined = (
        strip_duplicated_spans(docs, k=8)
        .select(
            "doc_id",
            F.size(F.split("text", r"\s+")).alias("before"),
            F.when(F.col("text_deduped") == "", F.lit(0))
            .otherwise(F.size(F.split("text_deduped", r"\s+")))
            .alias("after"),
        )
        .join(duplicated_span_stats(docs, k=8), "doc_id")
    )
    assert joined.where(
        F.col("before") - F.col("after") != F.col("dup_tokens")
    ).count() == 0
