"""Exact substring deduplication: find and strip verbatim-repeated
spans across a corpus (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499).

The paper's ExactSubstr dedup builds a corpus-wide suffix array and
removes every substring of >= L tokens that occurs more than once. A
suffix array is a single sorted view of the whole corpus — inherently
single-machine (their implementation memory-maps the full text). The
distributed re-expression used by the large-scale replications is
k-gram span marking, built entirely from shuffles Spark already does
well:

1. tokenize each document, emit every overlapping k-gram with its
   (doc_id, position) — a map-only explode, O(tokens) rows;
2. count k-gram occurrences corpus-wide (one groupBy — the only big
   shuffle; the key is an 8-byte ``xxhash64`` of the gram by default,
   so shuffle bytes stay ~16B/row at any corpus size);
3. a k-gram seen more than once marks its k token positions duplicated
   in EVERY document carrying it; merged runs of marked positions are
   exactly the paper's "duplicated substrings of length >= k" (a
   repeated span of length m >= k is repeated in all m-k+1 of its
   k-grams, and conversely every marked position sits inside some
   repeated k-gram).

Fidelity notes, stated rather than hidden:

- ``by="hash"`` (default) trades exactness for shuffle width: two
  DIFFERENT grams colliding in xxhash64 would over-mark. At web scale
  the standard answer is a 128-bit hash; here the text mode exists and
  the parity test pins hash == text on real data.
- The strip policy removes ALL occurrences of a duplicated span
  (including the first). The paper removes all-but-one; choosing the
  surviving occurrence needs a global argmin per duplicate cluster —
  an extra shuffle that changes nothing about which SPANS are
  duplicated. ``keep="none"`` is the only v1 policy and is documented
  in the API.

Reference parity: the reference engine has no substring dedup; its only
dedup is row-identity (fileprocesser/file_processor.py re-inserts
whole records). This operator exists for the training-data pipeline the
engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "duplicated_kgram_positions",
    "duplicated_span_stats",
    "strip_duplicated_spans",
]


def _grams(docs: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, pos, gram) for every overlapping k-gram; pos is 0-based
    token position. Documents shorter than k tokens emit nothing (no
    substring of length >= k exists in them)."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.split(F.col(text_col), r"\s+").alias("_t"),
    ).where(F.size("_t") >= k)
    return toks.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - k),
                lambda i: F.array_join(F.slice("_t", i + 1, k), " "),
            )
        ).alias("pos", "gram"),
    )


def duplicated_kgram_positions(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    by: str = "hash",
) -> DataFrame:
    """(doc_id, pos) of every k-gram whose text occurs more than once in
    the corpus (counting multiplicity — twice in one document counts).

    ``by="hash"``: the corpus-wide count groups on ``xxhash64(gram)``
    (8-byte shuffle key — the 100-TB shape); ``by="text"`` groups on the
    gram itself (exact, wide keys). Both run the same single
    aggregate-then-filter plan with a map-side partial count.
    """
    if by not in ("hash", "text"):
        raise ValueError(f"by must be 'hash' or 'text', got {by!r}")
    g = _grams(docs, text_col, id_col, k)
    key = F.xxhash64("gram") if by == "hash" else F.col("gram")
    g = g.select("_id", "pos", key.alias("_gk"))
    dup_keys = (
        g.groupBy("_gk").agg(F.count(F.lit(1)).alias("_n")).where("_n > 1")
    )
    return (
        g.join(dup_keys.select("_gk"), "_gk")
        .select(F.col("_id").alias(id_col), "pos")
    )


def _marked(dup_pos: DataFrame, id_col: str, k: int) -> DataFrame:
    """Distinct duplicated token positions per doc: each duplicated
    k-gram at pos marks [pos, pos+k)."""
    return dup_pos.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("tp"),
    ).distinct()


def duplicated_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    by: str = "hash",
) -> DataFrame:
    """Per-document duplication accounting: (id, n_tokens, dup_tokens,
    n_spans). ``dup_tokens`` counts token positions inside any
    corpus-duplicated substring of >= k tokens; ``n_spans`` counts the
    maximal such substrings (merged runs of marked positions — the
    window is per-document, so the sort is within each doc's handful of
    rows, never global). Documents with no duplication report zeros."""
    dup = duplicated_kgram_positions(docs, text_col, id_col, k, by)
    m = _marked(dup, id_col, k)
    w = Window.partitionBy(id_col).orderBy("tp")
    runs = m.select(
        id_col,
        "tp",
        F.when(
            F.col("tp") - F.lag("tp", 1, -2).over(w) != 1, F.lit(1)
        ).otherwise(F.lit(0)).alias("_newrun"),
    )
    per_doc = runs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_tokens"),
        F.sum("_newrun").alias("n_spans"),
    )
    base = docs.select(
        id_col,
        F.size(F.split(F.col(text_col), r"\s+")).alias("n_tokens"),
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
    )


def strip_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    by: str = "hash",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Rewrite each document with every corpus-duplicated span (>= k
    tokens, ALL occurrences — see module docstring) removed; surviving
    tokens are re-joined with single spaces. Adds ``out_col``; documents
    with nothing duplicated keep their token stream verbatim."""
    dup = duplicated_kgram_positions(docs, text_col, id_col, k, by)
    kept_mask = (
        _marked(dup, id_col, k)
        .groupBy(id_col)
        .agg(F.collect_set("tp").alias("_dup_tps"))
    )
    toks = docs.withColumn("_t", F.split(F.col(text_col), r"\s+"))
    joined = toks.join(kept_mask, id_col, "left")
    cleaned = F.array_join(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - 1),
                lambda i: F.when(
                    F.array_contains(
                        F.coalesce(
                            F.col("_dup_tps"), F.array().cast("array<bigint>")
                        ),
                        i.cast("bigint"),
                    ),
                    F.lit(None).cast("string"),
                ).otherwise(F.element_at("_t", i + 1)),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    return joined.withColumn(out_col, cleaned).drop("_t", "_dup_tps")
