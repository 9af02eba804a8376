"""BM25 ranked retrieval with an incrementally-maintained inverted index.

The LLM-data-pipeline retrieval operator the reference lacks entirely
(its closest surface is row filtering in fileprocesser/file_processor.py):
score documents against term queries with Okapi BM25 and keep the per-term
corpus statistics FRESH as document change batches land, instead of
rebuilding the index per query.

Spark-first decomposition — the "index" is not a special structure, it is
three DataFrame shapes the optimizer already handles:

- *postings* ``(term, doc_id, tf)``: explode + groupBy — one shuffle keyed
  on (doc, term), recomputable map-side per doc, never stored;
- *document frequencies* ``(term, df)``: a COUNT aggregate over the
  per-doc DISTINCT term explosion — at rest this is an
  :class:`plans.mv.IncrementalAggregate` with a ``row_transform``, so
  each CDC batch folds only the changed docs' term deltas (an update's
  unchanged terms cancel between the −1 old image and the +1 new image);
- *corpus totals* ``(N, total_len)``: a one-group COUNT/SUM MV.

Scoring joins the (small, broadcast) query-term list against the
postings, so only rows containing a query term are ever scored; the
per-document fold sums term contributions in sorted-term order, making
float summation DETERMINISTIC — the property the oracle gate needs and
an unordered ``sum()`` of doubles cannot give.

Two idf flavors:

- ``idf="ln"``   — Okapi/Lucene ``ln(1 + (N - df + .5)/(df + .5))``, the
  production default;
- ``idf="sqrt"`` — ``sqrt((2N − 2df + 1)/(2df + 1))``, same monotone
  damping shape but built ONLY from correctly-rounded IEEE ops (integer
  arithmetic, one divide, one sqrt), so Spark and any SQL oracle agree
  bit-for-bit (``ln`` carries no cross-libm rounding guarantee). The
  portable flavor pins ``k1=1.2, b=0.75`` and evaluates the tf component
  as one integer-ratio divide:
  ``22·tf·L / (10·tf·L + 3·L + 9·dl·N)`` where ``L`` is the corpus token
  count — exactly ``tf(k1+1)/(tf + k1(1−b+b·dl/avgdl))`` scaled by
  ``10·L``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_py_spark.functions.text import tokens
from data_ingestor_py_spark.plans.mv import IncrementalAggregate
from data_ingestor_py_spark.plans.target import TargetTable


def doc_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, term, tf, dl)`` — term frequencies plus doc length."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        # NULL text -> empty token list (size() of NULL is -1 in legacy
        # mode / NULL in ANSI — both wrong for a length)
        F.coalesce(tokens(text_col), F.array()).alias("_ts"),
    ).select("doc_id", F.size("_ts").cast("long").alias("dl"), F.explode("_ts").alias("term"))
    return base.groupBy("doc_id", "term", "dl").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def term_dfreq(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(term, df)`` — number of documents containing each term."""
    return (
        df.select(
            F.explode(F.array_distinct(tokens(text_col))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )


def corpus_totals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[int, int]:
    """``(N, total_len)`` — corpus document and token counts."""
    row = df.select(
        F.size(F.coalesce(tokens(text_col), F.array())).cast("long").alias("dl")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("L")).first()
    return int(row["n"]), int(row["L"] or 0)


def _query_frame(spark: SparkSession, queries: dict[str, list[str]]) -> DataFrame:
    rows = [(q, t) for q, ts in sorted(queries.items()) for t in sorted(set(ts))]
    return spark.createDataFrame(rows, "query_id string, term string")


def bm25_topk(
    docs: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "ln",
    id_col: str = "doc_id",
    text_col: str = "text",
    dfreq: DataFrame | None = None,
    totals: tuple[int, int] | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``dfreq``/``totals`` default to a full-corpus computation; pass the
    maintained tables (see :class:`IncrementalIndex`) to score against an
    index that folds CDC batches instead of rescanning the corpus.

    Plan shape: the query list is tiny → broadcast to the postings join,
    so the corpus scan scores only rows whose term matches some query
    term (predicate-pushed through the explode); ``df`` joins on term
    (broadcast — vocabulary of the HIT terms only); top-k per query is a
    ``row_number`` window Spark executes as WindowGroupLimit (partial
    top-k map-side, no global sort)."""
    if idf not in ("ln", "sqrt"):
        raise ValueError(f"idf {idf!r} not in ('ln', 'sqrt')")
    if idf == "sqrt" and (k1, b) != (1.2, 0.75):
        raise ValueError("portable sqrt-idf flavor pins k1=1.2, b=0.75")
    spark = docs.sparkSession
    post = doc_postings(docs, id_col, text_col)
    dfreq = dfreq if dfreq is not None else term_dfreq(docs, id_col, text_col)
    n_docs, total_len = (
        totals if totals is not None else corpus_totals(docs, id_col, text_col)
    )
    q = _query_frame(spark, queries)

    hits = (
        post.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq), "term")
    )
    n, L = F.lit(n_docs).cast("long"), F.lit(total_len).cast("long")
    if idf == "sqrt":
        idf_c = F.sqrt(
            (2 * n - 2 * F.col("df") + 1).cast("double")
            / (2 * F.col("df") + 1).cast("double")
        )
        tf_c = (22 * F.col("tf") * L).cast("double") / (
            10 * F.col("tf") * L + 3 * L + 9 * F.col("dl") * n
        ).cast("double")
    else:
        idf_c = F.log(
            1.0
            + (n.cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        # dl/avgdl with avgdl = L/N, kept as dl*N/L
        dl_ratio = F.col("dl") * n.cast("double") / F.lit(float(total_len))
        tf_c = (F.col("tf") * (k1 + 1.0)) / (
            F.col("tf") + k1 * (1.0 - b + b * dl_ratio)
        )
    contrib = hits.select(
        "query_id",
        "doc_id",
        "term",
        (idf_c * tf_c).alias("c"),
    )
    folded = contrib.groupBy("query_id", "doc_id").agg(
        # sorted-term fold => deterministic float summation order
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        folded.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score", "n_terms_hit")
    )


class IncrementalIndex:
    """Inverted-index corpus statistics maintained from a document
    :class:`TargetTable`'s changelog.

    Two ``row_transform`` MVs under ``root``:

    - ``root/df``     — ``(term) -> n_rows`` = document frequency, via the
      per-doc DISTINCT term explosion;
    - ``root/totals`` — one group: ``n_rows`` = N, ``total_len`` = corpus
      token count.

    Each :meth:`refresh` folds only the changed documents' term deltas
    (manifest-pruned changelog, O(batch·terms-per-doc)); both MVs inherit
    crash-idempotent folds and reseed from the MV machinery. At 10^10
    docs the alternative — re-aggregating the corpus per batch — is the
    anti-pattern this module exists to kill."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: TargetTable,
        text_col: str = "text",
        _create: bool = False,
        num_buckets: int = 8,
    ):
        self.spark = spark
        self.root = root
        self.source = source
        self.text_col = text_col
        mk = IncrementalAggregate.create if _create else IncrementalAggregate

        def distinct_terms(df: DataFrame) -> DataFrame:
            return df.select(
                F.explode(F.array_distinct(tokens(text_col))).alias("term")
            )

        def doc_lengths(df: DataFrame) -> DataFrame:
            return df.select(
                F.lit("corpus").alias("_all"),
                F.size(F.coalesce(tokens(text_col), F.array()))
                .cast("long").alias("dl"),
            )

        kw = {"num_buckets": num_buckets} if _create else {}
        self.dfreq_mv = mk(
            spark, f"{root}/df", source,
            group_cols=["term"], row_transform=distinct_terms, **kw,
        )
        self.totals_mv = mk(
            spark, f"{root}/totals", source,
            group_cols=["_all"], sum_cols=[("total_len", "dl")],
            row_transform=doc_lengths,
            **({"num_buckets": 1} if _create else {}),
        )

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        source: TargetTable,
        text_col: str = "text",
        num_buckets: int = 8,
    ) -> "IncrementalIndex":
        return cls(
            spark, root, source, text_col,
            _create=True, num_buckets=num_buckets,
        )

    def refresh(self, upto_version: int | None = None) -> None:
        self.dfreq_mv.refresh(upto_version=upto_version)
        self.totals_mv.refresh(upto_version=upto_version)

    def dfreq(self) -> DataFrame:
        return self.dfreq_mv.read().select(
            "term", F.col("n_rows").alias("df")
        )

    def totals(self) -> tuple[int, int]:
        row = self.totals_mv.read().first()
        if row is None:
            return 0, 0
        return int(row["n_rows"]), int(row["total_len"])

    def bm25_topk(
        self, queries: dict[str, list[str]], k: int = 10,
        id_type: str = "string", **kw
    ) -> DataFrame:
        """Score against the CURRENT table state using the MAINTAINED
        df/N/L statistics (per-doc tf/dl are recomputed map-side from the
        scored rows themselves — they are per-row facts, not corpus
        state, so there is nothing to maintain). ``id_type`` casts the
        (string-stored) key for the rank tiebreak — pass ``"long"`` for
        numeric ids, or lexicographic order breaks ties ('10' < '2')."""
        docs = self.source.read().select(
            F.col(self.source._load()["key_cols"][0])
            .cast(id_type).alias("doc_id"),
            F.col(self.text_col).alias("text"),
        )
        return bm25_topk(
            docs, queries, k=k,
            dfreq=self.dfreq(), totals=self.totals(), **kw,
        )
