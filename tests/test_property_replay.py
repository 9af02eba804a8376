"""Property-based randomized replay (SURVEY §5.4): seeded random
interleavings of I/U/D events per key; invariant = final state is
last-writer-by-_seq per surviving key, independent of how the stream is
chopped into batches."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.replay import replay, split_batches
from tests.conftest import make_table

KEYS = [("r1", "a"), ("r1", "b"), ("r2", "a")]

event_st = st.tuples(
    st.integers(0, len(KEYS) - 1),  # key index
    st.sampled_from(["I", "U", "D"]),
    st.text(alphabet="abcxyz", min_size=0, max_size=6),  # content
)


def _df(spark, events):
    rows = []
    for seq, (ki, op, content) in enumerate(events):
        r, p = KEYS[ki]
        rows.append((r, p, f"c{seq}", "py", None if op == "D" else content, seq, op))
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string, _seq long, _op string",
    )
    return df.withColumn("_ts", F.timestamp_seconds(F.col("_seq"))).withColumn(
        "_content_sha256", F.sha2(F.col("content"), 256)
    ).select("repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts")


def _expected(events):
    last = {}
    for seq, (ki, op, content) in enumerate(events):
        last[KEYS[ki]] = (op, content, seq)
    return {k: (c, s) for k, (op, c, s) in last.items() if op != "D"}


@settings(max_examples=8, deadline=None)
@given(st.lists(event_st, min_size=1, max_size=30), st.integers(1, 4))
def test_random_interleavings_last_writer_wins(spark_global, tmp_path_factory, events, n_batches):
    spark = spark_global
    tmp = tmp_path_factory.mktemp("prop")
    t = make_table(spark, tmp / "t")
    df = _df(spark, events)
    replay(t, split_batches(df, n_batches, by="_seq"), prepare=None)
    got = {(r["repo"], r["path"]): (r["content"], r["_seq"]) for r in t.read().collect()}
    assert got == _expected(events)