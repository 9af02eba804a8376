"""Temporal joins (as-of, bounded range) — semantics edges + plan shape."""

from pyspark.sql import functions as F

from data_ingestor_py_spark.operators.temporal import asof_join, range_self_join_counts


def _ts(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl).withColumn("ts", F.timestamp_seconds(F.col("t")))


def test_asof_backward_inclusive_and_null_before_first(spark):
    left = _ts(spark, [(1, 10, 100), (1, 20, 101), (1, 5, 102), (2, 50, 103)],
               "k long, t long, row_id long").select("k", "row_id", "ts")
    right = _ts(spark, [(1, 10, 1.0), (1, 15, 2.0), (2, 60, 9.0)],
                "k long, t long, v double").select("k", "ts", "v")
    out = asof_join(left, right, on=["k"], ts_col="ts", value_cols=["v"])
    got = {r["row_id"]: r["v"] for r in out.collect()}
    assert got[100] == 1.0  # equal timestamp is INCLUSIVE (>=)
    assert got[101] == 2.0  # most recent prior, not first
    assert got[102] is None  # before any right row -> NULL
    assert got[103] is None  # right exists only later -> NULL


def test_asof_multiple_value_cols_come_from_same_row(spark):
    left = _ts(spark, [(1, 30, 1)], "k long, t long, row_id long").select("k", "row_id", "ts")
    right = _ts(spark, [(1, 10, 1.0, "a"), (1, 20, 2.0, "b")],
                "k long, t long, v double, tag string").select("k", "ts", "v", "tag")
    r = asof_join(left, right, on=["k"], ts_col="ts", value_cols=["v", "tag"]).collect()[0]
    assert (r["v"], r["tag"]) == (2.0, "b")


def test_asof_join_single_exchange(spark):
    """The union/window carry-forward must shuffle ONCE (hash on the key)."""
    ev = spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 10).alias("ts"),
        F.col("id").alias("row_id"),
    )
    right = ev.where("row_id % 3 = 0").select("k", "ts", F.col("row_id").cast("double").alias("v"))
    out = asof_join(ev.select("k", "row_id", "ts"), right, on=["k"], ts_col="ts", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_self_join_exact_counts(spark):
    df = _ts(spark, [(1, 0, 10), (1, 50, 11), (1, 120, 12), (1, 200, 13), (2, 0, 20)],
             "k long, t long, eid long").select("k", "eid", "ts")
    out = range_self_join_counts(df, ["k"], "ts", "eid", window_s=60)
    got = {r["eid"]: r["n_neighbors"] for r in out.collect()}
    # 10@0: 50 within 60 -> 1; 11@50: 0 within, 120 at gap 70 out -> 1;
    # 12@120: 50 at gap 70 out, 200 at gap 80 out -> 0; 13@200 -> 0; 20 -> 0
    assert got == {10: 1, 11: 1, 12: 0, 13: 0, 20: 0}


def test_range_pair_counted_once_across_cell_boundary(spark):
    # two rows straddling a cell boundary (59.9 and 60.1 with 60s cells)
    df = spark.createDataFrame([(1, 59.9, 1), (1, 60.1, 2)], "k long, e double, eid long").select(
        "k", "eid", F.col("e").cast("timestamp").alias("ts")
    )
    out = range_self_join_counts(df, ["k"], "ts", "eid", window_s=60)
    got = {r["eid"]: r["n_neighbors"] for r in out.collect()}
    assert got == {1: 1, 2: 1}  # exactly once, not once per shared cell


def test_asof_matches_pandas_merge_asof_property(spark):
    """Property check vs an independent reference implementation: random
    keyed event/quote sets must agree with pandas.merge_asof (backward,
    exact matches allowed) on every row."""
    import pandas as pd

    rng_rows = []
    h = 0
    for i in range(400):  # deterministic pseudo-random, no global seed state
        h = (h * 1103515245 + 12345) & 0x7FFFFFFF
        rng_rows.append((h % 5, (h >> 8) % 1000, i))
    left_pd = pd.DataFrame(rng_rows, columns=["k", "t", "row_id"])
    right_rows = []
    for i in range(120):
        h = (h * 1103515245 + 12345) & 0x7FFFFFFF
        right_rows.append((h % 5, (h >> 8) % 1000, float(i)))
    right_pd = (
        pd.DataFrame(right_rows, columns=["k", "t", "v"])
        .groupby(["k", "t"], as_index=False)["v"].max()  # dedup like the engine requires
    )

    expected = pd.merge_asof(
        left_pd.assign(ts=pd.to_datetime(left_pd["t"], unit="s")).sort_values("ts"),
        right_pd.assign(ts=pd.to_datetime(right_pd["t"], unit="s")).sort_values("ts"),
        on="ts", by="k", direction="backward", allow_exact_matches=True,
    ).set_index("row_id")["v"].to_dict()

    left = spark.createDataFrame(left_pd, "k long, t long, row_id long").select(
        "k", "row_id", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame(right_pd, "k long, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    got = {
        r["row_id"]: r["v"]
        for r in asof_join(left, right, on=["k"], ts_col="ts", value_cols=["v"]).collect()
    }
    import math
    for rid, exp in expected.items():
        g = got[rid]
        assert (g is None and (exp is None or (isinstance(exp, float) and math.isnan(exp)))) or g == exp, (
            rid, g, exp)


def test_range_counts_match_bruteforce_property(spark):
    import itertools

    rows, h = [], 7
    for i in range(300):
        h = (h * 1103515245 + 12345) & 0x7FFFFFFF
        rows.append((h % 4, (h >> 7) % 5000, i))
    expected = {i: 0 for _, _, i in rows}
    for (k1, t1, i1), (k2, t2, i2) in itertools.permutations(rows, 2):
        if k1 == k2 and abs(t1 - t2) <= 120:
            expected[i1] += 1
    df = spark.createDataFrame(rows, "k long, t long, eid long").select(
        "k", "eid", F.timestamp_seconds("t").alias("ts")
    )
    out = range_self_join_counts(df, ["k"], "ts", "eid", window_s=120)
    got = {r["eid"]: r["n_neighbors"] for r in out.collect()}
    assert got == expected
