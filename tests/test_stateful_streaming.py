"""Custom stateful operator: streaming sessionization keeps per-key state
across micro-batches and emits closed sessions."""

from pyspark.sql import functions as F


def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    from data_ingestor_py_spark.streaming.stateful import sessionize_stream

    # state-store init cost is per (partition x batch): keep partitions tiny
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    src = str(tmp_path / "ev")
    # batch 1: user 1 has a session then a 1h gap opens a second session
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
         (1, "2024-01-01 02:00:00"), (2, "2024-01-01 00:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts")).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    sessions = sessionize_stream(stream, gap_s=1800)
    out_dir = str(tmp_path / "out")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    # availableNow + ProcessingTimeTimeout keeps the query alive waiting for
    # state timeouts — wait for the data pass, then stop explicitly
    q.awaitTermination(30)
    q.stop()

    # batch 2 (new file): user 1's open session gets more events, then a gap
    # event closes the earlier one
    spark.createDataFrame(
        [(1, "2024-01-01 02:05:00"), (1, "2024-01-01 05:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts")).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = (
        sessionize_stream(
            spark.readStream.schema("user_id long, ts timestamp").parquet(src), gap_s=1800
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(30)
    q.stop()

    spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    got = spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    ).parquet(out_dir)
    closed = {(r["user_id"], r["n_events"]) for r in got.collect()}
    # user 1's first session (2 events) closed by the 02:00 event; the
    # 02:00+02:05 session (2 events) closed by the 05:00 event
    assert (1, 2) in closed
    assert got.where("user_id = 1").count() >= 2