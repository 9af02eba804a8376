"""J1 end-to-end: the reference's error-code resolution
(errors/error_resolver.py:74-113 — a per-call point SELECT on
``error_definitions`` + str.format of args, schema.sql:47-73) as a broadcast
join + vectorized format_string over a log stream."""

from pyspark.sql import functions as F

from data_ingestor_py_spark.operators.join import dict_lookup, resolve_messages

# the reference's seed rows' SHAPE (schema.sql:67-73): symb/svrt/dscr
ERROR_DEFS = [
    ("GS1001I", "I", "job %s started"),
    ("GS2002W", "W", "file %s skipped"),
    ("GS3001S", "S", "fatal failure in %s"),
]


def _dims(spark):
    return spark.createDataFrame(ERROR_DEFS, "symb string, svrt string, dscr string")


def test_resolve_error_messages_end_to_end(spark):
    logs = spark.createDataFrame(
        [("GS1001I", "loader"), ("GS3001S", "consumer"), ("GS9999X", "ghost")],
        "symb string, arg1 string",
    )
    joined = dict_lookup(logs, _dims(spark), "symb")  # left join: unknown code -> NULLs
    out = resolve_messages(joined, "dscr", "arg1")
    rows = {r["symb"]: (r["svrt"], r["message"]) for r in out.collect()}
    assert rows["GS1001I"] == ("I", "job loader started")
    assert rows["GS3001S"] == ("S", "fatal failure in consumer")
    assert rows["GS9999X"][0] is None  # unknown code passes through (left join)


def test_severity_filter_composes(spark):
    logs = spark.createDataFrame([("GS1001I",), ("GS3001S",)], "symb string")
    severe = dict_lookup(logs, _dims(spark), "symb").where(F.col("svrt") == "S")
    assert [r["symb"] for r in severe.collect()] == ["GS3001S"]