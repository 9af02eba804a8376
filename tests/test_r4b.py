"""Round-4b: bigram LM quality metrics, Debezium dead-letter capture, and
MV refresh over a STREAMING-written source table."""

from collections import Counter

from pyspark.sql import functions as F

from data_ingestor_py_spark.functions.text import bigram_lm_metrics
from data_ingestor_py_spark.plans.mv import IncrementalAggregate
from data_ingestor_py_spark.sources.debezium import dead_letters, parse_debezium
from data_ingestor_py_spark.sources.generator import change_events
from data_ingestor_py_spark.streaming.stream_replay import stream_replay
from tests.conftest import make_table

ROW_FIELDS = [("repo", "string"), ("path", "string"), ("value", "double")]


def test_bigram_lm_metrics_vs_python(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    corpus = Counter()
    per_doc = {}
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t]
        grams = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
        per_doc[r["doc_id"]] = grams
        corpus.update(grams)
    known = {g for g, c in corpus.items() if c >= 5}
    out = {r["doc_id"]: r for r in bigram_lm_metrics(docs).collect()}
    assert set(out) == set(per_doc)
    for doc_id, grams in per_doc.items():
        n_known = sum(1 for g in grams if g in known)
        o = out[doc_id]
        assert (o["n_bigrams"], o["n_known"]) == (len(grams), n_known), doc_id
        assert o["is_fluent"] == (len(grams) > 0 and n_known * 5 > len(grams) * 4)


def test_bigram_lm_flags_gibberish(spark):
    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    docs = spark.createDataFrame(
        base + [(100, "zxq wvu tsr qpo nml kji")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_metrics(docs, min_count=5).collect()}
    assert out[0]["is_fluent"]
    assert not out[100]["is_fluent"] and out[100]["n_known"] == 0


def test_dead_letters_complement_parse(spark):
    lines = [
        ('{"op":"c","after":{"repo":"r","path":"p","value":1.0},"ts_ms":1,'
         '"source":{"lsn":1,"table":"t"}}',),
        ("",),                      # tombstone: neither parsed nor dead
        ("   ",),                   # whitespace-only: tombstone-equivalent
        ("garbage {{{",),           # dead letter
        ('{"no_op_field": 1}',),    # dead letter
        (None,),                    # null value: tombstone-equivalent
    ]
    df = spark.createDataFrame(lines, "value string")
    parsed = parse_debezium(df, ROW_FIELDS)
    dead = dead_letters(df, ROW_FIELDS)
    assert parsed.count() == 1
    assert sorted(r["raw"] for r in dead.collect()) == [
        "garbage {{{", '{"no_op_field": 1}'
    ]


def test_non_row_ops_and_imageless_records_quarantined(spark):
    """Debezium 't' (truncate) / 'm' (message) envelopes and c/u records
    missing their row image must never merge a phantom NULL-key row; they
    are dead letters, not change events."""
    lines = [
        ('{"op":"t","ts_ms":5,"source":{"lsn":5,"table":"t"}}',),
        ('{"op":"m","ts_ms":6,"source":{"lsn":6,"table":"t"}}',),
        ('{"op":"u","ts_ms":7,"source":{"lsn":7,"table":"t"}}',),  # no after
        ('{"op":"d","ts_ms":8,"source":{"lsn":8,"table":"t"}}',),  # no before
        ('{"op":"c","after":{"repo":"r","path":"p","value":1.0},"ts_ms":9,'
         '"source":{"lsn":9,"table":"t"}}',),
    ]
    df = spark.createDataFrame(lines, "value string")
    parsed = parse_debezium(df, ROW_FIELDS)
    assert [r["_seq"] for r in parsed.collect()] == [9]
    assert dead_letters(df, ROW_FIELDS).count() == 4


def test_lsn_strict_mode_quarantines_unsequenced(spark):
    """ts_ms seqs and LSN seqs are not comparable; LSN-strict mode routes
    lsn-less records to dead letters instead of merging a foreign
    ordering."""
    lines = [
        ('{"op":"u","after":{"repo":"r","path":"p","value":2.0},"ts_ms":777}',),
        ('{"op":"u","after":{"repo":"r","path":"q","value":3.0},"ts_ms":1,'
         '"source":{"lsn":42,"table":"t"}}',),
    ]
    df = spark.createDataFrame(lines, "value string")
    lenient = parse_debezium(df, ROW_FIELDS)
    assert sorted(r["_seq"] for r in lenient.collect()) == [42, 777]
    strict = parse_debezium(df, ROW_FIELDS, ts_ms_fallback=False)
    assert [r["_seq"] for r in strict.collect()] == [42]
    dead = dead_letters(df, ROW_FIELDS, ts_ms_fallback=False)
    assert dead.count() == 1 and '"ts_ms":777' in dead.collect()[0]["raw"]


def test_mv_gap_raises_and_reseed_recovers(spark, tmp_path):
    """Expiring source snapshots from under a lagging MV raises
    RefreshGapError; reseed() rebuilds at the current version and
    incremental refresh then resumes."""
    import pytest as _pytest

    from data_ingestor_py_spark.plans.replay import replay, split_batches
    from data_ingestor_py_spark.plans.mv import RefreshGapError

    t = make_table(spark, tmp_path / "src", num_buckets=4)
    ev = change_events(spark, 3000, n_repos=10, paths_per_repo=10, seed=77)
    prep = lambda df, _e=0: df.withColumn(  # noqa: E731
        "_content_sha256", F.sha2(F.col("content"), 256)
    ).select("repo", "path", "commit", "lang", "content", "_content_sha256",
             "_seq", "_op", "_ts")
    batches = split_batches(ev, 3)
    replay(t, batches[:1], prepare=prep)
    mv = IncrementalAggregate.create(
        spark, str(tmp_path / "mv"), t,
        group_cols=["lang"], sum_cols=[("sum_seq", "_seq")],
    )
    mv.refresh()
    # source advances 2 more snapshots, then retention drops the MV's base
    replay(t, batches, prepare=prep)
    t.expire_snapshots(keep_last=1)
    with _pytest.raises(RefreshGapError):
        mv.refresh()
    mv.refresh(auto_reseed=True)
    got = sorted(tuple(r) for r in mv.read().collect())
    assert got == sorted(tuple(r) for r in mv.recompute().collect())
    # incremental path works again after the reseed
    ev2 = change_events(spark, 1000, n_repos=10, paths_per_repo=10, seed=78)
    t.merge_apply(prep(ev2))
    mv.refresh()
    got = sorted(tuple(r) for r in mv.read().collect())
    assert got == sorted(tuple(r) for r in mv.recompute().collect())


def test_on_batch_end_skipped_when_checkpoint_falls_back(spark, tmp_path):
    """The hook contract is 'after the checkpoint is DURABLE': when the
    checkpoint write lands in the L2 fallback log instead, the hook must
    NOT fire — it fires on the resume re-application, exactly once per
    durable commit."""
    from data_ingestor_py_spark.plans.checkpoint import Checkpoint
    from data_ingestor_py_spark.plans.replay import replay, split_batches

    t = make_table(spark, tmp_path / "t", num_buckets=4)
    ev = change_events(spark, 1200, n_repos=8, paths_per_repo=8, seed=55)
    prep = lambda df, _e=0: df.withColumn(  # noqa: E731
        "_content_sha256", F.sha2(F.col("content"), 256)
    ).select("repo", "path", "commit", "lang", "content", "_content_sha256",
             "_seq", "_op", "_ts")

    class FlakyCheckpoint(Checkpoint):
        fail_ids = {1}

        def commit(self, rec):
            if rec.batch_id in self.fail_ids:
                raise OSError("metadata store down")
            super().commit(rec)

    fired = []
    batches = split_batches(ev, 3)
    cp = FlakyCheckpoint(spark, t.root, storage=t.io)
    replay(t, batches, prepare=prep, checkpoint=cp,
           on_batch_end=lambda i, tb, r: fired.append(i))
    assert fired == [0, 2]  # batch 1's checkpoint fell back -> no hook
    # resume with a healthy store: only batch 1 re-applies, hook fires once
    replay(t, batches, prepare=prep,
           on_batch_end=lambda i, tb, r: fired.append(i))
    assert fired == [0, 2, 1]


def test_mv_refresh_over_streamed_table(spark, tmp_path):
    """The MV folds changelogs regardless of HOW the source snapshots were
    produced: a streaming replay's epochs refresh identically to batch."""
    ev = change_events(spark, 2000, n_repos=10, paths_per_repo=10, seed=41)
    src = str(tmp_path / "events")
    ev.repartition(2).write.parquet(src)
    t = make_table(spark, tmp_path / "t")
    schema = (
        "event_id long, repo string, path string, commit string, _seq long, "
        "_op string, _ts timestamp, lang string, content string, _schema_version int"
    )
    prep = lambda df, _e=0: df.withColumn(  # noqa: E731
        "_content_sha256", F.sha2(F.col("content"), 256)
    ).select("repo", "path", "commit", "lang", "content", "_content_sha256",
             "_seq", "_op", "_ts")
    q = stream_replay(spark, src, schema, t, prepare=prep,
                      checkpoint_dir=str(tmp_path / "cp"), max_files_per_trigger=1)
    q.awaitTermination(120)
    mv = IncrementalAggregate.create(
        spark, str(tmp_path / "mv"), t,
        group_cols=["lang"], sum_cols=[("sum_seq", "_seq")],
    )
    mv.refresh()
    got = sorted(tuple(r) for r in mv.read().collect())
    want = sorted(tuple(r) for r in mv.recompute().collect())
    assert got == want and got


def test_stream_on_epoch_end_mv_refresh(spark, tmp_path):
    """Per-epoch MV maintenance over a live stream: the on_epoch_end hook
    fires after each durable epoch checkpoint and the MV tracks every
    intermediate snapshot exactly."""
    ev = change_events(spark, 1500, n_repos=8, paths_per_repo=8, seed=61)
    src = str(tmp_path / "events")
    ev.repartition(2).write.parquet(src)
    t = make_table(spark, tmp_path / "t")
    schema = (
        "event_id long, repo string, path string, commit string, _seq long, "
        "_op string, _ts timestamp, lang string, content string, _schema_version int"
    )
    prep = lambda df, _e=0: df.withColumn(  # noqa: E731
        "_content_sha256", F.sha2(F.col("content"), 256)
    ).select("repo", "path", "commit", "lang", "content", "_content_sha256",
             "_seq", "_op", "_ts")
    mv = IncrementalAggregate.create(
        spark, str(tmp_path / "mv"), t,
        group_cols=["lang"], sum_cols=[("sum_seq", "_seq")],
    )
    checks = []

    def on_end(epoch, table, rec):
        mv.refresh()
        got = sorted(tuple(r) for r in mv.read().collect())
        want = sorted(tuple(r) for r in mv.recompute().collect())
        checks.append(got == want)

    q = stream_replay(spark, src, schema, t, prepare=prep,
                      checkpoint_dir=str(tmp_path / "cp"),
                      max_files_per_trigger=1, on_epoch_end=on_end)
    q.awaitTermination(120)
    assert len(checks) >= 2 and all(checks)
    assert mv.synced_version() == t._load()["version"]
