"""Physical-plan quality gates + table maintenance (time travel, expiry).

SURVEY §4: pushdown/pruning/codegen are free if the plan stays declarative —
these tests pin that property so regressions (a UDF sneaking into the hot
path, a filter not reaching the scan) fail loudly.
"""

from pyspark.sql import functions as F

from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import SF_DIR, make_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").where(
        (F.col("l_quantity") > 40) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_scan(spark):
    from data_ingestor_py_spark.specs import ColumnMapping, MappingSpec

    spec = MappingSpec(1, (ColumnMapping("l_orderkey", "order_id", "long"),))
    df = spec.apply(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))
    plan = _plan(df)
    # the 11-column table must be scanned with a 1-column ReadSchema
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_hot_path_stays_jvm_side(spark):
    """Text/similarity pipelines must contain NO Python eval nodes (the
    higher-order-function expressions are JVM CodegenFallback, not UDFs)."""
    from data_ingestor_py_spark.functions.similarity import minhash_signature
    from data_ingestor_py_spark.functions.text import quality_metrics

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (quality_metrics(docs), docs.select(minhash_signature("text"))):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan or "text:string" in plan


def test_aggregate_pipeline_whole_stage_codegen(spark):
    """Plain relational pipelines compile to WholeStageCodegen spans."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    df.collect()  # AQE finalizes the plan on execution
    plan = _plan(df)
    assert "*(1)" in plan  # WholeStageCodegen span markers
    assert "HashAggregate" in plan and "partial_sum" in plan  # map-side combine


def test_merge_has_single_exchange(spark, tmp_path):
    """One shuffle per merge batch: the written plan history should show the
    window merge with exactly one Exchange (plus the tiny discovery agg)."""
    t = make_table(spark, tmp_path / "t", num_buckets=4)
    ev = change_events(spark, 500, n_repos=5, paths_per_repo=5, seed=2)
    prep = ev.withColumn("_content_sha256", F.sha2("content", 256)).select(
        "repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"
    )
    t.merge_apply(prep)
    # reconstruct the merge plan shape (state ∪ batch → window) and count shuffles
    from data_ingestor_py_spark.plans.target import _bucket_expr
    from pyspark.sql import Window

    state = t.read_raw().withColumn("bkt", _bucket_expr(["repo", "path"], 4))
    uni = state.unionByName(prep.withColumn("bkt", _bucket_expr(["repo", "path"], 4)))
    w = Window.partitionBy("bkt").orderBy("repo", "path", F.desc("_seq"))
    out = uni.withColumn("rn", F.row_number().over(w)).where("rn=1")
    n_exchanges = _plan(out).count("Exchange")
    assert n_exchanges == 1, _plan(out)


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 300, n_repos=5, paths_per_repo=5, seed=8)
    prep = lambda df: df.withColumn("_content_sha256", F.sha2("content", 256)).select(  # noqa: E731
        "repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"
    )
    s1 = t.merge_apply(prep(ev.where("event_id < 150")))
    h1 = t.snapshot_hash()
    t.merge_apply(prep(ev.where("event_id >= 150")))
    assert t.snapshot_hash() != h1
    old = t.read_version(s1.snapshot_version)
    from data_ingestor_py_spark.functions.content import table_state_hash

    assert table_state_hash(old) == h1


def test_expire_snapshots_keeps_current_readable(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 400, n_repos=5, paths_per_repo=5, seed=8)
    prep = lambda df: df.withColumn("_content_sha256", F.sha2("content", 256)).select(  # noqa: E731
        "repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"
    )
    for i in range(3):
        t.merge_apply(prep(ev.where(f"event_id % 3 = {i}")))
    h = t.snapshot_hash()
    t.expire_snapshots(keep_last=0)
    assert t.snapshot_hash() == h  # current snapshot fully readable after GC

def test_ivf_corpus_assignment_has_no_exchange(spark):
    """IVF cell assignment must be a pure per-row expression over the
    broadcast centroid list — the r1 window version shuffled corpus x
    n_lists rows. Only the final per-query top-k window may shuffle, and
    the query->corpus join must be a broadcast."""
    from data_ingestor_py_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = ivf_topk(emb.where("vec_id < 8"), emb, k=5, n_lists=8, n_probe=3)
    plan = _plan(df)
    # exactly ONE shuffle in the whole query: the final top-k window
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_build_vocab_shrinks_before_ranking_window(spark):
    """The corpus-wide distinct-token set must never funnel through one
    task: the top_k cut compiles to TakeOrderedAndProject (per-partition
    local top-k), and the global row_number window runs AFTER it — a plan
    where the Window's child is the full aggregate would OOM at 100 TB."""
    from data_ingestor_py_spark.functions.text import build_vocab

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(build_vocab(docs, top_k=100))
    assert "TakeOrderedAndProject" in plan, plan
    # the shrink happens below the window: TakeOrderedAndProject must appear
    # AFTER (deeper than) the Window node in the plan string
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan


def test_window_topk_uses_window_group_limit(spark):
    """Per-group top-k via row_number must keep the WindowGroupLimit partial
    pushdown (each map task pre-prunes to k rows per group before the
    shuffle) — without it the full table sorts through the window."""
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    df = (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    plan = _plan(df)
    assert plan.count("WindowGroupLimit") >= 2, plan  # partial + final
