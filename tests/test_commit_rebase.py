"""Disjoint-bucket commit rebase (TargetTable._rebase_merge_commit).

Parallel ingest writers sharded by key range touch disjoint buckets but
contend on the single version CAS; a lost race must cost a manifest
retry, not a full re-merge — and must NEVER change final state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import CommitConflict, TargetTable


def _mk(spark, tmp_path, name="t"):
    return TargetTable.create(
        spark, str(tmp_path / name),
        key_cols=["id"],
        columns=[("val", "long")],
        num_buckets=8,
    )


def _ids_by_bucket(spark, n=400, buckets=8):
    rows = spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(buckets))
        .cast("int")
        .alias("b"),
    ).collect()
    out: dict[int, list[str]] = {}
    for r in rows:
        out.setdefault(r["b"], []).append(r["id"])
    return out


def _batch(spark, ids, seq0, val0=0):
    return spark.createDataFrame(
        [(i, val0 + n, seq0 + n) for n, i in enumerate(ids)],
        "id string, val long, _seq long",
    ).select(
        "id", "val", "_seq", F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    )


def _inject_conflict(loser: TargetTable, competing_commit):
    """Make ``loser``'s NEXT commit lose its first CAS: run the competing
    commit right before the loser's first _commit_manifest call."""
    orig = TargetTable._commit_manifest
    state = {"fired": False}

    def wrapper(self, m):
        if self is loser and not state["fired"]:
            state["fired"] = True
            competing_commit()
        return orig(self, m)

    return wrapper, state


def test_disjoint_conflict_rebases_without_recompute(spark, tmp_path, monkeypatch):
    by_b = _ids_by_bucket(spark)
    ids_a = by_b[0] + by_b[1]          # writer A: buckets {0, 1}
    ids_b = by_b[4] + by_b[5]          # writer B: buckets {4, 5}
    t = _mk(spark, tmp_path)
    other = TargetTable(spark, t.root)

    writes = {"n": 0}
    orig_write = TargetTable._write_snap_dir

    def counting_write(self, *a, **kw):
        writes["n"] += 1
        return orig_write(self, *a, **kw)

    wrapper, state = _inject_conflict(
        t, lambda: other.merge_apply(_batch(spark, ids_b, 1000), stats="light")
    )
    monkeypatch.setattr(TargetTable, "_commit_manifest", wrapper)
    monkeypatch.setattr(TargetTable, "_write_snap_dir", counting_write)
    st = t.merge_apply(_batch(spark, ids_a, 2000), stats="light")
    assert state["fired"]
    # A wrote its snap dir exactly once (the competitor once too): the
    # lost CAS cost a manifest rebase, not a second merge/write
    assert writes["n"] == 2
    m = t._load()
    assert m["version"] == st.snapshot_version == 2
    assert m["history"][-1].get("rebased") is True
    # both writers' rows are live and exact
    got = {r["id"]: (r["val"], r["_seq"]) for r in t.read().collect()}
    assert len(got) == len(ids_a) + len(ids_b)
    for n, i in enumerate(ids_a):
        assert got[i] == (n, 2000 + n)
    for n, i in enumerate(ids_b):
        assert got[i] == (n, 1000 + n)


def test_overlapping_conflict_recomputes(spark, tmp_path, monkeypatch):
    """Competing commit touches one of OUR buckets: rebase must refuse
    (the state we merged against is stale) and the outer retry recomputes
    against the winner — max-seq semantics keep the result exact."""
    by_b = _ids_by_bucket(spark)
    ids_a = by_b[0] + by_b[1]
    ids_b = by_b[1] + by_b[2]          # overlaps bucket 1
    t = _mk(spark, tmp_path)
    other = TargetTable(spark, t.root)

    wrapper, state = _inject_conflict(
        t, lambda: other.merge_apply(_batch(spark, ids_b, 1000), stats="light")
    )
    monkeypatch.setattr(TargetTable, "_commit_manifest", wrapper)
    t.merge_apply(_batch(spark, ids_a, 5000), stats="light")
    assert state["fired"]
    m = t._load()
    assert m["version"] == 2
    assert not m["history"][-1].get("rebased")
    got = {r["id"]: r["_seq"] for r in t.read().collect()}
    # overlap keys: A's seq (5000+) wins over B's (1000+)
    for n, i in enumerate(ids_a):
        assert got[i] == 5000 + n
    b_only = [i for i in ids_b if i not in set(ids_a)]
    assert all(1000 <= got[i] < 2000 for i in b_only)


def test_config_change_conflict_recomputes(spark, tmp_path, monkeypatch):
    """A concurrent schema evolution is never rebase-safe."""
    by_b = _ids_by_bucket(spark)
    t = _mk(spark, tmp_path)
    other = TargetTable(spark, t.root)

    wrapper, state = _inject_conflict(
        t, lambda: other.evolve(add=[("extra", "string")])
    )
    monkeypatch.setattr(TargetTable, "_commit_manifest", wrapper)
    t.merge_apply(_batch(spark, by_b[0], 100), stats="light")
    assert state["fired"]
    m = t._load()
    assert not m["history"][-1].get("rebased")
    # the merged rows are present under the evolved schema
    assert t.read().where(F.col("val").isNotNull()).count() == len(by_b[0])


def test_rebase_refuses_when_output_dir_swept(spark, tmp_path):
    """If a concurrent expire reclaimed the candidate dir during the
    conflict window, rebase must bail to a recompute, never commit a
    manifest pointing at deleted data."""
    t = _mk(spark, tmp_path)
    t.merge_apply(_batch(spark, ["a", "b"], 1), stats="light")
    m = t._load()
    cand = {**m, "version": m["version"] + 1}
    with pytest.raises(CommitConflict, match="reclaimed"):
        t._rebase_merge_commit(
            {**cand, "history": [{"op": "merge"}],
             "buckets": dict(m["buckets"])},
            base_entries={},
            rel="snap-999999-deadbeef",   # never existed
            app_meta=None,
        )


def test_real_concurrent_disjoint_writers_converge(spark, tmp_path):
    """Two ACTUAL concurrent writers (threads, separate TargetTable
    handles) on disjoint key ranges: both commits must land (one may
    rebase, one may recompute — either is legal), versions are distinct,
    and the final state is the exact union."""
    import threading

    by_b = _ids_by_bucket(spark)
    ids_a = by_b[0] + by_b[1] + by_b[2]
    ids_b = by_b[5] + by_b[6] + by_b[7]
    t = _mk(spark, tmp_path)
    errs = []

    def run(ids, seq0):
        try:
            w = TargetTable(spark, t.root)
            w.merge_apply(_batch(spark, ids, seq0), stats="light")
        except Exception as e:  # noqa: BLE001 - surfaced below
            errs.append(e)

    th_a = threading.Thread(target=run, args=(ids_a, 1000))
    th_b = threading.Thread(target=run, args=(ids_b, 2000))
    th_a.start(); th_b.start()
    th_a.join(300); th_b.join(300)
    assert not errs, errs
    m = t._load()
    assert m["version"] == 2  # both commits landed as distinct versions
    got = {r["id"]: r["_seq"] for r in t.read().collect()}
    assert len(got) == len(ids_a) + len(ids_b)
    for n, i in enumerate(ids_a):
        assert got[i] == 1000 + n
    for n, i in enumerate(ids_b):
        assert got[i] == 2000 + n
