"""Declarative data-quality expectations over CDC batches.

The reference validates input shape imperatively and row-at-a-time
(fileprocesser/file_processor.py catches per-record parse errors and
logs them; bad rows vanish into the log). Here quality rules are
*declarative per-column/row constraints* evaluated by Catalyst in one
pass, with explicit per-rule actions — the Delta-Live-Tables
expectations shape:

- ``warn``        keep the row, count the violation
- ``drop``        remove the row, count it
- ``quarantine``  remove the row AND persist it (with the names of every
                  rule it violated) for repair/replay
- ``fail``        abort the batch if any row violates (schema contract)

NULL semantics match DLT: a constraint must evaluate to TRUE to pass, so
a NULL predicate (e.g. ``value >= 0`` with NULL value) is a violation —
``NOT coalesce(pred, false)`` is the violation condition everywhere,
including the SQL oracles.

Scale shape (100 TB reading):
- Evaluation is one narrow projection: every constraint compiles into a
  single ``array_compact(array(when(...)))`` expression producing the
  per-row list of violated rule names, inside the same codegen stage as
  the scan — no shuffle, no second pass, no Python.
- Violation counts ride a ``df.observe`` accumulator on the CLEAN frame,
  so the stats are collected by whatever action consumes the batch (the
  merge itself) — zero extra jobs when no quarantine rule exists. Only
  a ``fail`` rule forces an eager (cheap, count-only) check, because
  abort must precede the merge.
- The quarantine write is per-batch ``overwrite`` into a batch-keyed
  directory — idempotent under crash re-application, the same
  discipline as the Debezium dead-letter sink.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "quarantine", "fail")
_VCOL = "_violations"


@dataclass
class Expectation:
    """One named constraint. ``constraint`` is a SQL boolean expression
    over the batch's columns; rows where it is not TRUE violate."""

    name: str
    constraint: str
    action: str = "warn"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(
                f"expectation {self.name!r}: action {self.action!r} "
                f"not in {_ACTIONS}"
            )

    def violated(self) -> Column:
        return ~F.coalesce(F.expr(self.constraint), F.lit(False))


@dataclass
class BatchQuality:
    """Per-batch outcome: violation count per rule, rows in/retained."""

    rows_in: int
    rows_retained: int
    violations: dict[str, int]
    quarantined: int = 0


class ExpectationFailed(RuntimeError):
    """A ``fail``-action rule was violated; the batch was NOT applied."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        super().__init__(
            "fail-action expectation(s) violated: "
            + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        )


class ExpectationSet:
    """A compiled set of expectations applied as one Catalyst pass."""

    def __init__(self, expectations: list[Expectation]):
        names = [e.name for e in expectations]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate expectation names: {sorted(names)}")
        self.expectations = list(expectations)

    def _by_action(self, *actions: str) -> list[Expectation]:
        return [e for e in self.expectations if e.action in actions]

    def annotate(self, df: DataFrame) -> DataFrame:
        """Add ``_violations: array<string>`` — the names of every rule
        the row violates. One narrow projection, codegen-fused with the
        scan; rule evaluation order never short-circuits, so quarantined
        rows carry the COMPLETE violation list for repair."""
        slots = [
            F.when(e.violated(), F.lit(e.name)) for e in self.expectations
        ]
        return df.withColumn(_VCOL, F.array_compact(F.array(*slots)))

    def removal_condition(self) -> Column:
        """Rows matching this leave the clean stream (drop/quarantine/
        fail actions; warn rows stay)."""
        cond = F.lit(False)
        for e in self._by_action("drop", "quarantine", "fail"):
            cond = cond | F.array_contains(F.col(_VCOL), e.name)
        return cond

    # ---------------- application ----------------

    def apply(
        self,
        df: DataFrame,
        quarantine_dir: str | None = None,
        batch_id: int = 0,
    ) -> tuple[DataFrame, Observation]:
        """Split one batch. Returns ``(clean, observation)`` where
        ``clean`` is lazy and carries an attached :class:`Observation`
        that fills with per-rule violation counts when the CALLER's
        action runs (the merge) — call :meth:`quality` with it after.

        Eager work happens only when a rule demands it: ``fail`` rules
        run one count-only aggregate (abort must precede apply);
        ``quarantine`` rules trigger the per-batch overwrite write of
        the violating rows (full rows + ``_violations``)."""
        ann = self.annotate(df)

        fails = self._by_action("fail")
        if fails:
            row = ann.select(
                *[
                    F.sum(
                        F.array_contains(F.col(_VCOL), e.name).cast("long")
                    ).alias(e.name)
                    for e in fails
                ]
            ).first()
            bad = {e.name: row[e.name] or 0 for e in fails}
            if any(bad.values()):
                raise ExpectationFailed({k: v for k, v in bad.items() if v})

        quar = self._by_action("quarantine")
        if quar and quarantine_dir is None:
            raise ValueError(
                "quarantine-action expectation(s) "
                f"{[e.name for e in quar]} require quarantine_dir — "
                "without it the rows would vanish like 'drop', defeating "
                "the repair/replay contract (use action='drop' if that is "
                "what you mean)"
            )
        if quar:
            qcond = F.lit(False)
            for e in quar:
                qcond = qcond | F.array_contains(F.col(_VCOL), e.name)
            (
                ann.where(qcond)
                .withColumn(_VCOL, F.to_json(F.col(_VCOL)))
                .write.mode("overwrite")
                .json(os.path.join(quarantine_dir, f"batch={batch_id}"))
            )

        # the CollectMetrics node attaches BELOW the removal filter, so the
        # counts cover every input row (removed ones included) while still
        # riding the caller's action — no separate counting job
        obs = Observation(f"expectations-{batch_id}")
        qhit = F.lit(False)
        for e in self._by_action("quarantine"):
            qhit = qhit | F.array_contains(F.col(_VCOL), e.name)
        observed = ann.observe(
            obs,
            F.count(F.lit(1)).alias("_rows_in"),
            F.sum(qhit.cast("long")).alias("_quarantined"),
            *[
                F.sum(
                    F.array_contains(F.col(_VCOL), e.name).cast("long")
                ).alias(e.name)
                for e in self.expectations
            ],
        )
        clean = observed.where(~self.removal_condition()).drop(_VCOL)
        return clean, obs

    def quality(self, obs: Observation, rows_retained: int) -> BatchQuality:
        """Materialize the per-batch quality report after the caller's
        action has run (``obs.get`` blocks until then).

        Guarded against the empty-batch edge (ADVICE r5 low): a caller
        that short-circuited an empty CDC batch without ever running an
        action on the clean frame leaves the observation unfilled, and
        the blocking read would wait forever. The non-blocking JVM probe
        (``getRowOrEmpty``) detects that and reports zeros — correct for
        the empty batch this path exists for, and a safe degradation (a
        zeroed report, not a hang) for a caller that asks too early."""
        jo = getattr(obs, "_jo", None)
        if jo is not None:
            try:
                unfilled = jo.getRowOrEmpty().isEmpty()
            except Exception:
                unfilled = False  # older API shape: take the blocking read
            if unfilled:
                return BatchQuality(
                    rows_in=0,
                    rows_retained=rows_retained,
                    violations={e.name: 0 for e in self.expectations},
                    quarantined=0,
                )
        got = obs.get
        return BatchQuality(
            rows_in=got["_rows_in"],
            rows_retained=rows_retained,
            violations={
                e.name: got[e.name] or 0 for e in self.expectations
            },
            quarantined=got.get("_quarantined") or 0,
        )

    # ---------------- replay integration ----------------

    def wrap_prepare(self, prepare, quarantine_dir: str | None = None):
        """Compose with a replay ``prepare(df, batch_id)``: expectations
        run on the RAW batch first (contracts are on source shape), then
        the surviving rows flow through ``prepare``. The returned
        callable is what :func:`plans.replay.replay` and the streaming
        ``foreachBatch`` consumers take."""

        def prepared(df: DataFrame, batch_id: int) -> DataFrame:
            clean, _ = self.apply(
                df, quarantine_dir=quarantine_dir, batch_id=batch_id
            )
            return prepare(clean, batch_id) if prepare is not None else clean

        return prepared
