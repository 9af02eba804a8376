"""Fallback logging (L2): never lose a batch outcome to a failing log store.

The reference guards its SQL job log with a rotating local JSON file: when
the database insert/update fails, the structured entry goes to
``fallback_logs.json`` (5 MB x 3 backups) and processing continues
(logger/sqllogger.py:20-45 ``setup_fallback_logger``, :191-245
``_fallback_log`` / ``_format_log_entry``). The engine analogue: when a
checkpoint/lineage ``put`` through the storage adapter fails (object store
outage), the replay driver writes the same structured entry to LOCAL disk —
deliberately NOT through the adapter, because the adapter is exactly what
just failed — and keeps going. Correctness is unaffected either way: the
snapshot commit already landed, and an unrecorded batch is simply
re-applied idempotently on resume; the fallback entry preserves the
observability trail (offsets, counts, durations) for the operator.

Entry shape mirrors the reference's ``_format_log_entry``: ISO-8601 UTC
timestamp, hostname, a context block, plus the caller's fields, one JSON
object per line.
"""

from __future__ import annotations

import datetime
import json
import logging
import logging.handlers
import os
import socket


class FallbackLogger:
    """Rotating JSON-lines fallback log (5 MB x 3 backups, like the
    reference's RotatingFileHandler configuration)."""

    def __init__(
        self,
        path: str,
        context: dict | None = None,
        max_bytes: int = 5 * 1024 * 1024,
        backup_count: int = 3,
    ):
        self.path = path
        self.context = context or {}
        self.backup_count = backup_count
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # a logger per file path; idempotent across instances. Keyed by
        # ABSPATH — the same key the handler-dedup below compares — so two
        # instances naming one file via different spellings (relative vs
        # absolute) share a single logger/handler instead of attaching two
        # rotating handlers to the same file (duplicate entries + broken
        # rotation accounting).
        self._logger = logging.getLogger(f"ingestor.fallback.{os.path.abspath(path)}")
        self._logger.setLevel(logging.INFO)
        self._logger.propagate = False
        if not any(
            isinstance(h, logging.handlers.RotatingFileHandler)
            and getattr(h, "baseFilename", None) == os.path.abspath(path)
            for h in self._logger.handlers
        ):
            handler = logging.handlers.RotatingFileHandler(
                path, maxBytes=max_bytes, backupCount=backup_count
            )
            handler.setFormatter(logging.Formatter("%(message)s"))
            self._logger.addHandler(handler)

    def log(self, symbol: str, message: str, **fields) -> str:
        """Append one structured entry; returns the serialized line."""
        entry = {
            "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            "host": socket.gethostname(),
            "symbol": symbol,
            "message": message,
            "context": self.context,
            **fields,
        }
        line = json.dumps(entry, default=str)
        self._logger.info(line)
        return line

    def read(self) -> list[dict]:
        """All surviving entries, oldest first. Backups are DISCOVERED on
        disk (``<path>.N``, numerically descending: oldest first, current
        file last) rather than derived from this instance's
        ``backup_count`` — the rotating handler is registered once per path
        with the FIRST instance's configuration, so a later reader with a
        smaller count must still see every file that exists."""
        out: list[dict] = []
        d = os.path.dirname(self.path) or "."
        base = os.path.basename(self.path)
        nums = []
        for f in os.listdir(d) if os.path.isdir(d) else []:
            if f.startswith(base + "."):
                suffix = f[len(base) + 1:]
                if suffix.isdigit():
                    nums.append(int(suffix))
        candidates = [f"{self.path}.{i}" for i in sorted(nums, reverse=True)] + (
            [self.path] if os.path.exists(self.path) else []
        )
        for p in candidates:
            with open(p) as f:
                for ln in f:
                    ln = ln.strip()
                    if ln:
                        out.append(json.loads(ln))
        return out
