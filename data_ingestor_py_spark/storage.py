"""Storage adapters: the commit protocol's three durability primitives.

Everything the engine does for durability — the optimistic manifest commit
(`plans/target.py`), the main-pointer swap, and the driver-side checkpoint/
lineage appends (`plans/checkpoint.py`) — reduces to three object-storage
primitives:

- ``get(key)``            read an object's bytes (``None`` if absent);
- ``put(key, data)``      atomic full-object overwrite — a reader sees the
                          old bytes or the new bytes, never a mix;
- ``put_if_absent(key, data)`` atomic all-or-nothing conditional create —
                          exactly one concurrent caller wins, and the object
                          either appears with its COMPLETE payload or not at
                          all (no partially-written token can ever exist).

``TargetTable._commit_manifest`` = ``put_if_absent`` of the per-version
manifest (the CAS claim) + ``put`` of the main pointer; a stale/backwards
pointer is repaired by ``_load``'s roll-forward, so the pointer ``put`` may
be last-writer-wins with no ordering guarantee — exactly what S3 offers.
Spark-written DATA files (bucket parquet) go through Spark's own Hadoop
filesystem layer, which already speaks s3a/gs/abfs; these adapters cover
only the metadata the driver writes itself.

Two adapters:

- :class:`PosixStorage` — directory-native local filesystem. ``put`` is
  write-tmp + fsync + ``os.replace``; ``put_if_absent`` is write-tmp +
  fsync + ``os.link`` (an atomic no-overwrite publish, so a writer crashing
  mid-write leaves only a ``.tmp-*`` orphan, never a partial token — this
  closes the r2 advisory's "unparseable token wedges the version forever"
  window by construction).
- :class:`ConditionalPutStorage` — the object-store contract (S3 / GCS):
  ``put_if_absent`` models ``PUT If-None-Match: *`` (S3) /
  ``ifGenerationMatch=0`` (GCS); ``put`` models a plain PUT. The contract
  deliberately excludes rename, O_EXCL-style open file handles, and real
  directories (``list`` is a prefix scan); server-side atomicity is
  emulated locally with hardlink publication from hidden staging names.
  A real deployment swaps ONLY this class for one doing HTTP conditional
  PUTs — the engine above sees the identical three primitives, which is
  the claim `tests/test_concurrency.py` proves by running the full
  multi-writer suite against both adapters.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class StorageError(OSError):
    """Adapter-defined storage failure. Real HTTP backends should wrap
    transport/service errors (timeouts, 5xx, throttling) in this so callers
    can catch *storage* failures — the L2 fallback guard in the replay
    drivers catches ``OSError`` (which this subclasses, and which also
    covers local-FS and pyarrow IO errors) and deliberately NOT bare
    ``Exception``: a schema mismatch or serialization bug must surface, not
    be downgraded to a fallback-log line forever."""


class StorageAdapter:
    """Base: shared local-emulation mechanics; subclasses fix the contract.

    Keys are slash-separated paths (absolute local paths in this sandbox;
    bucket keys in a real object store)."""

    # -- the three core primitives -------------------------------------

    def get(self, key: str) -> bytes | None:
        try:
            with open(key, "rb") as f:
                return f.read()
        except (FileNotFoundError, IsADirectoryError):
            return None

    def put(self, key: str, data: bytes) -> None:
        """Atomic full-object overwrite (plain PUT)."""
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, key)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomic conditional create; True iff this caller created the
        object. All-or-nothing: the object is published by a hardlink to an
        already-complete, fsync'd staging file, so no reader (and no crash)
        can ever observe a partial payload under ``key``."""
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, key)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    # -- auxiliary metadata ops ------------------------------------------

    def exists(self, key: str) -> bool:
        return os.path.exists(key)

    def list(self, prefix: str) -> list[str]:
        """Keys under ``prefix`` (a 'directory'), staging names excluded."""
        if not os.path.isdir(prefix):
            return []
        return sorted(
            os.path.join(prefix, f)
            for f in os.listdir(prefix)
            if ".tmp-" not in f
        )

    def delete(self, key: str) -> None:
        """Idempotent delete — deleting an absent object is a no-op (matches
        S3 DELETE semantics; also makes concurrent GC/compaction races
        harmless)."""
        try:
            os.remove(key)
        except FileNotFoundError:
            pass

    def list_dirs(self, prefix: str) -> list[str]:
        """First-level 'directory' names under ``prefix`` — the S3/GCS
        delimiter-listing *common prefixes* shape (``delimiter='/'``). The
        data plane (snapshot GC, written-bucket discovery) uses this instead
        of ``os.listdir`` so a real object-store adapter overrides one
        method, not the engine."""
        if not os.path.isdir(prefix):
            return []
        return sorted(
            d for d in os.listdir(prefix)
            if ".tmp-" not in d and os.path.isdir(os.path.join(prefix, d))
        )

    def delete_prefix(self, prefix: str) -> int:
        """Delete every object under ``prefix`` (S3 batch-delete /
        list-then-delete shape). Idempotent; returns objects removed. The
        local emulation also drops the now-empty directory skeleton (real
        object stores have no directories to clean)."""
        n = 0
        for root, _dirs, files in os.walk(prefix):
            for f in files:
                self.delete(os.path.join(root, f))
                n += 1
        import shutil

        shutil.rmtree(prefix, ignore_errors=True)
        return n

    def sweep_staging(self, prefix: str, grace_s: float = 10.0) -> int:
        """Remove staging orphans older than ``grace_s`` left by crashed
        writers. The grace period protects a LIVE concurrent writer's
        in-flight staging file (the r2 advisory's unconditional-sweep race).
        Returns the number removed."""
        n = 0
        if not os.path.isdir(prefix):
            return 0
        now = time.time()
        for f in os.listdir(prefix):
            if ".tmp-" not in f:
                continue
            p = os.path.join(prefix, f)
            try:
                if now - os.stat(p).st_mtime > grace_s:
                    os.remove(p)
                    n += 1
            except FileNotFoundError:
                continue
        return n

    def reclaim_stale_token(self, key: str, grace_s: float = 10.0) -> bool:
        """Backend-specific repair hook for a CAS token that lost the race:
        may remove ``key`` if it is provably garbage from a dead writer (so
        a retry can claim the version). Returns True if reclaimed."""
        return False

    def mtime(self, key: str) -> float | None:
        """Last-modified time of a key/prefix, or None if unknown — used
        by grace-period sweeps (an object-store adapter takes this from
        the listing's LastModified; callers must treat None as 'not
        sweepable yet', never as 'infinitely old')."""
        try:
            return os.stat(key).st_mtime
        except OSError:
            return None


class PosixStorage(StorageAdapter):
    """Local-filesystem adapter (the default; also the shape of HDFS).

    ``put_if_absent`` publishes via hardlink, so tokens written by THIS
    version of the engine are never partial. ``reclaim_stale_token`` still
    repairs tokens that are empty or unparseable-and-old — garbage from a
    pre-seam writer version or from external corruption — so a wedged
    version number can always be reclaimed after the grace period."""

    def reclaim_stale_token(self, key: str, grace_s: float = 10.0) -> bool:
        try:
            st = os.stat(key)
        except FileNotFoundError:
            return False
        if time.time() - st.st_mtime <= grace_s:
            return False  # possibly a live writer (pre-seam partial write)
        if st.st_size == 0:
            return self._delete_if_unchanged(key, st)
        try:
            raw = self.get(key)
            if raw is not None:
                json.loads(raw)
            return False  # complete, valid token: a real committed version
        except (json.JSONDecodeError, UnicodeDecodeError):
            return self._delete_if_unchanged(key, st)

    @staticmethod
    def _delete_if_unchanged(key: str, st0: os.stat_result) -> bool:
        """Conditional delete guarding the inspect->remove TOCTOU: between
        judging the token garbage and removing it, a concurrent loser may
        have reclaimed the key and a retrying writer re-claimed it with a
        VALID committed manifest — an unconditional delete would then drop a
        committed version token. Re-stat and require the identity captured
        BEFORE parsing ((ino, mtime_ns, size)) to still match; a fresh token
        is always a NEW inode (put_if_absent publishes via hardlink from a
        staging file), so any replacement fails the comparison."""
        try:
            st1 = os.stat(key)
        except FileNotFoundError:
            return False  # someone else already reclaimed it
        if (st1.st_ino, st1.st_mtime_ns, st1.st_size) != (
            st0.st_ino, st0.st_mtime_ns, st0.st_size
        ):
            return False  # replaced since inspection — not ours to touch
        try:
            os.remove(key)
        except FileNotFoundError:
            return False
        return True


class ConditionalPutStorage(StorageAdapter):
    """Object-store contract (S3 conditional PUT / GCS generation match).

    The engine may call ONLY the object API: get / put / put_if_absent /
    exists / list / delete. No rename, no open-file handles, no mkdir —
    ``put`` here stands in for a plain ``PUT`` (last-writer-wins, atomic
    object replace) and ``put_if_absent`` for ``PUT If-None-Match: *``.
    Object-store uploads are all-or-nothing server-side, so there is no
    such thing as a partial token: ``reclaim_stale_token`` is the inherited
    no-op, and ``sweep_staging`` is a no-op too (staging is server-internal).

    The local emulation publishes objects from hidden staging names via
    hardlink/replace — that pair of lines is the stand-in for the HTTP
    request a real backend adapter would make; nothing above this class
    changes when it is swapped out.
    """

    def sweep_staging(self, prefix: str, grace_s: float = 10.0) -> int:
        # multipart-upload leftovers are the object store's own problem
        # (lifecycle rules), never visible in the key namespace
        return 0
