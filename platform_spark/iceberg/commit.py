"""Pluggable table-commit protocols — the catalog's one job.

An Iceberg commit is, at bottom, a compare-and-swap of the table's
current-metadata pointer: "publish THIS metadata as version N+1 iff the
current version is still N". Everything else in the layer (staged data
files, content-unique manifest lists, per-writer staging prefixes) is
already safe under concurrency without any coordination; the pointer
swap is the single primitive that needs one. Real Iceberg delegates it
to a catalog (Hive lock, DynamoDB conditional put, REST CAS, JDBC row
version); the reference commits through iceberg-go's catalog the same
way (iceberg-processor/internal/sink/iceberg.go:146-204, conflict
reload at iceberg.go:183-195).

Four implementations ship:

- :class:`FilesystemCommit` (the default) — HadoopTables-style
  exclusive-create of ``metadata/v{N}.metadata.json`` plus an advisory
  ``version-hint.text``. Correct on POSIX filesystems (local disk, NFS
  with O_EXCL, HDFS); NOT correct on S3, which has no atomic
  create-if-absent over a shared name.
- :class:`CasCommit` — a reference compare-and-swap pointer table
  (process-local, lock-guarded). Metadata files land under
  writer-unique names so the WRITE can never conflict; only the pointer
  swap decides the winner — exactly the shape of a DynamoDB/REST/JDBC
  catalog, so a real object-store deployment implements `current` +
  `commit` against its service and drops it in here.
- :class:`LockedPointerCommit` — the DURABLE cross-process form of the
  same protocol: the (version, path) pointer is a json file and the
  compare-and-swap runs under an ``fcntl.flock`` critical section, so
  independent OS processes (a streaming sink, a maintenance job, an
  ad-hoc backfill) can commit to one table concurrently with no shared
  Python state. Metadata still lands under writer-unique names; the
  pointer file is the only contended object. Correct wherever flock is
  (local disk, most NFSv4).
- :class:`ConditionalPutCommit` — the same pointer protocol with the
  flock section swapped for an object store's conditional put
  (If-None-Match create / If-Match etag replace — S3 conditional
  writes, GCS generations, DynamoDB conditional puts). Ships with
  :class:`EtagObjectStore`, the in-memory double the hammer tests run
  against; a real deployment implements the two-method get/put surface
  over its service and nothing else changes.

Losers raise :class:`CommitConflict`; every caller in
:mod:`platform_spark.iceberg.table` already refreshes and retries or
recomputes on that signal, so the retry semantics are identical across
protocols.
"""

from __future__ import annotations

import json
import os
import threading
import uuid


class CommitConflict(Exception):
    """Another writer committed the metadata version we targeted."""


def _meta_dir(location: str) -> str:
    return os.path.join(os.path.abspath(location).rstrip("/"), "metadata")


class CommitProtocol:
    """The two operations a table-commit backend must provide."""

    def current(self, location: str) -> tuple[int, str] | None:
        """(version, metadata_path) of the table's current metadata, or
        None when no table exists at ``location``."""
        raise NotImplementedError

    def commit(self, location: str, expected_version: int, metadata: dict) -> str:
        """Atomically publish ``metadata`` as version
        ``expected_version + 1`` iff the table is still at
        ``expected_version``; returns the published metadata file's path.
        Raises :class:`CommitConflict` when another writer got there
        first — the caller refreshes and retries/recomputes."""
        raise NotImplementedError


class FilesystemCommit(CommitProtocol):
    """HadoopTables commit: ``open(v{N}.metadata.json, "x")`` IS the CAS
    (the name encodes the expected version; POSIX exclusive-create admits
    exactly one winner), then an advisory version-hint rewrite. This is
    the default and matches the on-disk layout external HadoopTables
    readers expect."""

    def current(self, location: str) -> tuple[int, str] | None:
        meta_dir = _meta_dir(location)
        hint = os.path.join(meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            return None
        with open(hint) as f:
            version = int(f.read().strip())
        # the hint may lag a concurrent commit (it's advisory in the
        # spec): roll forward to the newest existing version
        while os.path.exists(os.path.join(meta_dir, f"v{version + 1}.metadata.json")):
            version += 1
        return version, os.path.join(meta_dir, f"v{version}.metadata.json")

    def commit(self, location: str, expected_version: int, metadata: dict) -> str:
        meta_dir = _meta_dir(location)
        path = os.path.join(meta_dir, f"v{expected_version + 1}.metadata.json")
        try:
            with open(path, "x") as f:
                json.dump(metadata, f, indent=1)
        except FileExistsError as e:
            raise CommitConflict(path) from e
        tmp = os.path.join(meta_dir, "version-hint.text.tmp")
        with open(tmp, "w") as f:
            f.write(str(expected_version + 1))
        os.replace(tmp, os.path.join(meta_dir, "version-hint.text"))
        return path


class CasCommit(CommitProtocol):
    """Reference catalog-style commit: metadata writes under a
    writer-UNIQUE name (never contended), then a lock-guarded
    compare-and-swap of the (version, path) pointer decides the winner —
    the exact protocol shape of a DynamoDB conditional put or an Iceberg
    REST catalog's ``updateTable``, usable on stores with no O_EXCL.

    The pointer table lives in this object, so every reader/writer of a
    table must share ONE CasCommit instance (a real implementation
    replaces the dict + lock with its service and becomes cross-process
    for free). Loser metadata files are removed eagerly — they were
    never visible."""

    def __init__(self) -> None:
        self._pointers: dict[str, tuple[int, str]] = {}
        self._lock = threading.Lock()

    @staticmethod
    def _key(location: str) -> str:
        return os.path.abspath(location).rstrip("/")

    def current(self, location: str) -> tuple[int, str] | None:
        with self._lock:
            return self._pointers.get(self._key(location))

    def commit(self, location: str, expected_version: int, metadata: dict) -> str:
        meta_dir = _meta_dir(location)
        os.makedirs(meta_dir, exist_ok=True)
        path = os.path.join(
            meta_dir,
            f"v{expected_version + 1}-{uuid.uuid4().hex[:12]}.metadata.json",
        )
        with open(path, "w") as f:  # unique name: the write cannot conflict
            json.dump(metadata, f, indent=1)
        key = self._key(location)
        with self._lock:
            cur = self._pointers.get(key, (0, ""))[0]
            if cur != expected_version:
                os.remove(path)
                raise CommitConflict(
                    f"{key}: expected v{expected_version}, catalog at v{cur}"
                )
            self._pointers[key] = (expected_version + 1, path)
        return path


class LockedPointerCommit(CommitProtocol):
    """Durable cross-PROCESS compare-and-swap: the pointer lives in
    ``metadata/catalog-pointer.json`` and both operations run inside an
    ``fcntl.flock`` exclusive section on ``metadata/catalog.lock``. The
    critical section is tiny (read pointer, compare, ``os.replace`` the
    new pointer) — metadata json, manifests and data files are all
    written OUTSIDE it under writer-unique names, so lock hold time is
    independent of commit size. A crash inside the section leaves either
    the old or the new pointer (os.replace is atomic) and the flock dies
    with the process, so no cleanup or lease expiry is needed.

    This is the deployment shape for multi-writer tables on a shared
    POSIX filesystem (the reference's analogue is its iceberg-go catalog
    against a real service, iceberg-processor/internal/sink/iceberg.go:
    146-204): a streaming CDC sink, a maintenance cron and ad-hoc
    backfills in separate OS processes all commit through the same
    pointer with losers raising :class:`CommitConflict` exactly like the
    in-process protocols."""

    _POINTER = "catalog-pointer.json"
    _LOCK = "catalog.lock"

    def _locked(self, location: str, shared: bool = False):
        import fcntl
        from contextlib import contextmanager

        meta_dir = _meta_dir(location)
        os.makedirs(meta_dir, exist_ok=True)
        mode = fcntl.LOCK_SH if shared else fcntl.LOCK_EX

        @contextmanager
        def section():
            with open(os.path.join(meta_dir, self._LOCK), "a+") as lk:
                fcntl.flock(lk.fileno(), mode)
                try:
                    yield meta_dir
                finally:
                    fcntl.flock(lk.fileno(), fcntl.LOCK_UN)

        return section()

    def _read_pointer(self, meta_dir: str) -> tuple[int, str] | None:
        p = os.path.join(meta_dir, self._POINTER)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        return d["version"], d["path"]

    def current(self, location: str) -> tuple[int, str] | None:
        # SHARED lock for the pure read (r11 ADVICE): concurrent
        # refreshers/pollers no longer serialize against each other —
        # only against a writer mid-swap, and even that is belt-and-
        # braces since the pointer swap itself is an atomic os.replace.
        with self._locked(location, shared=True) as meta_dir:
            return self._read_pointer(meta_dir)

    def commit(self, location: str, expected_version: int, metadata: dict) -> str:
        meta_dir = _meta_dir(location)
        os.makedirs(meta_dir, exist_ok=True)
        path = os.path.join(
            meta_dir,
            f"v{expected_version + 1}-{uuid.uuid4().hex[:12]}.metadata.json",
        )
        with open(path, "w") as f:  # unique name: the write cannot conflict
            json.dump(metadata, f, indent=1)
        with self._locked(location) as md:
            cur = self._read_pointer(md)
            cur_version = cur[0] if cur else 0
            if cur_version != expected_version:
                os.remove(path)
                raise CommitConflict(
                    f"{location}: expected v{expected_version}, "
                    f"catalog at v{cur_version}"
                )
            tmp = os.path.join(md, self._POINTER + f".{uuid.uuid4().hex[:8]}.tmp")
            with open(tmp, "w") as f:
                json.dump({"version": expected_version + 1, "path": path}, f)
            os.replace(tmp, os.path.join(md, self._POINTER))
        return path


class PreconditionFailed(Exception):
    """The object store rejected a conditional write: the precondition
    (If-Match etag / If-None-Match create) no longer held."""


class EtagObjectStore:
    """In-memory conditional-put object store — the test double for the
    S3 deployment shape. Mimics the PUBLIC semantics of S3 conditional
    writes (``If-None-Match: *`` create-if-absent, ``If-Match: <etag>``
    replace-if-unchanged) / GCS generation preconditions / DynamoDB
    conditional puts: every successful put yields a fresh opaque etag,
    and a conditional put whose precondition no longer holds raises
    :class:`PreconditionFailed` atomically. One instance stands for the
    bucket; thread-safe, so threaded hammers model concurrent clients
    of the real service."""

    def __init__(self) -> None:
        self._objects: dict[str, tuple[str, str]] = {}
        self._lock = threading.Lock()

    def get(self, key: str) -> tuple[str, str] | None:
        """(body, etag) or None when the key does not exist."""
        with self._lock:
            return self._objects.get(key)

    def put(
        self,
        key: str,
        body: str,
        *,
        if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        """Conditional write; returns the new etag. ``if_none_match``
        succeeds only when the key is absent (S3 ``If-None-Match: *``);
        ``if_match`` only when the stored etag still equals it."""
        with self._lock:
            cur = self._objects.get(key)
            if if_none_match and cur is not None:
                raise PreconditionFailed(f"{key}: already exists")
            if if_match is not None and (cur is None or cur[1] != if_match):
                raise PreconditionFailed(f"{key}: etag moved")
            etag = uuid.uuid4().hex
            self._objects[key] = (body, etag)
            return etag


class ConditionalPutCommit(CommitProtocol):
    """The object-store deployment of the pointer protocol —
    :class:`LockedPointerCommit`'s docstring claims "an S3 deployment
    swaps the flock section for its service's conditional put, nothing
    else changes"; this class IS that swap, as a tested seam. The
    pointer lives at ``<location>/metadata/catalog-pointer.json`` in a
    conditional-put object store (:class:`EtagObjectStore` in tests; a
    real S3/GCS/DynamoDB client implements the same two-method get/put
    surface); metadata json still lands on shared storage under
    writer-unique names OUTSIDE the swap, exactly as in every other
    protocol.

    The retry semantics a real backend must honor, pinned by the
    threaded hammer in tests/test_iceberg.py:

    1. GET the pointer: (body, etag) — or absent for a new table.
    2. Version in the body != the caller's expected version →
       :class:`CommitConflict` immediately (fast fail, no write).
    3. Conditional PUT of the new pointer: ``If-None-Match`` when no
       pointer existed, else ``If-Match: <etag from step 1>``.
    4. :class:`PreconditionFailed` → another writer swapped between
       steps 1 and 3 → :class:`CommitConflict`; the loser's unique
       metadata file is removed (it was never visible).

    No lock is held anywhere, and ``current()`` is a plain GET — reads
    never contend with writers or each other."""

    _POINTER = "catalog-pointer.json"

    def __init__(self, store: EtagObjectStore) -> None:
        self._store = store

    def _key(self, location: str) -> str:
        return os.path.join(_meta_dir(location), self._POINTER)

    @staticmethod
    def _parse(body: str) -> tuple[int, str]:
        d = json.loads(body)
        return d["version"], d["path"]

    def current(self, location: str) -> tuple[int, str] | None:
        got = self._store.get(self._key(location))
        return self._parse(got[0]) if got else None

    def commit(self, location: str, expected_version: int, metadata: dict) -> str:
        meta_dir = _meta_dir(location)
        os.makedirs(meta_dir, exist_ok=True)
        path = os.path.join(
            meta_dir,
            f"v{expected_version + 1}-{uuid.uuid4().hex[:12]}.metadata.json",
        )
        with open(path, "w") as f:  # unique name: the write cannot conflict
            json.dump(metadata, f, indent=1)
        key = self._key(location)
        got = self._store.get(key)
        cur_version = self._parse(got[0])[0] if got else 0
        if cur_version != expected_version:
            os.remove(path)
            raise CommitConflict(
                f"{location}: expected v{expected_version}, "
                f"catalog at v{cur_version}"
            )
        body = json.dumps({"version": expected_version + 1, "path": path})
        try:
            if got is None:
                self._store.put(key, body, if_none_match=True)
            else:
                self._store.put(key, body, if_match=got[1])
        except PreconditionFailed as e:
            os.remove(path)
            raise CommitConflict(
                f"{location}: pointer moved between read and swap"
            ) from e
        return path
