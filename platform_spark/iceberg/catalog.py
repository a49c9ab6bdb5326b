"""KAFSQL over Iceberg tables: a duck-typed TopicCatalog whose topics are
pure-Python Iceberg v2 tables (one table per topic, envelope schema).

The reference's ETL output IS an Iceberg table (iceberg-processor
internal/sink/iceberg.go) — and its users then query that output. This
module closes the loop the same way KfsTopicCatalog (kfs.py:692) does
for native segments: ``KafSqlEngine(IcebergTopicCatalog(spark, root))``
runs every KAFSQL query shape DIRECTLY against the committed Iceberg
tables — metadata-planned scans, snapshot isolation, merge-on-read
deletes — with no conversion step.

Layout: ``root/<topic>/`` is an Iceberg table whose schema is the topic
envelope (``_topic _partition _offset _ts _key _value _headers
_segment``), identity-partitioned by ``_partition`` (mirroring the
parquet topic layout, so `_partition =` filters prune files) and
optionally day-partitioned on ``_ts`` for time-bounded queries
(LAST/BETWEEN prune by ingest day).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from platform_spark.iceberg.table import IcebergTable, append_dataframe
from platform_spark.topics import IMPLICIT_COLUMNS


def materialize_topic_to_iceberg(
    df: DataFrame,
    root: str,
    name: str,
    partition_by: tuple[str, ...] = ("_partition",),
) -> IcebergTable:
    """Commit a topic envelope DataFrame into ``root/name`` as one append
    snapshot (create-if-missing) — the batch analogue of the streaming
    Iceberg sink, and the conversion step from parquet topics to
    Iceberg-backed ones. Pass ``("_partition", "days(_ts)")`` for the
    time-partitioned corpus layout."""
    loc = os.path.join(root, name)
    df = df.select(*IMPLICIT_COLUMNS)
    if IcebergTable.exists(loc):
        table = IcebergTable.load(loc)
    else:
        table = IcebergTable.create(loc, df.schema, partition_by=partition_by)
    append_dataframe(table, df)
    return table


class IcebergTopicCatalog:
    """Duck-typed TopicCatalog over a directory of Iceberg topic tables:
    ``KafSqlEngine(IcebergTopicCatalog(spark, root))`` gives the full
    KAFSQL dialect (projection, `_partition`/`_offset`/`_ts` bounds,
    LAST/TAIL/WITHIN, joins, aggregates, json helpers) over committed
    Iceberg snapshots.

    Notes vs the parquet catalog: reads are metadata-planned (manifest →
    file list; row-level deletes merge on read), so a query sees exactly
    one snapshot; scan budgeting uses the engine's envelope-view fallback
    (raw_source_path → None), like KfsTopicCatalog."""

    #: declared scan-hook capabilities (compiler.scan_capabilities reads
    #: this FIRST) — honored by both topic_scan and estimate_topic_scan,
    #: so wrapping either hook in a decorator can't silently break time
    #: travel's loud-rejection contract or the key_eq bucket prune
    topic_scan_capabilities = frozenset(
        {
            "partition", "ts_min", "ts_max", "offset_min", "offset_max",
            "key_eq", "as_of", "snapshot_id", "ref",
            "with_schema_columns",
        }
    )

    def __init__(self, spark: SparkSession, root: str, configs: dict | None = None):
        self.spark = spark
        self.root = root
        self.configs = configs or {}
        self._materialized: dict[str, str] = {}
        self.cache_root = None
        #: version-keyed metadata memo (r14 verdict #4): one query used
        #: to parse the table's metadata JSON 2-3 times (validation's
        #: plans_key_lookup, the budget/EXPLAIN estimate, the scan) —
        #: multi-MB parses on the driver critical path at 100 TB
        #: metadata sizes. The memo revalidates against the commit
        #: protocol's version pointer (one tiny version-hint read), so
        #: freshness across queries is unchanged: a concurrent writer
        #: bumps the version and the next lookup reloads.
        self._table_memo: dict[str, "IcebergTable"] = {}

    def _load_table(self, name: str) -> IcebergTable:
        """The catalog's ONLY metadata loader: returns the memoized
        table when its version still matches the commit pointer,
        re-parsing the metadata JSON only on version change. Raises
        FileNotFoundError for unknown topics (sites wanting KeyError
        guard with exists() first, unchanged)."""
        from platform_spark.iceberg.commit import FilesystemCommit

        loc = os.path.join(self.root, name)
        cur = FilesystemCommit().current(loc)
        if cur is None:
            raise FileNotFoundError(
                f"iceberg: no table at {loc} (catalog has no current "
                "metadata pointer)"
            )
        version, _path = cur
        memo = self._table_memo.get(name)
        if memo is not None and memo.version == version:
            return memo
        table = IcebergTable.load(loc)
        self._table_memo[name] = table
        return table

    def topic_names(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if IcebergTable.exists(os.path.join(self.root, d))
        )

    def topic(self, name: str, with_schema_columns: bool = True) -> DataFrame:
        loc = os.path.join(self.root, name)
        if not IcebergTable.exists(loc):
            raise KeyError(f"unknown topic {name!r}")
        df = self._load_table(name).to_spark(self.spark)
        if with_schema_columns:
            cfg = self.configs.get(name)
            if cfg:
                df = df.select("*", *[c.spark_expr() for c in cfg.columns])
        return df

    def describe(self, name: str) -> list[tuple[str, str, str]]:
        rows = [
            ("_topic", "text", "implicit"),
            ("_partition", "integer", "implicit"),
            ("_offset", "bigint", "implicit"),
            ("_ts", "timestamp", "implicit"),
            ("_key", "bytea", "implicit"),
            ("_value", "bytea", "implicit"),
            ("_headers", "jsonb", "implicit"),
            ("_segment", "text", "implicit"),
        ]
        cfg = self.configs.get(name)
        if cfg:
            rows += [(c.name, c.type, c.path) for c in cfg.columns]
        return rows

    def raw_source_path(self, name: str) -> str | None:
        return None  # EXPLAIN prices scans via estimate_topic_scan instead

    def topic_history(self, name: str) -> DataFrame:
        """``SHOW SNAPSHOTS FROM <topic>``: the topic table's snapshot
        log — (made_current_at, snapshot_id, parent_id,
        is_current_ancestor) — the discovery half of time travel: these
        are the instants/ids FOR SYSTEM_TIME / SYSTEM_VERSION accept."""
        loc = os.path.join(self.root, name)
        if not IcebergTable.exists(loc):
            raise KeyError(f"unknown topic {name!r}")
        return self._load_table(name).inspect_history(self.spark)

    @staticmethod
    def _bucket_spec_field(
        table: IcebergTable, column: str
    ) -> tuple[str, int] | None:
        """(spec field name, N) when the table's CURRENT default spec
        buckets ``column``; None otherwise."""
        import re as _re

        by_id = {f["id"]: f for f in table.schema["fields"]}
        for pf in table.spec["fields"]:
            m = _re.fullmatch(r"bucket\[(\d+)\]", str(pf.get("transform")))
            if m and by_id.get(pf["source-id"], {}).get("name") == column:
                return pf["name"], int(m.group(1))
        return None

    def plans_key_lookup(self, name: str) -> bool:
        """True when ``_key = x`` over ``name`` is metadata-planned to
        1/N of the files (the current default spec buckets ``_key``).
        The compiler admits such a lookup WITHOUT a time bound — its
        cost is priced from manifests and enforced by the engine's
        ScanBudget, unlike the blanket clause-shape guard (r13 verdict
        #2). Non-bucketed tables return False and keep the loud
        unbounded-query rejection."""
        table = self._load_table(name)
        return self._bucket_spec_field(table, "_key") is not None

    def _pruned_entries(
        self,
        table: IcebergTable,
        partition,
        ts_min,
        ts_max,
        offset_min=None,
        offset_max=None,
        key_eq: str | None = None,
        snapshot_id: int | None = None,
    ):
        """Live entries surviving `_partition =` (identity partition
        value), `_ts` bounds and `_offset` bounds (manifest column
        bounds) — a SUPERSET of the matching rows (files lacking bounds
        survive), so callers still apply the exact row filters. The
        `_offset` bounds make the S7 fetch-from-offset shape
        (server.go:1431-1436) metadata-pruned over Iceberg topics, like
        the KFS catalog's batch-level offset pruning (kfs.py:465): on a
        table with a declared `_offset` sort order the per-file bounds
        are tight, so a tail fetch plans a handful of files out of 10^5.

        ``key_eq`` is the point-lookup half of bucketing (r12 verdict
        #4): when the table's current spec has ``bucket[N]`` on
        ``_key``, the equality value hashes to its spec bucket id and
        the scan plans ONLY that bucket's files — 1/N of the table from
        manifests alone. Each manifest re-hashes the key under its OWN
        spec's bucket[N] (BucketLookup), so eras with a different bucket
        count each prune to 1/N_their_own; files written under an
        earlier spec without any bucket field are conservatively kept;
        non-bucketed tables simply skip the prune and rely on the exact
        row filter.

        ``snapshot_id`` pins the whole plan (data files AND the delete
        files merged on read) to one historical snapshot — time
        travel."""
        from platform_spark.iceberg.table import dt_to_micros as to_micros

        pf: dict = {}
        if partition is not None:
            pf["_partition"] = partition
        if key_eq is not None:
            bucket = self._bucket_spec_field(table, "_key")
            if bucket is not None:
                from platform_spark.iceberg.table import BucketLookup

                name, _n = bucket
                # the spec hashes a key's UTF-8 bytes whether the topic
                # writer recorded _key as string or binary —
                # bucket_value normalizes either way. A tuple (IN list)
                # plans the UNION of its members' buckets. The RAW keys
                # travel in a BucketLookup so each manifest hashes them
                # under its OWN spec's bucket[N] — after a bucket-count
                # evolution the current N's ids would silently mis-prune
                # old-era manifests (ADVICE r13), and per-spec hashing
                # also keeps old eras pruning to 1/N_old instead of
                # being conservatively kept.
                keys = key_eq if isinstance(key_eq, tuple) else (key_eq,)
                pf[name] = BucketLookup("_key", keys)
        entries = table.scan_files(
            snapshot_id=snapshot_id, partition_filter=pf or None,
            spark=self.spark,
        )
        fields = {f["name"] for f in table.schema["fields"]}

        bounds: dict = {}
        if "_ts" in fields and (ts_min is not None or ts_max is not None):
            bounds["_ts"] = (
                to_micros(ts_min) if ts_min is not None else None,
                to_micros(ts_max) if ts_max is not None else None,
            )
        if "_offset" in fields and (offset_min is not None or offset_max is not None):
            bounds["_offset"] = (offset_min, offset_max)
        if not bounds:
            return entries
        return table.filter_entries_by_bounds(entries, bounds)

    def topic_scan(
        self,
        name: str,
        partition=None,
        ts_min=None,
        ts_max=None,
        offset_min=None,
        offset_max=None,
        with_schema_columns: bool = True,
        key_eq: str | None = None,
        as_of=None,
        snapshot_id: int | None = None,
        ref: str | None = None,
    ) -> DataFrame:
        """Metadata-pruned topic read for the KAFSQL compiler: the
        planned file list already honors `_partition =`, `_ts` bounds,
        `_offset` bounds (manifest partition values + column bounds)
        and — on a `_key`-bucketed table — a `_key =` point lookup
        (plans 1/N of the files from the spec murmur3 bucket id alone),
        so a LAST-window query over a years-deep corpus table reads
        only the matching days' files and a key lookup only its
        bucket's — the compiler's exact row filters still apply on top,
        pruning only shrinks the plan. ``as_of`` (datetime or epoch
        millis) pins the read to the snapshot current at that instant
        (``FOR SYSTEM_TIME AS OF``): the corpus-reproducibility query —
        'what did the topic look like when we cut the training set'.
        ``snapshot_id`` pins a specific snapshot by id
        (``FOR SYSTEM_VERSION AS OF``; ids come from SHOW SNAPSHOTS) and
        ``ref`` a named tag/branch (``FOR SYSTEM_VERSION AS OF 'name'``)
        — unknown/expired ids and unknown refs fail loudly."""
        loc = os.path.join(self.root, name)
        if not IcebergTable.exists(loc):
            raise KeyError(f"unknown topic {name!r}")
        table = self._load_table(name)
        if sum(x is not None for x in (as_of, snapshot_id, ref)) > 1:
            raise ValueError("pass ONE of as_of / snapshot_id / ref")
        if ref is not None:
            # ref_snapshot_id validates the ref; its id is trusted as-is
            # (a branch cut on an empty table legally points at -1)
            snapshot_id = table.ref_snapshot_id(ref)
        elif as_of is not None:
            snapshot_id = table.snapshot_id_as_of(as_of)
        elif snapshot_id is not None and not any(
            s["snapshot-id"] == snapshot_id
            for s in table.metadata["snapshots"]
        ):
            raise ValueError(
                f"iceberg: topic {name!r} has no snapshot {snapshot_id} "
                "(expired or never committed; SHOW SNAPSHOTS lists the "
                "live ids)"
            )
        entries = self._pruned_entries(
            table, partition, ts_min, ts_max, offset_min, offset_max,
            key_eq=key_eq, snapshot_id=snapshot_id,
        )
        df = table.read_entries(self.spark, entries, snapshot_id=snapshot_id)
        if with_schema_columns:
            cfg = self.configs.get(name)
            if cfg:
                df = df.select("*", *[c.spark_expr() for c in cfg.columns])
        return df

    def estimate_topic_scan(
        self,
        name: str,
        partition=None,
        ts_min=None,
        ts_max=None,
        offset_min=None,
        offset_max=None,
        key_eq: str | None = None,
        as_of=None,
        snapshot_id: int | None = None,
        ref: str | None = None,
    ):
        """EXPLAIN scan estimate priced PURELY from Iceberg manifests —
        no parquet footer reads, no data access: each live entry carries
        record_count, file_size_in_bytes, identity partition values, and
        per-column bounds. This is the metadata-layer answer to the
        reference's EXPLAIN segment-count/byte estimates
        (server.go:929-962): at a ~10^5-file table the estimate costs
        one manifest walk, not 10^5 footer GETs."""
        from platform_spark.governance import ScanEstimate

        table = self._load_table(name)
        if ref is not None:
            snapshot_id = table.ref_snapshot_id(ref)
        elif as_of is not None:
            snapshot_id = table.snapshot_id_as_of(as_of)
        entries = self._pruned_entries(
            table, partition, ts_min, ts_max, offset_min, offset_max,
            key_eq=key_eq, snapshot_id=snapshot_id,
        )
        return ScanEstimate(
            files=len(entries),
            bytes=sum(e["data_file"]["file_size_in_bytes"] for e in entries),
            rows=sum(e["data_file"]["record_count"] for e in entries),
        )
