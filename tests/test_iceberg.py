"""Pure-Python Iceberg v2 layer: Avro container spec, table format spec,
commit/scan/time-travel/evolution semantics, and the pipeline sink.

Reference parity: iceberg-processor/internal/sink/iceberg.go (append with
retry-on-conflict 146-204, create-if-missing 330-384, widening-only
evolution 855-884). Format assertions follow the PUBLIC specs:
https://avro.apache.org/docs/1.11.1/specification/ and
https://iceberg.apache.org/spec/.
"""

from __future__ import annotations

import io
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from platform_spark.iceberg import avro
from platform_spark.iceberg.table import (
    CommitConflict,
    IcebergTable,
    append_dataframe,
    deserialize_bound,
    schema_to_iceberg,
    schema_to_spark,
    serialize_bound,
)


# -- avro binary encoding ---------------------------------------------------


def test_avro_zigzag_longs():
    buf = io.BytesIO()
    vals = [0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    for v in vals:
        avro.write_long(buf, v)
    buf.seek(0)
    assert [avro.read_long(buf) for _ in vals] == vals
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    for v, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"), (2, b"\x04")]:
        one = io.BytesIO()
        avro.write_long(one, v)
        assert one.getvalue() == b, v


def test_avro_negative_count_array_blocks():
    """Readers must accept the negative-count+byte-size block form even
    though our writer never emits it (spec: 'If a block's count is
    negative, its absolute value is used, and the count is followed
    immediately by a long block size')."""
    schema = {"type": "array", "items": "long"}
    buf = io.BytesIO()
    inner = io.BytesIO()
    for v in (7, 8, 9):
        avro.write_long(inner, v)
    avro.write_long(buf, -3)  # negative count
    avro.write_long(buf, len(inner.getvalue()))
    buf.write(inner.getvalue())
    avro.write_long(buf, 0)
    buf.seek(0)
    assert avro.decode(buf, schema) == [7, 8, 9]


def test_avro_union_and_errors():
    schema = ["null", "string"]
    for v in (None, "x"):
        buf = io.BytesIO()
        avro.encode(buf, schema, v)
        buf.seek(0)
        assert avro.decode(buf, schema) == v
    with pytest.raises(ValueError, match="non-nullable union"):
        avro.encode(io.BytesIO(), ["string"], None)
    with pytest.raises(ValueError, match="truncated varint"):
        avro.read_long(io.BytesIO(b""))
    with pytest.raises(ValueError, match="truncated bytes"):
        avro.read_bytes(io.BytesIO(b"\x08ab"))


def test_avro_container_spec_shape(tmp_path):
    """Container framing per spec: magic Obj\\x01, file metadata map with
    avro.schema + avro.codec, 16-byte sync marker repeated after each
    block; deterministic output (same path+records → same bytes)."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    recs = [{"a": i} for i in range(5)]
    p = str(tmp_path / "x.avro")
    avro.write_container(p, schema, recs)
    raw = open(p, "rb").read()
    assert raw[:4] == b"Obj\x01"
    got_schema, meta, out = avro.read_container(p)
    assert got_schema == schema and out == recs
    assert meta["avro.codec"] == b"deflate"
    assert json.loads(meta["avro.schema"]) == schema
    # deterministic sync → byte-identical rewrite
    avro.write_container(p, schema, recs)
    assert open(p, "rb").read() == raw
    # null codec round-trips too
    p2 = str(tmp_path / "y.avro")
    avro.write_container(p2, schema, recs, codec="null")
    assert avro.read_container(p2)[2] == recs
    # sync marker corruption is detected
    bad = bytearray(raw)
    bad[-1] ^= 0xFF
    p3 = str(tmp_path / "z.avro")
    open(p3, "wb").write(bytes(bad))
    with pytest.raises(ValueError, match="sync marker"):
        avro.read_container(p3)


def test_avro_nested_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "u", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": {
                "type": "record", "name": "kv", "fields": [
                    {"name": "key", "type": "int"},
                    {"name": "value", "type": "bytes"},
                ]}}},
            {"name": "m", "type": {"type": "map", "values": "double"}},
            {"name": "flag", "type": "boolean"},
        ],
    }
    recs = [
        {"u": None, "arr": [{"key": 1, "value": b"\x00\xff"}], "m": {"a": 1.5}, "flag": True},
        {"u": -9, "arr": [], "m": {}, "flag": False},
    ]
    p = str(tmp_path / "n.avro")
    avro.write_container(p, schema, recs)
    assert avro.read_container(p)[2] == recs


# -- schema conversion ------------------------------------------------------


def test_schema_to_iceberg_field_ids():
    s = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("meta", T.StructType([
            T.StructField("k", T.StringType(), True),
        ]), True),
        T.StructField("m", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("d", T.DecimalType(10, 2), True),
    ])
    ice = schema_to_iceberg(s)
    fields = {f["name"]: f for f in ice["fields"]}
    # top-level ids assigned first (spec: parent before children would be
    # fine too; what matters is uniqueness + last-column-id covers all)
    assert fields["id"]["id"] == 1 and fields["id"]["required"] is True
    assert fields["tags"]["type"]["type"] == "list"
    assert fields["d"]["type"] == "decimal(10, 2)"
    all_ids = []

    def walk(t):
        if isinstance(t, dict):
            if t.get("type") == "list":
                all_ids.append(t["element-id"])
                walk(t["element"])
            elif t.get("type") == "map":
                all_ids.extend([t["key-id"], t["value-id"]])
                walk(t["key"])
                walk(t["value"])
            elif t.get("type") == "struct":
                for f in t["fields"]:
                    all_ids.append(f["id"])
                    walk(f["type"])

    for f in ice["fields"]:
        all_ids.append(f["id"])
        walk(f["type"])
    assert len(all_ids) == len(set(all_ids)), "field ids must be unique"
    assert ice["_last_column_id"] == max(all_ids)
    # and back: Spark schema round-trips (nullability per required flags)
    back = schema_to_spark(ice)
    assert [f.name for f in back.fields] == [f.name for f in s.fields]
    assert back["id"].dataType == T.LongType() and not back["id"].nullable
    assert back["tags"].dataType == T.ArrayType(T.StringType())
    assert back["d"].dataType == T.DecimalType(10, 2)


def test_bound_serialization_roundtrip():
    import datetime

    cases = [
        ("int", 42), ("int", -1), ("long", 2**40), ("double", 1.5),
        ("string", "héllo"), ("boolean", True), ("boolean", False),
    ]
    for t, v in cases:
        assert deserialize_bound(t, serialize_bound(t, v)) == v, (t, v)
    # little-endian per spec's single-value serialization
    assert serialize_bound("int", 1) == b"\x01\x00\x00\x00"
    assert serialize_bound("long", 1) == b"\x01" + b"\x00" * 7
    assert serialize_bound("date", datetime.date(1970, 1, 2)) == b"\x01\x00\x00\x00"
    ts = datetime.datetime(1970, 1, 1, 0, 0, 1)
    assert deserialize_bound("timestamp", serialize_bound("timestamp", ts)) == 1_000_000


# -- the table --------------------------------------------------------------

CLOCK = lambda: 1_700_000_000.0  # noqa: E731 — deterministic commits


def _mk(spark, a, b):
    return spark.range(a, b).select(
        F.col("id"),
        (F.col("id") % 4).alias("part"),
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
    )


@pytest.fixture()
def table_loc(tmp_path):
    return str(tmp_path / "tbl")


def test_create_metadata_spec_shape(spark, table_loc):
    t = IcebergTable.create(
        table_loc, _mk(spark, 0, 1).schema, partition_by=("part",), clock=CLOCK
    )
    # HadoopTables layout
    assert os.path.exists(os.path.join(table_loc, "metadata", "v1.metadata.json"))
    hint = open(os.path.join(table_loc, "metadata", "version-hint.text")).read()
    assert hint == "1"
    m = t.metadata
    # required v2 metadata fields (spec "Table Metadata Fields")
    for key in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
        "partition-specs", "default-spec-id", "last-partition-id",
        "sort-orders", "default-sort-order-id", "properties",
        "current-snapshot-id", "snapshots", "snapshot-log", "metadata-log",
    ):
        assert key in m, key
    assert m["format-version"] == 2
    spec = m["partition-specs"][0]
    assert spec["fields"][0]["transform"] == "identity"
    assert spec["fields"][0]["field-id"] == 1000  # partition ids start at 1000
    assert m["last-partition-id"] == 1000
    with pytest.raises(ValueError, match="partition column"):
        IcebergTable.create(
            table_loc + "2", _mk(spark, 0, 1).schema, partition_by=("nope",)
        )


def test_append_scan_timetravel_prune(spark, table_loc):
    df1, df2 = _mk(spark, 0, 100), _mk(spark, 100, 150)
    t = IcebergTable.create(table_loc, df1.schema, partition_by=("part",), clock=CLOCK)
    s1 = append_dataframe(t, df1)
    s2 = append_dataframe(t, df2)
    assert s1["summary"]["operation"] == "append"
    assert int(s1["summary"]["added-records"]) == 100
    assert s2["parent-snapshot-id"] == s1["snapshot-id"]
    assert t.metadata["last-sequence-number"] == 2
    # full read, value-exact
    back = t.to_spark(spark)
    assert sorted(back.collect()) == sorted(df1.unionByName(df2).collect())
    # time travel
    assert t.to_spark(spark, snapshot_id=s1["snapshot-id"]).count() == 100
    # history/snapshot-log
    assert [h["snapshot-id"] for h in t.history()] == [
        s1["snapshot-id"], s2["snapshot-id"]
    ]
    # metadata-only partition pruning: fewer files planned, right rows read
    all_files = t.scan_files()
    p2_files = t.scan_files(partition_filter={"part": 2})
    assert 0 < len(p2_files) < len(all_files)
    assert all(e["data_file"]["partition"]["part"] == 2 for e in p2_files)
    got = t.to_spark(spark, partition_filter={"part": 2})
    assert got.count() == 37 and got.agg(F.min("part"), F.max("part")).first() == (2, 2)
    # the pruning is METADATA-side: the Spark scan only ever sees the
    # pruned file list (no full-scan-then-filter)
    assert len(got.inputFiles()) == len(p2_files)
    # fresh load sees the same state
    assert IcebergTable.load(table_loc).to_spark(spark).count() == 150


def test_manifest_files_are_spec_avro(spark, table_loc):
    df = _mk(spark, 0, 40)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, df)
    snap = t.current_snapshot()
    # manifest list: spec field ids + counts
    schema, meta, manifests = avro.read_container(snap["manifest-list"])
    by_name = {f["name"]: f for f in schema["fields"]}
    for name, fid in [
        ("manifest_path", 500), ("manifest_length", 501),
        ("partition_spec_id", 502), ("added_snapshot_id", 503),
        ("sequence_number", 515), ("min_sequence_number", 516),
        ("content", 517), ("added_rows_count", 512), ("partitions", 507),
    ]:
        assert by_name[name]["field-id"] == fid, name
    mf = manifests[0]
    assert mf["added_files_count"] == len(t.scan_files())
    assert mf["added_rows_count"] == 40
    assert mf["manifest_length"] == os.path.getsize(mf["manifest_path"])
    # partition summaries cover the written partition range 0..3
    summ = mf["partitions"][0]
    assert deserialize_bound("long", summ["lower_bound"]) == 0
    assert deserialize_bound("long", summ["upper_bound"]) == 3
    # manifest: required file-metadata keys + entry field ids (spec)
    eschema, emeta, entries = avro.read_container(mf["manifest_path"])
    for key in ("schema", "partition-spec", "partition-spec-id",
                "format-version", "content"):
        assert key in emeta, key
    assert emeta["format-version"] == b"2" and emeta["content"] == b"data"
    assert json.loads(emeta["schema"].decode()) == t.schema
    eby = {f["name"]: f for f in eschema["fields"]}
    assert eby["status"]["field-id"] == 0
    assert eby["data_file"]["field-id"] == 2
    dby = {f["name"]: f for f in eby["data_file"]["type"]["fields"]}
    for name, fid in [
        ("content", 134), ("file_path", 100), ("file_format", 101),
        ("partition", 102), ("record_count", 103), ("file_size_in_bytes", 104),
        ("lower_bounds", 125), ("upper_bounds", 128),
    ]:
        assert dby[name]["field-id"] == fid, name
    # entries carry real footer stats and bounds for the id column
    e = entries[0]
    assert e["status"] == 1 and e["data_file"]["file_format"] == "PARQUET"
    assert e["data_file"]["record_count"] > 0
    id_fid = next(f["id"] for f in t.schema["fields"] if f["name"] == "id")
    lower = {kv["key"]: kv["value"] for kv in e["data_file"]["lower_bounds"]}
    assert deserialize_bound("long", lower[id_fid]) >= 0


def test_commit_conflict_retries(spark, table_loc):
    """Optimistic concurrency: a concurrent v2 commit makes the first
    exclusive-create fail; append refreshes and lands at v3 (reference
    retry loop iceberg.go:157-195)."""
    df = _mk(spark, 0, 20)
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    # simulate a concurrent writer grabbing v2
    stale = json.loads(json.dumps(t.metadata))
    path = os.path.join(table_loc, "metadata", "v2.metadata.json")
    with open(path, "x") as f:
        json.dump(stale, f)
    s = append_dataframe(t, df)
    assert t.version == 3
    assert s["snapshot-id"] == t.current_snapshot()["snapshot-id"]
    assert t.to_spark(spark).count() == 20
    # exhausted retries surface CommitConflict
    for v in (4, 5, 6):
        with open(os.path.join(table_loc, "metadata", f"v{v}.metadata.json"), "x") as f:
            json.dump(stale, f)

    class _Frozen(IcebergTable):
        def refresh(self):
            return self  # never sees the concurrent commits

    frozen = _Frozen(t.location, t.metadata, version=3, clock=CLOCK)
    files = [e["data_file"]["file_path"] for e in t.scan_files()]
    with pytest.raises(CommitConflict):
        frozen.append_files(files[:1])


def test_evolution_rules(spark, table_loc):
    df = _mk(spark, 0, 10)
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    append_dataframe(t, df)
    old_ids = {f["name"]: f["id"] for f in t.schema["fields"]}
    # add a column: old rows read back NULL, ids preserved, new id appended
    df2 = _mk(spark, 10, 20).withColumn("lang", F.lit("en"))
    append_dataframe(t, df2)
    assert t.metadata["current-schema-id"] == 1
    new = {f["name"]: f["id"] for f in t.schema["fields"]}
    assert all(new[k] == v for k, v in old_ids.items())
    assert new["lang"] == t.metadata["last-column-id"]
    back = t.to_spark(spark)
    assert back.filter(F.col("lang").isNull()).count() == 10
    assert back.filter(F.col("lang") == "en").count() == 10
    # narrowing rejected (reference iceberg.go:855-884)
    bad = _mk(spark, 20, 30).withColumn("id", F.col("id").cast("int"))
    with pytest.raises(ValueError, match="widening-only"):
        append_dataframe(t, bad)
    # empty append rejected
    with pytest.raises(ValueError, match="empty append"):
        t.append_files([])


def test_compaction_and_snapshot_expiry(spark, table_loc):
    """replace_files + expire_snapshots: the maintenance pair that keeps
    scan planning O(live files) under thousands of micro-batch commits.
    Compaction must not change content; history survives until expiry;
    expiry physically removes only what no kept snapshot references."""
    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    df = _mk(spark, 0, 60)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    for lo in range(0, 60, 10):  # 6 small appends -> many small files
        append_dataframe(t, _mk(spark, lo, lo + 10))
    pre_snap = t.current_snapshot()["snapshot-id"]
    n_small = len(t.scan_files())
    expected = sorted(df.collect())

    rep = compact_table(t, spark)
    assert rep["summary"]["operation"] == "replace"
    assert int(rep["summary"]["deleted-data-files"]) == n_small
    n_packed = len(t.scan_files())
    assert n_packed < n_small and n_packed <= 4  # ~1 file per part value
    assert sorted(t.to_spark(spark).collect()) == expected
    # pre-compaction history still time-travels to the small files
    assert t.to_spark(spark, snapshot_id=pre_snap).count() == 60
    small_paths = [
        e["data_file"]["file_path"]
        for e in t.scan_files(snapshot_id=pre_snap)
    ]
    assert all(os.path.exists(p) for p in small_paths)

    removed = t.expire_snapshots(keep_last=1)
    assert removed["snapshots"] == 6 and removed["files"] > 0
    assert len(t.metadata["snapshots"]) == 1
    # replaced data files are physically gone; live content intact
    assert not any(os.path.exists(p) for p in small_paths)
    assert sorted(t.to_spark(spark).collect()) == expected
    assert sorted(IcebergTable.load(table_loc).to_spark(spark).collect()) == expected
    # expiring below the current snapshot is refused by the guard
    assert t.expire_snapshots(keep_last=5) == {"snapshots": 0, "files": 0}


def test_position_deletes_merge_on_read(spark, table_loc):
    """Iceberg v2 row-level deletes: delete_where commits sorted
    (file_path, pos) position-delete parquet in a deletes-content
    manifest; scans merge on read via a broadcast anti-join. Deletes
    accumulate across snapshots, overlap is idempotent, time travel sees
    the pre-delete rows, compaction folds deletes in and retires the
    delete files, expiry reclaims them physically."""
    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    df = _mk(spark, 0, 100)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 50))
    append_dataframe(t, _mk(spark, 50, 100))
    pre = t.current_snapshot()["snapshot-id"]

    snap = t.delete_where(spark, "id % 7 = 0")
    assert snap["summary"]["operation"] == "delete"
    assert int(snap["summary"]["added-position-delete-records"]) == 15
    keep1 = [r for r in df.collect() if r.id % 7 != 0]
    assert sorted(t.to_spark(spark).collect()) == sorted(keep1)
    # the delete set rides a broadcast anti-join: no shuffle of the data
    plan = t.to_spark(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan and "SortMergeJoin" not in plan

    # second delete overlaps the first (ids divisible by 14 hit both):
    # idempotent, accumulates, never resurrects
    t.delete_where(spark, "id % 2 = 0")
    keep2 = [r for r in keep1 if r.id % 2 != 0]
    assert sorted(t.to_spark(spark).collect()) == sorted(keep2)
    assert len(t.scan_deletes()) >= 2

    # delete files are spec-sorted by (file_path, pos)
    import pyarrow.parquet as pq

    for e in t.scan_deletes():
        rows = pq.read_table(e["data_file"]["file_path"]).to_pylist()
        assert rows == sorted(rows, key=lambda r: (r["file_path"], r["pos"]))
        assert e["data_file"]["content"] == 1

    # time travel to before any delete sees everything; partition-filtered
    # scans still apply the (unpruned) delete files
    assert t.to_spark(spark, snapshot_id=pre).count() == 100
    got_p1 = t.to_spark(spark, partition_filter={"part": 1})
    assert sorted(got_p1.collect()) == sorted(r for r in keep2 if r.part == 1)

    # no-match predicate commits nothing
    v = t.version
    assert t.delete_where(spark, "id = -1") is None
    assert t.version == v

    # compaction reads through MoR, so packed files exclude deleted rows
    # and the delete files are retired in the replace commit
    compact_table(t, spark)
    assert t.scan_deletes() == []
    assert sorted(t.to_spark(spark).collect()) == sorted(keep2)
    del_paths = [
        e["data_file"]["file_path"] for e in t.scan_deletes(snapshot_id=snap["snapshot-id"])
    ]
    assert del_paths and all(os.path.exists(p) for p in del_paths)
    t.expire_snapshots(keep_last=1)
    assert not any(os.path.exists(p) for p in del_paths)
    assert sorted(IcebergTable.load(table_loc).to_spark(spark).collect()) == sorted(keep2)


def test_partition_bounds_are_value_ordered(spark, table_loc):
    """Manifest partition summaries must order by VALUE: little-endian
    serialized bytes order 256 below 1, which made pruning skip matching
    manifests for any int partition spanning a byte boundary."""
    from pyspark.sql import functions as F

    df = spark.range(600).select(
        F.col("id"),
        F.when(F.col("id") < 300, F.lit(1)).otherwise(F.lit(256)).alias("day"),
    )
    t = IcebergTable.create(table_loc, df.schema, partition_by=("day",), clock=CLOCK)
    append_dataframe(t, df)  # ONE append -> one manifest holding 1 and 256
    from platform_spark.iceberg import avro as _avro
    from platform_spark.iceberg.table import deserialize_bound

    _, _, manifests = _avro.read_container(t.current_snapshot()["manifest-list"])
    summ = manifests[0]["partitions"][0]
    assert deserialize_bound("int", summ["lower_bound"]) == 1
    assert deserialize_bound("int", summ["upper_bound"]) == 256
    got = t.to_spark(spark, partition_filter={"day": 1})
    assert got.count() == 300 and len(got.inputFiles()) < len(t.scan_files())


def test_date_and_escaped_string_partitions(spark, table_loc):
    """Date partition values round-trip as days-since-epoch (crashed with
    int('2024-01-02') before); string partition values URL-unescape so
    filters on values with specials match."""
    import datetime

    from pyspark.sql import functions as F

    df = spark.range(40).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 3).cast("int")).alias("day"),
        F.concat(F.lit("a b/"), (F.col("id") % 2).cast("string")).alias("tag"),
    )
    t = IcebergTable.create(
        table_loc, df.schema, partition_by=("day", "tag"), clock=CLOCK
    )
    append_dataframe(t, df)
    assert sorted(r.id for r in t.to_spark(spark).collect()) == list(range(40))
    # filter by a real date object; stored value is days-since-epoch
    want = datetime.date(2024, 1, 2)
    got = t.to_spark(spark, partition_filter={"day": want})
    assert sorted(r.id for r in got.collect()) == [i for i in range(40) if i % 3 == 1]
    assert got.agg(F.min("day"), F.max("day")).first() == (want, want)
    # escaped string partition ('a b/0' -> 'tag=a%20b%2F0' on disk)
    got2 = t.to_spark(spark, partition_filter={"tag": "a b/0"})
    assert sorted(r.id for r in got2.collect()) == [i for i in range(40) if i % 2 == 0]


def test_relative_location_and_conflict_retry(spark, tmp_path, monkeypatch):
    """A relative table location must not break the _metadata.file_path
    identity joins (merge/deletes); a stale second handle's append must
    conflict, retry, and land without losing or duplicating rows."""
    import os as _os

    from platform_spark.iceberg.table import merge_into

    monkeypatch.chdir(tmp_path)
    df = _mk(spark, 0, 30)
    t = IcebergTable.create("rel/tbl", df.schema, partition_by=("part",), clock=CLOCK)
    assert _os.path.isabs(t.location)
    append_dataframe(t, df)
    t.delete_where(spark, "id = 7")
    assert t.to_spark(spark).count() == 29
    merge_into(t, _mk(spark, 0, 3).withColumn("text", F.lit("upd")), ["id"], spark)
    got = {r.id: r.text for r in t.to_spark(spark).collect()}
    assert got[0] == got[1] == got[2] == "upd" and len(got) == 29
    # stale-handle append: second handle loaded before the first's commit
    t1 = IcebergTable.load("rel/tbl", clock=CLOCK)
    t2 = IcebergTable.load("rel/tbl", clock=CLOCK)
    append_dataframe(t1, _mk(spark, 100, 110))
    append_dataframe(t2, _mk(spark, 200, 210))  # conflict -> refresh -> retry
    fresh = IcebergTable.load("rel/tbl", clock=CLOCK).to_spark(spark)
    ids = sorted(r.id for r in fresh.collect())
    assert ids == sorted(set(got) | set(range(100, 110)) | set(range(200, 210)))


def test_pipeline_empty_batch_and_replay(spark, tmp_path):
    """An all-filtered micro-batch must be a no-op, not a crash; a
    replayed batch_id must not double-append."""
    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    _mk(spark, 0, 20).withColumn("_partition", F.col("part")).write.parquet(src)
    loc = str(tmp_path / "ice")
    pipe = ContinuousTopicPipeline(
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
        transform=lambda df: df.filter("id < 0"),  # drops everything
    )
    pipe.run_available_now()  # must not raise; nothing committed
    assert not IcebergTable.exists(loc) or IcebergTable.load(loc).to_spark(spark).count() == 0

    pipe2 = ContinuousTopicPipeline(
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused2"),
        checkpoint_dir=str(tmp_path / "ck2"),
        iceberg_location=str(tmp_path / "ice2"),
    )
    pipe2.run_available_now()
    t = IcebergTable.load(str(tmp_path / "ice2"))
    assert t.to_spark(spark).count() == 20
    # simulate foreachBatch replay after a crash-before-checkpoint: the
    # recorded streaming-batch-id must make the re-delivery a no-op
    batch = spark.read.parquet(src)
    last_id = int(t.metadata["properties"]["streaming-batch-id"])
    pipe2._sink_iceberg_fs(batch, last_id)
    t.refresh()
    assert t.to_spark(spark).count() == 20  # unchanged
    pipe2._sink_iceberg_fs(batch, last_id + 1)  # genuinely new batch
    t.refresh()
    assert t.to_spark(spark).count() == 40


def test_partition_scoped_compaction(spark, table_loc):
    """compact_table(partition_filter=...) bin-packs ONLY the matching
    partitions through a partial manifest rewrite — the incremental
    maintenance shape for huge tables. Delete files survive (they may
    still apply elsewhere); content is identical; other partitions'
    files are untouched."""
    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    df = _mk(spark, 0, 60)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    for lo in range(0, 60, 10):
        append_dataframe(t, _mk(spark, lo, lo + 10))
    t.delete_where(spark, "id % 11 = 0")
    expected = sorted(r for r in df.collect() if r.id % 11 != 0)
    all_before = {e["data_file"]["file_path"] for e in t.scan_files()}
    p2_before = {
        e["data_file"]["file_path"]
        for e in t.scan_files(partition_filter={"part": 2})
    }

    snap = compact_table(t, spark, partition_filter={"part": 2})
    assert snap["summary"]["operation"] == "replace"
    assert int(snap["summary"]["deleted-data-files"]) == len(p2_before)
    assert sorted(t.to_spark(spark).collect()) == expected
    after = {e["data_file"]["file_path"] for e in t.scan_files()}
    # non-matching partitions keep their exact files; p2 is repacked
    assert all_before - p2_before <= after
    assert not (p2_before & after)
    assert len(t.scan_files(partition_filter={"part": 2})) == 1
    # delete files stay live for the untouched partitions
    assert t.scan_deletes()
    # an empty filter is a no-op commit-wise
    v = t.version
    compact_table(t, spark, partition_filter={"part": 99})
    assert t.version == v
    # changes() treats the partial replace as content-neutral
    assert t.changes(
        spark,
        from_snapshot_id=snap["snapshot-id"] - 1,
        to_snapshot_id=snap["snapshot-id"],
    ).count() == 0


def test_equality_deletes(spark, table_loc):
    """Equality deletes: O(keys) commit with no data scan, applied on
    read only to data files strictly OLDER than the delete (sequence
    rule), composing with position deletes, merge, compaction."""
    df = _mk(spark, 0, 60)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 60))

    snap = t.delete_keys(spark, spark.range(10, 20).select("id"))
    assert snap["summary"]["operation"] == "delete"
    assert int(snap["summary"]["added-equality-delete-records"]) == 10
    assert sorted(r.id for r in t.to_spark(spark).collect()) == [
        i for i in range(60) if not 10 <= i < 20
    ]
    # sequence rule: the same key appended AFTER the delete survives,
    # and the older copy stays dead
    append_dataframe(t, _mk(spark, 15, 16))
    got = [r.id for r in t.to_spark(spark).collect()]
    assert got.count(15) == 1 and len(got) == 51
    # multi-column keys match as a tuple, not independently
    t.delete_keys(
        spark, spark.createDataFrame([(40, "doc-40"), (41, "nope")], "id long, text string")
    )
    assert sorted(r.id for r in t.to_spark(spark).collect()) == sorted(
        i for i in range(60) if not 10 <= i < 20 or i == 15
        if i != 40
    )
    # empty key set commits nothing; unknown column rejected
    assert t.delete_keys(spark, spark.range(0, 0).select("id")) is None
    with pytest.raises(ValueError, match="not in schema"):
        t.delete_keys(spark, spark.range(1).select(F.col("id").alias("nope")))
    # position + equality deletes compose in one scan
    t.delete_where(spark, "id = 0")
    expected = sorted(
        i for i in range(60)
        if (not 10 <= i < 20 or i == 15) and i not in (40, 0)
    )
    assert sorted(r.id for r in t.to_spark(spark).collect()) == expected
    # time travel: pre-delete snapshots ignore later delete files
    first = min(s["snapshot-id"] for s in t.metadata["snapshots"])
    assert t.to_spark(spark, snapshot_id=first).count() == 60
    # merge over equality-deleted state sees the post-delete content
    from platform_spark.iceberg.table import compact_table, merge_into

    merge_into(
        t, _mk(spark, 12, 13), ["id"], spark  # upsert a dead key = insert
    )
    assert sorted(r.id for r in t.to_spark(spark).collect()) == sorted(expected + [12])
    # compaction folds all delete kinds and retires the delete files
    compact_table(t, spark)
    assert t.scan_deletes() == []
    assert sorted(r.id for r in t.to_spark(spark).collect()) == sorted(expected + [12])
    assert (
        IcebergTable.load(table_loc).to_spark(spark).count() == len(expected) + 1
    )


def test_merge_into_copy_on_write(spark, table_loc):
    """Copy-on-write MERGE: only files containing a matching key are
    rewritten (manifest rewrite keeps untouched entries EXISTING);
    updates replace, unmatched source rows insert, history time-travels,
    and live position deletes are folded into the rewrite."""
    from platform_spark.iceberg.table import merge_into

    df = _mk(spark, 0, 80)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    for lo in range(0, 80, 20):
        append_dataframe(t, _mk(spark, lo, lo + 20))
    pre = t.current_snapshot()["snapshot-id"]
    n_before = len(t.scan_files())
    t.delete_where(spark, "id = 5")  # a live position delete on an affected file

    # update ids 0..9 (text -> 'upd-<id>'), insert 200..204
    src = spark.range(0, 10).select(
        F.col("id"), (F.col("id") % 4).alias("part"),
        F.concat(F.lit("upd-"), F.col("id")).alias("text"),
    ).unionByName(_mk(spark, 200, 205))
    snap = merge_into(t, src, ["id"], spark)
    assert snap["summary"]["operation"] == "overwrite"
    # deleted id=5 was inside the updated key range: its file rewrites,
    # but the update resurrects the row via the source (id 5 in src)
    got = {r.id: r.text for r in t.to_spark(spark).collect()}
    exp = {i: f"upd-{i}" for i in range(10)}
    exp.update({i: f"doc-{i}" for i in range(10, 80)})
    exp.update({i: f"doc-{i}" for i in range(200, 205)})
    assert got == exp
    # only the files holding ids 0..9 were rewritten
    assert int(snap["summary"]["deleted-data-files"]) < n_before
    assert t.to_spark(spark, snapshot_id=pre).count() == 80
    assert sorted(IcebergTable.load(table_loc).to_spark(spark).collect()) == sorted(
        t.to_spark(spark).collect()
    )

    # a delete whose rows were all folded away: dangling delete rows
    # must not resurrect or double-delete anything
    t.delete_where(spark, "id >= 200")
    assert t.to_spark(spark).count() == len(exp) - 5

    # merge where nothing matches = pure insert (no files rewritten)
    snap2 = merge_into(t, _mk(spark, 300, 303), ["id"], spark)
    assert snap2["summary"]["deleted-data-files"] == "0"
    assert t.to_spark(spark).count() == len(exp) - 5 + 3


def test_incremental_changes(spark, table_loc):
    """changes(): exactly the rows appended in (from, to], replace
    snapshots skipped as content-neutral, delete/overwrite in range
    rejected, evolution-added columns read as NULL for older files."""
    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    df = _mk(spark, 0, 30)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    s1 = append_dataframe(t, _mk(spark, 0, 10))
    s2 = append_dataframe(t, _mk(spark, 10, 20))
    rep = compact_table(t, spark)
    s3 = append_dataframe(t, _mk(spark, 20, 30).withColumn("extra", F.lit(7)))

    full = t.changes(spark)
    assert sorted(r.id for r in full.collect()) == list(range(30))
    assert "extra" in full.columns
    inc = t.changes(spark, from_snapshot_id=s1["snapshot-id"])
    assert sorted(r.id for r in inc.collect()) == list(range(10, 30))
    # compaction-only window is empty, not duplicated
    assert t.changes(
        spark, from_snapshot_id=s2["snapshot-id"], to_snapshot_id=rep["snapshot-id"]
    ).count() == 0
    # bounded upper end
    assert t.changes(
        spark, from_snapshot_id=s1["snapshot-id"], to_snapshot_id=s2["snapshot-id"]
    ).count() == 10
    # old files surface the evolved column as NULL
    assert inc.filter("extra IS NULL").count() == 10
    t.delete_where(spark, "id = 3")
    with pytest.raises(ValueError, match="non-append"):
        t.changes(spark, from_snapshot_id=s3["snapshot-id"])
    # a window that stops before the delete still works
    assert t.changes(
        spark, from_snapshot_id=s2["snapshot-id"], to_snapshot_id=s3["snapshot-id"]
    ).count() == 10


def test_tags_pin_snapshots_against_expiry(spark, table_loc):
    """A tag names a snapshot and PINS it: compaction + expiry reclaim
    everything else, but the tagged corpus version stays byte-for-byte
    reproducible; dropping the tag releases it."""
    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    df = _mk(spark, 0, 40)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 20))
    t.create_tag("corpus-v1")
    v1 = sorted(t.to_spark(spark, ref="corpus-v1").collect())
    append_dataframe(t, _mk(spark, 20, 40))
    t.delete_where(spark, "id % 5 = 0")
    compact_table(t, spark)
    removed = t.expire_snapshots(keep_last=1)
    assert removed["snapshots"] > 0
    # the tagged snapshot survived expiry with its files intact
    assert sorted(t.to_spark(spark, ref="corpus-v1").collect()) == v1
    assert len(v1) == 20
    # current content is unaffected
    assert t.to_spark(spark).count() == 40 - 8
    # fresh load sees the ref
    t2 = IcebergTable.load(table_loc)
    assert sorted(t2.to_spark(spark, ref="corpus-v1").collect()) == v1
    # duplicate / unknown refs fail loudly; both selectors rejected
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("corpus-v1")
    with pytest.raises(ValueError, match="unknown ref"):
        t.to_spark(spark, ref="nope")
    with pytest.raises(ValueError, match="ONE of"):
        t.to_spark(spark, ref="corpus-v1", snapshot_id=1)
    # dropping the tag releases the snapshot to the next expiry
    t.drop_tag("corpus-v1")
    assert t.expire_snapshots(keep_last=1)["snapshots"] == 1
    with pytest.raises(ValueError, match="unknown ref"):
        t.to_spark(spark, ref="corpus-v1")
    assert t.to_spark(spark).count() == 32


def test_rollback_and_orphan_removal(spark, table_loc):
    """rollback_to is a pure metadata undo (later snapshots stay
    time-travelable until expiry; new appends continue from the rolled-
    back state); remove_orphan_files reclaims only old unreferenced
    files."""
    import time as _time

    df = _mk(spark, 0, 30)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    s1 = append_dataframe(t, _mk(spark, 0, 10))
    s2 = append_dataframe(t, _mk(spark, 10, 20))
    t.rollback_to(s1["snapshot-id"])
    assert sorted(r.id for r in t.to_spark(spark).collect()) == list(range(10))
    # the rolled-past snapshot still time-travels
    assert t.to_spark(spark, snapshot_id=s2["snapshot-id"]).count() == 20
    # a new append builds on the rolled-back state with a fresh sequence
    s3 = append_dataframe(t, _mk(spark, 50, 55))
    assert s3["sequence-number"] > s2["sequence-number"]
    assert sorted(r.id for r in t.to_spark(spark).collect()) == list(range(10)) + list(range(50, 55))
    assert IcebergTable.load(table_loc).to_spark(spark).count() == 15

    # orphans: an aborted writer's stray parquet + a fresh in-flight file
    data_dir = os.path.join(t.location, "data")
    old_orphan = os.path.join(data_dir, "part=0", "orphan-old.parquet")
    new_orphan = os.path.join(data_dir, "part=0", "orphan-new.parquet")
    for p in (old_orphan, new_orphan):
        with open(p, "wb") as f:
            f.write(b"junk")
    past = _time.time() - 7200
    os.utime(old_orphan, (past, past))
    removed = t.remove_orphan_files(older_than_s=3600)
    assert removed == [old_orphan]
    assert os.path.exists(new_orphan) and not os.path.exists(old_orphan)
    os.remove(new_orphan)  # keep the dir clean for the scan below
    assert t.to_spark(spark).count() == 15
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.rollback_to(999999)


def test_pipeline_pure_python_iceberg_sink(spark, tmp_path):
    """ContinuousTopicPipeline → pure-Python Iceberg table: exactly-once
    across restarts (checkpoint replays nothing), one snapshot per
    micro-batch, table readable through metadata planning."""
    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    _mk(spark, 0, 60).withColumn("_partition", F.col("part")).write.parquet(src)
    loc = str(tmp_path / "ice")
    pipe = ContinuousTopicPipeline(
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
    )
    pipe.run_available_now()
    t = IcebergTable.load(loc)
    assert t.to_spark(spark).count() == 60
    n_snaps = len(t.metadata["snapshots"])
    # restart: checkpoint replays nothing, no new snapshots
    pipe.run_available_now()
    t.refresh()
    assert t.to_spark(spark).count() == 60
    assert len(t.metadata["snapshots"]) == n_snaps


def test_pipeline_iceberg_sink_locked_pointer_protocol(spark, tmp_path):
    """The streaming sink threads its commit protocol end-to-end: with
    LockedPointerCommit every micro-batch commit is a durable
    cross-process CAS (pointer file + flock), so a maintenance cron or
    backfill in another OS process can commit to the same table while
    the sink runs. Content and exactly-once semantics are unchanged, and
    the table is readable by a fresh protocol instance (a 'different
    process')."""
    from platform_spark.iceberg.commit import LockedPointerCommit
    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    _mk(spark, 0, 30).withColumn("_partition", F.col("part")).write.parquet(src)
    loc = str(tmp_path / "ice")
    pipe = ContinuousTopicPipeline(
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
        commit_protocol=LockedPointerCommit(),
    )
    pipe.run_available_now()
    t = IcebergTable.load(loc, protocol=LockedPointerCommit())
    assert t.to_spark(spark).count() == 30
    # another-process writer commits between sink runs; the sink's next
    # run retries through the shared on-disk pointer without losing it
    append_dataframe(
        t, _mk(spark, 100, 105).withColumn("_partition", F.col("part"))
    )
    pipe.run_available_now()  # checkpoint replays nothing
    t2 = IcebergTable.load(loc, protocol=LockedPointerCommit())
    assert t2.to_spark(spark).count() == 35
    # no version-hint: this table's catalog IS the pointer file
    meta_dir = os.path.join(t2.location, "metadata")
    assert not os.path.exists(os.path.join(meta_dir, "version-hint.text"))


def test_pipeline_sink_maintained_matviews(spark, tmp_path):
    """The CDC sink maintains declared IncrementalAggregate views
    itself: after every committed micro-batch each view folds that
    batch's changelog (O(changed rows)), so derived tables stay at most
    one batch stale with no separate scheduler. The folded state equals
    the full GROUP BY of the live table through upsert batches, survives
    a replayed restart untouched, and a view whose checkpoint is expired
    re-baselines with one rebuild instead of failing the sink."""
    from platform_spark.iceberg.matview import IncrementalAggregate
    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    for lo in range(0, 60, 20):  # three micro-batches (1 file per trigger)
        _mk(spark, lo, lo + 20).withColumn(
            "_partition", F.col("part")
        ).write.mode("append").parquet(src)
    loc = str(tmp_path / "ice")
    mv = IncrementalAggregate(
        str(tmp_path / "mv"), group_cols=["part"], sum_cols=["id"]
    )
    pipe = ContinuousTopicPipeline(
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
        upsert_keys=("id",),
        matviews=(mv,),
    )
    pipe.run_available_now()
    t = IcebergTable.load(loc)

    def full_agg():
        return {
            (r.part, r.n, r.sum_id)
            for r in t.to_spark(spark)
            .groupBy("part")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("sum_id"))
            .collect()
        }

    def mv_state():
        return {
            (r.part, r.n, r.sum_id)
            for r in mv.read(spark, t).collect()
        }

    assert mv_state() == full_agg()
    ck_after_run = mv.checkpoint()
    assert ck_after_run == t.current_snapshot()["snapshot-id"]
    # replayed restart: no new commits, view untouched
    pipe.run_available_now()
    t.refresh()
    assert mv.checkpoint() == ck_after_run and mv_state() == full_agg()
    # expired checkpoint → the sink re-baselines instead of dying
    _mk(spark, 100, 110).withColumn("_partition", F.col("part")).write.mode(
        "append"
    ).parquet(src)
    t.refresh()
    with open(mv._ckpt_path) as f:
        state = json.load(f)
    state["snapshot-id"] = 999_999  # a snapshot id that never existed
    with open(mv._ckpt_path, "w") as f:
        json.dump(state, f)
    pipe.run_available_now()
    t.refresh()
    assert mv_state() == full_agg()
    assert {r.id for r in t.to_spark(spark).collect()} == set(range(60)) | set(
        range(100, 110)
    )


def test_pipeline_iceberg_auto_maintenance(spark, tmp_path):
    """compact_every: the sink bin-packs and expires history on a commit
    cadence, so a long-running micro-batch ingest keeps O(packed files)
    scan planning; content and exactly-once behavior are unchanged."""
    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    # many small source files -> many micro-batch appends (1 file/trigger
    # is forced by writing each range separately)
    for lo in range(0, 60, 10):
        _mk(spark, lo, lo + 10).withColumn("_partition", F.col("part")).write.mode(
            "append"
        ).parquet(src)
    loc = str(tmp_path / "ice")
    pipe = ContinuousTopicPipeline(
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
        compact_every=1,
        expire_keep_last=2,
    )
    pipe.run_available_now()
    t = IcebergTable.load(loc)
    assert sorted(r.id for r in t.to_spark(spark).collect()) == list(range(60))
    # maintenance ran: history trimmed, live files bin-packed
    assert len(t.metadata["snapshots"]) <= 2
    assert len(t.scan_files()) <= 4  # ~1 per _partition value
    # restart replays nothing and keeps content stable
    pipe.run_available_now()
    t.refresh()
    assert t.to_spark(spark).count() == 60


def test_changes_and_expiry_respect_rollback(spark, table_loc):
    """changes() defaults its window to the CURRENT snapshot (not the
    highest-sequence one) and expire_snapshots always pins the current
    snapshot — both matter after rollback_to(), where the undone
    snapshots still top the sequence order."""
    df = _mk(spark, 0, 30)
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    s1 = append_dataframe(t, _mk(spark, 0, 10))
    append_dataframe(t, _mk(spark, 10, 20))
    append_dataframe(t, _mk(spark, 20, 30))
    t.rollback_to(s1["snapshot-id"])
    # default incremental window stops at the CURRENT snapshot: an
    # incremental consumer must never ingest the rolled-back rows
    assert t.changes(spark).count() == 10
    assert t.changes(spark, from_snapshot_id=s1["snapshot-id"]).count() == 0
    # expiry keeps the current snapshot alive even though it is not among
    # the newest keep_last (and raises rather than asserts if it ever
    # would drop it)
    res = t.expire_snapshots(keep_last=1)
    assert res["snapshots"] >= 1
    assert t.current_snapshot()["snapshot-id"] == s1["snapshot-id"]
    assert t.to_spark(spark).count() == 10
    assert IcebergTable.load(t.location).to_spark(spark).count() == 10


def test_avro_truncated_block_header_raises(tmp_path):
    """A manifest truncated mid-block-header must raise, not silently
    return partial entries (a scan would silently drop data files);
    clean EOF at a block boundary still reads fine."""
    path = str(tmp_path / "t.avro")
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    avro.write_container(path, schema, [{"x": i} for i in range(5)], codec="null")
    raw = open(path, "rb").read()
    # a lone continuation byte (0x80) with no terminator = a real
    # mid-varint truncation of the next block's count
    with open(path, "wb") as f:
        f.write(raw + b"\x80")
    with pytest.raises(ValueError, match="varint"):
        avro.read_container(path)
    with open(path, "wb") as f:
        f.write(raw)
    _, _, recs = avro.read_container(path)
    assert len(recs) == 5


def test_concurrent_appends_without_lock(spark, table_loc):
    """Multi-writer safety via per-commit staging prefixes: three
    concurrent appenders (no advisory lock exists anymore) each claim
    exactly their own files — the final table has every row once, every
    live data file is referenced by exactly one manifest entry, and no
    lock file is left behind. With 3 writers each conflict implies
    another writer's single commit succeeded, so 3 commit attempts are
    deterministically enough."""
    import threading

    df = _mk(spark, 0, 1)
    IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    errs: list[Exception] = []

    def appender(lo: int, hi: int) -> None:
        try:
            t = IcebergTable.load(table_loc, clock=CLOCK)
            append_dataframe(t, _mk(spark, lo, hi))
        except Exception as e:  # noqa: BLE001 — surfaced via assert below
            errs.append(e)

    threads = [
        threading.Thread(target=appender, args=(i * 30, (i + 1) * 30))
        for i in range(3)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    t = IcebergTable.load(table_loc)
    assert sorted(r.id for r in t.to_spark(spark).collect()) == list(range(90))
    files = [e["data_file"]["file_path"] for e in t.scan_files()]
    assert len(files) == len(set(files))  # no double-claimed part file
    assert not os.path.exists(os.path.join(t.location, ".write.lock"))
    # no staging leftovers under data/
    assert not [
        d for d in os.listdir(os.path.join(t.location, "data"))
        if d.startswith("_stage-")
    ]


def test_cas_commit_unit_semantics(tmp_path):
    """CasCommit is a true compare-and-swap: the metadata write itself
    never conflicts (writer-unique names); only the pointer swap admits
    one winner per version, and the loser's file is removed."""
    from platform_spark.iceberg.commit import CasCommit, CommitConflict

    loc = str(tmp_path / "t")
    cat = CasCommit()
    assert cat.current(loc) is None
    p1 = cat.commit(loc, 0, {"v": 1})
    assert cat.current(loc) == (1, p1)
    with pytest.raises(CommitConflict):
        cat.commit(loc, 0, {"v": "loser"})  # stale expected version
    metas = os.listdir(os.path.join(loc, "metadata"))
    assert len(metas) == 1  # the loser's unique file was cleaned up
    p2 = cat.commit(loc, 1, {"v": 2})
    assert cat.current(loc) == (2, p2) and p2 != p1


def test_locked_pointer_commit_unit_semantics(tmp_path):
    """LockedPointerCommit is the DURABLE form of the CAS protocol: the
    pointer lives on disk, so two independent protocol INSTANCES (the
    in-process stand-in for two OS processes) see each other's commits,
    a stale expected version loses with its unique file cleaned up, and
    a brand-new instance — a process restart — resumes from the
    persisted pointer."""
    from platform_spark.iceberg.commit import CommitConflict, LockedPointerCommit

    loc = str(tmp_path / "t")
    a, b = LockedPointerCommit(), LockedPointerCommit()
    assert a.current(loc) is None
    p1 = a.commit(loc, 0, {"v": 1})
    assert b.current(loc) == (1, p1)  # no shared Python state
    with pytest.raises(CommitConflict):
        b.commit(loc, 0, {"v": "loser"})
    metas = [
        f for f in os.listdir(os.path.join(loc, "metadata"))
        if f.endswith(".metadata.json")
    ]
    assert len(metas) == 1
    p2 = b.commit(loc, 1, {"v": 2})
    assert LockedPointerCommit().current(loc) == (2, p2)  # restart survives


_LOCKED_POINTER_WORKER = """
import os, sys
sys.path.insert(0, sys.argv[4])
from platform_spark.iceberg.commit import CommitConflict, LockedPointerCommit

loc, n, wid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[5]
p = LockedPointerCommit()
lines = []
done = 0
while done < n:
    cur = p.current(loc)
    v = cur[0] if cur else 0
    try:
        path = p.commit(loc, v, {"writer": wid, "seq": done, "parent": v})
    except CommitConflict:
        continue  # refresh-and-retry, same loop every table caller runs
    won = int(os.path.basename(path).split("-")[0][1:])
    lines.append(f"{wid},{done},{won}")
    done += 1
with open(out, "w") as f:
    f.write("\\n".join(lines))
"""


def test_locked_pointer_commit_two_os_processes(tmp_path):
    """The last single-process assumption, removed: three separate OS
    PROCESSES hammer one table's pointer through LockedPointerCommit
    with conflict-retry, and the result is a strictly linear version
    chain — every commit lands on exactly one version, no version is
    double-claimed, no commit is lost, and losers leave no metadata
    litter. This is the multi-writer deployment (streaming sink +
    maintenance cron + backfill) the reference runs through its
    iceberg-go catalog service."""
    import subprocess
    import sys

    loc = str(tmp_path / "t")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_workers, n_commits = 3, 15
    procs = []
    outs = []
    for w in range(n_workers):
        out = str(tmp_path / f"w{w}.csv")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c", _LOCKED_POINTER_WORKER,
                    loc, str(n_commits), f"w{w}", repo, out,
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()
    rows = []
    for out in outs:
        with open(out) as f:
            rows += [ln.split(",") for ln in f.read().splitlines() if ln]
    total = n_workers * n_commits
    assert len(rows) == total
    # strictly linear history: versions 1..total, each won exactly once
    assert sorted(int(r[2]) for r in rows) == list(range(1, total + 1))
    # no commit lost or duplicated per worker
    for w in range(n_workers):
        seqs = sorted(int(r[1]) for r in rows if r[0] == f"w{w}")
        assert seqs == list(range(n_commits))
    from platform_spark.iceberg.commit import LockedPointerCommit

    version, path = LockedPointerCommit().current(loc)
    assert version == total and os.path.exists(path)
    # losers cleaned up: exactly one metadata file per won version
    metas = [
        f for f in os.listdir(os.path.join(loc, "metadata"))
        if f.endswith(".metadata.json")
    ]
    assert len(metas) == total


def test_locked_pointer_commit_spark_table(spark, table_loc):
    """An IcebergTable runs end-to-end through LockedPointerCommit, and
    two table handles with SEPARATE protocol instances — two processes,
    as far as the protocol can tell — interleave appends and row-level
    deletes correctly: the stale handle's commit retries through the
    on-disk pointer instead of clobbering."""
    from platform_spark.iceberg.commit import LockedPointerCommit
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1)
    IcebergTable.create(
        table_loc, df.schema, partition_by=("part",), clock=CLOCK,
        protocol=LockedPointerCommit(),
    )
    t1 = IcebergTable.load(table_loc, clock=CLOCK, protocol=LockedPointerCommit())
    t2 = IcebergTable.load(table_loc, clock=CLOCK, protocol=LockedPointerCommit())
    append_dataframe(t1, _mk(spark, 0, 20))
    append_dataframe(t2, _mk(spark, 20, 40))  # t2 was stale: internal retry
    upsert_dataframe(
        t1, _mk(spark, 5, 10).withColumn("text", F.lit("v2")), ["id"]
    )
    t3 = IcebergTable.load(table_loc, protocol=LockedPointerCommit())
    got = {(r.id, r.text) for r in t3.to_spark(spark).collect()}
    want = {
        (i, "v2" if 5 <= i < 10 else f"doc-{i}") for i in range(40)
    }
    assert got == want
    meta_dir = os.path.join(t3.location, "metadata")
    assert not os.path.exists(os.path.join(meta_dir, "version-hint.text"))


def test_commit_conflict_budget_is_bounded(spark, table_loc):
    """Every metadata-evolution path shares ONE bounded conflict budget
    (_commit_metadata_update): under a permanently-conflicting protocol
    — the wedged-foreign-writer failure mode of a conditional-put S3
    backend — the table raises CommitConflict loudly after exactly
    COMMIT_ATTEMPTS total losses instead of looping forever (the old
    shape recursed with a FRESH 3-attempt budget per conflict; r12
    verdict #3)."""
    from platform_spark.iceberg.commit import CommitConflict, FilesystemCommit

    df = spark.range(0, 10).select(F.col("id"))
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    append_dataframe(t, df)
    append_dataframe(t, df)  # 2 snapshots: expire below has real work
    # one committed no-match equality delete so rewrite_deletes below
    # has a live delete file to fold (its wedged run must reach the
    # commit, not return early) — id=99 matches nothing, count stays 20
    t.delete_keys(spark, spark.createDataFrame([(99,)], "id: long"))

    class WedgedCommit(FilesystemCommit):
        """Reads fine; every commit loses the race."""

        def __init__(self):
            self.attempts = 0

        def commit(self, location, expected_version, metadata):
            self.attempts += 1
            raise CommitConflict(f"wedged at v{expected_version}")

    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    for op in (
        # metadata-only paths (_commit_metadata_update)
        lambda w: w.create_tag("v1"),
        lambda w: w.evolve_sort_order(("id",)),
        lambda w: w.evolve_partition_spec(("bucket(id, 4)",)),
        lambda w: w.rollback_to(w.metadata["current-snapshot-id"]),
        lambda w: w.rename_column("id", "id2"),
        lambda w: w.expire_snapshots(keep_last=1),
        # file-commit paths share the SAME budget via
        # _commit_with_retries (r13 verdict #4): an append and a
        # compaction against the wedged protocol give up just as loudly
        lambda w: append_dataframe(w, df),
        lambda w: compact_table(w, spark),
        lambda w: w.rewrite_manifests(),
        # r14 verdict #6: the delete/upsert/maintenance sites joined
        # the shared budget in r14 — every one of them gives up just
        # as loudly, leaving the table untouched
        lambda w: w.delete_where(spark, "id < 5"),
        lambda w: w.delete_keys(spark, df.limit(3)),
        lambda w: upsert_dataframe(w, df, ["id"]),
        lambda w: merge_into(w, df, ["id"], spark=spark),
        lambda w: rewrite_deletes(w, spark),
    ):
        proto = WedgedCommit()
        wedged = IcebergTable.load(table_loc, clock=CLOCK, protocol=proto)
        with pytest.raises(CommitConflict, match="lost the commit race"):
            op(wedged)
        assert proto.attempts == IcebergTable.COMMIT_ATTEMPTS
    # the table itself is untouched: a fresh loader sees the old state
    t2 = IcebergTable.load(table_loc)
    assert t2.metadata.get("refs", {}) == {}
    assert t2.to_spark(spark).count() == 20
    assert len(t2.metadata["snapshots"]) == 3  # nothing expired


def test_cas_commit_protocol_concurrent_appends(spark, table_loc):
    """The pluggable catalog commit in its CAS shape (pointer swap — what
    an S3/DynamoDB/REST deployment implements, no O_EXCL anywhere):
    three concurrent appenders through ONE catalog instance produce the
    same every-row-once table the filesystem protocol does, and the
    version-hint/v{N} filenames are gone from the commit path."""
    import threading

    from platform_spark.iceberg.commit import CasCommit

    cat = CasCommit()
    df = _mk(spark, 0, 1)
    IcebergTable.create(
        table_loc, df.schema, partition_by=("part",), clock=CLOCK, protocol=cat
    )
    errs: list[Exception] = []

    def appender(lo: int, hi: int) -> None:
        try:
            t = IcebergTable.load(table_loc, clock=CLOCK, protocol=cat)
            append_dataframe(t, _mk(spark, lo, hi))
        except Exception as e:  # noqa: BLE001 — surfaced via assert below
            errs.append(e)

    threads = [
        threading.Thread(target=appender, args=(i * 30, (i + 1) * 30))
        for i in range(3)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    t = IcebergTable.load(table_loc, protocol=cat)
    assert t.version == 4  # create + exactly one pointer swap per append
    assert sorted(r.id for r in t.to_spark(spark).collect()) == list(range(90))
    files = [e["data_file"]["file_path"] for e in t.scan_files()]
    assert len(files) == len(set(files))  # no double-claimed part file
    meta_dir = os.path.join(t.location, "metadata")
    assert not os.path.exists(os.path.join(meta_dir, "version-hint.text"))
    # loser metadata files were removed: one unique file per won version
    metas = [f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")]
    assert len(metas) == 4
    # the metadata-log chain records the real (writer-unique) paths
    log_paths = [m["metadata-file"] for m in t.metadata["metadata-log"]]
    assert all(os.path.basename(p) in metas for p in log_paths)
    # history replay works through the protocol: MoR delete + reload
    t.delete_where(spark, "id % 30 = 7")
    t2 = IcebergTable.load(table_loc, protocol=cat)
    assert sorted(r.id for r in t2.to_spark(spark).collect()) == [
        i for i in range(90) if i % 30 != 7
    ]


def test_conditional_put_commit_unit_semantics(tmp_path):
    """ConditionalPutCommit is the tested seam for the S3 deployment
    claim ('swap the flock section for a conditional put; nothing else
    changes'): separate protocol instances sharing one store see each
    other's commits, a stale expected version fast-fails WITHOUT a
    write, and a pointer swap racing between the GET and the
    conditional PUT is caught by the etag precondition — both loser
    paths clean up their unique metadata file."""
    from platform_spark.iceberg.commit import (
        CommitConflict, ConditionalPutCommit, EtagObjectStore,
    )

    store = EtagObjectStore()
    loc = str(tmp_path / "t")
    a = ConditionalPutCommit(store)
    b = ConditionalPutCommit(store)
    assert a.current(loc) is None
    p1 = a.commit(loc, 0, {"v": 1})
    assert b.current(loc) == (1, p1)  # shared store, no shared instance
    # stale version: fast fail on the GET, before any conditional put
    with pytest.raises(CommitConflict):
        b.commit(loc, 0, {"v": "loser"})
    metas = [
        f for f in os.listdir(os.path.join(loc, "metadata"))
        if f.endswith(".metadata.json")
    ]
    assert len(metas) == 1
    # GET->PUT race: a competing writer swaps the pointer after this
    # commit's GET returned a matching version — the If-Match etag
    # rejects the now-stale put
    real_get = store.get
    raced = {"done": False}

    def racing_get(key):
        got = real_get(key)
        if not raced["done"]:
            raced["done"] = True
            b.commit(loc, 1, {"v": "sniper"})
        return got

    store.get = racing_get
    with pytest.raises(CommitConflict, match="between read and swap"):
        a.commit(loc, 1, {"v": "too-slow"})
    store.get = real_get
    assert a.current(loc)[0] == 2  # the sniper's commit stands
    metas = [
        f for f in os.listdir(os.path.join(loc, "metadata"))
        if f.endswith(".metadata.json")
    ]
    assert len(metas) == 2  # winner v1 + sniper v2; both losers removed


def test_conditional_put_commit_hammer_and_table(spark, table_loc, tmp_path):
    """The LockedPointerCommit hammer's semantics, replayed through the
    conditional-put protocol (threaded — the store stands for the
    remote service, each thread for a client process): a strictly
    linear version chain, every commit lands exactly once, no metadata
    litter. Then an IcebergTable runs end-to-end through it with stale
    handles retrying via the store."""
    import threading

    from platform_spark.iceberg.commit import (
        CommitConflict, ConditionalPutCommit, EtagObjectStore,
    )
    from platform_spark.iceberg.table import upsert_dataframe

    store = EtagObjectStore()
    loc = str(tmp_path / "hammer")
    n_workers, n_commits = 3, 15
    rows: list[tuple[str, int, int]] = []
    rows_lock = threading.Lock()
    errs: list[Exception] = []

    def worker(wid: str) -> None:
        # own protocol instance = own "process"; only the store is shared
        p = ConditionalPutCommit(store)
        done = 0
        try:
            while done < n_commits:
                cur = p.current(loc)
                v = cur[0] if cur else 0
                try:
                    path = p.commit(
                        loc, v, {"writer": wid, "seq": done, "parent": v}
                    )
                except CommitConflict:
                    continue  # refresh-and-retry, same as every caller
                won = int(os.path.basename(path).split("-")[0][1:])
                with rows_lock:
                    rows.append((wid, done, won))
                done += 1
        except Exception as e:  # noqa: BLE001 — surfaced via assert
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(f"w{w}",))
        for w in range(n_workers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    total = n_workers * n_commits
    assert len(rows) == total
    # strictly linear history: versions 1..total, each won exactly once
    assert sorted(r[2] for r in rows) == list(range(1, total + 1))
    for w in range(n_workers):
        seqs = sorted(r[1] for r in rows if r[0] == f"w{w}")
        assert seqs == list(range(n_commits))
    version, path = ConditionalPutCommit(store).current(loc)
    assert version == total and os.path.exists(path)
    # losers cleaned up: exactly one metadata file per won version
    metas = [
        f for f in os.listdir(os.path.join(loc, "metadata"))
        if f.endswith(".metadata.json")
    ]
    assert len(metas) == total

    # end-to-end: a Spark table commits through the conditional put,
    # and a stale second handle's append retries through the store
    df = _mk(spark, 0, 1)
    IcebergTable.create(
        table_loc, df.schema, partition_by=("part",), clock=CLOCK,
        protocol=ConditionalPutCommit(store),
    )
    t1 = IcebergTable.load(
        table_loc, clock=CLOCK, protocol=ConditionalPutCommit(store)
    )
    t2 = IcebergTable.load(
        table_loc, clock=CLOCK, protocol=ConditionalPutCommit(store)
    )
    append_dataframe(t1, _mk(spark, 0, 20))
    append_dataframe(t2, _mk(spark, 20, 40))  # t2 stale: internal retry
    upsert_dataframe(
        t1, _mk(spark, 5, 10).withColumn("text", F.lit("v2")), ["id"]
    )
    t3 = IcebergTable.load(table_loc, protocol=ConditionalPutCommit(store))
    got = {(r.id, r.text) for r in t3.to_spark(spark).collect()}
    want = {(i, "v2" if 5 <= i < 10 else f"doc-{i}") for i in range(40)}
    assert got == want
    meta_dir = os.path.join(t3.location, "metadata")
    assert not os.path.exists(os.path.join(meta_dir, "version-hint.text"))


def test_parallel_manifest_planning_matches_serial(spark, table_loc, monkeypatch):
    """scan_files with spark fans manifest decode out as a Spark job past
    the threshold; the plan (entries, order, inherited sequence numbers,
    partition pruning) must be identical to the serial driver decode."""
    from platform_spark.iceberg import table as tbl_mod

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    for i in range(6):  # 6 append commits -> 6 data manifests carried
        append_dataframe(t, _mk(spark, i * 10, (i + 1) * 10))
    t.delete_where(spark, "id % 11 = 3")
    monkeypatch.setattr(tbl_mod, "_PARALLEL_PLAN_MIN", 2)
    for pf in (None, {"part": 1}):
        serial = t.scan_files(partition_filter=pf)
        par = t.scan_files(partition_filter=pf, spark=spark)
        assert par == serial and len(serial) > 0
    assert t.scan_deletes(spark=spark) == t.scan_deletes()
    # the merge-on-read scan through the parallel planner stays correct
    got = sorted(r.id for r in t.to_spark(spark).collect())
    assert got == [i for i in range(60) if i % 11 != 3]


def test_merge_planning_bound(spark, table_loc):
    """merge_into caps its driver-collected affected-file set: a merge
    touching every file still works under the default bound, and one
    matching more files than max_affected_files raises loudly, pointing
    at the rewrite path."""
    from platform_spark.iceberg.table import merge_into

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 20))
    append_dataframe(t, _mk(spark, 20, 40))
    assert len(t.scan_files()) >= 8  # 2 commits x 4 partitions
    # source matching EVERY row -> every file affected; default bound ok
    src = _mk(spark, 0, 40).withColumn("text", F.lit("rewritten"))
    merge_into(t, src, ["id"], spark)
    got = t.to_spark(spark)
    assert got.count() == 40
    assert got.filter("text <> 'rewritten'").count() == 0
    # bound of 1 with >1 affected file raises and commits nothing
    v_before = t.version
    with pytest.raises(ValueError, match="replace_files"):
        merge_into(t, _mk(spark, 0, 40), ["id"], spark, max_affected_files=1)
    assert IcebergTable.load(table_loc).version == v_before


def _ts_rows(spark, a, b):
    # 4 rows per UTC day starting 2024-01-01 (epoch 1704067200)
    return spark.range(a, b).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 21600).alias("ts"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
    )


def test_day_transform_partitioning(spark, table_loc):
    """Hidden time partitioning (spec day transform): the source ts
    column stays a data column, the derived int days-since-epoch value
    lives only in paths/manifests, scans prune by day, and the row-level
    ops (delete/merge/partition-scoped compaction) work over it."""
    import datetime

    from platform_spark.iceberg.table import compact_table, merge_into

    df = _ts_rows(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("days(ts)",), clock=CLOCK)
    assert t.spec["fields"][0] == {
        "name": "ts_day", "transform": "day", "source-id": 2, "field-id": 1000,
    }
    append_dataframe(t, _ts_rows(spark, 0, 20))
    append_dataframe(t, _ts_rows(spark, 20, 40))

    # the derived column is in the PATH and the manifests, not the files
    one_file = t.scan_files()[0]["data_file"]
    assert "ts_day=" in one_file["file_path"]
    assert one_file["partition"]["ts_day"] == (
        datetime.date.fromisoformat("2024-01-01")
        - datetime.date(1970, 1, 1)
    ).days + int(
        one_file["file_path"].split("ts_day=")[1].split("/")[0]
    ) - 19723  # value equals the dir component
    import pyarrow.parquet as pq

    assert pq.read_schema(one_file["file_path"]).names == ["id", "ts", "text"]

    # full scan: schema intact, ts values intact
    got = t.to_spark(spark)
    assert got.columns == ["id", "ts", "text"]
    assert got.count() == 40
    assert got.filter("ts IS NULL").count() == 0

    # metadata pruning by day: Jan 2 holds exactly ids 4-7
    day2 = {"ts_day": datetime.date(2024, 1, 2)}
    pruned = t.scan_files(partition_filter=day2)
    assert 0 < len(pruned) < len(t.scan_files())
    rows = sorted(r.id for r in t.to_spark(spark, partition_filter=day2).collect())
    assert rows == [4, 5, 6, 7]
    # datetime filters normalize to the same day value
    assert sorted(
        r.id
        for r in t.to_spark(
            spark,
            partition_filter={"ts_day": datetime.datetime(2024, 1, 2, 13, 0)},
        ).collect()
    ) == [4, 5, 6, 7]

    # row-level ops over the day-partitioned table
    t.delete_where(spark, "id % 10 = 1")
    merge_into(
        t,
        _ts_rows(spark, 0, 40).filter("id % 10 = 2").withColumn(
            "text", F.lit("merged")
        ),
        ["id"],
        spark,
    )
    got = t.to_spark(spark)
    assert got.count() == 36
    assert got.filter("text = 'merged'").count() == 4
    # partition-scoped compaction over one day keeps content identical
    before = sorted((r.id, r.text) for r in got.collect())
    compact_table(t, spark, partition_filter=day2)
    after = sorted((r.id, r.text) for r in t.to_spark(spark).collect())
    assert after == before


def test_mixed_identity_and_day_partitioning(spark, table_loc):
    """Identity + day transform together: identity column recovers from
    the path, the day dir prunes, and both filters compose."""
    import datetime

    df = _ts_rows(spark, 0, 1).withColumn("lang", F.lit("en"))
    t = IcebergTable.create(
        table_loc, df.schema, partition_by=("lang", "days(ts)"), clock=CLOCK
    )
    data = _ts_rows(spark, 0, 16).withColumn(
        "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
    )
    append_dataframe(t, data)
    got = t.to_spark(spark)
    assert got.count() == 16 and set(got.columns) == {"id", "ts", "text", "lang"}
    both = t.to_spark(
        spark,
        partition_filter={"lang": "de", "ts_day": datetime.date(2024, 1, 3)},
    )
    assert sorted(r.id for r in both.collect()) == [9, 11]
    with pytest.raises(ValueError, match="day\\(\\) needs a date/timestamp"):
        IcebergTable.create(
            str(table_loc) + "2", df.schema, partition_by=("days(lang)",)
        )


def test_pipeline_day_partitioned_iceberg_sink(spark, tmp_path):
    """days(_ts) on the streaming sink: the corpus table partitions by
    ingest day (the shape every 100 TB deployment uses), a day filter
    prunes the scan to that day's files (asserted on the actual file
    list Spark reads), and partition-scoped auto-maintenance compacts
    only the touched days."""
    import datetime

    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    for lo in range(0, 32, 8):  # several micro-batches
        _ts_rows(spark, lo, lo + 8).withColumnRenamed("ts", "_ts").write.mode(
            "append"
        ).parquet(src)
    loc = str(tmp_path / "ice")
    pipe = ContinuousTopicPipeline(
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
        partition_cols=("days(_ts)",),
        compact_every=1,
        expire_keep_last=2,
    )
    pipe.run_available_now()
    t = IcebergTable.load(loc)
    assert t.spec["fields"][0]["transform"] == "day"
    got = t.to_spark(spark)
    assert got.count() == 32 and "_ts" in got.columns
    # time-pruned scan: the day filter reaches the FILE LIST the parquet
    # scan is planned over, not just a post-filter
    day3 = {"_ts_day": datetime.date(2024, 1, 3)}
    full_files = set(t.to_spark(spark).inputFiles())
    day_files = set(t.to_spark(spark, partition_filter=day3).inputFiles())
    assert day_files and day_files < full_files
    assert all("_ts_day=19725" in f for f in day_files)
    rows = sorted(
        r.id for r in t.to_spark(spark, partition_filter=day3).collect()
    )
    assert rows == [8, 9, 10, 11]
    # maintenance compacted per-day: each day's live data is ~1 file
    assert len(t.scan_files(partition_filter=day3)) <= 2
    # restart replays nothing
    n_snaps = len(t.metadata["snapshots"])
    pipe.run_available_now()
    t.refresh()
    assert t.to_spark(spark).count() == 32
    assert len(t.metadata["snapshots"]) == n_snaps


def test_kafsql_engine_runs_directly_on_iceberg_tables(spark, tmp_path):
    """KAFSQL over Iceberg: every dialect query shape runs against
    Iceberg-backed topics via IcebergTopicCatalog and matches the same
    engine over the parquet topics — incl. after a row-level delete is
    committed (the Iceberg side then matches a filtered parquet side)."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import (
        IcebergTopicCatalog,
        materialize_topic_to_iceberg,
    )
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    root = str(tmp_path / "icetopics")
    os.makedirs(root, exist_ok=True)
    for topic in ("events", "orders", "payments"):
        materialize_topic_to_iceberg(
            cat.topic(topic, with_schema_columns=False), root, topic
        )

    now = datetime(2024, 1, 31)
    ieng = KafSqlEngine(
        IcebergTopicCatalog(spark, root, configs=cat.configs), now=now
    )
    peng = KafSqlEngine(cat, now=now)
    queries = [
        "SELECT _partition, _offset, _ts, _key FROM events "
        "WHERE _partition = 1 AND _ts <= '2024-01-31 00:00:00' LIMIT 100000",
        "SELECT _partition, count(*) AS n, sum(json_value(_value, '$.amount')) AS s "
        "FROM events LAST 30d GROUP BY _partition",
        "SELECT event_type, count(*) AS n FROM events LAST 30d GROUP BY event_type",
        "SELECT o._key AS k, json_value(p._value, '$.method') AS m "
        "FROM orders o JOIN payments p ON o._key = p._key WITHIN 10m "
        "LAST 15000d LIMIT 100000",
        "SELECT _partition, _offset, _key FROM events TAIL 50",
    ]

    def canon(df):
        return sorted(
            tuple("<null>" if v is None else str(v) for v in row)
            for row in df.collect()
        )

    for q in queries:
        assert canon(ieng.sql(q)) == canon(peng.sql(q)), q
    # catalog surfaces over the iceberg root
    assert {r.topic for r in ieng.sql("SHOW TOPICS").collect()} == {
        "events", "orders", "payments"
    }
    assert ieng.sql("DESCRIBE events").count() >= 8

    # a GDPR-style row-level delete is visible to the dialect immediately
    from platform_spark.iceberg.table import IcebergTable

    IcebergTable.load(os.path.join(root, "events")).delete_where(
        spark, "_offset % 2 = 1"
    )
    got = canon(ieng.sql(queries[0]))
    want = canon(
        peng.sql(queries[0]).filter("_offset % 2 = 0")
    )
    assert got == want and len(got) > 0


def test_kafsql_bucket_point_lookup(spark, tmp_path):
    """Dialect point lookup over a `_key`-bucketed Iceberg topic (r12
    verdict #4): `WHERE _key = 'x'` maps through the catalog's metadata
    planner to ONE spec bucket's files — the compiled scan's inputFiles
    is a strict subset (~1/N) of the table — while the exact row filter
    keeps the result identical to the parquet engine's full-scan
    answer."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "bkttopics")
    os.makedirs(root, exist_ok=True)
    t = IcebergTable.create(
        os.path.join(root, "events"), ev.schema,
        partition_by=("bucket(_key, 8)",), clock=CLOCK,
    )
    # several appends so every bucket holds multiple files
    for p in range(4):
        append_dataframe(t, ev.filter(F.col("_partition") == p))
    key = (
        ev.filter(F.col("_key").isNotNull())
        .select(F.col("_key").cast("string").alias("k"))
        .first()
        .k
    )

    icat = IcebergTopicCatalog(spark, root, configs=cat.configs)
    all_entries = t.scan_files(spark=spark)
    planned = icat._pruned_entries(t, None, None, None, key_eq=key)
    assert 0 < len(planned) <= len(all_entries) // 4  # ~1/8 of the files
    # str and bytes forms hash identically (spec: UTF-8 bytes)
    want_bucket = t.bucket_value("_key", key)
    assert want_bucket == t.bucket_value("_key", key.encode("utf-8"))
    for e in planned:
        assert e["data_file"]["partition"]["_key_bucket"] == want_bucket

    now = datetime(2024, 1, 31)
    ieng = KafSqlEngine(icat, now=now)
    q = (
        f"SELECT _partition, _offset, _key FROM events WHERE _key = '{key}' "
        "LAST 30d LIMIT 100000"
    )
    df = ieng.sql(q)
    # the COMPILED scan reads only the planned bucket's parquet files
    norm = lambda p: p.replace("file:", "").lstrip("/")  # noqa: E731
    assert {norm(f) for f in df.inputFiles()} == {
        norm(e["data_file"]["file_path"]) for e in planned
    }
    # same rows as the parquet engine's full-scan evaluation of the
    # same query (there `_key =` is just an exact row filter)
    peng = KafSqlEngine(cat, now=now)
    canon = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    got, want = canon(df), canon(peng.sql(q))
    assert got == want and len(got) > 0
    # EXPLAIN prices the lookup from manifests: 1/N of the full estimate
    est_all = icat.estimate_topic_scan("events")
    est_key = icat.estimate_topic_scan("events", key_eq=key)
    assert 0 < est_key.files <= est_all.files // 4
    assert est_key.rows < est_all.rows

    # IN-list batch fetch: two keys from DIFFERENT buckets plan exactly
    # the union of both buckets' files
    keys2 = [
        r.k
        for r in ev.filter(F.col("_key").isNotNull())
        .select(F.col("_key").cast("string").alias("k"))
        .distinct()
        .collect()
    ]
    b0 = t.bucket_value("_key", keys2[0])
    other = next(k for k in keys2 if t.bucket_value("_key", k) != b0)
    pair = (keys2[0], other)
    planned_in = icat._pruned_entries(t, None, None, None, key_eq=pair)
    want_ids = {t.bucket_value("_key", k) for k in pair}
    got_ids = {
        e["data_file"]["partition"]["_key_bucket"] for e in planned_in
    }
    assert got_ids == want_ids
    assert len(planned_in) > len(planned)  # two buckets > one
    q_in = (
        "SELECT _partition, _offset, _key FROM events "
        f"WHERE _key IN ('{pair[0]}', '{pair[1]}') LAST 30d LIMIT 100000"
    )
    df_in = ieng.sql(q_in)
    assert {norm(f) for f in df_in.inputFiles()} == {
        norm(e["data_file"]["file_path"]) for e in planned_in
    }
    assert canon(df_in) == canon(peng.sql(q_in)) and df_in.count() > 0


def test_bucket_point_lookup_across_spec_evolution(spark, tmp_path):
    """Point lookup stays CORRECT — and still prunes — after
    evolve_partition_spec changes the bucket count (r13 ADVICE medium):
    both eras' spec fields are named `_key_bucket`, so a by-name filter
    carrying the CURRENT spec's bucket[8] id would silently mis-prune
    the bucket[4] manifests and drop their rows from the lookup. The
    BucketLookup filter re-hashes the raw key per manifest spec, so the
    old era plans its own 1/4 and the new era its own 1/8."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "evtopics")
    os.makedirs(root, exist_ok=True)
    t = IcebergTable.create(
        os.path.join(root, "events"), ev.schema,
        partition_by=("bucket(_key, 4)",), clock=CLOCK,
    )
    # era 1: two appends under bucket[4]
    append_dataframe(t, ev.filter(F.col("_partition") < 2))
    append_dataframe(t, ev.filter(F.col("_partition") == 2))
    old_entries = {
        e["data_file"]["file_path"] for e in t.scan_files(spark=spark)
    }
    t.evolve_partition_spec(("bucket(_key, 8)",))
    # era 2: one append under bucket[8]
    append_dataframe(t, ev.filter(F.col("_partition") == 3))

    from platform_spark.iceberg.bucket import bucket_value as bv

    # a key whose bucket[4] id differs from bucket[8] id — the shape
    # where the by-name bug actually drops rows (ids equal by luck
    # would mask it)
    key = next(
        r.k
        for r in ev.filter(F.col("_key").isNotNull())
        .select(F.col("_key").cast("string").alias("k"))
        .distinct()
        .collect()
        if bv(r.k, "string", 4) != bv(r.k, "string", 8)
    )
    b4, b8 = bv(key, "string", 4), bv(key, "string", 8)

    icat = IcebergTopicCatalog(spark, root, configs=cat.configs)
    planned = icat._pruned_entries(t, None, None, None, key_eq=key)
    planned_old = [
        e for e in planned if e["data_file"]["file_path"] in old_entries
    ]
    planned_new = [
        e for e in planned if e["data_file"]["file_path"] not in old_entries
    ]
    # BOTH eras contribute files, each pruned under its OWN bucket id
    assert planned_old and planned_new
    for e in planned_old:
        assert e["data_file"]["partition"]["_key_bucket"] == b4
    for e in planned_new:
        assert e["data_file"]["partition"]["_key_bucket"] == b8
    # and the prune is real: a strict subset of each era's files
    all_entries = t.scan_files(spark=spark)
    assert len(planned) < len(all_entries)

    now = datetime(2024, 1, 31)
    ieng = KafSqlEngine(icat, now=now)
    q = (
        f"SELECT _partition, _offset, _key FROM events WHERE _key = '{key}' "
        "LAST 30d LIMIT 100000"
    )
    df = ieng.sql(q)
    norm = lambda p: p.replace("file:", "").lstrip("/")  # noqa: E731
    assert {norm(f) for f in df.inputFiles()} == {
        norm(e["data_file"]["file_path"]) for e in planned
    }
    # row-identical to the parquet engine's full-scan answer — rows from
    # the old era included (the bug dropped exactly these)
    peng = KafSqlEngine(cat, now=now)
    canon = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    got = canon(df)
    assert got == canon(
        peng.sql(q).filter(F.col("_partition") <= 3)
    ) and len(got) > 0


def test_kafsql_system_time_as_of(spark, tmp_path):
    """`FROM t FOR SYSTEM_TIME AS OF <ts>` through the dialect (r12
    verdict #5): replays the snapshot current at the instant — the
    corpus-reproducibility query ('what did the topic look like when
    the training set was cut'). Pre-upsert instants see the original
    rows, later instants the upserted ones; pre-history instants and
    non-Iceberg catalogs fail loudly."""
    from datetime import datetime

    from platform_spark.errors import ValidationError
    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.iceberg.table import upsert_dataframe
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "ttopics")
    os.makedirs(root, exist_ok=True)
    times = [1_700_000_000.0]
    t = IcebergTable.create(
        os.path.join(root, "events"), ev.schema,
        partition_by=("_partition",), clock=lambda: times[0],
    )
    append_dataframe(t, ev)
    times[0] += 3600.0  # upsert lands one hour later
    upsert_dataframe(
        t,
        ev.filter("_offset % 5 = 0").withColumn("_segment", F.lit("upserted")),
        ["_partition", "_offset"],
    )

    now = datetime(2024, 1, 31)
    ieng = KafSqlEngine(IcebergTopicCatalog(spark, root), now=now)
    between_ms = 1_700_000_000_000 + 1_800_000  # between the two commits
    q_tpl = (
        "SELECT _segment, count(*) AS n FROM events "
        "FOR SYSTEM_TIME AS OF {ts} LAST 30d GROUP BY _segment"
    )
    # pre-upsert instant: no 'upserted' segment, original row count
    before = {
        r._segment: r.n
        for r in ieng.sql(q_tpl.format(ts=between_ms)).collect()
    }
    assert "upserted" not in before
    total = ev.filter(
        "_ts >= timestamp'2024-01-01' and _ts <= timestamp'2024-01-31'"
    ).count()
    assert sum(before.values()) == total
    # post-upsert instant: upserted rows visible, total unchanged
    after_ms = 1_700_000_000_000 + 7_200_000
    after = {
        r._segment: r.n
        for r in ieng.sql(q_tpl.format(ts=after_ms)).collect()
    }
    assert after.get("upserted", 0) > 0
    assert sum(after.values()) == total
    # the un-suffixed read equals the latest instant
    current = {
        r._segment: r.n
        for r in ieng.sql(
            "SELECT _segment, count(*) AS n FROM events LAST 30d "
            "GROUP BY _segment"
        ).collect()
    }
    assert current == after
    # EXPLAIN prices the historical snapshot (more files pre-compaction
    # semantics aside: both estimates come from manifests, no footers)
    icat = IcebergTopicCatalog(spark, root)
    est_before = icat.estimate_topic_scan("events", as_of=between_ms)
    est_after = icat.estimate_topic_scan("events", as_of=after_ms)
    assert est_before.rows < est_after.rows  # upsert added data+delete rows
    # pre-history instant fails loudly
    with pytest.raises(ValueError, match="predates"):
        ieng.sql(q_tpl.format(ts=1_600_000_000_000)).collect()
    # a catalog without snapshot history rejects time travel
    peng = KafSqlEngine(cat, now=now)
    with pytest.raises(ValidationError, match="Iceberg-backed"):
        peng.sql(q_tpl.format(ts=between_ms))

    # SHOW SNAPSHOTS: the discovery half — two snapshots, both on the
    # current lineage, ordered by made_current_at
    snaps = ieng.sql("SHOW SNAPSHOTS FROM events").collect()
    assert len(snaps) == 2
    assert snaps[0].made_current_at < snaps[1].made_current_at
    assert all(r.is_current_ancestor for r in snaps)
    # made_current_at renders through F4's text convention (r13 verdict
    # #7) — the pinned metadata clock makes the text exact, and quoted
    # back into FOR SYSTEM_TIME AS OF it replays the same snapshot
    assert snaps[0].made_current_at == "2023-11-14 22:13:20.000"
    assert snaps[1].made_current_at == "2023-11-14 23:13:20.000"
    replay = {
        r._segment: r.n
        for r in ieng.sql(
            "SELECT _segment, count(*) AS n FROM events "
            f"FOR SYSTEM_TIME AS OF '{snaps[0].made_current_at}' "
            "LAST 30d GROUP BY _segment"
        ).collect()
    }
    assert replay == before
    with pytest.raises(ValidationError, match="Iceberg-backed"):
        peng.sql("SHOW SNAPSHOTS FROM events")

    # FOR SYSTEM_VERSION AS OF <id>: pin the first snapshot by id —
    # identical result to the pre-upsert instant read
    first_id = snaps[0].snapshot_id
    ver = {
        r._segment: r.n
        for r in ieng.sql(
            "SELECT _segment, count(*) AS n FROM events "
            f"FOR SYSTEM_VERSION AS OF {first_id} LAST 30d "
            "GROUP BY _segment"
        ).collect()
    }
    assert ver == before
    # unknown/expired ids fail loudly, naming the discovery statement
    with pytest.raises(ValueError, match="SHOW SNAPSHOTS"):
        ieng.sql(
            "SELECT _segment, count(*) AS n FROM events "
            "FOR SYSTEM_VERSION AS OF 9999 LAST 30d GROUP BY _segment"
        )
    # named-ref form: a tag pinned at the first snapshot reads the same
    # pre-upsert state, survives history however it evolves
    t.create_tag("corpus-v1", snapshot_id=first_id)
    tagged = {
        r._segment: r.n
        for r in ieng.sql(
            "SELECT _segment, count(*) AS n FROM events "
            "FOR SYSTEM_VERSION AS OF 'corpus-v1' LAST 30d "
            "GROUP BY _segment"
        ).collect()
    }
    assert tagged == before
    with pytest.raises(ValueError, match="unknown ref"):
        ieng.sql(
            "SELECT _segment, count(*) AS n FROM events "
            "FOR SYSTEM_VERSION AS OF 'nope' LAST 30d GROUP BY _segment"
        )
    with pytest.raises(ValidationError, match="Iceberg-backed"):
        peng.sql(
            "SELECT _segment, count(*) AS n FROM events "
            f"FOR SYSTEM_VERSION AS OF {first_id} LAST 30d "
            "GROUP BY _segment"
        )


def test_bucket_lookup_multi_era_and_truncate_guard(spark, tmp_path):
    """Four spec eras on one table — bucket[4] → identity-only (no
    bucket field) → bucket[8] → bucket[4] again — and a point lookup
    still returns exactly the full-scan answer, with each bucketed era
    pruned under its OWN N and the bucketless era kept wholesale. Plus
    the same-name/different-transform guard on PLAIN filters: a
    truncate width change reuses the field name `{col}_trunc`, so a
    current-width prefix value must not prune the old-width era."""
    from pyspark.sql import Row

    from platform_spark.iceberg.bucket import bucket_value as bv
    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "eras")
    os.makedirs(root, exist_ok=True)
    t = IcebergTable.create(
        os.path.join(root, "events"), ev.schema,
        partition_by=("bucket(_key, 4)",), clock=CLOCK,
    )
    eras = [
        None,                     # era 0: bucket[4] (create)
        ("_partition",),          # era 1: identity only, NO bucket field
        ("bucket(_key, 8)",),     # era 2
        ("bucket(_key, 4)",),     # era 3: back to 4 (field-id reuse)
    ]
    for p, spec in enumerate(eras):
        if spec is not None:
            t.evolve_partition_spec(spec)
        append_dataframe(t, ev.filter(F.col("_partition") == p))

    key = next(
        r.k
        for r in ev.filter(F.col("_key").isNotNull())
        .select(F.col("_key").cast("string").alias("k"))
        .distinct()
        .collect()
        if bv(r.k, "string", 4) != bv(r.k, "string", 8)
    )
    b4, b8 = bv(key, "string", 4), bv(key, "string", 8)

    icat = IcebergTopicCatalog(spark, root, configs=cat.configs)
    planned = icat._pruned_entries(t, None, None, None, key_eq=key)
    by_spec: dict = {}
    for e in planned:
        by_spec.setdefault(e["_spec_id"], []).append(e)
    # every era contributes; bucketed eras carry exactly their own id
    assert len(by_spec) == 4
    for sid, entries in by_spec.items():
        fields = {
            pf["name"]: pf["transform"]
            for pf in t.partition_spec(sid)["fields"]
        }
        tr = fields.get("_key_bucket")
        want = {f"bucket[{4}]": b4, f"bucket[{8}]": b8}.get(tr)
        for e in entries:
            got = e["data_file"]["partition"].get("_key_bucket")
            assert got == want  # None for the bucketless era
    # rows equal the exact full-scan filter, all four eras included
    df = icat.topic_scan("events", key_eq=key, with_schema_columns=False)
    want_rows = sorted(
        map(
            tuple,
            ev.filter(F.col("_key").cast("string") == key)
            .select(*df.columns)
            .collect(),
        )
    )
    got_rows = sorted(
        map(tuple, df.filter(F.col("_key").cast("string") == key).collect())
    )
    assert got_rows == want_rows and len(got_rows) > 0
    parts = {r[df.columns.index("_partition")] for r in got_rows}
    assert parts == {0, 1, 2, 3} or parts <= {0, 1, 2, 3}

    # -- truncate-width guard over PLAIN by-name filters ----------------
    df2 = spark.createDataFrame(
        [Row(k="abcdXX", v=1), Row(k="abZZZZ", v=2)],
    )
    t2 = IcebergTable.create(
        os.path.join(root, "tr"), df2.schema,
        partition_by=("truncate(k, 4)",), clock=CLOCK,
    )
    append_dataframe(t2, df2.filter(F.col("v") == 1))  # k_trunc='abcd'
    t2.evolve_partition_spec(("truncate(k, 2)",))
    append_dataframe(t2, df2.filter(F.col("v") == 2))  # k_trunc='ab'
    # a CURRENT-width (2) prefix filter must keep the width-4 era's
    # files (their 'abcd' value would fail a naive 'ab' equality) —
    # the transform-mismatch guard keeps them, the row data proves it
    entries = t2.scan_files(partition_filter={"k_trunc": "ab"})
    assert len(entries) == 2  # both eras survive planning


def test_bare_key_lookup_admitted_by_measured_cost(spark, tmp_path):
    """`WHERE _key = 'x'` with NO time bound is admitted over a
    _key-BUCKETED Iceberg topic (r13 verdict #2): the catalog plans 1/N
    of the files from manifests and the engine's ScanBudget prices that
    plan, so the blanket clause-shape guard would only force a
    max_unbounded_scan row cap onto a measured, cheap read. The
    rejection stays loud where the lookup is NOT metadata-planned: a
    parquet (non-Iceberg) catalog and a non-bucketed Iceberg topic; and
    the admitted form still dies on the budget when the priced plan
    exceeds the cap."""
    from datetime import datetime

    from platform_spark.errors import GovernanceError, ValidationError
    from platform_spark.governance import ScanBudget
    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.sql.engine import EngineOptions, KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "badm")
    os.makedirs(root, exist_ok=True)
    t = IcebergTable.create(
        os.path.join(root, "events"), ev.schema,
        partition_by=("bucket(_key, 8)",), clock=CLOCK,
    )
    for p in range(4):
        append_dataframe(t, ev.filter(F.col("_partition") == p))
    # non-bucketed twin topic
    t2 = IcebergTable.create(
        os.path.join(root, "orders"), ev.schema, clock=CLOCK
    )
    append_dataframe(t2, ev.filter(F.col("_partition") == 0))

    key = (
        ev.filter(F.col("_key").isNotNull())
        .select(F.col("_key").cast("string").alias("k"))
        .first()
        .k
    )
    now = datetime(2024, 1, 31)
    icat = IcebergTopicCatalog(spark, root, configs=cat.configs)
    ieng = KafSqlEngine(icat, now=now)
    q = (
        "SELECT _partition, _offset, _key FROM events "
        f"WHERE _key = '{key}' LIMIT 100000"
    )
    got = sorted(map(tuple, ieng.sql(q).collect()))
    # identical to the time-bounded form (the events topic fits in 30d)
    want = sorted(
        map(tuple, ieng.sql(q.replace("LIMIT", "LAST 30d LIMIT")).collect())
    )
    assert got == want and len(got) > 0
    # IN-list form is admitted the same way
    assert (
        ieng.sql(
            "SELECT count(*) AS n FROM events "
            f"WHERE _key IN ('{key}') LIMIT 100000"
        ).first().n
        == len(got)
    )

    # parquet catalog: no metadata planning — loud rejection stands
    peng = KafSqlEngine(cat, now=now)
    with pytest.raises(ValidationError, match="unbounded"):
        peng.sql(q)
    # non-bucketed Iceberg topic: same rejection
    with pytest.raises(ValidationError, match="unbounded"):
        ieng.sql(q.replace("FROM events", "FROM orders"))
    # admitted ≠ unpriced: a tiny budget kills the lookup pre-execution
    tight = KafSqlEngine(
        icat, now=now, options=EngineOptions(budget=ScanBudget(max_scan_bytes=1))
    )
    with pytest.raises(GovernanceError, match="max_scan_bytes"):
        tight.sql(q).collect()

    # EXPLAIN surfaces the admission verdict (r14 verdict #5): the
    # admitted unbounded lookup prints the priced bytes against the
    # budget cap, and under the tight cap the same plan line says
    # REJECTED — the admission decision is visible, not implicit
    import re as _re

    plan = " ".join(r["plan"] for r in ieng.sql(f"EXPLAIN {q}").collect())
    m = _re.search(
        r"key_lookup=1keys-bucket-planned budget=(\d+)B/cap=(\d+)B-admitted",
        plan,
    )
    assert m, plan
    assert int(m.group(1)) > 0
    tplan = " ".join(r["plan"] for r in tight.sql(f"EXPLAIN {q}").collect())
    assert "/cap=1B-REJECTED" in tplan, tplan
    # a TIME-BOUNDED lookup is not on the admitted path: no budget note
    bplan = " ".join(
        r["plan"]
        for r in ieng.sql(
            f"EXPLAIN {q.replace('LIMIT', 'LAST 30d LIMIT')}"
        ).collect()
    )
    assert "budget=" not in bplan and "bucket-planned" in bplan


def test_key_lookup_composes_with_time_travel(spark, tmp_path):
    """`WHERE _key = 'x' ... FOR SYSTEM_TIME AS OF <t>` in ONE query:
    the snapshot pin scopes the manifest set, the bucket prune scopes
    the files within it, and the exact row filter composes on top — a
    historical point read must see the key's PRE-upsert rows only,
    while staying admitted through the unbounded guard without a time
    bound (the budget prices the pinned, pruned plan)."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.iceberg.table import upsert_dataframe
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "kttopics")
    os.makedirs(root, exist_ok=True)
    times = [1_700_000_000.0]
    t = IcebergTable.create(
        os.path.join(root, "events"), ev.schema,
        partition_by=("bucket(_key, 8)",), clock=lambda: times[0],
    )
    append_dataframe(t, ev)
    key = (
        ev.filter(F.col("_key").isNotNull())
        .select(F.col("_key").cast("string").alias("k"))
        .first()
        .k
    )
    times[0] += 3600.0
    upsert_dataframe(
        t,
        ev.filter(F.col("_key").cast("string") == key).withColumn(
            "_segment", F.lit("upserted")
        ),
        ["_partition", "_offset"],
    )

    eng = KafSqlEngine(
        IcebergTopicCatalog(spark, root, configs=cat.configs),
        now=datetime(2024, 1, 31),
    )
    q = (
        "SELECT _partition, _offset, _segment FROM events{pin} "
        f"WHERE _key = '{key}' LIMIT 100000"
    )
    # current state: every one of the key's rows carries the upsert
    cur = eng.sql(q.format(pin="")).collect()
    assert cur and all(r._segment == "upserted" for r in cur)
    # pinned between append and upsert: same row set, original segments
    pinned = eng.sql(
        q.format(pin=" FOR SYSTEM_TIME AS OF 1700001800000")
    ).collect()
    assert {(r._partition, r._offset) for r in pinned} == {
        (r._partition, r._offset) for r in cur
    }
    assert pinned and not any(r._segment == "upserted" for r in pinned)
    # the pinned lookup still plans only the key's bucket: strictly
    # fewer input files than the pinned full scan
    full = eng.sql(
        "SELECT _partition FROM events FOR SYSTEM_TIME AS OF "
        "1700001800000 LAST 30d LIMIT 100000"
    )
    look = eng.sql(q.format(pin=" FOR SYSTEM_TIME AS OF 1700001800000"))
    assert 0 < len(look.inputFiles()) < len(full.inputFiles())


def test_catalog_capabilities_survive_wrapped_topic_scan(spark, tmp_path):
    """Declared `topic_scan_capabilities` beats signature sniffing (r13
    verdict #3): a catalog whose topic_scan is shadowed by a
    ``(*args, **kwargs)`` wrapper used to advertise NOTHING under the
    r13 inspect.signature check — time travel falsely rejected, key_eq
    pruning silently skipped. The declared frozenset (inherited by
    subclasses) routes both correctly; the signature fallback follows
    ``__wrapped__`` and treats bare ``**kwargs`` as full-vocabulary."""
    import functools

    from datetime import datetime

    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.sql.compiler import (
        SCAN_CAPABILITIES,
        scan_capabilities,
    )
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    # -- unit: the resolution order ------------------------------------
    class Declared:
        topic_scan_capabilities = frozenset({"as_of"})

        def topic_scan(self, name):  # signature says nothing
            return None

    d = Declared()
    assert scan_capabilities(d, d.topic_scan) == frozenset({"as_of"})
    assert scan_capabilities(d, None) == frozenset()  # no hook, no caps

    class Sniffed:
        def topic_scan(self, name, ts_min=None, key_eq=None):
            return None

    s = Sniffed()
    assert scan_capabilities(s, s.topic_scan) == frozenset(
        {"ts_min", "key_eq"}
    )

    class VarKw:
        def topic_scan(self, *args, **kwargs):
            return None

    v = VarKw()
    # bare **kwargs grants the PRUNE keys only (r14 ADVICE): an
    # accept-and-ignore hook that drops ts_min merely skips pruning,
    # but one that drops as_of serves CURRENT data as historical — the
    # time-travel keys demand a declaration or a named parameter
    from platform_spark.sql.compiler import TIME_TRAVEL_CAPABILITIES

    assert scan_capabilities(v, v.topic_scan) == (
        SCAN_CAPABILITIES - TIME_TRAVEL_CAPABILITIES
    )

    class VarKwNamedAsOf:
        def topic_scan(self, name, as_of=None, **kwargs):
            return None

    va = VarKwNamedAsOf()
    # an explicitly NAMED time-travel param is a real commitment — it
    # composes with the **kwargs prune grant
    assert scan_capabilities(va, va.topic_scan) == (
        (SCAN_CAPABILITIES - TIME_TRAVEL_CAPABILITIES) | {"as_of"}
    )

    def deco(fn):
        @functools.wraps(fn)
        def inner(*a):  # no **kwargs: only __wrapped__ reveals the caps
            return fn(*a)

        return inner

    class Wrapped:
        @deco
        def topic_scan(self, name, snapshot_id=None):
            return None

    w = Wrapped()
    assert scan_capabilities(w, w.topic_scan) == frozenset(
        {"snapshot_id"}
    )

    # -- end-to-end: a subclass shadowing topic_scan with *args/**kwargs
    class WrappedCatalog(IcebergTopicCatalog):
        def topic_scan(self, *args, **kwargs):
            return super().topic_scan(*args, **kwargs)

        def estimate_topic_scan(self, *args, **kwargs):
            return super().estimate_topic_scan(*args, **kwargs)

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "captopics")
    os.makedirs(root, exist_ok=True)
    t = IcebergTable.create(
        os.path.join(root, "events"), ev.schema, clock=CLOCK
    )
    append_dataframe(t, ev.filter(F.col("_partition") == 0))
    append_dataframe(t, ev.filter(F.col("_partition") == 1))
    first_id = t.metadata["snapshots"][0]["snapshot-id"]

    eng = KafSqlEngine(
        WrappedCatalog(spark, root, configs=cat.configs),
        now=datetime(2024, 1, 31),
    )
    # time travel routes through the wrapper instead of being rejected
    n_first = eng.sql(
        "SELECT count(*) AS n FROM events "
        f"FOR SYSTEM_VERSION AS OF {first_id} LAST 30d"
    ).first().n
    n_now = eng.sql("SELECT count(*) AS n FROM events LAST 30d").first().n
    assert 0 < n_first < n_now
    # EXPLAIN's estimate hook takes the same route
    plan = eng.sql(
        "EXPLAIN SELECT count(*) AS n FROM events "
        f"FOR SYSTEM_VERSION AS OF {first_id} LAST 30d"
    )
    assert plan is not None


def test_kafsql_join_side_time_travel(spark, tmp_path):
    """Per-side FOR SYSTEM_TIME in joins (r13 verdict #6): pinning the
    RIGHT side to its pre-upsert snapshot changes exactly that side's
    rows while the left reads current; a parquet catalog still rejects
    loudly; WITHIN/LAST governance is unchanged."""
    from datetime import datetime

    from platform_spark.errors import ValidationError
    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.iceberg.table import upsert_dataframe
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    root = str(tmp_path / "jtt")
    os.makedirs(root, exist_ok=True)
    times = [1_700_000_000.0]
    for name in ("orders", "payments"):
        df = cat.topic(name, with_schema_columns=False).filter(
            F.col("_partition") == 0
        )
        t = IcebergTable.create(
            os.path.join(root, name), df.schema, clock=lambda: times[0]
        )
        append_dataframe(t, df)
    times[0] += 3600.0
    pay = IcebergTable.load(
        os.path.join(root, "payments"), clock=lambda: times[0]
    )
    upsert_dataframe(
        pay,
        cat.topic("payments", with_schema_columns=False)
        .filter((F.col("_partition") == 0) & (F.col("_offset") % 3 == 0))
        .withColumn("_segment", F.lit("upserted")),
        ["_partition", "_offset"],
    )

    eng = KafSqlEngine(
        IcebergTopicCatalog(spark, root, configs=cat.configs),
        now=datetime(1998, 8, 2),
    )
    q_tpl = (
        "SELECT o._offset AS ooffset, p._offset AS poffset, "
        "p._segment AS pseg "
        "FROM orders o JOIN payments p{pin} ON o._key = p._key "
        "WITHIN 10m LAST 15000d LIMIT 100000"
    )
    cur = eng.sql(q_tpl.format(pin="")).collect()
    assert any(r.pseg == "upserted" for r in cur)
    pinned = eng.sql(
        q_tpl.format(pin=" FOR SYSTEM_TIME AS OF 1700001800000")
    ).collect()
    # same join pairs, pre-upsert right-side segments
    assert {(r.ooffset, r.poffset) for r in pinned} == {
        (r.ooffset, r.poffset) for r in cur
    }
    assert pinned and not any(r.pseg == "upserted" for r in pinned)
    # SYSTEM_VERSION by named ref on the join side reads the same
    # pre-upsert snapshot (the 'training cut' tag shape)
    pay.create_tag("cut-v1", snapshot_id=pay.metadata["snapshots"][0]["snapshot-id"])
    tagged = eng.sql(
        q_tpl.format(pin=" FOR SYSTEM_VERSION AS OF 'cut-v1'")
    ).collect()
    assert sorted(map(tuple, tagged)) == sorted(map(tuple, pinned))
    # parquet catalog: loud rejection for a pinned join side
    peng = KafSqlEngine(cat, now=datetime(1998, 8, 2))
    with pytest.raises(ValidationError, match="Iceberg-backed"):
        peng.sql(q_tpl.format(pin=" FOR SYSTEM_TIME AS OF 1700001800000"))
    # governance unchanged: a pinned join still requires WITHIN+LAST
    with pytest.raises(ValidationError, match="WITHIN and LAST"):
        eng.sql(
            "SELECT o._offset AS a FROM orders o "
            "JOIN payments p FOR SYSTEM_TIME AS OF 1700001800000 "
            "ON o._key = p._key LIMIT 10"
        )


def test_kafsql_catalog_prunes_evolved_renamed_topic(spark, tmp_path):
    """The dialect's planning path over a topic normalized INTO the
    envelope by metadata commits (rename seg→_segment, spec evolution
    to identity(_partition)): `_partition =` pruning keeps ALL spec-0
    (unpartitioned) files — conservative superset — but only the
    matching partition's new-spec files, and the query result matches
    the parquet engine. Composes the r11 rename + evolution surfaces
    through catalog.py's _pruned_entries, the plan-level twin of the
    iceberg_kafsql_evolved_scan oracle gate."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    from platform_spark.iceberg.table import upsert_dataframe
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "evotopics")
    os.makedirs(root, exist_ok=True)
    foreign = ev.withColumnRenamed("_segment", "seg")
    t = IcebergTable.create(
        os.path.join(root, "events"), foreign.schema, clock=CLOCK
    )
    append_dataframe(t, foreign.filter("_offset % 2 = 0"))
    n_spec0 = len(t.scan_files())
    t.rename_column("seg", "_segment")
    t.evolve_partition_spec(("_partition",))
    append_dataframe(t, ev.filter("_offset % 2 = 1"))
    upsert_dataframe(
        t,
        ev.filter("_offset % 7 = 0").withColumn("_segment", F.lit("upd")),
        ["_partition", "_offset"],
    )

    icat = IcebergTopicCatalog(spark, root, configs=cat.configs)
    all_entries = t.scan_files(spark=spark)
    pruned = icat._pruned_entries(t, 2, None, None)
    assert len(pruned) < len(all_entries)
    # every spec-0 file survives (no _partition value recorded there);
    # new-spec files survive only for partition 2
    spec0_kept = [e for e in pruned if not e["data_file"]["partition"]]
    assert len(spec0_kept) == n_spec0
    for e in pruned:
        part = dict(e["data_file"]["partition"] or {})
        assert part.get("_partition", 2) == 2

    # end-to-end: dialect result over the evolved topic == parquet
    # engine over the equivalent post-upsert envelope
    now = datetime(2024, 1, 31)
    ieng = KafSqlEngine(icat, now=now)
    q = (
        "SELECT _partition, _segment, count(*) AS n FROM events "
        "WHERE _partition = 2 LAST 30d GROUP BY _partition, _segment"
    )
    got = {(r._partition, r._segment, r.n) for r in ieng.sql(q).collect()}
    peng = KafSqlEngine(cat, now=now)
    base = peng.sql(
        "SELECT _partition, _offset, _segment FROM events "
        "WHERE _partition = 2 LAST 30d LIMIT 100000"
    )
    want = {
        (r._partition, r._segment, r.n)
        for r in base.withColumn(
            "_segment",
            F.when(F.col("_offset") % 7 == 0, F.lit("upd")).otherwise(
                F.col("_segment")
            ),
        )
        .groupBy("_partition", "_segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_month_and_hour_transform_partitioning(spark, table_loc):
    """The spec's other time transforms: month (int months-since-epoch,
    works from date or timestamp) and hour (int hours-since-epoch,
    timestamp only); filters normalize date/datetime values and prune."""
    import datetime

    df = spark.range(0, 9).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 864000).alias("ts"),
    )  # one row every 10 days from 2024-01-01 -> spans Jan..Mar
    t = IcebergTable.create(
        table_loc, df.schema, partition_by=("months(ts)",), clock=CLOCK
    )
    append_dataframe(t, df)
    assert t.spec["fields"][0]["transform"] == "month"
    jan = t.to_spark(
        spark, partition_filter={"ts_month": datetime.date(2024, 1, 15)}
    )
    assert sorted(r.id for r in jan.collect()) == [0, 1, 2, 3]
    # int form: months since epoch for 2024-02 = (2024-1970)*12 + 1
    feb = t.to_spark(spark, partition_filter={"ts_month": 649})
    assert sorted(r.id for r in feb.collect()) == [4, 5]
    assert 0 < len(t.scan_files(partition_filter={"ts_month": 648})) < len(
        t.scan_files()
    )

    loc2 = str(table_loc) + "_h"
    dfh = spark.range(0, 8).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 1800).alias("ts"),
    )  # 30-minute steps -> 2 rows per hour
    th = IcebergTable.create(loc2, dfh.schema, partition_by=("hours(ts)",), clock=CLOCK)
    append_dataframe(th, dfh)
    hour1 = th.to_spark(
        spark,
        partition_filter={"ts_hour": datetime.datetime(2024, 1, 1, 1, 30)},
    )
    assert sorted(r.id for r in hour1.collect()) == [2, 3]

    # hour(date) is rejected per spec
    dd = spark.range(0, 1).select(F.col("id"), F.current_date().alias("d"))
    with pytest.raises(ValueError, match="hour\\(\\) needs"):
        IcebergTable.create(str(table_loc) + "_bad", dd.schema,
                            partition_by=("hours(d)",))

    # year transform (int years-since-epoch): rows every ~100 days span
    # 2024-2026; both int and date/datetime filter values prune
    loc3 = str(table_loc) + "_y"
    dfy = spark.range(0, 9).select(
        F.col("id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("id") * 8640000
        ).alias("ts"),
    )
    ty = IcebergTable.create(loc3, dfy.schema, partition_by=("years(ts)",), clock=CLOCK)
    append_dataframe(ty, dfy)
    assert ty.spec["fields"][0]["transform"] == "year"
    y2024 = ty.to_spark(spark, partition_filter={"ts_year": 54})  # 2024
    ids_2024 = sorted(r.id for r in y2024.collect())
    assert ids_2024 == [
        r.id
        for r in dfy.collect()
        if r.ts.year == 2024
    ]
    y2025 = ty.to_spark(
        spark, partition_filter={"ts_year": datetime.date(2025, 6, 1)}
    )
    assert sorted(r.id for r in y2025.collect()) == [
        r.id for r in dfy.collect() if r.ts.year == 2025
    ]
    assert 0 < len(ty.scan_files(partition_filter={"ts_year": 54})) < len(
        ty.scan_files()
    )


def test_kafsql_explain_prices_iceberg_scans_from_manifests(spark, tmp_path):
    """EXPLAIN over an Iceberg-backed topic reports candidate files /
    bytes / rows priced purely from manifests (no parquet footer reads),
    and `_partition =` + `_ts` bounds shrink the estimate."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import (
        IcebergTopicCatalog,
        materialize_topic_to_iceberg,
    )
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    root = str(tmp_path / "icetopics")
    os.makedirs(root, exist_ok=True)
    materialize_topic_to_iceberg(
        cat.topic("events", with_schema_columns=False), root, "events"
    )
    eng = KafSqlEngine(
        IcebergTopicCatalog(spark, root, configs=cat.configs),
        now=datetime(2024, 1, 31),
    )

    def est_line(sql: str) -> str:
        lines = [r["plan"] for r in eng.sql(sql).collect()]
        (line,) = [l for l in lines if "iceberg-manifest-estimate" in l]
        return line

    full = est_line("EXPLAIN SELECT * FROM events LAST 365d")
    part = est_line(
        "EXPLAIN SELECT * FROM events WHERE _partition = 2 LAST 365d"
    )
    narrow = est_line(
        "EXPLAIN SELECT * FROM events WHERE "
        "_ts BETWEEN '2099-01-01 00:00:00' AND '2099-01-02 00:00:00'"
    )

    def n(line: str, key: str) -> int:
        return int(line.split(f"{key}=")[1].split(" ")[0])

    assert n(full, "candidate_files") > n(part, "candidate_files") > 0
    assert n(full, "est_bytes") > n(part, "est_bytes") > 0
    assert n(narrow, "est_rows") == 0  # _ts bounds prune via column bounds
    # extension clauses annotate the estimate line (r14): a key filter
    # over this NON-bucketed table is an exact row filter, not a bucket
    # plan, and EXPLAIN must say so honestly
    keyed = est_line(
        "EXPLAIN SELECT * FROM events WHERE _key = 'x' LAST 365d"
    )
    assert "key_lookup=1keys-row-filter" in keyed
    assert "key_lookup" not in full and "pinned" not in full


def test_kafsql_time_pruning_over_day_partitioned_iceberg_topic(spark, tmp_path):
    """A LAST-window dialect query over a day-partitioned Iceberg topic
    plans ONLY the matching days' files (asserted on the compiled plan's
    actual input file list) and still matches the parquet engine's rows;
    a WITHIN join prunes the right side with band-widened bounds."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import (
        IcebergTopicCatalog,
        materialize_topic_to_iceberg,
    )
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    root = str(tmp_path / "icetopics")
    os.makedirs(root, exist_ok=True)
    for topic in ("events", "orders", "payments"):
        materialize_topic_to_iceberg(
            cat.topic(topic, with_schema_columns=False), root, topic,
            partition_by=("_partition", "days(_ts)"),
        )
    now = datetime(2024, 1, 31)
    ieng = KafSqlEngine(
        IcebergTopicCatalog(spark, root, configs=cat.configs), now=now
    )
    peng = KafSqlEngine(cat, now=now)
    # the row-level result cache would serve repeat queries as a
    # LocalRelation (zero input files) and mask the pruning assertion
    ieng.sql("SET enable_cache = false")

    narrow = "SELECT _partition, _offset, _ts FROM events LAST 2d"
    wide = "SELECT _partition, _offset, _ts FROM events LAST 365d"

    def canon(df):
        return sorted(tuple(str(v) for v in r) for r in df.collect())

    assert canon(ieng.sql(narrow)) == canon(peng.sql(narrow))
    n_narrow = len(set(ieng.sql(narrow).inputFiles()))
    n_wide = len(set(ieng.sql(wide).inputFiles()))
    assert 0 < n_narrow < n_wide  # time bounds reached the file list
    # partition filter composes with the day pruning
    one = "SELECT _offset FROM events WHERE _partition = 2 LAST 2d"
    assert canon(ieng.sql(one)) == canon(peng.sql(one))
    assert len(set(ieng.sql(one).inputFiles())) < n_narrow
    # WITHIN join (band-widened right bounds) stays row-identical
    j = ("SELECT o._key AS k, json_value(p._value, '$.method') AS m "
         "FROM orders o JOIN payments p ON o._key = p._key WITHIN 10m "
         "LAST 15000d LIMIT 100000")
    assert canon(ieng.sql(j)) == canon(peng.sql(j))


def test_upsert_dataframe_single_snapshot_cdc(spark, table_loc):
    """upsert_dataframe commits data + equality-delete in ONE snapshot:
    older copies of the batch keys die (sequence rule), the batch's own
    rows survive, no existing file is read or rewritten, and compaction
    later folds the deletes."""
    from platform_spark.iceberg.table import compact_table, upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 20))
    files_before = {e["data_file"]["file_path"] for e in t.scan_files()}
    v = t.version
    snap = upsert_dataframe(
        t, _mk(spark, 10, 30).withColumn("text", F.lit("v2")), ["id"]
    )
    assert snap["summary"]["operation"] == "overwrite"
    assert t.version == v + 1  # exactly one commit
    # no pre-existing data file was rewritten or retired
    assert files_before <= {e["data_file"]["file_path"] for e in t.scan_files()}
    got = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    assert got == {(i, f"doc-{i}") for i in range(10)} | {
        (i, "v2") for i in range(10, 30)
    }
    # second upsert over an overlapping key range: latest wins
    upsert_dataframe(t, _mk(spark, 15, 25).withColumn("text", F.lit("v3")), ["id"])
    got = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    assert got == (
        {(i, f"doc-{i}") for i in range(10)}
        | {(i, "v2") for i in list(range(10, 15)) + list(range(25, 30))}
        | {(i, "v3") for i in range(15, 25)}
    )
    # an incremental consumer must not treat upserts as appends
    with pytest.raises(ValueError, match="non-append"):
        t.changes(spark)
    # compaction folds the deletes; content identical, delete files gone
    compact_table(t, spark)
    assert t.scan_deletes() == []
    assert {(r.id, r.text) for r in t.to_spark(spark).collect()} == got


def test_upsert_dataframe_rejects_intra_batch_duplicate_keys(spark, table_loc):
    """The equality delete shares its sequence number with the batch's own
    data files, and the spec kills only strictly-older files — two
    same-key rows in one batch would BOTH survive. Without order_by the
    upsert must refuse such a batch (and leave nothing behind), not
    commit permanent duplicates."""
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 8))
    v = t.version
    dup = _mk(spark, 4, 10).unionAll(
        _mk(spark, 6, 8).withColumn("text", F.lit("later"))
    )
    with pytest.raises(ValueError, match="duplicate-key"):
        upsert_dataframe(t, dup, ["id"])
    assert t.version == v  # nothing committed
    # the rejected batch's staged files were cleaned up, not orphaned
    import os as _os

    left_behind = [
        p
        for sub in ("data", "deletes")
        for dirpath, _d, files in _os.walk(_os.path.join(table_loc, sub))
        for p in files
        if p.endswith(".parquet")
    ]
    live = {
        _os.path.basename(e["data_file"]["file_path"]) for e in t.scan_files()
    }
    assert set(left_behind) == live


def test_upsert_dataframe_order_by_last_wins(spark, table_loc):
    """order_by dedupes the batch to one row per key (greatest order_by
    wins) before the single-snapshot commit — the CDC-batch contract."""
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1).withColumn("ver", F.lit(0))
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 8).withColumn("ver", F.lit(0)))
    batch = (
        _mk(spark, 4, 10).withColumn("ver", F.lit(1))
        .unionAll(
            _mk(spark, 6, 12)
            .withColumn("text", F.concat(F.lit("v2-"), F.col("id")))
            .withColumn("ver", F.lit(2))
        )
    )
    snap = upsert_dataframe(t, batch, ["id"], order_by=["ver"])
    assert snap["summary"]["operation"] == "overwrite"
    got = {(r.id, r.text, r.ver) for r in t.to_spark(spark).collect()}
    assert got == (
        {(i, f"doc-{i}", 0) for i in range(4)}
        | {(i, f"doc-{i}", 1) for i in (4, 5)}  # only in the ver=1 half
        | {(i, f"v2-{i}", 2) for i in range(6, 12)}  # ver=2 beats ver=1
    )


def test_pipeline_iceberg_upsert_sink(spark, tmp_path):
    """upsert_keys on the streaming sink: later micro-batch runs replace
    earlier rows with the same key — the CDC topic→table shape — and the
    checkpoint keeps replay idempotent."""
    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    _mk(spark, 0, 21).withColumn("text", F.lit("v1")).write.mode("append").parquet(src)
    loc = str(tmp_path / "ice")
    mk_pipe = lambda: ContinuousTopicPipeline(  # noqa: E731
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
        partition_cols=("part",),
        upsert_keys=("id",),
    )
    mk_pipe().run_available_now()
    t = IcebergTable.load(loc)
    assert {r.text for r in t.to_spark(spark).collect()} == {"v1"}
    # a later run upserts the overlapping ids
    _mk(spark, 10, 21).withColumn("text", F.lit("v2")).write.mode("append").parquet(src)
    mk_pipe().run_available_now()
    t.refresh()
    got = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    assert got == {(i, "v1") for i in range(10)} | {
        (i, "v2") for i in range(10, 21)
    }
    # restart: checkpoint replays nothing
    n = len(t.metadata["snapshots"])
    mk_pipe().run_available_now()
    t.refresh()
    assert len(t.metadata["snapshots"]) == n
    assert {(r.id, r.text) for r in t.to_spark(spark).collect()} == got


def test_pipeline_upsert_sink_auto_maintenance(spark, tmp_path):
    """compact_every in CDC mode runs the full maintenance cadence:
    partition-scoped compaction, delete-file fold (partition compaction
    keeps eq-delete files live on its own), manifest-list fold, expiry —
    the table a continuous upsert pipeline settles into stays a handful
    of files/manifests with zero live equality deletes, content exact."""
    from platform_spark.iceberg import avro as _avro
    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    loc = str(tmp_path / "ice")
    mk_pipe = lambda: ContinuousTopicPipeline(  # noqa: E731
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
        partition_cols=("part",),
        upsert_keys=("id",),
        upsert_order_by=("text",),
        sort_cols=("id",),
        compact_every=1,
        expire_keep_last=2,
    )
    for lo in range(0, 24, 6):  # one upsert commit per run, overlapping keys
        _mk(spark, lo, lo + 8).withColumn(
            "text", F.lit(f"b{lo}")
        ).write.mode("append").parquet(src)
        mk_pipe().run_available_now()
    t = IcebergTable.load(loc)
    got = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    # last-wins per id across the overlapping batches (b18 > b12 > ... by
    # the text ordering, which matches batch order here)
    assert len(got) == 26 and (20, "b18") in got and (0, "b0") in got
    # maintenance left no live equality deletes and a folded manifest list
    assert t.scan_deletes() == []
    _, _, mlist = _avro.read_container(t.current_snapshot()["manifest-list"])
    assert len(mlist) <= 4
    assert len(t.metadata["snapshots"]) <= 2 + 1  # expire_keep_last honored
    # the sink declared sort_cols: maintenance re-laid the table out, so
    # a point lookup bounds-prunes to a strict subset of the live files
    assert t.sort_columns() == [("id", "asc")]
    hit = t.filter_entries_by_bounds(t.scan_files(), {"id": (25, 25)})
    assert len(hit) < len(t.scan_files())


def test_incremental_aggregate_maintenance(spark, table_loc, tmp_path):
    """IncrementalAggregate: a persisted GROUP BY maintained in
    O(changed rows) from changelog() — after every kind of table change
    (append, overlapping upserts, key/predicate deletes, maintenance)
    the state equals the full aggregate of the live table, refresh is
    idempotent, and a checkpoint re-fold after a no-op is free."""
    from platform_spark.iceberg.matview import IncrementalAggregate
    from platform_spark.iceberg.table import (
        compact_table, rewrite_deletes, upsert_dataframe,
    )

    def full(t):
        return {
            (r.part, r.n, r.s)
            for r in t.to_spark(spark)
            .groupBy("part")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
            .collect()
        }

    def state(agg):
        return {(r.part, r.n, r.sum_id) for r in agg.read(spark).collect()}

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    agg = IncrementalAggregate(
        str(tmp_path / "mv"), group_cols=["part"], sum_cols=["id"]
    )
    assert agg.read(spark).count() == 0
    append_dataframe(t, _mk(spark, 0, 20))
    assert agg.refresh(spark, t) == -1  # first materialization = rebuild
    assert state(agg) == full(t)
    # incremental folds: upsert (delete+insert nets), deletes, appends
    upsert_dataframe(t, _mk(spark, 5, 9).withColumn("text", F.lit("v2")), ["id"])
    n = agg.refresh(spark, t)
    assert n == 8  # 4 deletes + 4 inserts
    assert state(agg) == full(t)
    t.delete_keys(spark, spark.createDataFrame([(0,), (4,), (8,)], "id long"))
    t.delete_where(spark, "id >= 18")
    append_dataframe(t, _mk(spark, 40, 45))
    assert agg.refresh(spark, t) > 0
    assert state(agg) == full(t)
    # no table movement → zero events, checkpoint already current
    assert agg.refresh(spark, t) == 0
    # maintenance snapshots are content-neutral for the view too
    rewrite_deletes(t, spark)
    compact_table(t, spark)
    assert agg.refresh(spark, t) == 0
    assert state(agg) == full(t)
    # a group whose last row dies disappears from the state
    t.delete_where(spark, "part = 3")
    agg.refresh(spark, t)
    assert state(agg) == full(t)
    assert all(r.part != 3 for r in agg.read(spark).collect())
    # expired checkpoint → loud error, rebuild recovers
    append_dataframe(t, _mk(spark, 50, 55))
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="re-baseline|unknown|ancestry"):
        agg.refresh(spark, t)
    agg.rebuild(spark, t)
    assert state(agg) == full(t)


def test_column_bounds_data_skipping(spark, table_loc):
    """Manifest column bounds prune the FILE LIST before Spark plans: on
    a table whose files hold disjoint id ranges, a point/range lookup
    reads only the intersecting files (asserted on inputFiles), results
    stay exact after the row filter, and files lacking bounds survive
    (superset semantics)."""
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    for lo in range(0, 400, 100):  # 4 commits, disjoint id ranges
        append_dataframe(t, _mk(spark, lo, lo + 100).coalesce(1))
    all_files = set(t.to_spark(spark).inputFiles())
    # range straddling two commits
    pruned = t.to_spark(spark, column_bounds={"id": (150, 250)})
    assert set(pruned.inputFiles()) < all_files
    assert len(set(pruned.inputFiles())) == 2
    got = sorted(r.id for r in pruned.filter("id BETWEEN 150 AND 250").collect())
    assert got == list(range(150, 251))
    # point lookup: one file
    point = t.to_spark(spark, column_bounds={"id": (42, 42)})
    assert len(set(point.inputFiles())) == 1
    assert [r.text for r in point.filter("id = 42").collect()] == ["doc-42"]
    # open-ended + string bounds compose; unknown column raises
    hi = t.to_spark(spark, column_bounds={"id": (300, None), "text": ("doc-", None)})
    assert len(set(hi.inputFiles())) == 1
    with pytest.raises(ValueError, match="not in schema"):
        t.to_spark(spark, column_bounds={"nope": (1, 2)})
    # estimate path: the same pruning powers metadata-only planning
    entries = t.filter_entries_by_bounds(t.scan_files(), {"id": (0, 99)})
    assert sum(e["data_file"]["record_count"] for e in entries) == 100


def test_declared_sort_order_layout(spark, table_loc):
    """create(sort_by=...): every internal writer lays batches out by
    the declared order (range partition + local sort), so per-file
    column bounds come out disjoint and a point lookup through
    column_bounds touches ONE file even when the input arrived shuffled
    — and compaction re-establishes the layout after CDC churn."""
    from platform_spark.iceberg.table import compact_table, upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK, sort_by=("id",))
    assert t.metadata["default-sort-order-id"] == 1
    assert t.sort_columns() == [("id", "asc")]
    # shuffled input: layout must come from the writer, not the source
    shuffled = _mk(spark, 0, 320).orderBy(F.rand(7)).repartition(8)
    append_dataframe(t, shuffled)
    entries = t.scan_files()
    assert all(e["data_file"]["sort_order_id"] == 1 for e in entries)
    # disjoint per-file id ranges → a point lookup plans exactly one file
    assert len(t.filter_entries_by_bounds(entries, {"id": (200, 200)})) == 1
    point = t.to_spark(spark, column_bounds={"id": (200, 200)})
    assert [r.text for r in point.filter("id = 200").collect()] == ["doc-200"]
    # CDC churn then compaction: layout (and the 1-file lookup) returns
    upsert_dataframe(t, _mk(spark, 100, 104).withColumn("text", F.lit("v2")), ["id"])
    compact_table(t, spark)
    entries2 = t.scan_files()
    assert len(t.filter_entries_by_bounds(entries2, {"id": (100, 100)})) == 1
    got = t.to_spark(spark, column_bounds={"id": (100, 103)}).filter(
        "id BETWEEN 100 AND 103"
    )
    assert sorted((r.id, r.text) for r in got.collect()) == [
        (i, "v2") for i in range(100, 104)
    ]
    # unknown sort column fails at create time
    with pytest.raises(ValueError, match="not in schema"):
        IcebergTable.create(table_loc + "2", df.schema, sort_by=("nope",))
    # DESC direction round-trips through metadata
    t3 = IcebergTable.create(
        table_loc + "3", df.schema, clock=CLOCK, sort_by=("part", "id desc")
    )
    assert t3.sort_columns() == [("part", "asc"), ("id", "desc")]


def test_string_bounds_truncate_in_manifests(spark, table_loc):
    """Spec truncate(16): long string columns store a 16-char prefix as
    the lower bound and an incremented prefix as the upper bound — a
    100 KB document must never land whole in every manifest entry — and
    bounds pruning stays a correct superset through the truncation."""
    from platform_spark.iceberg.table import _truncate_upper, deserialize_bound

    df = spark.createDataFrame(
        [(i, ("b" if i < 50 else "m") * 40 + f"tail-{i}") for i in range(100)],
        "id long, text string",
    )
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    append_dataframe(t, df.filter("id < 50").coalesce(1))
    append_dataframe(t, df.filter("id >= 50").coalesce(1))
    fld = next(f for f in t.schema["fields"] if f["name"] == "text")
    for e in t.scan_files():
        lo = {kv["key"]: kv["value"] for kv in e["data_file"]["lower_bounds"]}
        hi = {kv["key"]: kv["value"] for kv in e["data_file"]["upper_bounds"]}
        lo_s = deserialize_bound("string", lo[fld["id"]])
        hi_s = deserialize_bound("string", hi[fld["id"]])
        assert len(lo_s) <= 16 and len(hi_s) <= 16
        assert lo_s in ("b" * 16, "m" * 16)
        # upper bound = prefix with last unit incremented → ≥ every value
        assert hi_s in ("b" * 15 + "c", "m" * 15 + "n")
    # pruning through truncated bounds: 'm'-prefixed lookups skip file 1
    pruned = t.filter_entries_by_bounds(
        t.scan_files(), {"text": ("m", "n")}
    )
    assert len(pruned) == 1
    assert (
        t.to_spark(spark, column_bounds={"text": ("m", "n")})
        .filter("text >= 'm' AND text < 'n'")
        .count()
        == 50
    )
    # increment edge: all-max prefix drops the upper bound (unbounded),
    # and an increment never lands inside the surrogate gap
    assert _truncate_upper(chr(0x10FFFF) * 20, "string") is None
    assert (
        _truncate_upper(chr(0xD7FF) * 20, "string")
        == chr(0xD7FF) * 15 + chr(0xE000)
    )


def test_expire_snapshots_older_than(spark, table_loc):
    """Age-based expiry composes with the count floor: only snapshots
    strictly older than the cutoff expire, whichever policy keeps more
    history wins, and tag/current pins still hold."""
    now = [1_700_000_000.0]
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, clock=lambda: now[0])
    for lo in range(0, 40, 10):  # four commits, one hour apart
        now[0] += 3600
        append_dataframe(t, _mk(spark, lo, lo + 10))
    ts = [s["timestamp-ms"] for s in t.metadata["snapshots"]]
    # cutoff between commit 2 and 3: commits 1-2 are expirable by age,
    # but keep_last=3 keeps commit 2 anyway (count floor wins)
    res = t.expire_snapshots(keep_last=3, older_than_ms=ts[1] + 1)
    assert res["snapshots"] == 1
    assert len(t.metadata["snapshots"]) == 3
    # age floor wins over an aggressive count: everything is younger
    # than the cutoff → nothing expires despite keep_last=1
    res = t.expire_snapshots(keep_last=1, older_than_ms=ts[0])
    assert res["snapshots"] == 0
    # content never changes
    assert t.to_spark(spark).count() == 40
    # with a permissive age cutoff the count floor applies as before
    res = t.expire_snapshots(keep_last=1, older_than_ms=ts[-1] + 1)
    assert res["snapshots"] == 2
    assert t.to_spark(spark).count() == 40


def test_expire_pins_staged_branch_ancestry(spark, table_loc):
    """r11 ADVICE: expiry while a WAP branch is staged must pin the
    branch's whole parent chain down to its recorded base — not just
    the branch HEAD — or the pre-publish audit read (changes/changelog
    over the branch window) hits 'ancestry broken' and the chain is
    unrecoverable. And inspect_refs DEGRADES (staged_snapshots=NULL)
    instead of throwing when a foreign writer expired branch ancestry
    anyway."""
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 10))
    base_id = t.current_snapshot()["snapshot-id"]
    t.create_branch("audit")
    append_dataframe(t, _mk(spark, 100, 105), branch="audit")
    b1 = t.ref_snapshot_id("audit")
    append_dataframe(t, _mk(spark, 105, 110), branch="audit")
    b2 = t.ref_snapshot_id("audit")
    # main advances independently while the branch is staged
    append_dataframe(t, _mk(spark, 10, 20))
    mid = t.current_snapshot()["snapshot-id"]
    append_dataframe(t, _mk(spark, 20, 30))

    # keep_last=1 keeps only the newest main commit by count — but the
    # staged chain (head b2, interior b1, base) is pinned; only the
    # unpinned interior MAIN commit expires
    res = t.expire_snapshots(keep_last=1)
    assert res["snapshots"] == 1
    left = {s["snapshot-id"] for s in t.metadata["snapshots"]}
    assert {base_id, b1, b2}.issubset(left)
    assert mid not in left

    # the pre-publish audit read still walks the full branch window
    staged = t.changes(spark, from_snapshot_id=base_id, ref="audit")
    assert sorted(r.id for r in staged.collect()) == list(range(100, 110))
    refs = {r.name: r for r in t.inspect_refs(spark).collect()}
    assert refs["audit"].staged_snapshots == 2

    # degradation path: a FOREIGN writer expired the interior branch
    # snapshot — the ops view reports NULL for that ref, not an error
    pruned = dict(t.metadata)
    pruned["snapshots"] = [
        s for s in t.metadata["snapshots"] if s["snapshot-id"] != b1
    ]
    orig_meta = t.metadata
    t.metadata = pruned
    refs = {r.name: r for r in t.inspect_refs(spark).collect()}
    assert refs["audit"].staged_snapshots is None
    assert refs["audit"].snapshot_id == b2  # the rest still renders
    t.metadata = orig_meta


def test_truncate_transform_partitioning(spark, table_loc):
    """truncate[W]: strings bucket by prefix, ints floor to the nearest
    W multiple (negatives too) — the prefix layout for URL/id-keyed
    corpora; values keep the source type in paths and manifests."""
    df = spark.range(0, 30).select(
        F.col("id"),
        F.concat(
            F.lit("user-"), (F.col("id") % 7).cast("string"),
            F.lit("-x"), F.col("id").cast("string"),
        ).alias("key"),
    )
    t = IcebergTable.create(
        table_loc, df.schema, partition_by=("truncate(key, 6)",), clock=CLOCK
    )
    assert t.spec["fields"][0]["transform"] == "truncate[6]"
    append_dataframe(t, df)
    got = t.to_spark(spark, partition_filter={"key_trunc": "user-3"})
    assert sorted(r.id for r in got.collect()) == [3, 10, 17, 24]
    assert 0 < len(t.scan_files(partition_filter={"key_trunc": "user-3"})) < len(
        t.scan_files()
    )
    # data files keep the full key column; derived prefix is path-only
    assert "key" in t.to_spark(spark).columns
    assert t.to_spark(spark).count() == 30

    loc2 = str(table_loc) + "_i"
    di = spark.range(0, 30).select((F.col("id") - 15).alias("id"))
    ti = IcebergTable.create(loc2, di.schema, partition_by=("truncate(id, 10)",), clock=CLOCK)
    append_dataframe(ti, di)
    neg = ti.to_spark(spark, partition_filter={"id_trunc": -20})
    assert sorted(r.id for r in neg.collect()) == list(range(-15, -10))
    mid = ti.to_spark(spark, partition_filter={"id_trunc": 0})
    assert sorted(r.id for r in mid.collect()) == list(range(0, 10))
    with pytest.raises(ValueError, match="width must be > 0"):
        IcebergTable.create(str(table_loc) + "_b", di.schema,
                            partition_by=("truncate(id, 0)",))


def test_bucket_transform_spec_vectors():
    """The bucket hash is the SPEC's murmur3_x86_32, pinned against the
    published Appendix-B reference vectors — an external iceberg-java /
    pyiceberg reader computes identical buckets for every value, which
    is the whole point of a spec-fixed transform."""
    from platform_spark.iceberg.bucket import bucket_value, hash_value

    assert hash_value(34, "int") == 2017239379
    assert hash_value(34, "long") == 2017239379  # int widens to long
    assert hash_value("iceberg", "string") == 1210000089
    assert hash_value(17486, "date") == -653330422  # 2017-11-16
    # 2017-11-16T22:31:08 in micros
    assert hash_value(1510871468000000, "timestamp") == -2047944441
    assert hash_value(b"\x00\x01\x02\x03", "binary") == -188683207
    assert bucket_value(34, "long", 16) == 2017239379 % 16
    assert bucket_value(None, "long", 16) is None
    # negative hash: (h & Integer.MAX_VALUE) % N stays in [0, N)
    b = bucket_value(17486, "date", 7)
    assert 0 <= b < 7 and b == ((-653330422) & 0x7FFFFFFF) % 7


def test_bucket_udf_matches_scalar(spark):
    """The numpy-vectorized UDF path and the scalar reference agree on
    every value class (positives, negatives, nulls, strings) — the
    vectorized two-block unroll is bit-identical to the byte-wise
    reference."""
    import pandas as pd

    from platform_spark.iceberg.bucket import bucket_udf, bucket_value

    vals = [0, 1, -1, 34, -34, 2**33, -(2**33), 7, 12345678901, None]
    df = spark.createDataFrame([(v,) for v in vals], "id long")
    got = [
        r.b
        for r in df.select(bucket_udf("long", 16)("id").alias("b")).collect()
    ]
    want = [
        None if v is None else bucket_value(v, "long", 16) for v in vals
    ]
    assert got == want
    svals = ["iceberg", "", "ü-höh", "doc-42", None]
    sdf = spark.createDataFrame([(v,) for v in svals], "k string")
    got_s = [
        r.b
        for r in sdf.select(bucket_udf("string", 8)("k").alias("b")).collect()
    ]
    assert got_s == [
        None if v is None else bucket_value(v, "string", 8) for v in svals
    ]
    # timestamps (micros widening) and dates (days), nulls interleaved
    import datetime as dtm

    tvals = [
        dtm.datetime(2017, 11, 16, 22, 31, 8),
        dtm.datetime(1970, 1, 1),
        None,
        dtm.datetime(1969, 12, 31, 23, 59, 59),
    ]
    tdf = spark.createDataFrame([(v,) for v in tvals], "ts timestamp")
    got_t = [
        r.b
        for r in tdf.select(bucket_udf("timestamp", 16)("ts").alias("b")).collect()
    ]
    epoch = dtm.datetime(1970, 1, 1)
    want_t = [
        None
        if v is None
        else bucket_value(
            round((v - epoch).total_seconds() * 1_000_000), "timestamp", 16
        )
        for v in tvals
    ]
    assert got_t == want_t
    # spec vector: 2017-11-16T22:31:08 hashes to -2047944441
    assert got_t[0] == ((-2047944441) & 0x7FFFFFFF) % 16
    dvals = [dtm.date(2017, 11, 16), dtm.date(1970, 1, 1), None]
    ddf = spark.createDataFrame([(v,) for v in dvals], "d date")
    got_d = [
        r.b
        for r in ddf.select(bucket_udf("date", 16)("d").alias("b")).collect()
    ]
    want_d = [
        None
        if v is None
        else bucket_value((v - dtm.date(1970, 1, 1)).days, "date", 16)
        for v in dvals
    ]
    assert got_d == want_d
    assert want_d[0] == ((-653330422) & 0x7FFFFFFF) % 16  # spec vector


def test_bucket_bytes_vectorized_property():
    """The length-grouped 2-D numpy murmur3 (the r13 string/binary write
    path) is bit-identical to the scalar reference at EVERY length
    0..67 (block counts 0..16 plus every tail shape) and on
    mixed-length batches with interleaved nulls."""
    import random

    import numpy as np

    from platform_spark.iceberg.bucket import (
        _bucket_bytes_batch,
        _hash_bytes_same_len_numpy,
        bucket_value,
        murmur3_32,
    )

    rnd = random.Random(7)
    for length in range(1, 68):
        vals = [
            bytes(rnd.randrange(256) for _ in range(length))
            for _ in range(64)
        ]
        buf = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(
            64, length
        )
        got = _hash_bytes_same_len_numpy(buf)
        want = np.array([murmur3_32(v) for v in vals], dtype=np.uint32)
        assert (got == want).all(), f"length {length}"
    mixed = (
        [None]
        + [
            bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 40)))
            for _ in range(500)
        ]
        + [b"", None]
    )
    assert list(_bucket_bytes_batch(mixed, 16)) == [
        None if v is None else bucket_value(v, "binary", 16) for v in mixed
    ]


def test_bucket_udf_string_vectorized_batch(spark):
    """A realistic mixed-length STRING key batch (the common LLM-corpus
    shape) routes through the vectorized length classes inside the
    pandas UDF and agrees with the scalar spec hash row-for-row —
    including multi-byte UTF-8 keys and nulls."""
    from platform_spark.iceberg.bucket import bucket_udf, bucket_value

    vals = [f"doc-{i}-{'x' * (i % 37)}" for i in range(1000)]
    vals += [f"ü-{i}-héh" for i in range(50)] + [None, "", "short"]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = [
        r.b
        for r in df.select(bucket_udf("string", 32)("k").alias("b")).collect()
    ]
    assert got == [
        None if v is None else bucket_value(v, "string", 32) for v in vals
    ]


def test_bucket_nullable_long_overflow_raises(spark):
    """Nullable long batches cross Arrow as float64; keys >= 2^53 have
    ALREADY lost precision there, so hashing them would silently write
    wrong buckets for external readers — the UDF fails loudly instead
    (r12 ADVICE)."""
    from platform_spark.iceberg.bucket import bucket_udf

    big = 2**53 + 1
    # coalesce(1): the null and the big key must share one Arrow batch —
    # that is exactly the combination that downgrades the batch to float64
    df = spark.createDataFrame(
        [(1,), (None,), (big,)], "id long"
    ).coalesce(1)
    with pytest.raises(Exception, match="2\\^53"):
        df.select(bucket_udf("long", 16)("id").alias("b")).collect()
    # same magnitude WITHOUT nulls stays on the exact int64 path
    ok = spark.createDataFrame([(1,), (big,)], "id long").coalesce(1)
    assert (
        ok.select(bucket_udf("long", 16)("id").alias("b")).count() == 2
    )


def test_bucket_requires_utc_session(spark):
    """Bucketing a timestamp column asserts the session time zone is
    UTC — a foreign-TZ session would hash LOCALIZED micros and write
    spec-divergent bucket ids (r12 ADVICE)."""
    from platform_spark.iceberg.bucket import assert_utc_session

    assert_utc_session(spark, "timestamp")  # framework session: UTC, ok
    assert_utc_session(spark, "long")  # non-temporal: never checked
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone=UTC"):
            assert_utc_session(spark, "timestamp")
        assert_utc_session(spark, "string")  # still fine
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_dt_to_micros_exact():
    """Datetime→micros conversions use exact integer arithmetic: the
    old ``int(total_seconds() * 1e6)`` float idiom is off by 1 µs for
    ~1% of microsecond timestamps, which flips the murmur3 bucket
    entirely (r12 ADVICE medium)."""
    import datetime as dtm
    import random

    from platform_spark.iceberg.table import dt_to_micros, dt_to_millis

    rnd = random.Random(11)
    epoch = dtm.datetime(1970, 1, 1)
    mismatches = 0
    for _ in range(20_000):
        us = rnd.randrange(0, 4_000_000_000_000_000)  # ~1970..2096
        dt = epoch + dtm.timedelta(microseconds=us)
        assert dt_to_micros(dt) == us
        assert dt_to_millis(dt) == us // 1000
        if int((dt - epoch).total_seconds() * 1_000_000) != us:
            mismatches += 1
    # the float idiom really is broken — this is why the helper exists
    assert mismatches > 0
    # tz-aware datetimes convert identically
    aware = dtm.datetime(2024, 5, 17, 1, 2, 3, 123457, tzinfo=dtm.timezone.utc)
    naive = dtm.datetime(2024, 5, 17, 1, 2, 3, 123457)
    assert dt_to_micros(aware) == dt_to_micros(naive)


def test_zorder_all_null_column(spark, table_loc):
    """An all-null z-order column degrades gracefully (bins to the
    curve origin) instead of feeding an empty F.array to F.filter and
    raising at analysis time (r12 ADVICE)."""
    from pyspark.sql import types as T

    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("x", T.LongType()),
            T.StructField("dead", T.DoubleType()),
        ]
    )
    df = spark.range(0, 500).select(
        F.col("id"),
        (F.col("id") * 7 % 500).alias("x"),
        F.lit(None).cast("double").alias("dead"),
    )
    t = IcebergTable.create(table_loc, schema, clock=CLOCK)
    append_dataframe(t, df)
    append_dataframe(t, df.withColumn("id", F.col("id") + 500))
    res = compact_table(t, spark, zorder_by=("x", "dead"), zorder_files=4)
    assert res is not None
    assert t.to_spark(spark).count() == 1000


def test_bucket_transform_partitioning(spark, table_loc):
    """bucket[N] end-to-end: writes spread across N stable directories,
    a point lookup plans ONLY its bucket's files (1/N of the table from
    manifests alone), CDC upserts keep landing in the right buckets,
    and evolve_partition_spec can move a table ONTO bucketing with zero
    data moves."""
    from platform_spark.iceberg.table import upsert_dataframe

    df = spark.range(0, 400).select(
        F.col("id"), F.concat(F.lit("doc-"), F.col("id")).alias("text")
    )
    t = IcebergTable.create(
        table_loc, df.schema, partition_by=("bucket(id, 8)",), clock=CLOCK
    )
    assert t.spec["fields"][0]["transform"] == "bucket[8]"
    append_dataframe(t, df)
    # every row readable; files land in at most 8 bucket partitions
    assert t.to_spark(spark).count() == 400
    parts = {
        e["data_file"]["partition"]["id_bucket"] for e in t.scan_files()
    }
    assert parts <= set(range(8)) and len(parts) >= 2
    # point lookup: plan exactly the key's bucket
    b42 = t.bucket_value("id", 42)
    planned = t.scan_files(partition_filter={"id_bucket": b42})
    assert 0 < len(planned) < len(t.scan_files())
    got = t.to_spark(spark, partition_filter={"id_bucket": b42}).filter(
        "id = 42"
    )
    assert [(r.id, r.text) for r in got.collect()] == [(42, "doc-42")]
    # the bucket is spec-stable: the manifest value equals the scalar
    from platform_spark.iceberg.bucket import bucket_value as bv

    for e in t.scan_files():
        pth = e["data_file"]["file_path"]
        rows = spark.read.parquet(pth).collect()
        want_b = e["data_file"]["partition"]["id_bucket"]
        assert all(bv(r.id, "long", 8) == want_b for r in rows)
    # CDC upsert: replaced rows keep resolving through their bucket
    upsert_dataframe(
        t,
        spark.createDataFrame([(42, "doc-42-v2")], df.schema),
        ["id"],
    )
    got2 = t.to_spark(spark, partition_filter={"id_bucket": b42}).filter(
        "id = 42"
    )
    assert [(r.id, r.text) for r in got2.collect()] == [(42, "doc-42-v2")]
    with pytest.raises(ValueError, match="no bucket transform"):
        t.bucket_value("text", "x")

    # evolution ONTO bucketing: old unpartitioned files stay readable
    # and conservatively unpruned; new files prune by bucket
    loc2 = str(table_loc) + "_evo"
    t2 = IcebergTable.create(loc2, df.schema, clock=CLOCK)
    append_dataframe(t2, df.filter("id < 200"))
    t2.evolve_partition_spec(("bucket(id, 4)",))
    append_dataframe(t2, df.filter("id >= 200"))
    assert t2.to_spark(spark).count() == 400
    bk = t2.bucket_value("id", 250)
    pl = t2.scan_files(partition_filter={"id_bucket": bk})
    assert len(pl) < len(t2.scan_files())  # new-spec files pruned
    assert (
        t2.to_spark(spark, partition_filter={"id_bucket": bk})
        .filter("id = 250")
        .count()
        == 1
    )


def test_bucket_transform_string_key(spark, table_loc):
    """String bucketing (UTF-8 murmur per spec): URL/doc-key point
    lookups prune to one bucket; non-ASCII keys hash stably."""
    df = spark.range(0, 200).select(
        F.concat(F.lit("https://src.example.com/p/"), F.col("id")).alias(
            "url"
        ),
        F.col("id").alias("n"),
    )
    t = IcebergTable.create(
        table_loc, df.schema, partition_by=("bucket(url, 6)",), clock=CLOCK
    )
    append_dataframe(t, df)
    key = "https://src.example.com/p/77"
    b = t.bucket_value("url", key)
    planned = t.scan_files(partition_filter={"url_bucket": b})
    assert 0 < len(planned) < len(t.scan_files())
    got = t.to_spark(spark, partition_filter={"url_bucket": b}).filter(
        F.col("url") == key
    )
    assert [r.n for r in got.collect()] == [77]


def test_time_travel_as_of_and_history(spark, table_loc):
    """FOR SYSTEM_TIME AS OF: to_spark(as_of=) reads the snapshot that
    was current at that instant (newest snapshot-log entry at or before
    it); predating history or landing on an expired snapshot raises
    loudly; inspect_history marks rollback-stranded entries as
    non-ancestors — the audit view behind the resolution."""
    import datetime as dtm

    now = [1_700_000_000.0]
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=lambda: now[0])
    commit_ts = []
    for lo in range(0, 30, 10):
        now[0] += 3600
        append_dataframe(t, _mk(spark, lo, lo + 10))
        commit_ts.append(int(now[0] * 1000))

    # between commits 2 and 3 → the state as of commit 2
    mid = commit_ts[1] + 1800_000
    assert t.to_spark(spark, as_of=mid).count() == 20
    assert t.snapshot_id_as_of(mid) == t.history()[1]["snapshot-id"]
    # exact commit instant is inclusive; datetime values resolve too
    assert t.to_spark(spark, as_of=commit_ts[0]).count() == 10
    as_dt = dtm.datetime.utcfromtimestamp(commit_ts[2] / 1000 + 60)
    assert t.to_spark(spark, as_of=as_dt).count() == 30
    # predating the first commit raises
    with pytest.raises(ValueError, match="predates"):
        t.snapshot_id_as_of(commit_ts[0] - 10_000_000)
    # one of snapshot_id/ref/as_of only
    with pytest.raises(ValueError, match="ONE of"):
        t.to_spark(spark, as_of=mid, snapshot_id=1)

    # rollback strands the later entry: history marks it non-ancestor
    sid2 = t.history()[1]["snapshot-id"]
    t.rollback_to(sid2)
    hist = {
        r.snapshot_id: r.is_current_ancestor
        for r in t.inspect_history(spark).collect()
    }
    assert hist[sid2] is True
    assert hist[t.history()[0]["snapshot-id"]] is True
    stranded = [s for s, anc in hist.items() if not anc]
    assert stranded  # the undone 3rd commit shows as non-ancestor

    # expiry: the resolved snapshot must still exist
    now[0] += 3600
    append_dataframe(t, _mk(spark, 50, 55))
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired|predates"):
        t.snapshot_id_as_of(commit_ts[0])


def test_sort_order_evolution(spark, table_loc):
    """evolve_sort_order: a metadata-only commit changes the layout
    future writes use — the third evolution leg (schema, spec, sort
    order). Old files keep their recorded order id; compaction migrates
    the whole table to the new order lazily, restoring selective
    manifest bounds; an identical order reuses its id; () reverts to
    unsorted (order-id 0). Content never changes."""
    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    df = spark.range(0, 4000).select(
        (F.col("id") * 2654435761 % 4000).alias("id"),  # scattered ids
        F.concat(F.lit("d-"), F.col("id")).alias("text"),
    )
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    for lo in range(0, 4000, 1000):
        append_dataframe(
            t, df.filter((F.col("id") >= lo) & (F.col("id") < lo + 1000))
        )
    assert t.sort_columns() == []
    v0 = t.version

    t.evolve_sort_order(("id",))
    assert t.sort_columns() == [("id", "asc")]
    assert t.version == v0 + 1  # one metadata-only commit, no snapshot
    assert t.current_snapshot()["snapshot-id"] == IcebergTable.load(
        table_loc
    ).current_snapshot()["snapshot-id"]

    # post-evolution appends lay out by the new order; compaction
    # migrates the old files — a point range then plans few files
    append_dataframe(t, df.filter("id >= 4000"))  # empty, harmless
    compact_table(t, spark, files_per_partition=8)
    entries = t.scan_files()
    if len(entries) > 2:
        kept = t.filter_entries_by_bounds(entries, {"id": (100, 140)})
        assert len(kept) < len(entries)
    got = sorted(r.id for r in t.to_spark(spark).collect())
    assert got == sorted((i * 2654435761) % 4000 for i in range(4000))

    # identical order reuses its id; re-evolving to the default is a no-op
    oid = t.metadata["default-sort-order-id"]
    v1 = t.version
    t.evolve_sort_order(("id",))
    assert t.version == v1 and t.metadata["default-sort-order-id"] == oid
    # a different order gets a fresh id; flipping back REUSES the first
    t.evolve_sort_order(("id desc",))
    assert t.sort_columns() == [("id", "desc")]
    desc_id = t.metadata["default-sort-order-id"]
    assert desc_id != oid
    t.evolve_sort_order(("id",))
    assert t.metadata["default-sort-order-id"] == oid
    # unsorted reverts to order-id 0
    t.evolve_sort_order(())
    assert t.metadata["default-sort-order-id"] == 0
    assert t.sort_columns() == []
    # unknown column refuses
    with pytest.raises(ValueError, match="not in schema"):
        t.evolve_sort_order(("nope",))


def test_zorder_layout_plan_shape(spark, table_loc):
    """The z-order layout is the plan you'd want at 100 TB: NO Window
    operator (a percent_rank normalization would serialize the table
    through one task) and exactly ONE shuffle — the range exchange on
    the interleaved key that any sorted write pays."""
    from platform_spark.iceberg.table import _apply_zorder_layout

    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") * 7 % 5000).alias("x"),
        (F.col("id") * 13 % 5000).alias("y"),
    )
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    laid = _apply_zorder_layout(t, df, [], ("x", "y"), 8)
    plan = laid._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan
    phys = laid._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 1
    assert "rangepartitioning" in phys.lower()


def test_zorder_compaction_prunes_both_dimensions(spark, table_loc):
    """compact_table(zorder_by=(x, y)): after the Morton-curve rewrite,
    manifest column bounds prune the file list on EITHER column at
    ~equal selectivity — where the same table linearly sorted by x
    prunes x but reads ~everything for a y range. Content is unchanged
    (compaction is a replace snapshot)."""
    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    n = 20_000
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") * 7919 % n).alias("x"),   # decorrelated uniform dims
        (F.col("id") * 104729 % n).alias("y"),
    )
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    # many small appends = scattered layout: every file spans ~full range
    for lo in range(0, n, n // 8):
        append_dataframe(t, df.filter((F.col("id") >= lo) & (F.col("id") < lo + n // 8)))
    before_entries = t.scan_files()
    before = {e["data_file"]["file_path"] for e in before_entries}
    span = n // 25  # 4% of the value space
    x_rng = (1000, 1000 + span)
    y_rng = (6200, 6200 + span)
    # scattered layout: every file spans ~the full range of both dims,
    # so bounds-filtering keeps EVERYTHING
    assert len(
        t.filter_entries_by_bounds(before_entries, {"x": x_rng})
    ) == len(before_entries)
    assert len(
        t.filter_entries_by_bounds(before_entries, {"y": y_rng})
    ) == len(before_entries)

    compact_table(t, spark, zorder_by=("x", "y"), zorder_files=64)
    entries = t.scan_files()
    assert len(entries) >= 32  # range exchange produced a real file set
    assert {e["data_file"]["file_path"] for e in entries}.isdisjoint(before)

    # a narrow range on EITHER dimension now prunes most files (curve
    # segments approximate boxes; cuts are unaligned, so the bound is
    # loose-but-strict: well under half, vs 100% before)
    kept_x = t.filter_entries_by_bounds(entries, {"x": x_rng})
    kept_y = t.filter_entries_by_bounds(entries, {"y": y_rng})
    assert len(kept_x) < len(entries) * 0.5, (len(kept_x), len(entries))
    assert len(kept_y) < len(entries) * 0.5, (len(kept_y), len(entries))

    # content-neutral: exact same rows after the rewrite
    assert t.to_spark(spark).count() == n
    got = t.to_spark(spark).agg(
        F.sum("id"), F.sum("x"), F.sum("y")
    ).collect()[0]
    s = n * (n - 1) // 2
    assert tuple(got) == (s, s, s)  # both dims are permutations of id

    # pruned reads return exactly the matching rows (superset + filter)
    rows = (
        t.read_entries(spark, kept_x)
        .filter("x between %d and %d" % x_rng)
        .count()
    )
    assert rows == span + 1

    # contrast: LINEAR sort by x prunes x but stays blind off-axis
    loc2 = str(table_loc) + "_lin"
    t2 = IcebergTable.create(loc2, df.schema, clock=CLOCK, sort_by=("x",))
    append_dataframe(t2, df)
    compact_table(t2, spark)
    e2 = t2.scan_files()
    if len(e2) > 4:
        lin_y = t2.filter_entries_by_bounds(e2, {"y": y_rng})
        z_y_frac = len(kept_y) / len(entries)
        lin_y_frac = len(lin_y) / len(e2)
        assert lin_y_frac > z_y_frac  # the curve beats the line off-axis


def test_inspect_metadata_tables(spark, table_loc):
    """The snapshots/manifests/files/partitions inspect surface answers
    ops questions from metadata alone (no data file reads)."""
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 20))
    append_dataframe(t, _mk(spark, 20, 40))
    t.delete_where(spark, "id % 9 = 1")

    snaps = t.inspect_snapshots(spark).collect()
    assert [r.operation for r in snaps] == ["append", "append", "delete"]
    assert snaps[1].parent_id == snaps[0].snapshot_id
    assert json.loads(snaps[0].summary)["added-records"] == "20"

    mans = t.inspect_manifests(spark).collect()
    assert sum(1 for r in mans if r.content == 1) == 1  # one delete manifest
    assert sum(r.added_rows for r in mans if r.content == 0) == 40

    files = t.inspect_files(spark)
    assert files.filter("content = 0").count() == len(t.scan_files())
    assert files.filter("content = 1").count() == len(t.scan_deletes())
    total = files.filter("content = 0").agg({"record_count": "sum"}).first()[0]
    assert total == 40

    parts = {
        json.loads(r.partition)["part"]: r.record_count
        for r in t.inspect_partitions(spark).collect()
    }
    assert parts == {0: 10, 1: 10, 2: 10, 3: 10}

    # refs view: a staged WAP branch shows its base and staged depth,
    # a tag pins with no staging bookkeeping
    t.create_branch("audit")
    append_dataframe(t, _mk(spark, 100, 105), branch="audit")
    append_dataframe(t, _mk(spark, 105, 110), branch="audit")
    t.create_tag("v1")
    refs = {r.name: r for r in t.inspect_refs(spark).collect()}
    assert refs["audit"].type == "branch"
    assert refs["audit"].staged_snapshots == 2
    assert refs["audit"].base_snapshot_id == refs["v1"].snapshot_id
    assert refs["v1"].type == "tag" and refs["v1"].staged_snapshots is None
    assert refs["v1"].snapshot_id == t.current_snapshot()["snapshot-id"]


def test_wap_branch_stage_validate_publish(spark, table_loc):
    """Write-audit-publish: staged appends advance only the branch ref
    (main readers see nothing), the branch validates through any scan,
    publish fast-forwards main atomically, and a non-fast-forward
    publish (main moved independently) is rejected."""
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 10))
    main_log = len(t.metadata["snapshot-log"])
    t.create_branch("audit")
    append_dataframe(t, _mk(spark, 10, 20), branch="audit")
    append_dataframe(t, _mk(spark, 20, 30), branch="audit")
    # main untouched: count, current snapshot, history
    assert t.to_spark(spark).count() == 10
    assert len(t.metadata["snapshot-log"]) == main_log
    # a fresh loader (another reader) also sees only main
    assert IcebergTable.load(table_loc).to_spark(spark).count() == 10
    # the audit scan sees the staged state
    assert sorted(
        r.id for r in t.to_spark(spark, ref="audit").collect()
    ) == list(range(30))
    # expiry never reclaims the staged branch head
    t.expire_snapshots(keep_last=1)
    assert t.to_spark(spark, ref="audit").count() == 30
    # publish: main fast-forwards to the branch head in one commit
    head = t.publish_branch("audit")
    assert t.current_snapshot()["snapshot-id"] == head["snapshot-id"]
    assert t.to_spark(spark).count() == 30
    assert "audit" not in t.metadata.get("refs", {})
    assert IcebergTable.load(table_loc).to_spark(spark).count() == 30

    # non-fast-forward: branch cut, then main advances -> publish raises
    t.create_branch("risky")
    append_dataframe(t, _mk(spark, 50, 55), branch="risky")
    append_dataframe(t, _mk(spark, 90, 95))  # main moves independently
    with pytest.raises(ValueError, match="fast-forward"):
        t.publish_branch("risky")
    # the staged rows never leaked into main
    assert t.to_spark(spark).filter("id >= 50 AND id < 55").count() == 0


def test_changes_ignores_branch_only_snapshots(spark, table_loc):
    """Incremental reads walk MAIN's ancestry: a staged (unpublished)
    branch commit whose sequence number lands inside the window must not
    leak into a main consumer; after publish it appears exactly once."""
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    s1 = append_dataframe(t, _mk(spark, 0, 10))
    t.create_branch("audit")
    append_dataframe(t, _mk(spark, 100, 120), branch="audit")  # staged
    append_dataframe(t, _mk(spark, 10, 20))  # main advances past it
    got = sorted(
        r.id for r in t.changes(spark, from_snapshot_id=s1["snapshot-id"]).collect()
    )
    assert got == list(range(10, 20))  # no staged rows
    # after publish the branch rows are main history... but publish is a
    # non-fast-forward here (main advanced), so it correctly refuses
    with pytest.raises(ValueError, match="fast-forward"):
        t.publish_branch("audit")
    # a consumer checkpointed at an expired/foreign snapshot fails loudly
    with pytest.raises(ValueError, match="ancestry|unknown|re-baseline"):
        t.changes(spark, from_snapshot_id=999999)


def test_changes_along_branch_ref(spark, table_loc):
    """changes(ref=...) audits a WAP branch pre-publish: the window walks
    the BRANCH head's ancestry, so a reviewer reads exactly the staged
    rows that publishing would land on main — while a plain main read of
    the same window stays branch-free."""
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    s1 = append_dataframe(t, _mk(spark, 0, 10))
    t.create_branch("audit")
    append_dataframe(t, _mk(spark, 100, 110), branch="audit")
    append_dataframe(t, _mk(spark, 110, 125), branch="audit")
    # branch audit: from the fork point, exactly the staged rows
    got = sorted(
        r.id
        for r in t.changes(
            spark, from_snapshot_id=s1["snapshot-id"], ref="audit"
        ).collect()
    )
    assert got == list(range(100, 125))
    # the same window on main is empty (nothing published yet)
    assert t.changes(spark, from_snapshot_id=s1["snapshot-id"]).count() == 0
    # changelog() takes the same ref= path (append-only branch → inserts)
    cl = t.changelog(spark, from_snapshot_id=s1["snapshot-id"], ref="audit")
    assert sorted(r.id for r in cl.collect()) == list(range(100, 125))
    assert {r._change_type for r in cl.collect()} == {"insert"}
    # a tag ref works the same way (pinned head)
    t.create_tag("baseline", s1["snapshot-id"])
    assert t.changes(spark, ref="baseline").count() == 10
    # ref= and to_snapshot_id= are mutually exclusive; unknown ref raises
    with pytest.raises(ValueError, match="not both"):
        t.changes(spark, ref="audit", to_snapshot_id=s1["snapshot-id"])
    with pytest.raises(ValueError, match="unknown ref"):
        t.changes(spark, ref="nope")
    # publish-then-read: after fast-forward the branch rows appear exactly
    # once in the MAIN window and the checkpoint chain stays unbroken
    head = t.publish_branch("audit")
    got_main = sorted(
        r.id
        for r in t.changes(spark, from_snapshot_id=s1["snapshot-id"]).collect()
    )
    assert got_main == list(range(100, 125))
    assert t.current_snapshot()["snapshot-id"] == head["snapshot-id"]


def test_rewrite_deletes_folds_eq_and_pos(spark, table_loc):
    """Delete-file maintenance: after a run of CDC upserts (equality
    deletes) plus a takedown (position deletes), rewrite_deletes folds
    everything into consolidated position deletes — content identical,
    exactly one live delete-file generation, data files untouched, time
    travel intact, and expire_snapshots then reclaims the retired delete
    files from disk."""
    from platform_spark.iceberg.table import rewrite_deletes, upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 40))
    # force the single-scan eq-delete path (as after ~1k micro-upserts)
    t._EQ_UNION_MAX = 1
    for lo in (5, 12, 20):  # three upsert commits → three eq-delete files
        upsert_dataframe(
            t,
            _mk(spark, lo, lo + 6).withColumn("text", F.lit(f"v{lo}")),
            ["id"],
        )
    t.delete_where(spark, "id >= 36")  # position deletes on top
    want = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    old_del_paths = {e["data_file"]["file_path"] for e in t.scan_deletes()}
    assert any(
        e["data_file"]["content"] == 2 for e in t.scan_deletes()
    )  # eq deletes live
    data_before = {e["data_file"]["file_path"] for e in t.scan_files()}
    pre_snap = t.current_snapshot()

    res = rewrite_deletes(t, spark)
    assert res["retired_delete_files"] == len(old_del_paths)
    assert res["new_delete_files"] >= 1
    # content identical; data files untouched; only position deletes live
    assert {(r.id, r.text) for r in t.to_spark(spark).collect()} == want
    assert {e["data_file"]["file_path"] for e in t.scan_files()} == data_before
    live = t.scan_deletes()
    assert {e["data_file"]["content"] for e in live} == {1}
    assert not old_del_paths & {e["data_file"]["file_path"] for e in live}
    # the maintenance snapshot is content-neutral for incremental readers
    snap = append_dataframe(t, _mk(spark, 100, 105))
    got = sorted(
        r.id
        for r in t.changes(spark, from_snapshot_id=pre_snap["snapshot-id"]).collect()
    )
    assert got == list(range(100, 105))
    # time travel to the pre-rewrite snapshot still merges the OLD deletes
    assert {
        (r.id, r.text)
        for r in t.to_spark(spark, snapshot_id=pre_snap["snapshot-id"]).collect()
    } == want
    # a later upsert still last-wins over the folded state
    upsert_dataframe(t, _mk(spark, 20, 23).withColumn("text", F.lit("v9")), ["id"])
    got2 = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    assert {(i, "v9") for i in range(20, 23)} <= got2
    assert len(got2) == len(want) + 5
    # expiry reclaims the retired delete files' storage
    t.expire_snapshots(keep_last=1)
    assert not any(os.path.exists(p) for p in old_del_paths)
    assert {(r.id, r.text) for r in t.to_spark(spark).collect()} == got2


def _replay_changelog(rows, upto=None):
    """Reconstruct table content from changelog rows: per ordinal in
    order, apply deletes (by id) then inserts."""
    by_ord: dict[int, list] = {}
    for r in rows:
        by_ord.setdefault(r._change_ordinal, []).append(r)
    state: dict[int, tuple] = {}
    for o in sorted(by_ord):
        if upto is not None and o > upto:
            break
        batch = by_ord[o]
        for r in batch:
            if r._change_type == "delete":
                state.pop(r.id, None)
        for r in batch:
            if r._change_type == "insert":
                state[r.id] = (r.id, r.part, r.text)
    return set(state.values())


def test_changelog_cdc_read(spark, table_loc):
    """changelog(): the general incremental read — upserts emit
    delete+insert, row-level deletes emit the killed rows, replace
    snapshots are skipped, and replaying the batches in ordinal order
    reconstructs the live table exactly."""
    from platform_spark.iceberg.table import (
        compact_table, rewrite_deletes, upsert_dataframe,
    )

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    s1 = append_dataframe(t, _mk(spark, 0, 12))
    upsert_dataframe(
        t, _mk(spark, 5, 9).withColumn("text", F.lit("v2")), ["id"]
    )
    t.delete_keys(spark, spark.createDataFrame([(9,), (10,)], "id long"))
    t.delete_where(spark, "id = 11")
    rows = t.changelog(spark).collect()
    # window from table birth replays to exactly the live content
    live = {(r.id, r.part, r.text) for r in t.to_spark(spark).collect()}
    assert _replay_changelog(rows) == live
    # the upsert batch emits delete(old 5-8) + insert(v2 5-8); the
    # delete_keys batch emits exactly the still-live killed rows (9, 10);
    # delete_where emits 11
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r._change_type, []).append(r)
    ins = {(r.id, r.text) for r in by_type["insert"]}
    assert {(i, "v2") for i in range(5, 9)} <= ins
    dels = sorted((r.id, r.text) for r in by_type["delete"])
    assert dels == [
        *[(i, f"doc-{i}") for i in range(5, 9)],  # superseded by upsert
        (9, f"doc-9"), (10, f"doc-10"), (11, f"doc-11"),
    ]
    # ordinals follow snapshot order (upsert before the key delete)
    ords = {
        r._change_snapshot_id: r._change_ordinal for r in rows
    }
    assert sorted(ords.values()) == sorted(set(ords.values()))
    # a partial window starting after the first append yields no s1 rows
    w = t.changelog(spark, from_snapshot_id=s1["snapshot-id"]).collect()
    assert all(r._change_snapshot_id != s1["snapshot-id"] for r in w)
    # maintenance snapshots are content-neutral: compaction +
    # delete-rewrite in the window change nothing in the replay
    n_before = len(t.changelog(spark).collect())
    rewrite_deletes(t, spark)
    compact_table(t, spark)
    append_dataframe(t, _mk(spark, 100, 103))
    rows2 = t.changelog(spark).collect()
    live2 = {(r.id, r.part, r.text) for r in t.to_spark(spark).collect()}
    assert _replay_changelog(rows2) == live2
    assert len(rows2) == n_before + 3  # only the new append added events


def test_changelog_copy_on_write_merge(spark, table_loc):
    """A copy-on-write merge_into emits file-level delete+insert pairs
    (removed files' parent-era rows out, new files' rows in) — replay
    still reconstructs the merged table, and only the files containing a
    matching key contribute delete events."""
    from platform_spark.iceberg.table import merge_into

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 20))
    merge_into(
        t, _mk(spark, 18, 24).withColumn("text", F.lit("m")), ["id"], spark
    )
    rows = t.changelog(spark).collect()
    live = {(r.id, r.part, r.text) for r in t.to_spark(spark).collect()}
    assert _replay_changelog(rows) == live
    # the merge's delete events only come from partitions holding ids
    # 18/19 (part 2 and 3) — untouched files never emit
    merge_sid = t.current_snapshot()["snapshot-id"]
    merge_dels = {
        r.part for r in rows
        if r._change_type == "delete" and r._change_snapshot_id == merge_sid
    }
    assert merge_dels <= {18 % 4, 19 % 4}


def test_changelog_wide_window_plan_width(spark, table_loc):
    """A continuous-upsert window folds with PLAN WIDTH independent of
    the number of snapshots: N micro-upsert commits changelog as ~3 scan
    leaves (one provenance-tagged insert read, one kill-candidate read,
    one delete-key read), not O(N) union branches — the property that
    keeps a 1-commit/min table's daily matview refresh analyzable
    (~1,440 snapshots would otherwise union ~3,000 leaves). The event
    set stays identical to the per-snapshot semantics: each superseded
    row dies exactly once, at the FIRST delete that reaches it."""
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 40))
    for c in range(24):
        lo = (c * 3) % 30
        upsert_dataframe(
            t, _mk(spark, lo, lo + 4).withColumn("text", F.lit(f"u{c}")), ["id"]
        )
    cl = t.changelog(spark)
    plan = cl._jdf.queryExecution().optimizedPlan().toString()
    n_leaves = plan.count("Relation")
    assert n_leaves <= 6, f"changelog plan has {n_leaves} leaves for 25 snapshots"
    rows = cl.collect()
    # every upsert killed exactly its 4 live predecessors and inserted 4
    assert len(rows) == 40 + 24 * 8
    live = {(r.id, r.part, r.text) for r in t.to_spark(spark).collect()}
    assert _replay_changelog(rows) == live
    # first-matching-delete-wins: each physical row emits ≤1 delete event
    died: dict[tuple, list] = {}
    for r in rows:
        if r._change_type == "delete":
            died.setdefault((r.id, r.text), []).append(r._change_ordinal)
    assert all(len(v) == 1 for v in died.values())
    # a partial window over the same cadence stays narrow and correct:
    # rows live at the window start emit their delete at the first
    # IN-WINDOW kill; rows already dead at the start emit nothing
    mid = t.metadata["snapshots"][12]["snapshot-id"]
    w = t.changelog(spark, from_snapshot_id=mid)
    n_leaves_w = (
        w._jdf.queryExecution().optimizedPlan().toString().count("Relation")
    )
    assert n_leaves_w <= 6
    wrows = w.collect()
    pre = {
        (r.id, r.part, r.text)
        for r in t.to_spark(spark, snapshot_id=mid).collect()
    }
    state = dict()
    for tup in pre:
        state[tup[0]] = tup
    for o in sorted({r._change_ordinal for r in wrows}):
        batch = [r for r in wrows if r._change_ordinal == o]
        for r in batch:
            if r._change_type == "delete":
                assert state.get(r.id) == (r.id, r.part, r.text), (
                    "delete event does not match the live row at its parent"
                )
                state.pop(r.id)
        for r in batch:
            if r._change_type == "insert":
                state[r.id] = (r.id, r.part, r.text)
    assert set(state.values()) == live


def test_delete_key_bounds_prune_kill_candidates(spark, table_loc):
    """Equality-delete materialization (wide changelog folds,
    rewrite_deletes) prunes its data-file read set by the delete files'
    OWN manifest key bounds: on a sorted table with localized CDC
    batches, only files whose key range intersects a delete file's key
    range are read — O(touched ranges), not O(table). Null delete keys
    disable the pruning for their keyset (null-safe equality matches
    outside any [min, max]), so correctness never depends on it."""
    from pyspark.sql import types as T

    from platform_spark.iceberg.table import (
        rewrite_deletes, upsert_dataframe,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = IcebergTable.create(table_loc, schema, clock=CLOCK, sort_by=("id",))

    def batch(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.col("id"), F.concat(F.lit(tag), F.col("id")).alias("text")
        )

    for lo in range(0, 400, 100):  # four disjoint-range files
        append_dataframe(t, batch(lo, lo + 100, "base-"))
    first = t.current_snapshot()["snapshot-id"]
    upsert_dataframe(t, batch(150, 160, "upd-"), ["id"])

    # unit: of the four original files only the 100-199 one is reachable
    eq = [e for e in t.scan_deletes() if e["data_file"]["content"] == 2]
    assert len(eq) == 1
    max_del = max(e["sequence_number"] for e in eq)
    older = [e for e in t.scan_files() if e["sequence_number"] < max_del]
    assert len(older) == 4
    kept = t._prune_kill_candidates(older, eq)
    assert len(kept) == 1
    lo_b, hi_b = t._entry_bounds(kept[0], 1, "long")
    assert lo_b <= 150 and hi_b >= 159

    # the wide changelog fold emits exactly the superseded rows — and
    # stays correct with the pruned candidate set
    ev = t.changelog(spark, from_snapshot_id=first).collect()
    dels = sorted(r.id for r in ev if r._change_type == "delete")
    assert dels == list(range(150, 160))
    assert all(
        r.text == f"base-{r.id}" for r in ev if r._change_type == "delete"
    )

    # rewrite_deletes reads only the reachable file; the consolidated
    # position deletes reference it alone, and content is unchanged
    res = rewrite_deletes(t, spark)
    assert res["retired_delete_files"] == 1
    pos = [e for e in t.scan_deletes() if e["data_file"]["content"] == 1]
    ids = spark.read.parquet(
        *[e["data_file"]["file_path"] for e in pos]
    ).collect()
    assert len(ids) == 10 and len({r.file_path for r in ids}) == 1
    got = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    want = {
        (i, f"upd-{i}" if 150 <= i < 160 else f"base-{i}")
        for i in range(400)
    }
    assert got == want

    # null-key deletes: pruning must keep everything (null-safe match)
    t2loc = table_loc + "_null"
    t2 = IcebergTable.create(t2loc, schema, clock=CLOCK, sort_by=("id",))
    df = spark.createDataFrame([(None, "n-null"), (5, "n-5")], schema)
    append_dataframe(t2, df)
    append_dataframe(t2, batch(100, 200, "base-"))
    t2.delete_keys(spark, spark.createDataFrame([(None,)], "id long"))
    eq2 = [e for e in t2.scan_deletes() if e["data_file"]["content"] == 2]
    older2 = [
        e for e in t2.scan_files()
        if e["sequence_number"] < max(x["sequence_number"] for x in eq2)
    ]
    assert len(t2._prune_kill_candidates(older2, eq2)) == len(older2)
    got2 = {r.text for r in t2.to_spark(spark).collect()}
    assert "n-null" not in got2 and "n-5" in got2


def test_composite_key_kill_candidate_pruning(spark, table_loc):
    """r11 verdict #4: a composite-key CDC table — (tenant_id, doc_id)
    with few tenants — must prune on the SECOND key column too. Every
    data file spans the full tenant range, so first-column bounds alone
    keep all files; intersecting bounds across ALL equality columns
    keeps only the file whose doc range the delete touches. The fold
    stays correct on the pruned set, and a delete file with NULLs in
    one key column unbounds only that column — the other still
    prunes."""
    from pyspark.sql import types as T

    from platform_spark.iceberg.table import upsert_dataframe

    schema = T.StructType(
        [
            T.StructField("tenant", T.LongType()),
            T.StructField("doc", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = IcebergTable.create(table_loc, schema, clock=CLOCK, sort_by=("doc",))

    def batch(lo, hi, tag):
        # every batch covers BOTH tenants: tenant bounds are [1, 2] in
        # every file, doc bounds are the localized [lo, hi) range
        return spark.range(lo, hi).select(
            (F.col("id") % 2 + 1).alias("tenant"),
            F.col("id").alias("doc"),
            F.concat(F.lit(tag), F.col("id")).alias("text"),
        )

    for lo in range(0, 400, 100):  # four files, disjoint doc ranges
        append_dataframe(t, batch(lo, lo + 100, "base-"))
    first = t.current_snapshot()["snapshot-id"]
    upsert_dataframe(t, batch(150, 160, "upd-"), ["tenant", "doc"])

    eq = [e for e in t.scan_deletes() if e["data_file"]["content"] == 2]
    assert len(eq) == 1
    assert tuple(eq[0]["data_file"]["equality_ids"]) == (1, 2)
    max_del = max(e["sequence_number"] for e in eq)
    older = [e for e in t.scan_files() if e["sequence_number"] < max_del]
    assert len(older) == 4
    # tenant (field 1) bounds are [1, 2] everywhere — first-column-only
    # pruning would keep all four; the composite intersection keeps one
    for e in older:
        assert t._entry_bounds(e, 1, "long") == (1, 2)
    kept = t._prune_kill_candidates(older, eq)
    assert len(kept) == 1
    lo_b, hi_b = t._entry_bounds(kept[0], 2, "long")
    assert lo_b <= 150 and hi_b >= 159

    # the fold over the pruned candidate set is still exact
    ev = t.changelog(spark, from_snapshot_id=first).collect()
    dels = sorted(r.doc for r in ev if r._change_type == "delete")
    assert dels == list(range(150, 160))

    # NULLs in ONE key column unbound only that column: a delete file
    # with null tenants but doc keys in [150, 159] still prunes to the
    # one doc-range file
    t2loc = table_loc + "_null1col"
    t2 = IcebergTable.create(t2loc, schema, clock=CLOCK, sort_by=("doc",))
    rows = [(None, d, f"base-{d}") for d in range(0, 400, 7)]
    append_dataframe(t2, spark.createDataFrame(rows, schema))
    for lo in range(0, 400, 100):
        append_dataframe(t2, batch(lo, lo + 100, "base-"))
    t2.delete_keys(
        spark,
        spark.createDataFrame(
            [(None, d) for d in range(150, 160)], "tenant long, doc long"
        ),
    )
    eq2 = [e for e in t2.scan_deletes() if e["data_file"]["content"] == 2]
    older2 = [
        e
        for e in t2.scan_files()
        if e["sequence_number"] < max(x["sequence_number"] for x in eq2)
    ]
    assert len(older2) == 5
    kept2 = t2._prune_kill_candidates(older2, eq2)
    # doc bounds [150, 159] reach the null-tenant file (docs 0..399 by 7)
    # and the 100-199 file — tenant column is unbounded by the nulls
    assert len(kept2) == 2
    got2 = {(r.tenant, r.doc) for r in t2.to_spark(spark).collect()}
    assert (None, 154) not in got2  # 154 = 7*22 → was present, killed
    assert (None, 147) in got2
    assert (1, 154) in got2  # non-null tenants unaffected (null-safe eq)


def test_rename_and_drop_column(spark, table_loc):
    """Metadata-only rename/drop via parquet field-id resolution: every
    internal writer stamps Iceberg field ids into parquet, so the first
    rename switches the table to id-based column matching and
    pre-rename files read correctly under the new name — including
    equality-delete KEY files (a post-rename upsert still kills
    pre-rename copies). Guards: partition-spec sources and sort columns
    refuse, live eq-delete keys block a drop until rewrite_deletes, and
    tables that predate field-id stamping refuse outright."""
    from pyspark.sql import types as T

    from platform_spark.iceberg.table import rewrite_deletes, upsert_dataframe

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.LongType()),
            T.StructField("txt", T.StringType()),
            T.StructField("extra", T.LongType()),
        ]
    )

    def mk(lo, hi, tag):
        return spark.createDataFrame(
            [(i, i % 3, f"{tag}-{i}", i * 10) for i in range(lo, hi)], schema
        )

    t = IcebergTable.create(table_loc, schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, mk(0, 12, "a"))
    upsert_dataframe(t, mk(3, 6, "u1"), ["id"])  # pre-rename eq-delete

    t.rename_column("txt", "body")
    assert [f.name for f in t.spark_schema.fields] == [
        "id", "part", "body", "extra",
    ]
    got = {(r.id, r.body) for r in t.to_spark(spark).collect()}
    assert got == {
        (i, f"u1-{i}" if 3 <= i < 6 else f"a-{i}") for i in range(12)
    }

    # post-rename writes + a cross-rename upsert (old copies must die)
    def mk2(lo, hi, tag):
        return spark.createDataFrame(
            [(i, i % 3, f"{tag}-{i}", i * 10) for i in range(lo, hi)],
            t.spark_schema,
        )

    append_dataframe(t, mk2(12, 16, "b"))
    upsert_dataframe(t, mk2(4, 8, "u2"), ["id"])
    got = {(r.id, r.body) for r in t.to_spark(spark).collect()}
    want = {
        (
            i,
            "u2-%d" % i if 4 <= i < 8
            else "u1-%d" % i if 3 <= i < 4
            else "b-%d" % i if i >= 12
            else "a-%d" % i,
        )
        for i in range(16)
    }
    assert got == want

    # rename the upsert KEY column: eq-delete files resolve by id too
    t.rename_column("id", "doc_id")
    upsert_dataframe(
        t,
        spark.createDataFrame(
            [(0, 0, "u3-0", 0)], t.spark_schema
        ),
        ["doc_id"],
    )
    got = {(r.doc_id, r.body) for r in t.to_spark(spark).collect()}
    assert (0, "u3-0") in got and (0, "a-0") not in got and len(got) == 16

    # guards
    with pytest.raises(ValueError, match="partition spec"):
        t.rename_column("part", "bucket")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("extra", "body")
    with pytest.raises(ValueError, match="equality-delete"):
        t.drop_column("doc_id")
    # changelog across the rename window replays to the live table
    rows = t.changelog(spark).collect()
    state = {}
    by_ord: dict[int, list] = {}
    for r in rows:
        by_ord.setdefault(r._change_ordinal, []).append(r)
    for o in sorted(by_ord):
        for r in by_ord[o]:
            if r._change_type == "delete":
                state.pop(r.doc_id, None)
        for r in by_ord[o]:
            if r._change_type == "insert":
                state[r.doc_id] = (r.doc_id, r.body)
    assert set(state.values()) == got

    # drop a plain column; old files keep the bytes, reads stop seeing it
    t.drop_column("extra")
    assert [f.name for f in t.spark_schema.fields] == ["doc_id", "part", "body"]
    assert {(r.doc_id, r.body) for r in t.to_spark(spark).collect()} == got
    # after folding eq-deletes to position deletes the key drop is legal
    rewrite_deletes(t, spark)
    t.drop_column("body")
    assert {r.doc_id for r in t.to_spark(spark).collect()} == {
        i for i in range(16)
    }

    # a table that predates field-id stamping refuses loudly
    t2 = IcebergTable.create(
        table_loc + "_old",
        schema,
        clock=CLOCK,
        properties={"write.parquet.field-ids": "false"},
    )
    append_dataframe(t2, mk(0, 4, "x"))
    with pytest.raises(ValueError, match="predates"):
        t2.rename_column("txt", "body")


def test_partition_spec_evolution(spark, table_loc):
    """Partition-spec evolution: one metadata-only commit changes how
    FUTURE writes partition; zero data moves. Old files stay scannable
    and prunable under their own recorded spec (a filter on a field an
    old spec lacks keeps those files — conservative superset); new files
    write and prune under the new spec; mixed-layout reads (scan,
    row-level delete, changelog) stay correct; rewrite_manifests
    consolidates per (kind, spec); compact_table rewrites under the
    CURRENT spec and thereby migrates the table lazily, after which
    pruning is tight again. Re-declaring a field from any prior spec
    keeps its field-id (spec rule)."""
    import datetime

    from pyspark.sql import types as T

    from platform_spark.iceberg.table import (
        compact_table,
        merge_into,
        rewrite_deletes,
        upsert_dataframe,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def mk(lo, hi, day):
        return spark.createDataFrame(
            [
                (i, i % 3, datetime.datetime(2024, 1, day, 12, 0), f"doc-{i}")
                for i in range(lo, hi)
            ],
            schema,
        )

    # spec 0: unpartitioned (one file, so pruning counts are exact below)
    t = IcebergTable.create(table_loc, schema, clock=CLOCK)
    append_dataframe(t, mk(0, 8, 1).coalesce(1))
    # spec 1: identity(part) — metadata-only
    v_before = t.version
    t.evolve_partition_spec(("part",))
    assert t.version == v_before + 1
    part_fid = next(
        pf["field-id"] for pf in t.spec["fields"] if pf["name"] == "part"
    )
    append_dataframe(t, mk(8, 16, 2))
    assert sorted(r.id for r in t.to_spark(spark).collect()) == list(range(16))
    # pruning: the old (unpartitioned) file is KEPT — it cannot prove it
    # lacks part=1 — while new files prune exactly
    ent = t.scan_files(partition_filter={"part": 1})
    by_spec: dict = {}
    for e in ent:
        by_spec.setdefault(e["_spec_id"], []).append(e)
    assert len(by_spec[0]) == 1  # the old file survives every filter
    assert all(
        e["data_file"]["partition"]["part"] == 1 for e in by_spec[1]
    )
    # spec 2: hidden time partitioning — days(ts)
    t.evolve_partition_spec(("days(ts)",))
    append_dataframe(t, mk(16, 24, 3))
    assert {e["_spec_id"] for e in t.scan_files()} == {0, 1, 2}
    assert sorted(r.id for r in t.to_spark(spark).collect()) == list(range(24))
    # day filter prunes only spec-2 files; all older files conservatively kept
    day3 = (datetime.date(2024, 1, 3) - datetime.date(1970, 1, 1)).days
    ent = t.scan_files(partition_filter={"ts_day": day3})
    assert {e["_spec_id"] for e in ent} == {0, 1, 2}
    ent_none = t.scan_files(partition_filter={"ts_day": day3 + 100})
    assert {e["_spec_id"] for e in ent_none} == {0, 1}  # spec-2 pruned out
    # the incremental append read also spans the layout boundary: the
    # window after the first append holds spec-1 and spec-2 files
    first_snap = t.metadata["snapshots"][0]["snapshot-id"]
    inc = sorted(
        r.id for r in t.changes(spark, from_snapshot_id=first_snap).collect()
    )
    assert inc == list(range(8, 24))
    # row-level delete across the three layouts (mixed-spec with_pos read)
    t.delete_where(spark, "id % 8 = 5")
    live = sorted(r.id for r in t.to_spark(spark).collect())
    assert live == [i for i in range(24) if i % 8 != 5]
    # changelog across the evolution replays to the live content
    rows = t.changelog(spark).collect()
    assert _replay_changelog(rows) == {
        (r.id, r.part, r.text) for r in t.to_spark(spark).select(
            "id", "part", "text"
        ).collect()
    }
    # manifest consolidation respects spec boundaries: more spec-2
    # commits grow the list, then the fold makes exactly one manifest
    # per (content kind, spec)
    append_dataframe(t, mk(24, 28, 3))
    append_dataframe(t, mk(28, 32, 3))
    live = live + list(range(24, 32))
    res = t.rewrite_manifests()
    assert res["manifests_created"] == 4  # data×3 specs + deletes×1
    assert sorted(r.id for r in t.to_spark(spark).collect()) == live
    # compaction migrates everything to the CURRENT spec...
    compact_table(t, spark)
    assert {e["_spec_id"] for e in t.scan_files()} == {2}
    assert sorted(r.id for r in t.to_spark(spark).collect()) == live
    # ...after which time-partition pruning is exact
    ent = t.scan_files(partition_filter={"ts_day": day3})
    assert ent and all(
        e["data_file"]["partition"]["ts_day"] == day3 for e in ent
    )
    # re-declaring identity(part) reuses its original field-id
    t.evolve_partition_spec(("part",))
    assert (
        next(pf["field-id"] for pf in t.spec["fields"] if pf["name"] == "part")
        == part_fid
    )
    assert t.spec["spec-id"] == 3


def test_rewrite_manifests_pure_metadata_consolidation(spark, table_loc):
    """rewrite_manifests folds a commit-count-long manifest list into one
    manifest per content kind without touching any data/delete file:
    content identical, equality-delete sequence rule still applies from
    the carried per-entry sequence numbers, history snapshots untouched,
    incremental readers skip the replace, expiry reclaims old manifests."""
    from platform_spark.iceberg import avro as _avro
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    for lo in range(0, 24, 4):  # six append commits
        append_dataframe(t, _mk(spark, lo, lo + 4))
    upsert_dataframe(t, _mk(spark, 2, 6).withColumn("text", F.lit("v2")), ["id"])
    upsert_dataframe(t, _mk(spark, 4, 8).withColumn("text", F.lit("v3")), ["id"])
    t.delete_keys(spark, spark.createDataFrame([(20,)], "id long"))
    want = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    pre_snap = t.current_snapshot()
    _, _, mlist_before = _avro.read_container(pre_snap["manifest-list"])
    assert len(mlist_before) > 8  # one-plus per commit: the 10k-commit disease
    data_files = {e["data_file"]["file_path"] for e in t.scan_files()}
    del_files = {e["data_file"]["file_path"] for e in t.scan_deletes()}
    old_manifest_paths = {m["manifest_path"] for m in mlist_before}

    res = t.rewrite_manifests()
    assert res["manifests_replaced"] == len(mlist_before)
    assert res["manifests_created"] == 2  # one data + one deletes
    _, _, mlist_after = _avro.read_container(
        t.current_snapshot()["manifest-list"]
    )
    assert len(mlist_after) == 2
    # nothing but metadata moved; content and sequence semantics intact
    assert {(r.id, r.text) for r in t.to_spark(spark).collect()} == want
    assert {e["data_file"]["file_path"] for e in t.scan_files()} == data_files
    assert {e["data_file"]["file_path"] for e in t.scan_deletes()} == del_files
    # v3 beat v2 on the overlap BECAUSE of per-entry sequence numbers —
    # still true reading through the consolidated manifests
    assert {(i, "v3") for i in range(4, 8)} <= want
    # a second rewrite is a no-op (already consolidated)
    v = t.version
    assert t.rewrite_manifests()["manifests_replaced"] == 0
    assert t.version == v
    # incremental readers skip the replace; history reads old lists
    snap = append_dataframe(t, _mk(spark, 100, 103))
    got = sorted(
        r.id
        for r in t.changes(spark, from_snapshot_id=pre_snap["snapshot-id"]).collect()
    )
    assert got == [100, 101, 102]
    assert {
        (r.id, r.text)
        for r in t.to_spark(spark, snapshot_id=pre_snap["snapshot-id"]).collect()
    } == want
    # upserts keep working on top of the consolidated list
    upsert_dataframe(t, _mk(spark, 100, 101).withColumn("text", F.lit("v4")), ["id"])
    assert (100, "v4") in {
        (r.id, r.text) for r in t.to_spark(spark).collect()
    }
    # expiry reclaims the replaced manifest files
    t.expire_snapshots(keep_last=1)
    assert not any(os.path.exists(p) for p in old_manifest_paths)
    live_now = {(r.id, r.text) for r in t.to_spark(spark).collect()}
    assert (100, "v4") in live_now and len(live_now) == len(want) + 3


def test_rewrite_deletes_noop_and_dead_keys(spark, table_loc):
    """No live deletes → no-op without a commit; an equality delete whose
    keys match nothing folds to a retire-only commit (zero new files) and
    the scan stops paying for it."""
    from platform_spark.iceberg.table import rewrite_deletes

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 10))
    v = t.version
    assert rewrite_deletes(t, spark)["retired_delete_files"] == 0
    assert t.version == v  # no commit
    # an eq delete for keys that never existed
    t.delete_keys(spark, spark.createDataFrame([(999,), (1000,)], "id long"))
    res = rewrite_deletes(t, spark)
    assert res["retired_delete_files"] == 1
    assert res["new_delete_files"] == 0
    assert t.scan_deletes() == []
    assert t.to_spark(spark).count() == 10


def test_matview_publish_is_atomic(spark, table_loc, tmp_path, monkeypatch):
    """A crash between the state write and the checkpoint publish leaves
    the PREVIOUS (state, checkpoint) pair fully intact — the two are
    published together by one os.replace, so there is no double-fold
    window (new state + old checkpoint) and no missing-state window
    (mid-swap rename). Re-running the refresh converges and sweeps the
    orphaned state directory."""
    import platform_spark.iceberg.matview as mv
    from platform_spark.iceberg.matview import IncrementalAggregate
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 20))
    agg = IncrementalAggregate(str(tmp_path / "mv"), ["part"], sum_cols=["id"])
    agg.refresh(spark, t)
    ckpt_before = agg.checkpoint()
    state_before = {(r.part, r.n, r.sum_id) for r in agg.read(spark).collect()}
    upsert_dataframe(t, _mk(spark, 5, 9).withColumn("text", F.lit("v2")), ["id"])

    real_replace = os.replace

    def boom(src, dst):
        raise RuntimeError("crash before checkpoint publish")

    monkeypatch.setattr(mv.os, "replace", boom)
    with pytest.raises(RuntimeError, match="crash before"):
        agg.refresh(spark, t)
    monkeypatch.setattr(mv.os, "replace", real_replace)
    # the crashed refresh is invisible: checkpoint AND state are the old pair
    assert agg.checkpoint() == ckpt_before
    assert {
        (r.part, r.n, r.sum_id) for r in agg.read(spark).collect()
    } == state_before
    mv_root = str(tmp_path / "mv")
    live_dir = os.path.basename(agg._live_data_dir())
    orphans = {
        d
        for d in os.listdir(mv_root)
        if d.startswith("state-") and d != live_dir
    }
    assert orphans  # the crashed refresh left its unreferenced state dir
    # re-run folds the same window exactly once and converges to the
    # full aggregate; the orphaned state dir from the crash is swept
    assert agg.refresh(spark, t) == 8  # 4 deletes + 4 inserts
    full = {
        (r.part, r.n, r.s)
        for r in t.to_spark(spark)
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert {(r.part, r.n, r.sum_id) for r in agg.read(spark).collect()} == full
    # the crash orphan is swept; the superseded generation is kept for
    # one refresh (reader grace), so exactly {current, previous} remain
    state_dirs = {
        d for d in os.listdir(mv_root) if d.startswith("state-")
    }
    assert orphans.isdisjoint(state_dirs)
    assert state_dirs == {os.path.basename(agg._live_data_dir()), live_dir}


def test_pipeline_bucket_partitioned_cdc_deployment(spark, tmp_path):
    """Deployment composition (the 100 TB shape, end to end): the CDC
    sink commits through the durable cross-process catalog into a
    bucket(id, 4)-partitioned table while maintaining a declared
    matview; compact_every bin-packs only the TOUCHED buckets (the
    bucket-aware partition tracking added with the transform); and a
    separate 'process' — its own protocol instance — point-looks-up
    through exactly one bucket's files afterwards."""
    from platform_spark.iceberg.commit import LockedPointerCommit
    from platform_spark.iceberg.matview import IncrementalAggregate
    from platform_spark.streaming.pipeline import ContinuousTopicPipeline

    src = str(tmp_path / "src")
    for lo in range(0, 60, 20):  # three micro-batches
        _mk(spark, lo, lo + 20).write.mode("append").parquet(src)
    loc = str(tmp_path / "ice")
    mv = IncrementalAggregate(
        str(tmp_path / "mv"), group_cols=["part"], sum_cols=["id"]
    )
    pipe = ContinuousTopicPipeline(
        spark,
        source_dir=src,
        dest_dir=str(tmp_path / "unused"),
        checkpoint_dir=str(tmp_path / "ck"),
        iceberg_location=loc,
        partition_cols=("bucket(id, 4)",),
        upsert_keys=("id",),
        compact_every=2,
        commit_protocol=LockedPointerCommit(),
        matviews=(mv,),
    )
    pipe.run_available_now()

    # the "other process": a fresh handle through its own protocol
    t = IcebergTable.load(loc, protocol=LockedPointerCommit())
    assert {r.id for r in t.to_spark(spark).collect()} == set(range(60))
    # every file's partition value is a real bucket id
    parts = {e["data_file"]["partition"]["id_bucket"] for e in t.scan_files()}
    assert parts <= set(range(4))
    # point lookup plans one bucket's files only
    b = t.bucket_value("id", 17)
    planned = t.scan_files(partition_filter={"id_bucket": b})
    assert 0 < len(planned) < len(t.scan_files())
    got = t.to_spark(spark, partition_filter={"id_bucket": b}).filter("id = 17")
    assert [r.id for r in got.collect()] == [17]
    # the sink-maintained view equals the full aggregate of the table
    full = {
        (r.part, r.n, r.s)
        for r in t.to_spark(spark)
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert {
        (r.part, r.n, r.sum_id) for r in mv.read(spark, t).collect()
    } == full
    # a CDC re-upsert through the sink replays cleanly after compaction
    _mk(spark, 10, 15).withColumn("text", F.lit("v2")).write.mode(
        "append"
    ).parquet(src)
    pipe.run_available_now()
    t.refresh()
    got2 = {
        (r.id, r.text) for r in t.to_spark(spark).collect() if 10 <= r.id < 15
    }
    assert got2 == {(i, "v2") for i in range(10, 15)}


def test_matview_read_survives_concurrent_refresh_sweep(
    spark, table_loc, tmp_path
):
    """A lazy read planned before a concurrent refresh publishes still
    executes afterwards (r11 verdict #3: the multi-writer sink protocol
    makes a cross-process reader/refresher overlap realistic, and an
    immediate sweep turned it into a mid-query FileNotFound). The
    superseded state dir survives exactly ONE more refresh — the
    documented reader-grace bound — and is swept by the refresh after
    next."""
    from platform_spark.iceberg.matview import IncrementalAggregate
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 20))
    agg = IncrementalAggregate(str(tmp_path / "mv"), ["part"], sum_cols=["id"])
    agg.refresh(spark, t)
    gen1 = os.path.basename(agg._live_data_dir())

    # reader plans against generation 1 but has not executed yet
    planned = agg.read(spark)

    # a "concurrent" refresher publishes generation 2 and sweeps
    upsert_dataframe(t, _mk(spark, 5, 9).withColumn("text", F.lit("v2")), ["id"])
    assert agg.refresh(spark, t) == 8
    gen2 = os.path.basename(agg._live_data_dir())
    assert gen2 != gen1

    # the planned read executes mid-overlap: no FileNotFound, and it
    # sees the consistent generation-1 aggregate it planned against
    rows = {(r.part, r.n, r.sum_id) for r in planned.collect()}
    assert sum(r[1] for r in rows) == 20  # pre-upsert row count

    # a fresh read sees generation 2 = the live table's full aggregate
    full = {
        (r.part, r.n, r.s)
        for r in t.to_spark(spark)
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert {
        (r.part, r.n, r.sum_id) for r in agg.read(spark).collect()
    } == full

    # grace is one generation: the refresh after next sweeps gen1
    t.delete_keys(spark, spark.createDataFrame([(0,), (1,)], "id long"))
    assert agg.refresh(spark, t) > 0
    dirs = {
        d
        for d in os.listdir(str(tmp_path / "mv"))
        if d.startswith("state-")
    }
    assert gen1 not in dirs
    assert dirs == {os.path.basename(agg._live_data_dir()), gen2}

    # a no-op republish (table unmoved) does NOT advance the generation
    # or shrink the grace window
    assert agg.refresh(spark, t) == 0
    dirs2 = {
        d
        for d in os.listdir(str(tmp_path / "mv"))
        if d.startswith("state-")
    }
    assert dirs2 == dirs


@pytest.mark.parametrize("keep", [1, 3])
def test_matview_keep_generations_tunable(spark, table_loc, tmp_path, keep):
    """The reader-grace window is ``keep_generations`` (r12 verdict #6):
    after each refresh exactly min(keep, generations so far) state dirs
    survive, newest-first — long-held reader plans become a tunable
    retention decision instead of a hard-coded {current, previous}."""
    from platform_spark.iceberg.matview import IncrementalAggregate
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(
        table_loc, df.schema, partition_by=("part",), clock=CLOCK
    )
    append_dataframe(t, _mk(spark, 0, 10))
    agg = IncrementalAggregate(
        str(tmp_path / "mv"), ["part"], sum_cols=["id"], keep_generations=keep
    )
    seen: list[str] = []
    agg.refresh(spark, t)
    seen.append(os.path.basename(agg._live_data_dir()))
    for i in range(4):
        upsert_dataframe(
            t,
            _mk(spark, i, i + 3).withColumn("text", F.lit(f"v{i}")),
            ["id"],
        )
        assert agg.refresh(spark, t) > 0
        seen.append(os.path.basename(agg._live_data_dir()))
        dirs = {
            d
            for d in os.listdir(str(tmp_path / "mv"))
            if d.startswith("state-")
        }
        # newest `keep` generations survive, older ones are swept
        assert dirs == set(seen[-keep:])
    # the live state still equals the full aggregate
    full = {
        (r.part, r.n, r.s)
        for r in t.to_spark(spark)
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert {
        (r.part, r.n, r.sum_id) for r in agg.read(spark).collect()
    } == full


def test_matview_concurrent_refreshers_serialize(spark, table_loc, tmp_path):
    """Two refreshers on ONE state dir (separate instances = separate
    processes as far as the flock can tell) serialize instead of racing:
    no refresher's unpublished state dir is swept out from under it, the
    checkpoint always names an existing directory, and the final state
    equals the full aggregate."""
    import threading

    from platform_spark.iceberg.matview import IncrementalAggregate
    from platform_spark.iceberg.table import upsert_dataframe

    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, partition_by=("part",), clock=CLOCK)
    append_dataframe(t, _mk(spark, 0, 20))
    mv_dir = str(tmp_path / "mv")
    a = IncrementalAggregate(mv_dir, ["part"], sum_cols=["id"])
    b = IncrementalAggregate(mv_dir, ["part"], sum_cols=["id"])
    a.refresh(spark, t)
    upsert_dataframe(t, _mk(spark, 5, 9).withColumn("text", F.lit("v2")), ["id"])

    errs: list[Exception] = []

    def go(agg):
        try:
            agg.refresh(spark, t)
        except Exception as e:  # noqa: BLE001 — surfaced via assert
            errs.append(e)

    threads = [threading.Thread(target=go, args=(x,)) for x in (a, b, a, b)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    # checkpoint names a directory that exists
    live = a._live_data_dir()
    assert live is not None and os.path.isdir(live)
    full = {
        (r.part, r.n, r.s)
        for r in t.to_spark(spark)
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert {
        (r.part, r.n, r.sum_id) for r in a.read(spark).collect()
    } == full
    assert a.checkpoint() == t.current_snapshot()["snapshot-id"]


def test_matview_empty_read_schema_derives_types(spark, table_loc, tmp_path):
    """read() on an uninitialized view with the source table given
    derives the group/sum column types from the table schema, so the
    empty shape unions/compares cleanly with the post-refresh one
    (instead of hardcoding string group columns)."""
    from platform_spark.iceberg.matview import IncrementalAggregate

    df = spark.createDataFrame(
        [(1, 10, 0.5)], "id long, part long, score double"
    )
    t = IcebergTable.create(table_loc, df.schema, clock=CLOCK)
    agg = IncrementalAggregate(
        str(tmp_path / "mv"), ["part"], sum_cols=["id", "score"]
    )
    empty = agg.read(spark, table=t)
    assert empty.count() == 0
    append_dataframe(t, df)
    agg.refresh(spark, t)
    filled = agg.read(spark)
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in filled.schema.fields
    ]
    assert empty.unionByName(filled).count() == 1
    # the no-table fallback keeps the legacy string shape
    legacy = IncrementalAggregate(str(tmp_path / "mv2"), ["part"]).read(spark)
    assert [f.dataType.simpleString() for f in legacy.schema.fields] == [
        "string", "bigint"
    ]


def test_expire_conflict_retry_keeps_age_guard(spark, table_loc, monkeypatch):
    """expire_snapshots' conflict retry must re-apply older_than_ms
    against the REFRESHED snapshot list: a snapshot committed
    concurrently during the conflict is younger than the age cutoff and
    must survive a retry whose count floor would otherwise expire it."""
    now = [1_700_000_000.0]
    df = _mk(spark, 0, 1)
    t = IcebergTable.create(table_loc, df.schema, clock=lambda: now[0])
    for lo in range(0, 30, 10):
        now[0] += 3600
        append_dataframe(t, _mk(spark, lo, lo + 10))
    ts = [s["timestamp-ms"] for s in t.metadata["snapshots"]]
    # snapshot 0 is expirable by age; 1 and 2 are pinned young
    cutoff = ts[0] + 1

    real = t._write_version
    state = {"raised": False}

    def flaky(version, metadata):
        if not state["raised"]:
            state["raised"] = True
            # a concurrent writer lands an append and wins the version race
            t2 = IcebergTable.load(table_loc, clock=lambda: now[0])
            append_dataframe(t2, _mk(spark, 100, 110))
            raise CommitConflict("lost to the concurrent append")
        return real(version, metadata)

    monkeypatch.setattr(t, "_write_version", flaky)
    res = t.expire_snapshots(keep_last=1, older_than_ms=cutoff)
    # without the age guard on retry, the count floor (keep_last widened
    # to 2 pre-conflict) would also expire snapshot 1 — young by age
    assert res["snapshots"] == 1
    left = sorted(s["timestamp-ms"] for s in t.metadata["snapshots"])
    assert left == sorted([ts[1], ts[2], int(now[0] * 1000)])
    assert t.to_spark(spark).count() == 40


def test_kafsql_offset_pruning_over_iceberg_topic(spark, tmp_path):
    """A `WHERE _offset >=` fetch (the S7 fetch-from-offset analogue)
    over an Iceberg topic prunes the planned FILE LIST via manifest
    `_offset` column bounds — matching the KFS catalog's batch-level
    offset pruning — asserted on the compiled plan's actual input files,
    row-identical to the parquet engine, and priced identically by the
    manifest-only EXPLAIN estimate."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import (
        IcebergTopicCatalog,
        materialize_topic_to_iceberg,
    )
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    root = str(tmp_path / "icetopics")
    os.makedirs(root, exist_ok=True)
    ev = cat.topic("events", with_schema_columns=False)
    cut = ev.agg(F.max("_offset")).first()[0] // 2
    # two commits with disjoint per-file offset ranges (a live topic's
    # natural layout: offsets only grow, so later files carry higher
    # bounds — the declared sort orders make this tight after compaction)
    for sl in (
        ev.filter(F.col("_offset") < cut),
        ev.filter(F.col("_offset") >= cut),
    ):
        materialize_topic_to_iceberg(sl, root, "events")
    now = datetime(2024, 1, 31)
    icat = IcebergTopicCatalog(spark, root, configs=cat.configs)
    ieng = KafSqlEngine(icat, now=now)
    peng = KafSqlEngine(cat, now=now)
    ieng.sql("SET enable_cache = false")

    def canon(df):
        return sorted(tuple(str(v) for v in r) for r in df.collect())

    full = "SELECT _partition, _offset FROM events LAST 365d"
    fetch = (
        f"SELECT _partition, _offset FROM events "
        f"WHERE _offset >= {cut + 1} LAST 365d"
    )
    assert canon(ieng.sql(fetch)) == canon(peng.sql(fetch))
    n_full = len(set(ieng.sql(full).inputFiles()))
    n_fetch = len(set(ieng.sql(fetch).inputFiles()))
    assert 0 < n_fetch < n_full  # offset bound reached the file list
    # the manifest-only estimate prices the same pruned plan
    est_full = icat.estimate_topic_scan("events")
    est_fetch = icat.estimate_topic_scan("events", offset_min=cut + 1)
    assert est_fetch.files == n_fetch
    assert est_fetch.files < est_full.files
    # upper bounds prune the other side too
    est_head = icat.estimate_topic_scan("events", offset_max=cut - 1)
    assert est_head.files < est_full.files


def test_one_metadata_load_per_query(spark, tmp_path, monkeypatch):
    """r14 verdict #4: one KAFSQL query over an Iceberg topic used to
    parse the table's metadata JSON 2-3 times (plans_key_lookup in
    validation, the budget estimate, the scan). The catalog now routes
    every read through a version-keyed memo, so a full engine.sql()
    round — including the metadata-heaviest shape, a budget-admitted
    bare key lookup — costs exactly ONE IcebergTable.load; freshness
    across queries is unchanged (a concurrent commit bumps the version
    pointer and the next query reloads exactly once)."""
    from datetime import datetime

    from platform_spark.iceberg.catalog import IcebergTopicCatalog
    import platform_spark.iceberg.catalog as cat_mod
    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    ev = cat.topic("events", with_schema_columns=False)
    root = str(tmp_path / "memo")
    os.makedirs(root, exist_ok=True)
    t = IcebergTable.create(
        os.path.join(root, "events"), ev.schema,
        partition_by=("bucket(_key, 4)",), clock=CLOCK,
    )
    append_dataframe(t, ev.filter(F.col("_partition") == 0))
    key = (
        ev.filter(F.col("_key").isNotNull())
        .select(F.col("_key").cast("string").alias("k"))
        .first()
        .k
    )

    icat = IcebergTopicCatalog(spark, root, configs=cat.configs)
    eng = KafSqlEngine(icat, now=datetime(2024, 1, 31))
    # the C8 result cache would serve the repeated count() below from
    # memory (no scan, no load) and mask what this test measures
    eng.sql("SET enable_cache = false")

    calls = []
    real_load = IcebergTable.load

    def counting_load(cls, location, *a, **kw):
        calls.append(location)
        return real_load.__func__(cls, location, *a, **kw)

    monkeypatch.setattr(
        IcebergTable, "load", classmethod(counting_load)
    )

    # budget-admitted bare key lookup: validation + estimate + scan
    n = eng.sql(
        f"SELECT _offset FROM events WHERE _key = '{key}'"
    ).count()
    assert n > 0
    assert len(calls) == 1, calls
    # second query on the unchanged table: memo hit, ZERO loads
    calls.clear()
    eng.sql("SELECT count(*) AS n FROM events LAST 30d").first()
    assert calls == []
    # EXPLAIN routes through the same memo
    eng.sql(f"EXPLAIN SELECT _offset FROM events WHERE _key = '{key}'")
    assert calls == []

    # concurrent writer: version bump -> exactly one reload, new rows
    # visible (freshness across queries unchanged by the memo)
    before = eng.sql(
        "SELECT count(*) AS n FROM events LAST 30d"
    ).first().n
    append_dataframe(t, ev.filter(F.col("_partition") == 1))
    calls.clear()
    after = eng.sql(
        "SELECT count(*) AS n FROM events LAST 30d"
    ).first().n
    assert after > before
    assert len(calls) == 1, calls
