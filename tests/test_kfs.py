"""Native .kfs segment codec + Spark source/sink (platform_spark/kfs.py).

Byte-level layout is pinned against the public spec (kafscale-spec.md:84-178)
and the reference decoder's behaviors (decoder.go:157-356): magics, header
and footer sizes, big-endian fields, varint/zigzag records, batch-skip
pruning, completed-segment invariant.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from platform_spark import kfs


def _rows(n: int, ts0: int = 1_700_000_000_000) -> list[dict]:
    return [
        {
            "offset": i,
            "ts_ms": ts0 + i * 13,
            "key": None if i % 5 == 0 else f"k{i}".encode(),
            "value": None if i % 97 == 96 else f'{{"n":{i}}}'.encode(),
            "headers": [("h1", b"v1"), ("hnull", None)] if i % 3 == 0 else [],
        }
        for i in range(n)
    ]


def test_crc32c_check_vector():
    # the canonical CRC-32C check vector (RFC 3720 appendix B.4)
    assert kfs.crc32c(b"123456789") == 0xE3069283


def test_segment_layout_pinned():
    seg, idx = kfs.encode_segment(_rows(10), created_ms=42, batch_records=4)
    assert seg[:4] == b"KAFS"
    version, flags, base, count, created, _res = struct.unpack(
        ">HHqiqI", seg[4:32]
    )
    assert (version, flags, base, count, created) == (1, 0, 0, 10, 42)
    assert seg[-4:] == b"END!"
    crc, last = struct.unpack(">Iq", seg[-16:-4])
    assert last == 9
    assert crc == kfs.crc32c(seg[32:-16])
    # first batch frame: base_offset 0, magic=2 at frame offset 16
    fbase, blen = struct.unpack(">qI", seg[32:44])
    assert fbase == 0 and blen > 0
    assert seg[32 + 16] == 2  # Kafka v2 magic
    assert idx[:4] == b"IDX\x00"


def test_codec_roundtrip_exact():
    rows = _rows(2500)
    seg, _ = kfs.encode_segment(rows, batch_records=100)
    back = list(kfs.decode_segment(seg, verify_crc=True))
    assert back == [
        {k: r[k] for k in ("offset", "ts_ms", "key", "value", "headers")}
        for r in rows
    ]


def test_offset_bounds_prune_batches_and_filter_records():
    rows = _rows(1000)
    seg, _ = kfs.encode_segment(rows, batch_records=100)
    got = list(kfs.decode_segment(seg, min_offset=250, max_offset=649))
    assert [r["offset"] for r in got] == list(range(250, 650))
    # batch-granularity skip: a range inside one batch decodes only it
    got2 = list(kfs.decode_segment(seg, min_offset=110, max_offset=115))
    assert [r["offset"] for r in got2] == list(range(110, 116))


def test_ts_span_overflow_splits_batch():
    # two records 30 days apart exceed the i32 ms delta → writer must split
    rows = [
        {"offset": 0, "ts_ms": 0, "key": None, "value": b"a", "headers": []},
        {
            "offset": 1,
            "ts_ms": 30 * 24 * 3600 * 1000,
            "key": None,
            "value": b"b",
            "headers": [],
        },
    ]
    seg, _ = kfs.encode_segment(rows, batch_records=500)
    assert [r["offset"] for r in kfs.decode_segment(seg)] == [0, 1]
    # count frames: two single-record batches
    body = seg[32:-16]
    frames = 0
    pos = 0
    while pos + 12 <= len(body):
        (_, blen) = struct.unpack(">qI", body[pos : pos + 12])
        if blen <= 0:
            break
        frames += 1
        pos += 12 + blen
    assert frames == 2


def test_incomplete_segment_rejected_and_detected():
    seg, _ = kfs.encode_segment(_rows(10))
    truncated = seg[:-3]  # footer magic gone
    assert not kfs.is_completed(truncated)
    with pytest.raises(ValueError, match="incomplete"):
        list(kfs.decode_segment(truncated))


def test_crc_verification_catches_corruption():
    seg, _ = kfs.encode_segment(_rows(10))
    corrupt = bytearray(seg)
    corrupt[40] ^= 0xFF
    with pytest.raises(ValueError, match="crc"):
        list(kfs.decode_segment(bytes(corrupt), verify_crc=True))


def test_index_entries_match_interval():
    rows = _rows(2500)
    seg, idx = kfs.encode_segment(rows, batch_records=100, index_interval=500)
    entries = kfs.parse_index(idx)
    assert [off for off, _pos in entries] == [0, 500, 1000, 1500, 2000]
    # positions point at real frame starts: base_offset at each position
    for off, pos in entries:
        (fbase,) = struct.unpack(">q", seg[pos : pos + 8])
        assert fbase == off


def _envelope_df(spark, n=600):
    rows = [
        Row(
            _partition=i % 3,
            _offset=i // 3,
            _ts=f"2024-01-0{1 + i % 5} 12:00:{i % 60:02d}",
            _key=None if i % 7 == 0 else f"key-{i}",
            _value=f'{{"i":{i}}}',
            _headers='{"seq":"%d"}' % i if i % 2 == 0 else "{}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows).withColumn("_ts", F.col("_ts").cast("timestamp"))


def test_spark_write_read_roundtrip(spark, tmp_path):
    df = _envelope_df(spark)
    root = str(tmp_path / "kfs")
    manifest = kfs.write_kfs(df, root, "t", segment_rows=100).collect()
    assert sum(m.records for m in manifest) == 600
    assert all(m.path.endswith(".kfs") for m in manifest)
    back = kfs.read_kfs(spark, root, "t")
    a = {
        (r._partition, r._offset, r._key, bytes(r._value), r._headers, str(r._ts))
        for r in back.withColumn("_key", F.col("_key").cast("string")).collect()
    }
    b = {
        (
            r._partition,
            r._offset,
            r._key,
            r._value.encode(),
            r._headers,
            str(r._ts),
        )
        for r in df.collect()
    }
    assert a == b
    # segment naming: zero-padded base offset under topic/partition dirs
    seg_names = {m.path.split("/")[-1] for m in manifest}
    assert "segment-00000000000000000000.kfs" in seg_names
    assert "segment-00000000000000000100.kfs" in seg_names


def test_spark_read_offset_pruning_equals_filter(spark, tmp_path):
    df = _envelope_df(spark)
    root = str(tmp_path / "kfs")
    kfs.write_kfs(df, root, "t", segment_rows=100, batch_records=20).collect()
    pruned = kfs.read_kfs(spark, root, "t", min_offset=40, max_offset=120)
    full = kfs.read_kfs(spark, root, "t").filter(
        (F.col("_offset") >= 40) & (F.col("_offset") <= 120)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))


def test_streaming_kfs_source(spark, tmp_path):
    df = _envelope_df(spark, n=120)
    root = str(tmp_path / "kfs")
    kfs.write_kfs(df, root, "t", segment_rows=50).collect()
    stream = kfs.read_kfs(spark, root, "t", streaming=True)
    assert stream.isStreaming
    spark.sql("DROP TABLE IF EXISTS kfs_stream_sink")
    q = (
        stream.writeStream.format("memory")
        .queryName("kfs_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("kfs_stream_sink").count() == 120


def test_read_kfs_from_resumes_at_committed_offsets(spark, tmp_path):
    from platform_spark.streaming.ingest import ConsumerGroupOffsets

    df = _envelope_df(spark, n=300)  # partitions 0..2, offsets 0..99 each
    root = str(tmp_path / "kfs")
    kfs.write_kfs(df, root, "t", segment_rows=40, batch_records=10).collect()
    (tmp_path / "groups").mkdir()
    cg = ConsumerGroupOffsets(spark, str(tmp_path / "groups"))
    cg.commit("g1", "t", 0, 49)   # consumed through offset 49
    cg.commit("g1", "t", 2, 99)   # fully consumed
    nxt = {p: (cg.fetch("g1", "t", p) or -1) + 1 for p in (0, 1, 2)}
    got = kfs.read_kfs_from(spark, root, "t", nxt)
    by_part = {
        p: sorted(r._offset for r in rows)
        for p, rows in __import__("itertools").groupby(
            sorted(got.collect(), key=lambda r: r._partition),
            key=lambda r: r._partition,
        )
    }
    assert by_part.get(0) == list(range(50, 100))
    assert by_part.get(1) == list(range(0, 100))
    assert 2 not in by_part


def test_estimate_kfs_scan_prunes_from_headers_and_index(spark, tmp_path):
    df = _envelope_df(spark, n=600)  # 3 partitions × 200 offsets
    root = str(tmp_path / "kfs")
    kfs.write_kfs(
        df, root, "t", segment_rows=100, batch_records=20, index_interval=20
    ).collect()
    full = kfs.estimate_kfs_scan(root, "t")
    assert full["segments"] == 6 and full["est_records"] == 600
    assert full["est_bytes"] <= full["total_bytes"]
    # offset range inside the second segment of each partition
    est = kfs.estimate_kfs_scan(root, "t", min_offset=150, max_offset=199)
    assert est["segments"] == 3 and est["est_records"] == 150
    # the index narrows the byte window below the 3 candidate segments' span
    assert est["est_bytes"] < full["est_bytes"] / 2  # < half of all 6 segments
    # fully out-of-range prunes everything from headers alone
    none = kfs.estimate_kfs_scan(root, "t", min_offset=10_000)
    assert none["segments"] == 0 and none["est_records"] == 0
    # single-partition estimate
    one = kfs.estimate_kfs_scan(root, "t", partition=1)
    assert one["segments"] == 2 and one["est_records"] == 200


def test_kafsql_engine_runs_directly_on_kfs_segments(spark, tmp_path):
    """The migration on-ramp: every KAFSQL query shape runs against native
    segments via KfsTopicCatalog, matching the same engine over the
    parquet topic (rendered outputs are ms-precision on both sides)."""
    from datetime import datetime

    from platform_spark.sql.engine import KafSqlEngine
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001")
    root = str(tmp_path / "kfs")
    for topic in ("events", "orders", "payments"):
        kfs.write_kfs(
            cat.topic(topic, with_schema_columns=False), root, topic,
            segment_rows=500,
        ).collect()

    now = datetime(2024, 1, 31)
    keng = KafSqlEngine(
        kfs.KfsTopicCatalog(spark, root, configs=cat.configs), now=now
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
        assert canon(keng.sql(q)) == canon(peng.sql(q)), q
    # catalog surfaces: SHOW/DESCRIBE work over the kfs root
    assert {r.topic for r in keng.sql("SHOW TOPICS").collect()} == {
        "events", "orders", "payments"
    }
    assert keng.sql("DESCRIBE events").count() >= 8


def test_migrate_kfs_to_topic_preserves_offsets_and_continues(spark, tmp_path):
    from pyspark.sql import functions as F

    from platform_spark.streaming.ingest import TopicWriter

    df = _envelope_df(spark, n=300)  # 3 partitions, offsets 0..99
    kroot = str(tmp_path / "kfs")
    kfs.write_kfs(df, kroot, "t", segment_rows=40).collect()
    proot = str(tmp_path / "topics")
    hwm = kfs.migrate_kfs_to_topic(spark, kroot, "t", proot)
    assert hwm == {0: 100, 1: 100, 2: 100}
    w = TopicWriter(spark, proot, "t", n_partitions=3)
    back = w.read()
    assert back.count() == 300
    # original offsets preserved byte-for-byte
    assert back.agg(F.max("_offset")).first()[0] == 99
    # appends continue the sequence with no gaps or overlaps
    more = spark.createDataFrame(
        [(0, "2024-02-01 00:00:00", "nk", "nv", "{}")],
        "_partition int, _ts string, _key string, _value string, _headers string",
    ).withColumn("_ts", F.col("_ts").cast("timestamp"))
    new_hwm = w.append(more)
    assert new_hwm[0] == 101
    offs = sorted(
        r._offset for r in w.read().filter(F.col("_partition") == 0).collect()
    )
    assert offs == list(range(101))


def test_read_kfs_corrupt_segment_handling(spark, tmp_path):
    import glob
    import os

    df = _envelope_df(spark, n=120)  # 3 partitions × 40
    root = str(tmp_path / "kfs")
    kfs.write_kfs(df, root, "t", segment_rows=20).collect()
    # corrupt one segment's body but keep its END! footer (a truncated
    # footer would be skipped as merely-incomplete, which is T1 behavior)
    victim = sorted(glob.glob(os.path.join(root, "t", "0", "*.kfs")))[0]
    data = bytearray(open(victim, "rb").read())
    # inside the first batch's RECORD payload (past the 93-byte
    # header+frame): varint garbage -> hard decode error. Corrupting
    # header fields instead hits the reference's lenient paths
    # (truncation break / non-positive record count skip, decoder.go)
    data[100:120] = b"\xff" * 20
    open(victim, "wb").write(bytes(data))
    # default: loud failure naming the segment
    with pytest.raises(Exception):
        kfs.read_kfs(spark, root, "t").count()
    # skip_corrupt: remaining segments decode, the bad one is dropped
    got = kfs.read_kfs(spark, root, "t", skip_corrupt=True)
    assert got.count() == 100
    assert got.filter(F.col("_partition") == 0).count() == 20
