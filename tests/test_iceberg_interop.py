"""Cross-runtime Iceberg conformance: golden metadata bytes + external
readers.

The pure-Python v2 layer (platform_spark/iceberg) round-trips its own
manifests and hash-matches DuckDB on table CONTENT, but this container
has no external Iceberg runtime (no pyiceberg, no Spark iceberg-runtime
jar, no DuckDB iceberg extension), so a spec-level byte bug — field-id
placement, bound serialization, sequence-number inheritance — would be
invisible to every content gate. This module closes that gap in two
halves:

1. A GOLDEN FIXTURE (tests/fixtures/iceberg_golden/, committed): two
   tiny deterministic tables built at the fixed canonical root below —
   fixed clock, pyarrow-written data files with fixed names — whose
   metadata JSON, Avro manifests, and manifest lists are pinned
   byte-for-byte. test_golden_metadata_bytes rebuilds both tables from
   the FIXTURE's parquet files (so parquet-writer drift can't leak into
   the comparison) and diffs every metadata file against the fixture:
   today's bytes can never drift silently.
2. SKIP-IF-ABSENT interop tests: the first environment that has
   pyiceberg (or the DuckDB iceberg extension) automatically validates
   that an external reader accepts those exact bytes and returns the
   expected rows; here they skip with a loud reason. A standalone
   one-shot wrapper lives at tools/check_interop.py.

The golden build covers the spec-risk surface of the WRITER:

``tbl``: v2 metadata JSON, identity partition spec + hive path-derived
partition values, Avro manifest/manifest-list encoding with field-ids,
column bounds (single-value serialization), widening add-column
evolution, sequence numbering across commits, a SINGLE-SNAPSHOT CDC
UPSERT (data manifest + equality-delete manifest at one sequence
number — the atomic upsert commit shape), and a branch ref in the
metadata JSON ``refs`` map with a branch-only (unpublished) snapshot.

``txf``: a truncate[4](text) + month(ts) hidden-partition spec — the
non-identity transform encodings (partition field names, int
months-since-epoch values, string-prefix values) in manifests and
partition summaries.

``bkt``: a bucket[4](id) spec — the murmur3-hashed bucket ids in paths,
manifests and partition summaries. The interop half is the strongest
check the transform can get: a pyiceberg ``row_filter="id = N"`` scan
prunes through ITS OWN murmur3 against OUR recorded bucket values, so
any hash disagreement loses rows loudly.

Delete parquet payloads here are pyarrow-written with fixed names
(golden-del-b3), so the eq-delete bytes are pinned too — unlike the
Spark-written delete files the gates commit. NOTE for external readers:
``tbl``'s expected rows assume the reader applies EQUALITY deletes
(spec v2 merge-on-read); a reader lacking eq-delete support would show
the two superseded rows (ids 2, 4) twice.

Regenerate (only after a DELIBERATE format change):
    python tests/test_iceberg_interop.py regen
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest

#: metadata bytes embed absolute file paths, so golden builds always
#: happen at this canonical location (a ROOT holding tables tbl/ txf/)
CANON = "/tmp/platform_spark_iceberg_golden"
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "iceberg_golden")
#: logical content of golden table `tbl` (id, part, text, score) AFTER
#: the upsert snapshot replaced ids 2 and 4
EXPECTED = [
    *[(i, i % 2, f"doc-{i}", None) for i in range(10) if i not in (2, 4)],
    (2, 0, "doc-2-v2", 2.5),
    (4, 0, "doc-4-v2", 4.5),
    *[(i, 1, f"doc-{i}", float(i) / 4.0) for i in range(10, 20)],
]
#: rows staged only on the `audit` branch of `tbl` (absent from main)
BRANCH_ONLY = [(i, 1, f"staged-{i}", None) for i in (90, 91, 92)]
#: logical content of golden table `txf` (id, ts, text)
EXPECTED_TXF = [
    *[(i, dt.datetime(2024, 1, 10 + i), f"doc-{i}") for i in range(5)],
    *[(i, dt.datetime(2024, 2, i - 3), f"ref-{i}") for i in range(5, 10)],
]
#: logical content of golden table `bkt` (id, text)
EXPECTED_BKT = [(i, f"k-{i}") for i in range(12)]


def _write_parquet(path: str, cols: dict) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table(cols), path)


def build_golden(root: str) -> None:
    """Deterministically build both golden tables under ``root``. Data
    and delete files are REUSED from the fixture when present
    (regeneration aside, the comparison must pin the metadata writer,
    not pyarrow)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    from platform_spark.iceberg.table import IcebergTable

    shutil.rmtree(root, ignore_errors=True)
    clock = lambda: 1_700_000_000.0  # noqa: E731 — deterministic metadata

    # -- table `tbl`: appends + evolution + upsert + branch ------------------
    loc = os.path.join(root, "tbl")
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("part", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
    ])
    table = IcebergTable.create(loc, schema, partition_by=("part",), clock=clock)

    # batch 1: ids 0-9 split across part=0 / part=1 (identity partition
    # columns live in the PATH, not the file — spec-accurate layout)
    paths1 = []
    for part in (0, 1):
        p = os.path.join(loc, "data", f"part={part}", f"golden-b1-p{part}.parquet")
        ids = [i for i in range(10) if i % 2 == part]
        if not _copy_fixture_parquet(root, p):
            _write_parquet(p, {
                "id": pa.array(ids, pa.int64()),
                "text": pa.array([f"doc-{i}" for i in ids], pa.string()),
            })
        paths1.append(p)
    table.append_files(paths1)

    # widening evolution (adds score double), then batch 2 under part=1
    table.evolve_schema(T.StructType(
        schema.fields + [T.StructField("score", T.DoubleType(), True)]
    ))
    p2 = os.path.join(loc, "data", "part=1", "golden-b2-p1.parquet")
    if not _copy_fixture_parquet(root, p2):
        ids = list(range(10, 20))
        _write_parquet(p2, {
            "id": pa.array(ids, pa.int64()),
            "text": pa.array([f"doc-{i}" for i in ids], pa.string()),
            "score": pa.array([i / 4.0 for i in ids], pa.float64()),
        })
    table.append_files([p2])

    # single-snapshot CDC upsert: new versions of ids 2 and 4 plus an
    # equality delete on id, BOTH at one sequence number (the spec's
    # strict data_seq < delete_seq rule keeps the batch's own rows alive
    # while killing the batch-1 copies)
    p3 = os.path.join(loc, "data", "part=0", "golden-b3-p0.parquet")
    if not _copy_fixture_parquet(root, p3):
        _write_parquet(p3, {
            "id": pa.array([2, 4], pa.int64()),
            "text": pa.array(["doc-2-v2", "doc-4-v2"], pa.string()),
            "score": pa.array([2.5, 4.5], pa.float64()),
        })
    d3 = os.path.join(loc, "deletes", "golden-del-b3.parquet")
    if not _copy_fixture_parquet(root, d3):
        _write_parquet(d3, {"id": pa.array([2, 4], pa.int64())})
    stats = table._file_stats([p3, d3])
    table._upsert_once([p3], [d3], stats, [1])  # field-id 1 = id

    # write-audit-publish: a branch ref in the metadata JSON refs map,
    # with one branch-only (unpublished) snapshot on it
    table.create_branch("audit")
    p4 = os.path.join(loc, "data", "part=1", "golden-b4-branch.parquet")
    if not _copy_fixture_parquet(root, p4):
        ids = [90, 91, 92]
        _write_parquet(p4, {
            "id": pa.array(ids, pa.int64()),
            "text": pa.array([f"staged-{i}" for i in ids], pa.string()),
        })
    table.append_files([p4], branch="audit")

    # -- table `txf`: truncate[4](text) + month(ts) hidden partitioning ------
    loc2 = os.path.join(root, "txf")
    schema2 = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
    ])
    t2 = IcebergTable.create(
        loc2, schema2,
        partition_by=("truncate(text, 4)", "months(ts)"),
        clock=clock,
    )
    # 2024-01 → 648 months since epoch, 2024-02 → 649; text prefixes
    # doc-/ref- are the truncate[4] partition values
    tpaths = []
    for trunc, month, rows in (
        ("doc-", 648, [(i, dt.datetime(2024, 1, 10 + i, tzinfo=dt.timezone.utc),
                        f"doc-{i}") for i in range(5)]),
        ("ref-", 649, [(i, dt.datetime(2024, 2, i - 3, tzinfo=dt.timezone.utc),
                        f"ref-{i}") for i in range(5, 10)]),
    ):
        p = os.path.join(
            loc2, "data", f"text_trunc={trunc}", f"ts_month={month}",
            f"golden-t-{month}.parquet",
        )
        if not _copy_fixture_parquet(root, p):
            _write_parquet(p, {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
                "text": pa.array([r[2] for r in rows], pa.string()),
            })
        tpaths.append(p)
    t2.append_files(tpaths)

    # -- table `bkt`: bucket[4](id) hash partitioning ------------------------
    from platform_spark.iceberg.bucket import bucket_value

    loc3 = os.path.join(root, "bkt")
    schema3 = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    t3 = IcebergTable.create(loc3, schema3, partition_by=("bucket(id, 4)",), clock=clock)
    by_bucket: dict[int, list[int]] = {}
    for i in range(12):
        by_bucket.setdefault(bucket_value(i, "long", 4), []).append(i)
    kpaths = []
    for b in sorted(by_bucket):
        p = os.path.join(loc3, "data", f"id_bucket={b}", f"golden-k-{b}.parquet")
        if not _copy_fixture_parquet(root, p):
            ids = by_bucket[b]
            _write_parquet(p, {
                "id": pa.array(ids, pa.int64()),
                "text": pa.array([f"k-{i}" for i in ids], pa.string()),
            })
        kpaths.append(p)
    t3.append_files(kpaths)


def _copy_fixture_parquet(root: str, dest: str) -> bool:
    """Copy the fixture's copy of ``dest`` (same root-relative path)
    into the build, so the metadata comparison derives from the exact
    parquet bytes the fixture pinned. False when no fixture exists yet
    (initial regeneration)."""
    rel = os.path.relpath(dest, root)
    src = os.path.join(FIXTURE, rel)
    if not os.path.exists(src):
        return False
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copyfile(src, dest)
    return True


def _tree(root: str) -> dict[str, bytes]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = open(p, "rb").read()
    return out


def test_golden_metadata_bytes():
    """Rebuilding both golden tables from the fixture's parquet files
    must reproduce every metadata file (JSON + Avro) byte-for-byte. A
    mismatch means the on-disk FORMAT changed — regenerate only for a
    deliberate format change, never to silence this test."""
    assert os.path.isdir(FIXTURE), (
        "golden fixture missing; run: python tests/test_iceberg_interop.py regen"
    )
    build_golden(CANON)
    got = _tree(CANON)
    want = _tree(FIXTURE)
    assert sorted(got) == sorted(want)
    for rel in sorted(want):
        assert got[rel] == want[rel], f"byte drift in {rel}"


def _restore_fixture_at_canon() -> str:
    shutil.rmtree(CANON, ignore_errors=True)
    shutil.copytree(FIXTURE, CANON)
    return CANON


def _current_metadata(loc: str) -> str:
    """The table's CURRENT metadata version per the version hint."""
    with open(os.path.join(loc, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    return os.path.join(loc, "metadata", f"v{v}.metadata.json")


def test_pyiceberg_reads_golden_tables():
    """First environment with pyiceberg validates our bytes end-to-end —
    incl. the eq-delete upsert (merge-on-read) and the transform spec."""
    pyiceberg_table = pytest.importorskip(
        "pyiceberg.table",
        reason="pyiceberg not installed in this container — interop "
        "validation runs automatically in the first environment that has it",
    )
    root = _restore_fixture_at_canon()
    t = pyiceberg_table.StaticTable.from_metadata(
        _current_metadata(os.path.join(root, "tbl"))
    )
    rows = sorted(
        (r["id"], r["part"], r["text"], r["score"])
        for r in t.scan().to_arrow().to_pylist()
    )
    assert rows == sorted(EXPECTED)
    t2 = pyiceberg_table.StaticTable.from_metadata(
        _current_metadata(os.path.join(root, "txf"))
    )
    rows2 = sorted(
        (r["id"], r["ts"].replace(tzinfo=None), r["text"])
        for r in t2.scan().to_arrow().to_pylist()
    )
    assert rows2 == sorted(EXPECTED_TXF)
    # bucket spec: pyiceberg prunes a point lookup through ITS murmur3
    # against OUR recorded bucket values — a hash disagreement between
    # the two implementations would lose the row here
    t3 = pyiceberg_table.StaticTable.from_metadata(
        _current_metadata(os.path.join(root, "bkt"))
    )
    rows3 = sorted(
        (r["id"], r["text"]) for r in t3.scan().to_arrow().to_pylist()
    )
    assert rows3 == sorted(EXPECTED_BKT)
    for probe in (0, 7, 11):
        hit = t3.scan(row_filter=f"id = {probe}").to_arrow().to_pylist()
        assert [(r["id"], r["text"]) for r in hit] == [(probe, f"k-{probe}")]


def test_duckdb_iceberg_extension_reads_golden_tables():
    """Same validation through DuckDB's iceberg extension (needs network
    to INSTALL here, so it skips in this container)."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("INSTALL iceberg; LOAD iceberg;")
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"duckdb iceberg extension unavailable: {e}")
    root = _restore_fixture_at_canon()
    meta = _current_metadata(os.path.join(root, "tbl"))
    rows = sorted(
        con.execute(
            f"SELECT id, part, text, score FROM iceberg_scan('{meta}') "
            "ORDER BY id"
        ).fetchall()
    )
    assert rows == sorted(EXPECTED)
    meta2 = _current_metadata(os.path.join(root, "txf"))
    rows2 = sorted(
        con.execute(
            f"SELECT id, ts, text FROM iceberg_scan('{meta2}') ORDER BY id"
        ).fetchall()
    )
    assert rows2 == sorted(EXPECTED_TXF)
    meta3 = _current_metadata(os.path.join(root, "bkt"))
    rows3 = sorted(
        con.execute(
            f"SELECT id, text FROM iceberg_scan('{meta3}') ORDER BY id"
        ).fetchall()
    )
    assert rows3 == sorted(EXPECTED_BKT)


def test_golden_tables_read_back_through_own_scanner(spark):
    """The pinned fixture is also readable by our own reader (guards the
    fixture itself against rot: a content bug in the fixture would
    otherwise only surface in the future interop environment)."""
    from platform_spark.iceberg.table import IcebergTable

    root = _restore_fixture_at_canon()
    t = IcebergTable.load(os.path.join(root, "tbl"))
    rows = sorted(
        (r.id, r.part, r.text, r.score) for r in t.to_spark(spark).collect()
    )
    assert rows == sorted(EXPECTED)
    # the branch ref survives in metadata and scans to staged + main rows
    branch = sorted(
        (r.id, r.part, r.text, r.score)
        for r in t.to_spark(spark, ref="audit").collect()
    )
    assert branch == sorted(EXPECTED + BRANCH_ONLY)
    # partition pruning over the fixture metadata: part=0 holds batch 1
    # evens + the upsert file
    assert len(t.scan_files(partition_filter={"part": 0})) == 2
    # the upsert snapshot carries exactly one live equality delete
    dels = t.scan_deletes()
    assert [e["data_file"]["content"] for e in dels] == [2]
    assert dels[0]["data_file"]["equality_ids"] == [1]

    t2 = IcebergTable.load(os.path.join(root, "txf"))
    rows2 = sorted(
        (r.id, r.ts.replace(tzinfo=None), r.text)
        for r in t2.to_spark(spark).collect()
    )
    assert rows2 == sorted(EXPECTED_TXF)
    # hidden-partition pruning straight off the fixture's manifests
    assert len(t2.scan_files(partition_filter={"ts_month": 649})) == 1
    assert len(t2.scan_files(partition_filter={"text_trunc": "doc-"})) == 1

    t3 = IcebergTable.load(os.path.join(root, "bkt"))
    rows3 = sorted((r.id, r.text) for r in t3.to_spark(spark).collect())
    assert rows3 == sorted(EXPECTED_BKT)
    # point lookup plans exactly one bucket's file off the fixture
    b7 = t3.bucket_value("id", 7)
    planned = t3.scan_files(partition_filter={"id_bucket": b7})
    assert len(planned) == 1
    got = t3.to_spark(spark, partition_filter={"id_bucket": b7}).filter(
        "id = 7"
    )
    assert [(r.id, r.text) for r in got.collect()] == [(7, "k-7")]


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        build_golden(CANON)
        shutil.rmtree(FIXTURE, ignore_errors=True)
        shutil.copytree(CANON, FIXTURE)
        n = len(_tree(FIXTURE))
        print(f"golden fixture regenerated at {FIXTURE} ({n} files)")
    else:
        print(__doc__)
