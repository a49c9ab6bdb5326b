"""Cross-runtime Iceberg conformance: golden metadata bytes + external
readers.

The pure-Python v2 layer (platform_spark/iceberg) round-trips its own
manifests and hash-matches DuckDB on table CONTENT, but this container
has no external Iceberg runtime (no pyiceberg, no Spark iceberg-runtime
jar, no DuckDB iceberg extension), so a spec-level byte bug — field-id
placement, bound serialization, sequence-number inheritance — would be
invisible to every content gate. This module closes that gap in two
halves:

1. A GOLDEN FIXTURE (tests/fixtures/iceberg_golden/, committed):
   a tiny deterministic table built at the fixed canonical location
   below — fixed clock, pyarrow-written data files with fixed names —
   whose metadata JSON, Avro manifests, and manifest lists are pinned
   byte-for-byte. test_golden_metadata_bytes rebuilds the table from
   the FIXTURE's parquet files (so parquet-writer drift can't leak into
   the comparison) and diffs every metadata file against the fixture:
   today's bytes can never drift silently.
2. SKIP-IF-ABSENT interop tests: the first environment that has
   pyiceberg (or the DuckDB iceberg extension) automatically validates
   that an external reader accepts those exact bytes and returns the
   expected rows; here they skip with a loud reason.

The golden build covers the spec-risk surface of the WRITER: v2
metadata JSON, identity partition spec + hive path-derived partition
values, Avro manifest/manifest-list encoding with field-ids, column
bounds (single-value serialization), widening add-column evolution, and
sequence numbering across two commits. Delete manifests reuse the same
writer machinery (content checked by the iceberg_delete_scan gate) but
are not in the golden fixture because their parquet payloads are
Spark-written (nondeterministic part-file names).

Regenerate (only after a DELIBERATE format change):
    python tests/test_iceberg_interop.py regen
"""

from __future__ import annotations

import os
import shutil

import pytest

#: metadata bytes embed absolute file paths, so golden builds always
#: happen at this canonical location
CANON = "/tmp/platform_spark_iceberg_golden"
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "iceberg_golden")
#: logical content of the golden table (id, part, text, score)
EXPECTED = [
    *[(i, i % 2, f"doc-{i}", None) for i in range(10)],
    *[(i, 1, f"doc-{i}", float(i) / 4.0) for i in range(10, 20)],
]


def build_golden(loc: str) -> None:
    """Deterministically build the golden table at ``loc``: two append
    commits over pyarrow-written files with a widening add-column
    evolution between them, identity-partitioned by ``part``. Data
    files are REUSED from the fixture when present (regeneration aside,
    the comparison must pin the metadata writer, not pyarrow)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from platform_spark.iceberg.table import IcebergTable

    shutil.rmtree(loc, ignore_errors=True)
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("part", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
    ])
    clock = lambda: 1_700_000_000.0  # noqa: E731 — deterministic metadata
    table = IcebergTable.create(loc, schema, partition_by=("part",), clock=clock)

    # batch 1: ids 0-9 split across part=0 / part=1 (identity partition
    # columns live in the PATH, not the file — spec-accurate layout)
    paths1 = []
    for part in (0, 1):
        d = os.path.join(loc, "data", f"part={part}")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"golden-b1-p{part}.parquet")
        ids = [i for i in range(10) if i % 2 == part]
        if not _copy_fixture_parquet(loc, p):
            pq.write_table(
                pa.table({
                    "id": pa.array(ids, pa.int64()),
                    "text": pa.array([f"doc-{i}" for i in ids], pa.string()),
                }),
                p,
            )
        paths1.append(p)
    table.append_files(paths1)

    # widening evolution (adds score double), then batch 2 under part=1
    table.evolve_schema(T.StructType(
        schema.fields + [T.StructField("score", T.DoubleType(), True)]
    ))
    p2 = os.path.join(loc, "data", "part=1", "golden-b2-p1.parquet")
    if not _copy_fixture_parquet(loc, p2):
        import pyarrow as pa
        import pyarrow.parquet as pq

        ids = list(range(10, 20))
        pq.write_table(
            pa.table({
                "id": pa.array(ids, pa.int64()),
                "text": pa.array([f"doc-{i}" for i in ids], pa.string()),
                "score": pa.array([i / 4.0 for i in ids], pa.float64()),
            }),
            p2,
        )
    table.append_files([p2])


def _copy_fixture_parquet(loc: str, dest: str) -> bool:
    """Copy the fixture's copy of ``dest`` (same table-relative path)
    into the build, so the metadata comparison derives from the exact
    parquet bytes the fixture pinned. False when no fixture exists yet
    (initial regeneration)."""
    rel = os.path.relpath(dest, loc)
    src = os.path.join(FIXTURE, rel)
    if not os.path.exists(src):
        return False
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
    """Rebuilding the golden table from the fixture's parquet files must
    reproduce every metadata file (JSON + Avro) byte-for-byte. A
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
    """The CURRENT metadata version per the version hint (v4: create,
    append, evolution, append)."""
    with open(os.path.join(loc, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    return os.path.join(loc, "metadata", f"v{v}.metadata.json")


def test_pyiceberg_reads_golden_table():
    """First environment with pyiceberg validates our bytes end-to-end."""
    pyiceberg_table = pytest.importorskip(
        "pyiceberg.table",
        reason="pyiceberg not installed in this container — interop "
        "validation runs automatically in the first environment that has it",
    )
    loc = _restore_fixture_at_canon()
    t = pyiceberg_table.StaticTable.from_metadata(_current_metadata(loc))
    rows = sorted(
        (r["id"], r["part"], r["text"], r["score"])
        for r in t.scan().to_arrow().to_pylist()
    )
    assert rows == sorted(EXPECTED)


def test_duckdb_iceberg_extension_reads_golden_table():
    """Same validation through DuckDB's iceberg extension (needs network
    to INSTALL here, so it skips in this container)."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("INSTALL iceberg; LOAD iceberg;")
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"duckdb iceberg extension unavailable: {e}")
    loc = _restore_fixture_at_canon()
    meta = _current_metadata(loc)
    rows = sorted(
        con.execute(
            f"SELECT id, part, text, score FROM iceberg_scan('{meta}') "
            "ORDER BY id"
        ).fetchall()
    )
    assert rows == sorted(EXPECTED)


def test_golden_table_reads_back_through_own_scanner(spark):
    """The pinned fixture is also readable by our own reader (guards the
    fixture itself against rot: a content bug in the fixture would
    otherwise only surface in the future interop environment)."""
    from platform_spark.iceberg.table import IcebergTable

    loc = _restore_fixture_at_canon()
    t = IcebergTable.load(loc)
    rows = sorted(
        (r.id, r.part, r.text, r.score) for r in t.to_spark(spark).collect()
    )
    assert rows == sorted(EXPECTED)
    # partition pruning over the fixture metadata: part=0 holds only
    # batch-1 evens
    assert len(t.scan_files(partition_filter={"part": 0})) == 1


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
