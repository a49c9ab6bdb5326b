"""One-shot external-runtime Iceberg interop check.

The golden fixture (tests/fixtures/iceberg_golden) pins this writer's
metadata bytes; this tool validates them through whatever EXTERNAL
Iceberg readers are installed — run it in any environment that has
pyiceberg and/or the DuckDB iceberg extension (this container has
neither, so the pytest twins skip there):

    pip install pyiceberg duckdb   # elsewhere, not in this container
    python tools/check_interop.py

It restores the fixture at its canonical path (metadata embeds absolute
paths), then for each available reader scans both golden tables —
``tbl`` (identity partitions, widening evolution, a single-snapshot
equality-delete upsert, a branch ref), ``bkt`` (bucket[4] murmur3
hash partitioning — the pyiceberg check prunes a point lookup through
ITS murmur3 against OUR bucket values) and ``txf`` (truncate[4] + month
hidden partitioning) — and diffs the rows against the pinned expected
content. Exit 0 = every available reader matched; exit 1 = a reader
mismatched; exit 2 = no external reader available (nothing validated).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from test_iceberg_interop import (  # noqa: E402
    EXPECTED,
    EXPECTED_BKT,
    EXPECTED_TXF,
    _current_metadata,
    _restore_fixture_at_canon,
)


def _check(name: str, got: list, want: list) -> bool:
    got, want = sorted(got), sorted(want)
    if got == want:
        print(f"ok   {name}: {len(got)} rows match")
        return True
    extra = [r for r in got if r not in want][:5]
    missing = [r for r in want if r not in got][:5]
    print(f"FAIL {name}: {len(got)} rows vs expected {len(want)}")
    print(f"     extra rows (≤5): {extra}")
    print(f"     missing rows (≤5): {missing}")
    return False


def check_pyiceberg(root: str) -> bool | None:
    try:
        from pyiceberg.table import StaticTable
    except ImportError:
        print("skip pyiceberg: not installed")
        return None
    t = StaticTable.from_metadata(_current_metadata(os.path.join(root, "tbl")))
    ok = _check(
        "pyiceberg tbl",
        [(r["id"], r["part"], r["text"], r["score"])
         for r in t.scan().to_arrow().to_pylist()],
        EXPECTED,
    )
    t2 = StaticTable.from_metadata(_current_metadata(os.path.join(root, "txf")))
    ok &= _check(
        "pyiceberg txf",
        [(r["id"], r["ts"].replace(tzinfo=None), r["text"])
         for r in t2.scan().to_arrow().to_pylist()],
        EXPECTED_TXF,
    )
    t3 = StaticTable.from_metadata(_current_metadata(os.path.join(root, "bkt")))
    ok &= _check(
        "pyiceberg bkt",
        [(r["id"], r["text"]) for r in t3.scan().to_arrow().to_pylist()],
        EXPECTED_BKT,
    )
    ok &= _check(
        "pyiceberg bkt point-lookup (its murmur3 vs our buckets)",
        [(r["id"], r["text"])
         for r in t3.scan(row_filter="id = 7").to_arrow().to_pylist()],
        [(7, "k-7")],
    )
    return ok


def check_duckdb(root: str) -> bool | None:
    try:
        import duckdb
    except ImportError:
        print("skip duckdb: not installed")
        return None

    con = duckdb.connect()
    try:
        con.execute("INSTALL iceberg; LOAD iceberg;")
    except Exception as e:  # noqa: BLE001
        print(f"skip duckdb-iceberg: extension unavailable ({e})")
        return None
    meta = _current_metadata(os.path.join(root, "tbl"))
    ok = _check(
        "duckdb tbl",
        con.execute(
            f"SELECT id, part, text, score FROM iceberg_scan('{meta}')"
        ).fetchall(),
        EXPECTED,
    )
    meta2 = _current_metadata(os.path.join(root, "txf"))
    ok &= _check(
        "duckdb txf",
        con.execute(
            f"SELECT id, ts, text FROM iceberg_scan('{meta2}')"
        ).fetchall(),
        EXPECTED_TXF,
    )
    meta3 = _current_metadata(os.path.join(root, "bkt"))
    ok &= _check(
        "duckdb bkt",
        con.execute(
            f"SELECT id, text FROM iceberg_scan('{meta3}')"
        ).fetchall(),
        EXPECTED_BKT,
    )
    return ok


def main() -> int:
    root = _restore_fixture_at_canon()
    results = [check_pyiceberg(root), check_duckdb(root)]
    ran = [r for r in results if r is not None]
    if not ran:
        print("no external Iceberg reader available — nothing validated")
        return 2
    if all(ran):
        print(f"{len(ran)}/{len(ran)} external readers accept the golden bytes")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
