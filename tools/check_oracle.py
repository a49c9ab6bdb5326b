"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables registered as views),
then compares row count, sorted column names, and an order-insensitive
value hash. Use while iterating:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # tolerate float jitter across engines
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append("\x1f".join(_canon_cell(v) for v in tup))
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    ap.add_argument(
        "--bare",
        action="store_true",
        help="use a bare SparkSession (no engine confs) — replicates the "
        "driver exactly; the engine must self-configure the session",
    )
    ap.add_argument(
        "--json-out",
        help="also write a CORRECTNESS-style JSON record (per-gate "
        "rows/schema/hash match verdicts) — the round-end local snapshot "
        "that keeps round-over-round comparisons alive when the driver's "
        "own artifacts go missing",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry

    if args.bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-bare")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from platform_spark.session import get_spark

        spark = get_spark("oracle-check")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    record: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}")
            failed.append(name)
            record[name] = {"error": "unknown query"}
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            record[name] = {"error": f"spark: {e}"[:300]}
            continue
        n_s, c_s, h_s = canon(sdf)
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={n_s} (rows-only check)")
            record[name] = {"rows": n_s, "rows_only": True}
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            record[name] = {"error": f"duckdb: {e}"[:300]}
            continue
        n_d, c_d, h_d = canon(ddf)
        ok = (n_s, c_s, h_s) == (n_d, c_d, h_d)
        record[name] = {
            "rows_match": n_s == n_d,
            "schema_match": c_s == c_d,
            "hash_match": h_s == h_d,
            "spark_rows": n_s,
            "duck_rows": n_d,
            "spark_hash": h_s,
            "duck_hash": h_d,
            "sec": round(time.time() - t0, 2),
        }
        status = "ok  " if ok else "FAIL"
        print(
            f"{status} {name}: spark(rows={n_s},hash={h_s}) duck(rows={n_d},hash={h_d}) "
            f"[{time.time() - t0:.1f}s]"
        )
        if not ok:
            failed.append(name)
            if c_s != c_d:
                print(f"     cols spark={c_s} duck={c_d}")
            if args.show_diff:
                print("--- spark ---")
                print(sdf.head(8).to_string())
                print("--- duck ---")
                print(ddf.head(8).to_string())
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump(
                {
                    "sf": args.sf,
                    "n_gates": len(names),
                    "n_failed": len(failed),
                    "failed": sorted(failed),
                    "gates": record,
                },
                f,
                indent=1,
            )
        print(f"wrote {args.json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
