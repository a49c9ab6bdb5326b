"""CI safety net for the GATE entries parked past the driver's 50-query
correctness window (gate.py `_TAIL_SUBSETS`).

The driver harness only hash-checks the first 50 registry entries; the
tail entries are deliberate subsets / trivially-stable surfaces, but a
compiler change could still silently diverge one of them from its oracle.
This test runs the SAME spark-vs-DuckDB comparison the driver runs —
row count, sorted columns, order-insensitive value hash — for every tail
entry at sf0.001, so `pytest tests/` (which the driver DOES run every
round) catches tail-gate regressions.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _tail_names() -> list[str]:
    from platform_spark.gate import _TAIL_SUBSETS

    return list(_TAIL_SUBSETS)


@pytest.mark.parametrize("name", _tail_names())
def test_tail_gate_matches_oracle(spark, duck, name):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_oracle import canon

    from platform_spark.gate import GATE

    fn, oracle = GATE[name]
    sdf = fn(spark, SF_DIR).toPandas()
    n_s, c_s, h_s = canon(sdf)
    assert oracle is not None, f"tail gate {name} lost its oracle"
    ddf = duck.execute(oracle).df()
    n_d, c_d, h_d = canon(ddf)
    assert (n_s, c_s, h_s) == (n_d, c_d, h_d), (
        f"{name}: spark(rows={n_s},cols={c_s},hash={h_s}) != "
        f"duck(rows={n_d},cols={c_d},hash={h_d})"
    )
