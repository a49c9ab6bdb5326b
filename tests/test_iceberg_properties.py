"""Property tests (hypothesis) for the Iceberg CDC surface: a random
sequence of table operations must (a) scan to exactly what a dict model
predicts, (b) changelog-replay to the same state, and (c) keep both
invariants across every maintenance primitive — the composition space
(upsert-after-delete-after-compact-after-manifest-rewrite ...) is where
hand-written cases run out.

Sequences are short and example counts small because every op runs real
Spark jobs; the value is the COMPOSITION coverage, not volume.
"""

from __future__ import annotations

import os

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from platform_spark.iceberg.table import (  # noqa: E402
    IcebergTable,
    append_dataframe,
    compact_table,
    merge_into,
    rewrite_deletes,
    upsert_dataframe,
)

CLOCK = lambda: 1_700_000_000.0  # noqa: E731


def _batch(spark, ids, val):
    return spark.createDataFrame(
        [(i, i % 3, f"{val}-{i}") for i in ids], "id long, part long, text string"
    )


#: op alphabet — (kind, param). Ranges kept small so runs stay fast and
#: overlaps (the interesting part) stay frequent.
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 3)),
        st.tuples(st.just("upsert"), st.integers(0, 5)),
        st.tuples(st.just("merge"), st.integers(0, 5)),
        st.tuples(st.just("delete_keys"), st.integers(0, 5)),
        st.tuples(st.just("delete_where"), st.integers(2, 4)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("rewrite_deletes"), st.just(0)),
        st.tuples(st.just("rewrite_manifests"), st.just(0)),
        st.tuples(st.just("evolve"), st.integers(0, 3)),
        st.tuples(st.just("sort_evolve"), st.integers(0, 2)),
    ),
    min_size=2,
    max_size=7,
)


_N = iter(range(10**6))  # tmp_path is per-TEST; examples need fresh dirs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_random_op_sequences_match_model_and_changelog(spark, tmp_path, ops):
    loc = os.path.join(str(tmp_path), f"t_{next(_N)}")
    df0 = _batch(spark, [0], "seed")
    t = IcebergTable.create(loc, df0.schema, partition_by=("part",), clock=CLOCK)
    model: dict[int, tuple] = {}
    #: (snapshot id, model at that instant) after every committing op —
    #: the time-travel invariant's replay points
    history: list[tuple[int, set]] = []
    fresh = 0  # next never-used id block for appends (appends = new rows)
    for n, (kind, p) in enumerate(ops):
        if kind == "append":
            ids = list(range(100 + fresh * 10, 100 + fresh * 10 + 3 + p))
            fresh += 1
            append_dataframe(t, _batch(spark, ids, f"a{n}"))
            for i in ids:
                model[i] = (i, i % 3, f"a{n}-{i}")
        elif kind == "upsert":
            ids = list(range(p, p + 4))
            upsert_dataframe(t, _batch(spark, ids, f"u{n}"), ["id"])
            for i in ids:
                model[i] = (i, i % 3, f"u{n}-{i}")
        elif kind == "merge":
            # copy-on-write twin of upsert: same model semantics,
            # different physical path (affected-file rewrite)
            ids = list(range(p, p + 3))
            merge_into(t, _batch(spark, ids, f"m{n}"), ["id"], spark=spark)
            for i in ids:
                model[i] = (i, i % 3, f"m{n}-{i}")
        elif kind == "delete_keys":
            ids = [(i,) for i in range(p, p + 3)]
            t.delete_keys(spark, spark.createDataFrame(ids, "id long"))
            for (i,) in ids:
                model.pop(i, None)
        elif kind == "delete_where":
            t.delete_where(spark, f"id % {p} = 1")
            for i in [k for k in model if k % p == 1]:
                model.pop(i)
        elif kind == "evolve":
            # partition-spec evolution is LOGICALLY invisible: the model
            # does not change, whatever mix of layouts the files land in
            t.evolve_partition_spec(
                [(), ("part",), ("truncate(id, 8)",), ("bucket(id, 4)",)][p]
            )
        elif kind == "sort_evolve":
            # sort-order evolution is LOGICALLY invisible too: only the
            # layout of future writes changes
            t.evolve_sort_order([(), ("id",), ("text desc",)][p])
        elif kind == "compact":
            if t.scan_files():
                compact_table(t, spark)
        elif kind == "rewrite_deletes":
            rewrite_deletes(t, spark)
        elif kind == "rewrite_manifests":
            t.rewrite_manifests()
        sid = t.metadata["current-snapshot-id"]
        if sid != -1 and (not history or history[-1][0] != sid):
            history.append((sid, set(model.values())))
    got = {(r.id, r.part, r.text) for r in t.to_spark(spark).collect()}
    assert got == set(model.values())
    # time travel: reading a PAST snapshot by id reproduces the model
    # exactly as it stood then — through every later upsert, delete,
    # compaction and manifest rewrite (maintenance must rewrite only
    # CURRENT metadata, never history). First/middle/last keep the
    # replay cost bounded.
    probes = {0, len(history) // 2, len(history) - 1} if history else set()
    for idx in probes:
        sid, want = history[idx]
        past = {
            (r.id, r.part, r.text)
            for r in t.to_spark(spark, snapshot_id=sid).collect()
        }
        assert past == want, f"snapshot {sid} (op {idx}) diverged"
    # changelog replay over the full window reconstructs the same state
    # (maintenance snapshots must be invisible to it)
    state: dict[int, tuple] = {}
    by_ord: dict[int, list] = {}
    for r in t.changelog(spark).collect():
        by_ord.setdefault(r._change_ordinal, []).append(r)
    for o in sorted(by_ord):
        for r in by_ord[o]:
            if r._change_type == "delete":
                state.pop(r.id, None)
        for r in by_ord[o]:
            if r._change_type == "insert":
                state[r.id] = (r.id, r.part, r.text)
    assert set(state.values()) == got
