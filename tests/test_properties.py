"""Property tests (hypothesis) for the dialect front-end."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from platform_spark.functions.durations import parse_duration, parse_ts_literal
from platform_spark.sql import parser


@given(
    st.integers(0, 10_000),
    st.sampled_from(["ms", "s", "m", "h", "d"]),
)
def test_duration_single_unit(n, unit):
    mult = {"ms": 1e-3, "s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
    assert parse_duration(f"{n}{unit}") == pytest.approx(n * mult)


@given(st.integers(0, 3650), st.integers(0, 23), st.integers(0, 59))
def test_duration_compound(d, h, m):
    assert parse_duration(f"{d}d{h}h{m}m") == d * 86400 + h * 3600 + m * 60


@given(st.text(max_size=12))
def test_duration_never_crashes_weirdly(s):
    try:
        out = parse_duration(s)
        assert out >= 0
    except ValueError:
        pass


@given(
    st.datetimes(
        min_value=datetime(1990, 1, 1),
        max_value=datetime(2100, 1, 1),
    )
)
def test_ts_literal_epoch_roundtrip(dt):
    ms = int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)
    if ms < 10**11:  # epoch-ms literals need >= 12 digits
        return
    back = parse_ts_literal(str(ms))
    assert abs((back - dt.replace(tzinfo=None)).total_seconds()) < 0.001


@given(
    st.datetimes(min_value=datetime(1990, 1, 1), max_value=datetime(2100, 1, 1))
)
def test_ts_literal_sql_roundtrip(dt):
    dt = dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    text = dt.strftime("%Y-%m-%d %H:%M:%S.") + f"{dt.microsecond // 1000:03d}"
    assert parse_ts_literal(text) == dt


@settings(max_examples=200)
@given(
    st.integers(0, 3),
    st.integers(0, 10**6),
    st.integers(0, 10**6),
    st.sampled_from(["5m", "1h", "3d", "90s"]),
    st.integers(1, 100000),
)
def test_parser_roundtrips_filters(partition, off_lo, off_hi, last, limit):
    q = parser.parse(
        f"SELECT _offset FROM events WHERE _partition = {partition} "
        f"AND _offset >= {off_lo} AND _offset <= {off_hi} LAST {last} LIMIT {limit}"
    )
    assert q.partition == partition
    assert q.offset_min == off_lo and q.offset_max == off_hi
    assert q.limit == limit
    assert q.last_seconds == parse_duration(last)


# -- pure-Python twins of the distributed operators, for property checks ----


def _sessions_python(times: list[int], gap: int) -> list[tuple[int, int, int]]:
    """(start, end, n) per session — the spec sessionize must match."""
    out = []
    for t in sorted(times):
        if out and t - out[-1][1] <= gap:
            s, _e, n = out[-1]
            out[-1] = (s, t, n + 1)
        else:
            out.append((t, t, 1))
    return out


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 10**6), min_size=1, max_size=40),
    st.integers(1, 10**5),
)
def test_sessionize_matches_python_spec(times, gap):
    # pandas twin of the Spark expression chain (identical window logic:
    # lag → gap flag → running sum → group) — property-checks the operator
    # formula itself without a Spark session per example
    import pandas as pd

    df = pd.DataFrame({"t": sorted(times)})
    prev = df["t"].shift(1)
    brk = (prev.isna() | ((df["t"] - prev) > gap)).astype(int)
    sess = brk.cumsum()
    got = [
        (int(g["t"].min()), int(g["t"].max()), len(g))
        for _, g in df.groupby(sess)
    ]
    assert got == _sessions_python(times, gap)


def _components_python(pairs: list[tuple[int, int]]) -> dict[int, int]:
    lab: dict[int, int] = {}

    def find(x: int) -> int:
        while lab.setdefault(x, x) != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lab[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in lab}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_dedup_clusters_matches_union_find(spark, pairs):
    from platform_spark.llmdata.clusters import dedup_clusters

    norm = [(min(a, b), max(a, b)) for a, b in pairs]
    df = spark.createDataFrame(norm, "doc_a: long, doc_b: long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(df).collect()}
    want = _components_python(norm)
    assert got == want


def _dedup_lines_python(docs: list[tuple[int, str]], min_count: int):
    from collections import Counter

    counts = Counter(
        line for _, text in docs for line in text.split("\n")
    )
    out = {}
    for doc_id, text in docs:
        lines = text.split("\n")
        kept = [l for l in lines if counts[l] < min_count]
        out[doc_id] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa bb", "cc dd", "shared one", "x", ""]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(2, 4),
)
def test_dedup_lines_matches_python_spec(spark, doclines, min_count):
    from platform_spark.llmdata.cleaning import dedup_lines

    docs = [(i, "\n".join(ls)) for i, ls in enumerate(doclines)]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in dedup_lines(df, min_count=min_count).collect()
    }
    assert got == _dedup_lines_python(docs, min_count)
    # idempotence: a second pass over the non-emptied survivors removes
    # nothing — every surviving line occurs < min_count times corpus-wide.
    # (Docs reduced to ZERO lines are excluded: their '' placeholder would
    # re-enter as a brand-new empty line; a real pipeline drops them.)
    survivors = [(i, t) for i, (t, k, _r) in got.items() if k > 0]
    if survivors:
        df2 = spark.createDataFrame(survivors, "doc_id: long, text: string")
        again = dedup_lines(df2, min_count=min_count).collect()
        assert all(r["n_lines_removed"] == 0 for r in again)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.sampled_from(["tok%d" % i for i in range(4)]), min_size=0, max_size=12
    )
)
def test_repetition_metrics_bounds_and_distinct_zero(spark, words):
    from platform_spark.llmdata.cleaning import repetition_metrics

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    row = repetition_metrics(df, ns=(2,)).first()
    top, dup = row["top_2gram_char_frac"], row["dup_2gram_char_frac"]
    assert 0.0 <= top <= 1.0 and 0.0 <= dup <= 1.0
    assert dup == 0.0 or dup >= top - 1e-9  # dup covers the top gram too
    # all 2-grams distinct -> no duplicate coverage at all
    bigrams = [tuple(words[i : i + 2]) for i in range(len(words) - 1)]
    if len(bigrams) == len(set(bigrams)):
        assert dup == 0.0


# -- native .kfs codec (platform_spark/kfs.py) ------------------------------

_rec = st.fixed_dictionaries(
    {
        "key": st.one_of(st.none(), st.binary(max_size=24)),
        "value": st.one_of(st.none(), st.binary(max_size=64)),
        "headers": st.lists(
            st.tuples(
                st.text(
                    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
                    max_size=8,
                ),
                st.one_of(st.none(), st.binary(max_size=16)),
            ),
            max_size=3,
        ),
        # spans beyond i32 ms force the writer's batch-split path
        "ts_jump": st.integers(0, (1 << 31) + 10_000),
    }
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_rec, min_size=1, max_size=40), st.integers(0, 1 << 40))
def test_kfs_codec_roundtrips_arbitrary_records(recs, base_offset):
    from platform_spark import kfs

    ts = 1_500_000_000_000
    rows = []
    for i, r in enumerate(recs):
        ts += r["ts_jump"]
        rows.append(
            {
                "offset": base_offset + i,
                "ts_ms": ts,
                "key": r["key"],
                "value": r["value"],
                "headers": r["headers"],
            }
        )
    seg, idx = kfs.encode_segment(rows, batch_records=7, index_interval=10)
    back = list(kfs.decode_segment(seg, verify_crc=True))
    assert back == [
        {k: r[k] for k in ("offset", "ts_ms", "key", "value", "headers")}
        for r in rows
    ]
    # header/footer invariants
    assert kfs.is_completed(seg)
    entries = kfs.parse_index(idx)
    assert entries and entries[0][0] == base_offset
    # any offset sub-range decodes to exactly the range filter
    lo = base_offset + len(rows) // 3
    hi = base_offset + (2 * len(rows)) // 3
    got = [r["offset"] for r in kfs.decode_segment(seg, lo, hi)]
    assert got == [r["offset"] for r in rows if lo <= r["offset"] <= hi]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["low", "lower", "lowest", "new", "newest", "wide", "widest", "news"]
        ),
        min_size=4,
        max_size=30,
    )
)
def test_train_bpe_property_matches_reference(spark, words):
    from tests.test_llmdata import _ref_bpe_train
    from collections import Counter

    from platform_spark.llmdata.bpe import train_bpe

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    expected = _ref_bpe_train(dict(Counter(words)), 5)
    assert train_bpe(df, n_merges=5) == expected


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["aa", "bb", "cc", None])),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_snapshot_diff_identity_and_classes(spark, rows):
    """diff(x, x) is empty for ANY snapshot (including NULL texts), and
    every report row is one of the three change classes."""
    from platform_spark.llmdata.snapshots import snapshot_diff

    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    assert snapshot_diff(df, df).count() == 0
    other = df.filter("doc_id % 2 = 0")
    got = snapshot_diff(df, other).collect()
    assert all(r["change"] in ("added", "removed", "changed") for r in got)
    # dropping rows can only ever produce 'removed'
    assert {r["change"] for r in got} <= {"removed"}
