"""BENCH_DELTA's host-speed normalization (r13 verdict #1), pure-python
— no Spark. Two rounds running, cross-round >1.25x flags were dominated
by container CPU variance (r13: 49 false flags adjudicated only via
bisect + isolated traces); compute_delta normalizes each leg's ratio by
the sentinel ratio, so a uniformly slower host produces ZERO flags while
a genuine single-leg regression still fires."""

from __future__ import annotations

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_delta_under_test", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PRIOR = {"q1": [1.0, 1.1], "ecf": [8.0, 8.5], "tiny": [0.2]}
SPREAD = {"q1": 0.05, "ecf": 0.4, "tiny": 0.01}
RUNS = {"q1": 3, "ecf": 4, "tiny": 3}


def test_uniform_slow_host_produces_zero_flags():
    """The synthetic slow-host case: every leg 1.4x slower AND the
    sentinel 1.4x slower — exactly what a throttled container looks
    like. The r13 artifact would flag all three legs; the normalized
    artifact flags none."""
    b = _bench()
    now = {"q1": 1.4, "ecf": 11.2, "tiny": 0.28}
    doc = b.compute_delta(
        now, PRIOR, SPREAD, RUNS, 0.1,
        sentinel_now=0.28, sentinel_prior_best=0.20,
    )
    assert doc["flagged_over_1.25x"] == {}
    assert doc["sentinel"]["host_speed_ratio"] == 1.4
    # raw ratios stay recorded for the audit trail
    assert doc["legs"]["q1"]["ratio"] == 1.4
    assert doc["legs"]["q1"]["norm_ratio"] == 1.0


def test_genuine_regression_still_fires_on_slow_host():
    """One leg regresses 2x on the same 1.4x-slower host: its
    normalized ratio is ~1.43 and it is the ONLY flag."""
    b = _bench()
    now = {"q1": 1.4, "ecf": 22.4, "tiny": 0.28}
    doc = b.compute_delta(
        now, PRIOR, SPREAD, RUNS, 0.1,
        sentinel_now=0.28, sentinel_prior_best=0.20,
    )
    assert set(doc["flagged_over_1.25x"]) == {"ecf"}
    f = doc["flagged_over_1.25x"]["ecf"]
    assert f["ratio"] == 2.8 and f["norm_ratio"] == 2.0
    assert f["repeat_runs"] == 4 and f["repeat_spread"] == 0.4


def test_flat_legs_on_faster_host_flag_as_relative_regression():
    """Host sped up 1.25x+ but a leg did not move: relative to the
    demonstrated host speed that leg regressed — the flag is correct
    (this is exactly the shape a real code regression takes when it
    lands in the same round as a faster container)."""
    b = _bench()
    now = {"q1": 1.0, "ecf": 5.0, "tiny": 0.125}
    doc = b.compute_delta(
        now, PRIOR, SPREAD, RUNS, 0.1,
        sentinel_now=0.125, sentinel_prior_best=0.20,
    )
    assert "q1" in doc["flagged_over_1.25x"]  # flat while host got 1.6x
    assert "ecf" not in doc["flagged_over_1.25x"]  # moved with the host
    assert "tiny" not in doc["flagged_over_1.25x"]


def test_no_sentinel_history_falls_back_to_raw_ratio():
    """First invocation after the upgrade (no __sentinel__ ledger):
    flags fall back to the raw ratio — same behavior as r13."""
    b = _bench()
    now = {"q1": 1.4, "ecf": 8.2, "tiny": 0.1}
    doc = b.compute_delta(now, PRIOR, SPREAD, RUNS, 0.1)
    assert set(doc["flagged_over_1.25x"]) == {"q1", "tiny"}
    assert doc["legs"]["q1"]["norm_ratio"] == doc["legs"]["q1"]["ratio"]
    assert doc["sentinel"]["host_speed_ratio"] is None


def test_new_leg_has_no_ratio_and_no_flag():
    b = _bench()
    doc = b.compute_delta(
        {"brand_new": 3.0}, {}, {}, {}, 0.1,
        sentinel_now=0.2, sentinel_prior_best=0.2,
    )
    assert doc["n_new_legs"] == 1
    assert doc["flagged_over_1.25x"] == {}
    assert doc["legs"]["brand_new"]["ratio"] is None


def test_paired_runs_normalize_per_invocation():
    """Exact pairing (r14): with a per-invocation `__runs__` sentinel
    list, each leg history entry normalizes by the sentinel of ITS OWN
    invocation, and the prior best is the best TIME-PER-SENTINEL-UNIT
    run. Prior window: 1.0 s @ sentinel 0.10 and 2.0 s @ 0.20 — the
    same relative speed (10.0 units) on a fast and a 2x-slower host. A
    new run at 1.4 s on a 0.14-sentinel host is also 10.0 units → norm
    1.0, no flag (the raw ratio 1.4 would have false-flagged)."""
    b = _bench()
    prior = {"q1": [1.0, 2.0]}
    doc = b.compute_delta(
        {"q1": 1.4}, prior, {}, {}, 0.1,
        sentinel_now=0.14, sentinel_prior_best=0.10,
        prior_sentinels=[0.10, 0.20],
    )
    assert doc["legs"]["q1"]["norm_ratio"] == 1.0
    assert doc["flagged_over_1.25x"] == {}
    # divergence from the coarse window ratio: swap the pairing so the
    # 1.0 s entry happened on the SLOW host (1.0/0.20 = 5.0 units, the
    # engine's demonstrated best). The coarse ratio (min time / min
    # sentinel windows) cannot see that; paired pairing normalizes now
    # = 10.0 units against best 5.0 -> 2.0, flagged.
    doc2 = b.compute_delta(
        {"q1": 1.4}, prior, {}, {}, 0.1,
        sentinel_now=0.14, sentinel_prior_best=0.10,
        prior_sentinels=[0.20, 0.10],
    )
    assert doc2["legs"]["q1"]["norm_ratio"] == 2.0
    assert set(doc2["flagged_over_1.25x"]) == {"q1"}


def test_paired_runs_suffix_alignment_for_new_legs():
    """A leg added after the pairing began has a SHORTER history than
    the runs list: its L entries pair with the LAST L sentinels. And a
    leg whose history PREDATES every sentinel (no pairable entries)
    falls back to the coarse window ratio."""
    b = _bench()
    doc = b.compute_delta(
        {"new_leg": 2.0, "old_leg": 2.0},
        {"new_leg": [1.0], "old_leg": [1.0, 1.0, 1.0]},
        {}, {}, 0.1,
        sentinel_now=0.2, sentinel_prior_best=0.1,
        # runs began two invocations ago; old_leg's first entry has no
        # paired sentinel and drops out of the paired min
        prior_sentinels=[0.1, 0.1],
    )
    # new_leg: pairs its single entry with the LAST sentinel (0.1):
    # prior 1.0/0.1=10, now 2.0/0.2=10 -> 1.0, unflagged
    assert doc["legs"]["new_leg"]["norm_ratio"] == 1.0
    # old_leg: last two entries pair (1.0/0.1); same normalized best
    assert doc["legs"]["old_leg"]["norm_ratio"] == 1.0
    # no runs at all -> coarse ratio fallback
    doc2 = b.compute_delta(
        {"old_leg": 2.0}, {"old_leg": [1.0]}, {}, {}, 0.1,
        sentinel_now=0.2, sentinel_prior_best=0.1,
        prior_sentinels=[],
    )
    assert doc2["legs"]["old_leg"]["norm_ratio"] == 1.0  # 2.0 / (0.2/0.1)


def test_sentinel_is_fast_and_deterministic_shape():
    """The sentinel itself: Spark-free, sub-second per measurement,
    positive. (Determinism of the WORKLOAD is by construction — pinned
    bytes, no RNG; wall time naturally varies.)"""
    b = _bench()
    s = b.sentinel_sec()
    assert 0.01 < s < 5.0


def test_sentinel_workload_frozen():
    """r14 verdict #1: the sentinel is the arbiter of every cross-round
    perf claim, so its workload is FROZEN — pinned input bytes, pinned
    kernel output, and no import from the package under optimization
    (speeding up iceberg/bucket.py must move the legs, not the
    yardstick). Any change to _sentinel_block/_sentinel_kernel breaks
    these hashes and invalidates the .bench ledger's pairing."""
    import hashlib

    b = _bench()
    blk = b._sentinel_block()
    assert blk.shape == (4096, 24) and blk.dtype.name == "uint8"
    assert hashlib.sha256(blk.tobytes()).hexdigest() == (
        "9f627e5e510abe8878c4c9ed762e40a0a16cdb8296ca48814134dff16f9f42a2"
    )
    h = b._sentinel_kernel(blk)
    assert hashlib.sha256(h.astype("<u4").tobytes()).hexdigest() == (
        "0f395d119569f0c63bbe45527f795d89f74af176baafbb8f310441655d146222"
    )
    # decoupled from the engine: nothing in the sentinel path may
    # import platform_spark (source-level check on both functions)
    import inspect

    src = inspect.getsource(b._sentinel_kernel)
    src += inspect.getsource(b._sentinel_block)
    src += inspect.getsource(b.sentinel_sec)
    imports = [
        ln for ln in src.splitlines()
        if ln.strip().startswith(("import ", "from "))
    ]
    assert imports and not any("platform_spark" in ln for ln in imports)


def test_paired_tuple_entries_normalize_exactly():
    """r15 (ADVICE): ledger entries are [time, sentinel] pairs — the
    sentinel travels WITH the time, so a leg that skipped an invocation
    cannot mis-pair with a neighbour's sentinel. Prior: 1.0 s @ 0.10
    and 2.0 s @ 0.20 — same 10.0 time-per-sentinel-unit speed. A new
    1.4 s run on a 0.14 host is also 10.0 units -> norm 1.0, no flag."""
    b = _bench()
    prior = {"q1": [[1.0, 0.10], [2.0, 0.20]]}
    doc = b.compute_delta(
        {"q1": 1.4}, prior, {}, {}, 0.1,
        sentinel_now=0.14, sentinel_prior_best=0.10,
    )
    assert doc["legs"]["q1"]["norm_ratio"] == 1.0
    assert doc["legs"]["q1"]["prev_best"] == 1.0  # raw-time best
    assert doc["flagged_over_1.25x"] == {}


def test_skipped_invocation_cannot_mispair():
    """THE advice scenario: leg q1 ran in invocations 1 and 3 only,
    while __runs__ logged sentinels for 1,2,3. Positional suffix
    alignment would pair q1's first entry with invocation 2's wildly
    slow sentinel (0.50) and grossly understate its demonstrated speed;
    embedded pairs ignore __runs__ entirely and get it right."""
    b = _bench()
    prior = {"q1": [[1.0, 0.10], [1.0, 0.10]]}
    doc = b.compute_delta(
        {"q1": 2.0}, prior, {}, {}, 0.1,
        sentinel_now=0.10, sentinel_prior_best=0.10,
        # the runs log contains a middle invocation q1 skipped; with
        # suffix alignment q1's first 1.0 s would pair with 0.50 ->
        # paired_best 2.0 units -> norm 2.0/... masked to 1.0. Embedded
        # pairs give paired_best 10.0 -> norm 2.0: flagged, correctly.
        prior_sentinels=[0.10, 0.50, 0.10],
    )
    assert doc["legs"]["q1"]["norm_ratio"] == 2.0
    assert set(doc["flagged_over_1.25x"]) == {"q1"}


def test_mixed_legacy_and_tuple_entries():
    """Migration window: a history holding r14 bare floats followed by
    r15 pairs. Floats use positional suffix alignment against
    prior_sentinels; pairs use their embedded sentinel; both feed the
    same paired min."""
    b = _bench()
    prior = {"q1": [1.0, [2.0, 0.20]]}
    doc = b.compute_delta(
        {"q1": 1.4}, prior, {}, {}, 0.1,
        sentinel_now=0.14, sentinel_prior_best=0.10,
        # suffix alignment: hist len 2 pairs with last 2 sentinels;
        # the float 1.0 pairs with 0.10, the pair keeps its own 0.20
        # (NOT the positional 0.99 — embedded wins)
        prior_sentinels=[0.10, 0.99],
    )
    assert doc["legs"]["q1"]["norm_ratio"] == 1.0
    assert doc["flagged_over_1.25x"] == {}
