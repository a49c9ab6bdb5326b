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
