"""Semantics pins for the behavioral-analytics operators (funnel,
cohort retention) and PMI collocations — hand-checked fixtures plus a
pure-python PMI reference, so the catalog oracles aren't the only
guard on these."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from boatrace_database_spark.operators import behavior
from boatrace_database_spark.operators import text as TX


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, 1.0) for i, (ts, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.mark.slow
def test_funnel_order_matters(spark):
    rows = [
        # u1 completes all three in order
        (_ts("2024-01-01 10:00:00"), 1, "view"),
        (_ts("2024-01-01 11:00:00"), 1, "click"),
        (_ts("2024-01-01 13:00:00"), 1, "purchase"),
        # u2 clicks BEFORE the first view: click must not convert
        (_ts("2024-01-02 09:00:00"), 2, "click"),
        (_ts("2024-01-02 10:00:00"), 2, "view"),
        # u3 views only
        (_ts("2024-01-03 08:00:00"), 3, "view"),
        # u4 purchases before clicking: stops at click stage
        (_ts("2024-01-04 08:00:00"), 4, "view"),
        (_ts("2024-01-04 08:30:00"), 4, "purchase"),
        (_ts("2024-01-04 09:00:00"), 4, "click"),
    ]
    out = behavior.funnel_summary(
        _events(spark, rows), ["view", "click", "purchase"]
    ).collect()
    by_stage = {r.stage: r for r in out}
    assert by_stage[1].users == 4
    assert by_stage[2].users == 2  # u1 and u4 (u2's click precedes its view)
    assert by_stage[3].users == 1  # only u1
    assert by_stage[1].avg_hours_from_entry == 0.0
    # u1: 1h, u4: 1h -> mean 1.0; stage 3 is u1's 3h
    assert by_stage[2].avg_hours_from_entry == 1.0
    assert by_stage[3].avg_hours_from_entry == 3.0


@pytest.mark.slow
def test_funnel_same_timestamp_counts(spark):
    rows = [
        (_ts("2024-01-01 10:00:00"), 1, "view"),
        (_ts("2024-01-01 10:00:00"), 1, "click"),
    ]
    out = behavior.funnel_summary(_events(spark, rows), ["view", "click"])
    by_stage = {r.stage: r for r in out.collect()}
    assert by_stage[2].users == 1  # >= admits same-instant completion


def test_funnel_stage_frames_shrink_and_carry_times(spark):
    rows = [
        (_ts("2024-01-01 10:00:00"), 1, "view"),
        (_ts("2024-01-01 11:00:00"), 1, "view"),  # later view ignored
        (_ts("2024-01-01 12:00:00"), 1, "click"),
    ]
    frames = behavior.funnel_stage_times(
        _events(spark, rows), ["view", "click"]
    )
    r = frames[1].collect()[0]
    assert r.t_1 == _ts("2024-01-01 10:00:00")  # FIRST view carried
    assert r.t_2 == _ts("2024-01-01 12:00:00")


def test_funnel_fold_equals_chain_on_random_log(spark):
    """funnel_summary's single-pass fold must reproduce the join-chain
    semantics of funnel_stage_times exactly — seeded random log with
    heavy timestamp ties to stress the same-instant tiebreak."""
    import random

    rng = random.Random(42)
    stages = ["view", "click", "purchase"]
    types = stages + ["noise"]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            base + dt.timedelta(seconds=rng.randrange(50)),  # many ties
            rng.randrange(30),
            rng.choice(types),
        )
        for _ in range(600)
    ]
    ev = _events(spark, rows)
    got = {
        r.stage: (r.users, r.avg_hours_from_entry)
        for r in behavior.funnel_summary(ev, stages).collect()
    }
    frames = behavior.funnel_stage_times(ev, stages)
    for i, frame in enumerate(frames, start=1):
        rs = frame.collect()
        users = len(rs)
        deltas = [
            int(getattr(r, f"t_{i}").timestamp())
            - int(r.t_1.timestamp())
            for r in rs
        ]
        avg_h = (
            round(sum(deltas) / len(deltas) / 3600.0, 3) if deltas else None
        )
        assert got[i] == (users, avg_h), f"stage {i}"


def test_funnel_rejects_duplicate_stages(spark):
    import pytest as _pytest

    ev = _events(spark, [(_ts("2024-01-01 10:00:00"), 1, "view")])
    with _pytest.raises(ValueError):
        behavior.funnel_summary(ev, ["view", "view"])
    with _pytest.raises(ValueError):
        behavior.funnel_stage_times(ev, ["view", "view"])


def test_cohort_retention_hand_checked(spark):
    rows = [
        # u1 signs up Wed 2024-01-03 (cohort week Mon 2024-01-01),
        # active same week and 2 weeks later
        (_ts("2024-01-03 10:00:00"), 1, "signup"),
        (_ts("2024-01-05 10:00:00"), 1, "click"),
        (_ts("2024-01-17 10:00:00"), 1, "view"),
        # u2 same cohort week, never returns after week 0
        (_ts("2024-01-04 10:00:00"), 2, "signup"),
        # u2 has a PRE-signup event that must not count
        (_ts("2024-01-01 10:00:00"), 2, "view"),
        # u3: a later cohort (Mon 2024-01-15)
        (_ts("2024-01-16 10:00:00"), 3, "signup"),
        (_ts("2024-01-24 10:00:00"), 3, "purchase"),
    ]
    out = behavior.cohort_retention(_events(spark, rows)).collect()
    grid = {(str(r.cohort_week), r.week_offset): r for r in out}
    w1, w3 = "2024-01-01", "2024-01-15"
    # week 0 of cohort 1: both users (their signup event itself counts)
    assert grid[(w1, 0)].active_users == 2
    assert grid[(w1, 0)].retention_pct == 100.0
    # u1's 2024-01-17 event is 14 days after its 01-03 signup -> offset 2
    assert grid[(w1, 2)].active_users == 1
    assert grid[(w1, 2)].retention_pct == 50.0
    # offset is day-exact from the USER's signup day, not the cohort week:
    # u3's 01-24 event is 8 days after 01-16 -> offset 1
    assert grid[(w3, 1)].active_users == 1
    # u2's pre-signup view created no negative-offset row
    assert all(k[1] >= 0 for k in grid)
    assert (w1, 1) not in grid  # nobody active in cohort-1 week 1


def test_pmi_matches_python_reference(spark):
    docs = [
        (0, "a b a b c"),
        (1, "a b x"),
        (2, "c c a"),
        (3, "b a b a"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.w1, r.w2): (r.pair_count, r.pmi)
        for r in TX.pmi_bigrams(df, "text", min_count=1).collect()
    }

    from collections import Counter

    uni, big = Counter(), Counter()
    n_tokens = n_pairs = 0
    for _, t in docs:
        ws = t.split()
        uni.update(ws)
        n_tokens += len(ws)
        for x, y in zip(ws, ws[1:]):
            big[(x, y)] += 1
            n_pairs += 1
    for (x, y), cxy in big.items():
        pmi = round(
            math.log(
                (cxy * float(n_tokens) * n_tokens)
                / (n_pairs * float(uni[x]) * uni[y])
            ),
            4,
        )
        assert got[(x, y)] == (cxy, pmi), (x, y)
    assert set(got) == set(big)


def test_pmi_min_count_and_ordering(spark):
    df = spark.createDataFrame(
        [(0, "p q p q p q"), (1, "r s")], "doc_id long, text string"
    )
    out = TX.pmi_bigrams(df, "text", min_count=2).collect()
    # only (p,q)x3 and (q,p)x2 survive min_count=2; (r,s) and (q... ) drop
    assert [(r.w1, r.w2) for r in out] == [("p", "q"), ("q", "p")]
    # ordering is by pmi desc then lexicographic
    assert out[0].pmi >= out[1].pmi


def test_pmi_single_token_docs_ignored(spark):
    df = spark.createDataFrame(
        [(0, "solo"), (1, "a b")], "doc_id long, text string"
    )
    out = TX.pmi_bigrams(df, "text", min_count=1).collect()
    assert [(r.w1, r.w2, r.pair_count) for r in out] == [("a", "b", 1)]
    # the solo token still participates in unigram totals: N=3, so
    # pmi = ln((1*3*3)/(1*1*1)) = ln 9
    assert out[0].pmi == round(math.log(9.0), 4)


@pytest.mark.slow
def test_funnel_window_hand_checked_and_fold_chain_parity(spark):
    rows = [
        # u1 converts inside the 1h window
        (_ts("2024-01-01 10:00:00"), 1, "view"),
        (_ts("2024-01-01 10:30:00"), 1, "click"),
        # u2's click is 2h after entry: outside a 3600s window
        (_ts("2024-01-02 09:00:00"), 2, "view"),
        (_ts("2024-01-02 11:00:00"), 2, "click"),
        # u3: a late SECOND view must not re-anchor the window
        (_ts("2024-01-03 08:00:00"), 3, "view"),
        (_ts("2024-01-03 10:00:00"), 3, "view"),
        (_ts("2024-01-03 10:30:00"), 3, "click"),
    ]
    ev = _events(spark, rows)
    out = behavior.funnel_summary(
        ev, ["view", "click"], within_seconds=3600
    ).collect()
    by_stage = {r.stage: r for r in out}
    assert by_stage[1].users == 3
    assert by_stage[2].users == 1  # only u1; u3 not re-anchored
    # exact boundary: 3600s after entry still counts (<=)
    bnd = _events(
        spark,
        [
            (_ts("2024-01-04 10:00:00"), 4, "view"),
            (_ts("2024-01-04 11:00:00"), 4, "click"),
        ],
    )
    got = {
        r.stage: r.users
        for r in behavior.funnel_summary(
            bnd, ["view", "click"], within_seconds=3600
        ).collect()
    }
    assert got[2] == 1

    # fold == chain for the windowed variant, random log with ties
    import random

    rng = random.Random(7)
    stages = ["view", "click", "purchase"]
    types = stages + ["noise"]
    base = dt.datetime(2024, 1, 1)
    big = _events(
        spark,
        [
            (
                base + dt.timedelta(seconds=rng.randrange(7200)),
                rng.randrange(40),
                rng.choice(types),
            )
            for _ in range(800)
        ],
    )
    fold = {
        r.stage: r.users
        for r in behavior.funnel_summary(
            big, stages, within_seconds=600
        ).collect()
    }
    frames = behavior.funnel_stage_times(big, stages, within_seconds=600)
    chain = {i: f.count() for i, f in enumerate(frames, start=1)}
    assert fold == chain


def test_event_transitions_hand_checked(spark):
    rows = [
        (_ts("2024-01-01 10:00:00"), 1, "view"),
        (_ts("2024-01-01 11:00:00"), 1, "click"),
        (_ts("2024-01-01 12:00:00"), 1, "view"),
        (_ts("2024-01-01 13:00:00"), 1, "click"),
        (_ts("2024-01-02 10:00:00"), 2, "view"),
        (_ts("2024-01-02 11:00:00"), 2, "purchase"),
        # user boundary: u2's last event chains to nothing
    ]
    out = behavior.event_transitions(_events(spark, rows)).collect()
    got = {(r.from_type, r.to_type): (r.n, r.p) for r in out}
    # u1: view->click, click->view, view->click; u2: view->purchase
    assert got[("view", "click")] == (2, 0.6667)
    assert got[("view", "purchase")] == (1, 0.3333)
    assert got[("click", "view")] == (1, 1.0)
    assert set(got) == {
        ("view", "click"), ("view", "purchase"), ("click", "view")
    }


def test_event_transitions_same_ts_tiebreak(spark):
    # two events at the same instant order by event_id (insertion order
    # in the fixture), so the edge is deterministic
    rows = [
        (_ts("2024-01-01 10:00:00"), 1, "view"),
        (_ts("2024-01-01 10:00:00"), 1, "click"),
    ]
    out = behavior.event_transitions(_events(spark, rows)).collect()
    assert [(r.from_type, r.to_type, r.n) for r in out] == [
        ("view", "click", 1)
    ]
