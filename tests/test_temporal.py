"""As-of join and bounded range join: hand-pinned semantics + random-data
brute-force equivalence (the bucketed/window implementations must match the
obvious O(n^2) definition exactly)."""

import datetime as dt
import random

from pyspark.sql import functions as F

from jamie_spark import temporal


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "a"), (1, _t(10), "b"), (1, _t(2), "c"), (2, _t(7), "d")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t(5), 50.0), (1, _t(8), 80.0), (2, _t(9), 90.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        (r["user_id"], r["ts"].second): r["value_right"]
        for r in temporal.asof_join(left, right).collect()
    }
    assert got == {
        (1, 5): 50.0,   # equality matches (inclusive)
        (1, 10): 80.0,  # latest preceding
        (1, 2): None,   # before any right row
        (2, 7): None,   # right row for user 2 is later
    }


def test_asof_join_null_payload_is_attached_not_skipped(spark):
    """The asof match attaches exactly ONE right row — a legitimately NULL
    value in the matched row must come through as NULL, and multiple value
    columns must all come from that same row. Regression: per-column
    last(ignorenulls) skipped NULLs (stale older value) and could stitch
    columns from different right rows."""
    left = spark.createDataFrame(
        [(1, _t(3))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t(1), 1.0, None), (1, _t(2), None, 2.0)],
        "user_id long, ts timestamp, a double, b double",
    )
    rows = temporal.asof_join(
        left, right, value_cols=["a", "b"]
    ).collect()
    assert len(rows) == 1
    # the ts=2 row is the asof match: a is NULL there, b is 2.0
    assert rows[0]["a_right"] is None
    assert rows[0]["b_right"] == 2.0


def test_asof_join_keeps_left_payload(spark):
    left = spark.createDataFrame(
        [(1, _t(9), "x")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _t(3), 7.0)], "user_id long, ts timestamp, value double"
    )
    row = temporal.asof_join(left, right).first()
    assert (row["tag"], row["value_right"]) == ("x", 7.0)


def test_asof_join_matches_bruteforce_random(spark):
    rng = random.Random(9)
    left = [
        (rng.randrange(5), _t(rng.randrange(60)), float(i))
        for i in range(200)
    ]
    right_raw = {
        (rng.randrange(5), rng.randrange(60)): float(1000 + i)
        for i in range(120)
    }
    right = [(u, _t(s), v) for (u, s), v in right_raw.items()]
    ldf = spark.createDataFrame(left, "user_id long, ts timestamp, lval double")
    rdf = spark.createDataFrame(right, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["ts"], r["lval"]): r["value_right"]
        for r in temporal.asof_join(ldf, rdf).collect()
    }
    assert len(got) == len(set((u, t, v) for u, t, v in left))
    for u, t, lv in set(left):
        cands = [(rt, rv) for ru, rt, rv in right if ru == u and rt <= t]
        exp = max(cands)[1] if cands else None
        assert got[(u, t, lv)] == exp, (u, t)


def test_range_count_boundaries(spark):
    ev = spark.createDataFrame(
        [
            (1, _t(0)), (1, _t(10)), (1, _t(10)),  # dup ts collapses
            (1, _t(11)), (2, _t(5)),
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (r["user_id"], r["ts"].second): r["n_next"]
        for r in temporal.range_count(ev, horizon_sec=10).collect()
    }
    # from t=0: t=10 is inside (0,10], t=11 is out; from t=10: t=11 inside
    assert got == {(1, 0): 1, (1, 10): 1, (1, 11): 0, (2, 5): 0}


def test_range_count_matches_bruteforce_random(spark):
    rng = random.Random(4)
    rows = list({(rng.randrange(4), rng.randrange(300)) for _ in range(250)})
    ev = spark.createDataFrame(
        [(u, _t(0) + dt.timedelta(seconds=s)) for u, s in rows],
        "user_id long, ts timestamp",
    )
    horizon = 37  # deliberately not dividing the bucket grid nicely
    got = {
        (r["user_id"], r["ts"]): r["n_next"]
        for r in temporal.range_count(ev, horizon_sec=horizon).collect()
    }
    for u, s in rows:
        exp = sum(1 for u2, s2 in rows if u2 == u and s < s2 <= s + horizon)
        assert got[(u, _t(0) + dt.timedelta(seconds=s))] == exp, (u, s)


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "a"), (1, _t(10), "b"), (1, _t(30), "c")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t(5), 50.0), (1, _t(8), 80.0), (1, _t(20), 200.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        (r["user_id"], r["ts"].second): r["value_right"]
        for r in temporal.asof_join(left, right, direction="forward").collect()
    }
    assert got == {
        (1, 5): 50.0,    # equality matches (inclusive)
        (1, 10): 200.0,  # earliest following
        (1, 30): None,   # nothing after
    }


def test_asof_join_forward_matches_bruteforce_random(spark):
    import random

    rng = random.Random(13)
    left = [(rng.randrange(4), _t(rng.randrange(50)), float(i)) for i in range(150)]
    right_raw = {(rng.randrange(4), rng.randrange(50)): float(500 + i) for i in range(90)}
    right = [(u, _t(s), v) for (u, s), v in right_raw.items()]
    ldf = spark.createDataFrame(left, "user_id long, ts timestamp, lval double")
    rdf = spark.createDataFrame(right, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["ts"], r["lval"]): r["value_right"]
        for r in temporal.asof_join(ldf, rdf, direction="forward").collect()
    }
    for u, t, lv in set(left):
        cands = [(rt, rv) for ru, rt, rv in right if ru == u and rt >= t]
        exp = min(cands)[1] if cands else None
        assert got[(u, t, lv)] == exp, (u, t)


def test_latest_snapshot_picks_max_ts_under_cutoff(spark):
    from jamie_spark import temporal

    obs = spark.createDataFrame(
        [
            ("s", "p", "old", 10), ("s", "p", "mid", 20),
            ("s", "p", "late", 99),           # beyond cutoff
            ("s", "q", "a", 20), ("s", "q", "b", 20),  # ts tie -> obj DESC
            ("t", "p", "only", 5),
        ],
        "subj string, pred string, obj string, observed_at long",
    )
    got = {
        (r["subj"], r["pred"]): (r["obj"], r["observed_at"])
        for r in temporal.latest_snapshot(
            obs, ["subj", "pred"], "observed_at", 50, tiebreak_cols=("obj",)
        ).collect()
    }
    assert got == {
        ("s", "p"): ("mid", 20),
        ("s", "q"): ("b", 20),
        ("t", "p"): ("only", 5),
    }


def test_valid_intervals_chain_and_open_tail(spark):
    from jamie_spark import temporal

    obs = spark.createDataFrame(
        [("s", "p", "v1", 10), ("s", "p", "v2", 30), ("s", "p", "v3", 70)],
        "subj string, pred string, obj string, observed_at long",
    )
    rows = sorted(
        (r["obj"], r["valid_from"], r["valid_to"])
        for r in temporal.valid_intervals(
            obs, ["subj", "pred"], "observed_at", order_cols=("obj",)
        ).collect()
    )
    assert rows == [("v1", 10, 30), ("v2", 30, 70), ("v3", 70, None)]


def test_snapshot_diff_classification(spark):
    """added / removed / changed / unchanged on a handmade ledger: key A
    changes obj between the cutoffs, B appears only after t0 (added), C is
    unchanged (dropped), and swapping the cutoffs turns B into removed."""
    obs = spark.createDataFrame(
        [
            ("A", "p", "x", 10), ("A", "p", "y", 20),   # changed
            ("B", "p", "n", 15),                        # added after t0=10
            ("C", "p", "z", 5), ("C", "p", "z", 18),    # re-asserted, same
        ],
        "subj string, pred string, obj string, observed_at long",
    )
    d = {
        (r["subj"], r["change"]): (r["old_obj"], r["new_obj"])
        for r in temporal.snapshot_diff(
            obs, ["subj", "pred"], "observed_at", 10, 20,
            value_cols=("obj",), tiebreak_cols=("obj",),
        ).collect()
    }
    assert d == {
        ("A", "changed"): ("x", "y"),
        ("B", "added"): (None, "n"),
    }
    rev = {
        (r["subj"], r["change"]): (r["old_obj"], r["new_obj"])
        for r in temporal.snapshot_diff(
            obs, ["subj", "pred"], "observed_at", 20, 10,
            value_cols=("obj",), tiebreak_cols=("obj",),
        ).collect()
    }
    assert rev == {
        ("A", "changed"): ("y", "x"),
        ("B", "removed"): ("n", None),
    }


def test_snapshot_diff_null_values_diff_correctly(spark):
    """Presence is tracked by marker columns, not value null-ness: a key
    whose belief moves from NULL to a value is CHANGED, not added."""
    obs = spark.createDataFrame(
        [("A", "p", None, 10), ("A", "p", "v", 20)],
        "subj string, pred string, obj string, observed_at long",
    )
    rows = temporal.snapshot_diff(
        obs, ["subj", "pred"], "observed_at", 10, 20, value_cols=("obj",)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["change"], r["old_obj"], r["new_obj"]) == ("changed", None, "v")
