"""Round-2 additions: sessionization and as-of join (+ driver-query twins)."""

import numpy as np
import pyarrow as pa
import pytest


def test_sessionize_gap_semantics(ray_session):
    """Strict-gap boundary: exactly 30 min does NOT break; 30 min + 1 µs does.
    Ordering ties on ts resolve by event_id in both engine and oracle."""
    import ray.data as rd

    from logjuicer_ray.functions.windows import sessionize

    m = 60 * 1_000_000
    rows = {
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 30 * m, 60 * m + 1, 61 * m, 5], pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13, 20], pa.int64()),
    }
    out = (
        sessionize(rd.from_arrow(pa.table(rows)), gap_minutes=30)
        .sort(["user_id", "session_idx"])
        .to_pandas()
    )
    # user 1: [0, 30m] one session (gap == 30m keeps), then 60m+1µs breaks
    assert list(out["user_id"]) == [1, 1, 2]
    assert list(out["n_events"]) == [2, 2, 1]
    assert list(out["min_event_id"]) == [10, 12, 20]
    assert list(out["max_event_id"]) == [11, 13, 20]
    assert list(out["session_idx"]) == [0, 1, 0]


def test_asof_join_tie_break_and_nulls(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.joins import asof_join

    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "ts": pa.array([100, 60, 10], pa.timestamp("us")),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([7, 7, 7], pa.int64()),
            "o_orderkey": pa.array([500, 501, 502], pa.int64()),
            # two orders share ts=100 → max orderkey (502) must win at ts>=100
            "o_orderdate": pa.array([60, 100, 100], pa.timestamp("us")),
            "o_totalprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    out = (
        asof_join(
            rd.from_arrow(events),
            rd.from_arrow(orders),
            key="user_id",
            right_key="o_custkey",
            left_ts="ts",
            right_ts="o_orderdate",
            left_cols=["event_id", "user_id", "ts"],
            right_cols=["o_orderkey", "o_totalprice"],
            right_id="o_orderkey",
        )
        .sort("event_id")
        .to_pandas()
    )
    assert list(out["event_id"]) == [1, 2, 3]
    assert out.loc[0, "o_orderkey"] == 502  # tie at date 100 → max orderkey
    assert out.loc[1, "o_orderkey"] == 500  # only date 60 qualifies at ts 60
    # user 8 has no orders at all → NULL enrichment
    assert out.loc[2, ["o_orderkey", "o_totalprice"]].isna().all()


@pytest.mark.parametrize("name", ["events_sessions", "events_asof_orders"])
def test_new_queries_vs_duckdb(ray_session, name):
    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    out = e.queries()[name](sf).to_pandas()
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    want = con.execute(e.oracle_sql()[name]).df()
    assert len(out) == len(want)
    assert list(out.columns) == list(want.columns)
    for c in out.columns:
        a, b = out[c], want[c]
        if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
            a = pd.to_datetime(a).astype("int64")
            b = pd.to_datetime(b).astype("int64")
        if a.dtype.kind == "f":
            assert np.allclose(a.fillna(-1), b.fillna(-1)), c
        else:
            assert (a.fillna(-1).values == b.fillna(-1).values).all(), c


def test_topk_per_group_combiner_parity(ray_session):
    """Many tiny blocks (forces the map-side combiner to act per block) must
    give the same top-k as a single-block run, incl. rank and tie-breaks."""
    import ray.data as rd

    from logjuicer_ray.functions.topk import topk_per_group

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table(
        {
            "g": pa.array([f"g{int(x)}" for x in rng.integers(0, 5, n)]),
            "v": pa.array(rng.integers(0, 50, n).astype("float64")),  # many ties
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    kw = dict(group_cols=["g"], order_col="v", k=4, tie_cols=["id"])
    one = (
        topk_per_group(rd.from_arrow(t), **kw)
        .sort(["g", "rank"]).to_pandas()
    )
    many = (
        topk_per_group(rd.from_arrow(t).repartition(37), **kw)
        .sort(["g", "rank"]).to_pandas()
    )
    assert one.equals(many)
    assert list(one.groupby("g")["rank"].max()) == [4] * 5
    # rank 1 really is the max v, min id among ties
    for g, grp in one.groupby("g"):
        sub = t.to_pandas().query("g == @g")
        best = sub.sort_values(["v", "id"], ascending=[False, True]).iloc[0]
        assert grp.iloc[0]["id"] == best["id"]


def test_lineitem_topk_query_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    out = e.queries()["lineitem_topk"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
    want = con.execute(e.oracle_sql()["lineitem_topk"]).df()
    assert len(out) == len(want)
    for c in out.columns:
        a, b = out[c], want[c]
        if a.dtype.kind == "f":
            assert np.allclose(a, b), c
        else:
            assert (a.values == b.values).all(), c


def _brute_sessions(df, gap_us):
    import pandas as pd

    rows = []
    for uid, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        sess, start = -1, None
        prev = None
        for r in g.itertuples(index=False):
            if prev is None or (r.ts - prev) > gap_us:
                sess += 1
                rows.append({"user_id": uid, "session_idx": sess, "n_events": 0,
                             "session_start": r.ts, "session_end": r.ts,
                             "min_event_id": r.event_id, "max_event_id": r.event_id})
            cur = rows[-1]
            cur["n_events"] += 1
            cur["session_end"] = r.ts
            cur["min_event_id"] = min(cur["min_event_id"], r.event_id)
            cur["max_event_id"] = max(cur["max_event_id"], r.event_id)
            prev = r.ts
    import pandas as pd

    return pd.DataFrame(rows)


def test_sessionize_random_property(ray_session):
    import pandas as pd
    import ray.data as rd

    from logjuicer_ray.functions.windows import sessionize

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": rng.integers(0, 10_000, n) * 1_000_000,  # µs, dense → many gaps
            "event_id": np.arange(n, dtype=np.int64),
        }
    )
    gap_us = 600 * 1_000_000  # 10 min
    t = pa.table(
        {
            "user_id": pa.array(df.user_id, pa.int64()),
            "ts": pa.array(df.ts, pa.timestamp("us")),
            "event_id": pa.array(df.event_id, pa.int64()),
        }
    )
    got = (
        sessionize(rd.from_arrow(t).repartition(11), gap_minutes=10)
        .sort(["user_id", "session_idx"]).to_pandas()
    )
    want = _brute_sessions(df, gap_us).sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["n_events"].values == want["n_events"].values).all()
    assert (got["session_start"].astype("int64").values // 1 == want["session_start"].values).all()
    assert (got["min_event_id"].values == want["min_event_id"].values).all()
    assert (got["max_event_id"].values == want["max_event_id"].values).all()


def test_asof_join_random_property(ray_session):
    import pandas as pd
    import ray.data as rd

    from logjuicer_ray.functions.joins import asof_join

    rng = np.random.default_rng(17)
    ne, no = 800, 400
    ev = pd.DataFrame(
        {
            "event_id": np.arange(ne, dtype=np.int64),
            "user_id": rng.integers(0, 25, ne),
            "ts": rng.integers(0, 1000, ne),
        }
    )
    od = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, 30, no),  # some keys event-less / order-less
            "o_orderkey": np.arange(no, dtype=np.int64),
            "o_orderdate": rng.integers(0, 1000, no),
            "o_totalprice": rng.normal(100, 10, no).round(2),
        }
    )
    t_ev = pa.table(
        {
            "event_id": pa.array(ev.event_id),
            "user_id": pa.array(ev.user_id, pa.int64()),
            "ts": pa.array(ev.ts, pa.timestamp("us")),
        }
    )
    t_od = pa.table(
        {
            "o_custkey": pa.array(od.o_custkey, pa.int64()),
            "o_orderkey": pa.array(od.o_orderkey),
            "o_orderdate": pa.array(od.o_orderdate, pa.timestamp("us")),
            "o_totalprice": pa.array(od.o_totalprice),
        }
    )
    got = (
        asof_join(
            rd.from_arrow(t_ev).repartition(7),
            rd.from_arrow(t_od).repartition(5),
            key="user_id", right_key="o_custkey", left_ts="ts",
            right_ts="o_orderdate", left_cols=["event_id", "user_id", "ts"],
            right_cols=["o_orderkey", "o_totalprice"], right_id="o_orderkey",
        )
        .sort("event_id").to_pandas()
    )
    # brute force
    want_key = []
    for r in ev.itertuples(index=False):
        cand = od[(od.o_custkey == r.user_id) & (od.o_orderdate <= r.ts)]
        if len(cand):
            best = cand.sort_values(["o_orderdate", "o_orderkey"], ascending=False).iloc[0]
            want_key.append(best.o_orderkey)
        else:
            want_key.append(None)
    got_key = [None if pd.isna(x) else int(x) for x in got["o_orderkey"]]
    assert got_key == [None if w is None else int(w) for w in want_key]


def test_range_join_agg_random_property(ray_session):
    import pandas as pd
    import ray.data as rd

    from logjuicer_ray.functions.joins import range_join_agg

    rng = np.random.default_rng(23)
    nl, nr = 500, 700
    left = pd.DataFrame(
        {
            "lid": np.arange(nl, dtype=np.int64),
            "k": rng.integers(0, 15, nl),
            "ts": rng.integers(0, 500, nl),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 18, nr),
            "rts": rng.integers(0, 500, nr),
            "v": rng.normal(10, 3, nr).round(3),
        }
    )
    t_l = pa.table(
        {"lid": pa.array(left.lid), "k": pa.array(left.k, pa.int64()),
         "ts": pa.array(left.ts, pa.timestamp("us"))}
    )
    t_r = pa.table(
        {"k": pa.array(right.k, pa.int64()),
         "rts": pa.array(right.rts, pa.timestamp("us")),
         "v": pa.array(right.v)}
    )
    lo, hi = -25, 50  # inclusive window [ts-25, ts+50] µs
    got = (
        range_join_agg(
            rd.from_arrow(t_l).repartition(9), rd.from_arrow(t_r).repartition(4),
            key="k", right_key="k", left_ts="ts", right_ts="rts",
            left_cols=["lid", "k", "ts"], value_col="v", lo_us=lo, hi_us=hi,
        )
        .sort("lid").to_pandas()
    )
    assert len(got) == nl
    for r in got.sample(60, random_state=0).itertuples(index=False):
        sub = right[(right.k == r.k)]
        ts = int(pd.Timestamp(r.ts).value // 1000)
        m = sub[(sub.rts >= ts + lo) & (sub.rts <= ts + hi)]
        assert r.n_matches == len(m), (r.lid, r.n_matches, len(m))
        assert abs(r.sum_value - m.v.sum()) < 1e-6
    assert (got["n_matches"] > 0).any()


def test_hll_error_bound_vs_exact(ray_session):
    import duckdb

    import __ray_entry__ as e

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        est = e.queries()["distinct_users_hll"](sf).to_pandas()["distinct_users_est"][0]
        exact = duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
        ).fetchone()[0]
        assert abs(est - exact) / max(exact, 1) < 0.05, (sf, est, exact)


def test_hll_partitioning_invariance(ray_session):
    """Identical registers (hence estimate) regardless of block layout."""
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.sketch import hll_count_distinct

    vals = pa.table({"v": pa.array([f"u{i % 3777}" for i in range(20000)])})
    a = hll_count_distinct(rd.from_arrow(vals), "v")
    b = hll_count_distinct(rd.from_arrow(vals).repartition(17), "v")
    assert a == b
    assert abs(a - 3777) / 3777 < 0.03
