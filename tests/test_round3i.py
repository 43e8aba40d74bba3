"""Round-3i surfaces: graph analytics (triangles, integer PageRank),
keyed dataset diff, ordered funnel."""

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data as rd

    t = pa.table({"u": pa.array([p[0] for p in pairs], pa.int64()),
                  "v": pa.array([p[1] for p in pairs], pa.int64())})
    return rd.from_arrow(t)


def test_triangle_counts_known_graph(ray_session):
    """K4 minus one edge: nodes 0-3, all edges except (2,3) → triangles
    (0,1,2) and (0,1,3) only."""
    from logjuicer_ray.functions.graph import triangle_counts

    edges = _edges_ds([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)])
    out = triangle_counts(edges).to_pandas().set_index("node")["n_triangles"]
    assert dict(out) == {0: 2, 1: 2, 2: 1, 3: 1}


def test_pagerank_integer_exact_vs_bruteforce(ray_session):
    """3-iteration micro-unit PageRank equals the driver-side integer
    recomputation on a small random graph, under multiple partitionings."""
    from logjuicer_ray.functions.graph import pagerank

    rng = np.random.default_rng(3)
    nodes = 20
    pairs = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, nodes, (60, 2)) if a < b})
    # brute force
    import collections
    adj = collections.defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    deg = {n: len(vs) for n, vs in adj.items()}
    r = {n: 1_000_000 for n in deg}
    for _ in range(3):
        nxt = {n: 150_000 for n in deg}
        for u, vs in adj.items():
            c = int(np.floor(0.85 * r[u] / deg[u]))
            for v in vs:
                nxt[v] += c
        r = nxt
    for parts in (1, 5):
        out = pagerank(_edges_ds(pairs).repartition(parts), iterations=3)
        got = dict(zip(*[out.to_pandas()[c] for c in ("node", "rank_e6")]))
        assert got == r, parts


def test_cooccurrence_edges_dedup_and_orientation(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.graph import cooccurrence_edges

    t = pa.table({
        "g": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "i": pa.array([5, 7, 5, 9, 7, 5, 4], pa.int64()),  # dup (1,5)
    })
    out = cooccurrence_edges(
        rd.from_arrow(t).repartition(3), group_col="g", item_col="i"
    ).to_pandas()
    got = set(zip(out["u"], out["v"]))
    assert got == {(5, 7), (5, 9), (7, 9)}  # (5,7) once despite two groups


def test_dataset_diff_statuses(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.diff import dataset_diff

    a = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["same", "old", "gone", "keep"]),
    }))
    b = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 4, 5], pa.int64()),
        "text": pa.array(["same", "new", "keep", "fresh"]),
    }))
    out = dataset_diff(a, b, key_col="k", compare_cols=["text"]).to_pandas()
    got = dict(zip(out["k"], out["status"]))
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_funnel_greedy_strict_order(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.windows import funnel_users

    us = 1_000_000

    def ts(sec):
        return sec * us

    rows = [
        # user 1 completes: signup@1, click@2, purchase@3
        (1, ts(1), "signup"), (1, ts(2), "click"), (1, ts(3), "purchase"),
        # user 2: purchase BEFORE click → incomplete
        (2, ts(1), "signup"), (2, ts(3), "click"), (2, ts(2), "purchase"),
        # user 3: greedy — first click after signup is @5; purchase@4 < 5
        # fails, purchase@6 succeeds
        (3, ts(1), "signup"), (3, ts(5), "click"),
        (3, ts(4), "purchase"), (3, ts(6), "purchase"),
        # user 4: click at exactly signup ts → NOT strictly after
        (4, ts(1), "signup"), (4, ts(1), "click"), (4, ts(2), "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    out = funnel_users(
        rd.from_arrow(t).repartition(2),
        steps=["signup", "click", "purchase"],
    ).to_pandas().set_index("user_id")
    assert set(out.index) == {1, 3}
    assert out.loc[1, "t_purchase_us"] == ts(3)
    assert out.loc[3, "t_click_us"] == ts(5)
    assert out.loc[3, "t_purchase_us"] == ts(6)


def test_round3i_queries_vs_duckdb(ray_session):
    """part_triangles / part_pagerank / docs_diff / funnel_users hash-match
    their DuckDB oracles at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for tbl in ("documents", "orders", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')"
        )
    for name in ("part_triangles", "part_pagerank", "docs_diff", "funnel_users"):
        got = q[name]("/root/testdata/sf0.001").to_pandas()
        want = con.execute(o[name]).fetchdf()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            b[c] = b[c].astype(a[c].dtype)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), f"{name}: value mismatch"


def test_dataset_diff_fast_equals_md5(ray_session):
    """Both digest modes classify identically (the digest only carries
    equality, never values)."""
    import ray.data as rd

    from logjuicer_ray.functions.diff import dataset_diff

    rng = np.random.default_rng(17)
    texts = [f"doc-{i}-" + "x" * int(rng.integers(0, 30)) for i in range(60)]
    a = rd.from_arrow(pa.table({
        "k": pa.array(range(60), pa.int64()), "text": pa.array(texts)}))
    texts_b = [t + "!" if i % 7 == 0 else t for i, t in enumerate(texts[:50])]
    b = rd.from_arrow(pa.table({
        "k": pa.array(range(50), pa.int64()), "text": pa.array(texts_b)}))
    outs = []
    for mode in ("fast", "md5"):
        out = dataset_diff(a, b, key_col="k", compare_cols=["text"],
                           digest=mode).to_pandas()
        outs.append(out.sort_values("k").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    got = dict(zip(outs[0]["k"], outs[0]["status"]))
    assert all(got[k] == "removed" for k in range(50, 60))
    assert all(got[k] == "changed" for k in range(0, 50, 7))
