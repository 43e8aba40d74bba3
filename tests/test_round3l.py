"""Round-3l surfaces: dense resample, Markov transitions, int8 embedding
quantization."""

import numpy as np
import pyarrow as pa
import pytest


def test_resample_dense_zero_fill(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.windows import resample_dense

    H = 3_600_000_000
    t = pa.table({
        "u": pa.array([1, 1, 1, 2], pa.int64()),
        # user 1: events in hours 10, 10, 13 → grid 10..13 with a gap
        "ts": pa.array([10 * H + 5, 10 * H + 9, 13 * H + 1, 7 * H],
                       pa.timestamp("us")),
    })
    out = resample_dense(rd.from_arrow(t).repartition(2), key="u",
                         ts_col="ts").to_pandas()
    u1 = out[out["u"] == 1].sort_values("bucket_us")
    assert list(u1["bucket_us"]) == [10 * H, 11 * H, 12 * H, 13 * H]
    assert list(u1["n_events"]) == [2, 0, 0, 1]
    u2 = out[out["u"] == 2]
    assert len(u2) == 1 and u2.iloc[0]["n_events"] == 1


def test_event_transitions_order_and_counts(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.windows import event_transitions

    rows = [
        (1, 1, 10, "a"), (1, 2, 20, "b"), (1, 3, 30, "a"),   # a→b, b→a
        (2, 4, 5, "b"), (2, 5, 5, "a"),                      # ts tie → id asc: b? a?
        (3, 6, 1, "x"),                                      # single event: none
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
    })
    out = event_transitions(rd.from_arrow(t).repartition(2)).to_pandas()
    got = {(r.from_type, r.to_type): r.cnt for r in out.itertuples()}
    # user 2: equal ts → event_id ascending orders (4,'b') before (5,'a')
    assert got == {("a", "b"): 1, ("b", "a"): 2}


def test_quantize_embeddings_known_values(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.knn import quantize_embeddings

    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array(
            [[1.0, -2.0, 0.5, 0.0], [0.0, 0.0, 0.0, 0.0]],
            pa.list_(pa.float32()),
        ),
    })
    out = quantize_embeddings(rd.from_arrow(t)).to_pandas().set_index("vec_id")
    # vec 0: scale = 2/127; q = floor(x*127/2 + 0.5) = [64, -127, 32, 0]
    assert out.loc[0, "scale_e9"] == int(np.floor(2.0 / 127.0 * 1e9 + 0.5))
    assert out.loc[0, "q_sum"] == 64 - 127 + 32
    assert out.loc[0, "q_min"] == -127 and out.loc[0, "q_max"] == 64
    # all-zero vector → q = 0 by definition
    assert out.loc[1, "q_sum"] == 0 and out.loc[1, "scale_e9"] == 0


def test_round3l_queries_vs_duckdb(ray_session):
    """events_resampled / event_transitions / quantized_embeddings
    hash-match their DuckDB oracles at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for tbl in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')"
        )
    for name in ("events_resampled", "event_transitions",
                 "quantized_embeddings"):
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
