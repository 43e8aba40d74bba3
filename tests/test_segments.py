"""Sort-based grouped-min exchange (functions/segments.py): correctness
against pandas brute force, with hot keys that genuinely span sorted block
boundaries (fewer keys than blocks forces the driver chain repair)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df, parts):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(parts)


def _check_attach(df, key_cols, val_col, parts, ray_session, tiebreaks=()):
    from logjuicer_ray.functions.segments import attach_group_min

    got = (
        attach_group_min(
            _ds(df, parts), key_cols=key_cols, val_col=val_col,
            out_col="m", tiebreak_cols=list(tiebreaks),
        )
        .to_pandas()
        .sort_values(list(df.columns))
        .reset_index(drop=True)
    )
    want = df.assign(m=df.groupby(key_cols)[val_col].transform("min"))
    want = want.sort_values(list(df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_attach_hot_keys_span_blocks(ray_session):
    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({"k": rng.integers(0, 4, n), "v": rng.permutation(n)})
    _check_attach(df, ["k"], "v", parts=16, ray_session=ray_session)


def test_attach_single_group_spans_everything(ray_session):
    df = pd.DataFrame({"k": np.zeros(5000, np.int64),
                       "v": np.random.default_rng(3).permutation(5000)})
    _check_attach(df, ["k"], "v", parts=12, ray_session=ray_session)


def test_attach_unique_keys(ray_session):
    df = pd.DataFrame({"k": np.arange(3000), "v": np.arange(3000)[::-1]})
    _check_attach(df, ["k"], "v", parts=6, ray_session=ray_session)


def test_attach_multi_column_string_keys(ray_session):
    rng = np.random.default_rng(11)
    n = 8000
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], n),
            "b": rng.integers(0, 3, n),
            "v": rng.permutation(n),
        }
    )
    _check_attach(df, ["a", "b"], "v", parts=10, ray_session=ray_session)


def test_group_first_row_vs_pandas(ray_session):
    from logjuicer_ray.functions.segments import group_first_row

    rng = np.random.default_rng(5)
    n = 15_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n),
            "o": rng.permutation(n),
            "t": np.arange(n),
        }
    )
    got = (
        group_first_row(_ds(df, 14), key_cols=["k"], order_cols=["o", "t"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "o", "t"]).groupby("k").first().reset_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_partition_invariance(ray_session):
    from logjuicer_ray.functions.segments import group_first_row

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.integers(0, 3, 6000),
                       "o": rng.permutation(6000)})
    outs = []
    for parts in (1, 5, 17):
        outs.append(
            group_first_row(_ds(df, parts), key_cols=["k"], order_cols=["o"])
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_attach_minmax_vs_pandas(ray_session):
    from logjuicer_ray.functions.segments import attach_group_minmax

    rng = np.random.default_rng(13)
    n = 20_000
    df = pd.DataFrame({"k": rng.integers(0, 4, n), "v": rng.permutation(n)})
    got = (
        attach_group_minmax(
            _ds(df, 16), key_cols=["k"], val_col="v",
            min_col="mn", max_col="mx",
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = df.assign(
        mn=df.groupby("k")["v"].transform("min"),
        mx=df.groupby("k")["v"].transform("max"),
    ).sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_attach_minmax_singletons_and_one_group(ray_session):
    from logjuicer_ray.functions.segments import attach_group_minmax

    # all-unique keys: min == max everywhere
    df = pd.DataFrame({"k": np.arange(4000), "v": np.arange(4000)[::-1]})
    got = attach_group_minmax(
        _ds(df, 9), key_cols=["k"], val_col="v", min_col="mn", max_col="mx"
    ).to_pandas()
    assert (got["mn"] == got["v"]).all() and (got["mx"] == got["v"]).all()
    # one group spanning every block
    df1 = pd.DataFrame({"k": np.zeros(5000, np.int64),
                        "v": np.random.default_rng(2).permutation(5000)})
    got1 = attach_group_minmax(
        _ds(df1, 11), key_cols=["k"], val_col="v", min_col="mn", max_col="mx"
    ).to_pandas()
    assert (got1["mn"] == 0).all() and (got1["mx"] == 4999).all()


def _make_concat_apply():
    def _concat_apply(sub: pa.Table, offsets):
        """Reference apply_block: per-group join of txt ordered by o."""
        import pyarrow.compute as pc

        n = sub.num_rows
        if n == 0:
            return pa.table({
                "k": pa.array([], pa.int64()),
                "joined": pa.array([], pa.string()),
                "total": pa.array([], pa.int64()),
            })
        off = np.append(np.asarray(offsets), n).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), sub.column("txt").combine_chunks()
        )
        heads = pa.array(off[:-1], pa.int64())
        return pa.table({
            "k": sub.column("k").take(heads),
            "joined": pc.binary_join(lists, "|"),
            "total": pa.array(
                np.add.reduceat(
                    sub.column("v").to_numpy(zero_copy_only=False), off[:-1]
                ).astype(np.int64)
            ),
        })
    return _concat_apply


def _sga_frame(df, parts, **kw):
    from logjuicer_ray.functions.segments import sorted_group_apply

    return (
        sorted_group_apply(
            _ds(df, parts), key_cols=["k"], order_cols=["o"],
            apply_block=_make_concat_apply(), **kw,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )


def _sga_want(df):
    g = df.sort_values(["k", "o"]).groupby("k")
    return pd.DataFrame({
        "k": list(g.groups),
        "joined": g["txt"].apply("|".join).values,
        "total": g["v"].sum().values,
    }).sort_values("k").reset_index(drop=True)


def test_sorted_group_apply_vs_pandas(ray_session):
    rng = np.random.default_rng(5)
    n = 30_000
    df = pd.DataFrame({
        "k": rng.integers(0, 2_000, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 100, n).astype(np.int64),
        "txt": [f"t{i % 97}" for i in range(n)],
    })
    got = _sga_frame(df, 16)
    pd.testing.assert_frame_equal(got, _sga_want(df), check_dtype=False)


def test_sorted_group_apply_hot_keys_and_partitions(ray_session):
    # 3 keys over 16 blocks: most blocks are single-segment, every block's
    # rows land in the repair pass; also exercise the distributed repair
    rng = np.random.default_rng(11)
    n = 8_000
    df = pd.DataFrame({
        "k": rng.integers(0, 3, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 9, n).astype(np.int64),
        "txt": [f"x{i % 13}" for i in range(n)],
    })
    want = _sga_want(df)
    for parts in (1, 16):
        pd.testing.assert_frame_equal(
            _sga_frame(df, parts), want, check_dtype=False)
    # distributed fragment repair (driver_repair_rows=0 forces it)
    pd.testing.assert_frame_equal(
        _sga_frame(df, 16, driver_repair_rows=0), want, check_dtype=False)


def test_sorted_group_sum_vs_pandas(ray_session):
    from logjuicer_ray.functions.segments import sorted_group_sum

    rng = np.random.default_rng(23)
    n = 25_000
    df = pd.DataFrame({
        "k": rng.integers(0, 3_000, n).astype(np.int64),
        "a": rng.integers(-50, 50, n).astype(np.int64),
        "b": rng.normal(size=n),
    })
    got = (
        sorted_group_sum(_ds(df, 13), key_cols=["k"], sum_cols=["a", "b"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    g = df.groupby("k", as_index=False).agg({"a": "sum", "b": "sum"})
    g.columns = ["k", "sum(a)", "sum(b)"]
    got["sum(b)"] = got["sum(b)"].round(6)
    g["sum(b)"] = g["sum(b)"].round(6)
    pd.testing.assert_frame_equal(got, g.sort_values("k").reset_index(drop=True),
                                  check_dtype=False)


def test_sorted_group_sum_hot_key(ray_session):
    from logjuicer_ray.functions.segments import sorted_group_sum

    # one key spanning every block exercises the repair pass
    df = pd.DataFrame({"k": np.zeros(9_000, np.int64),
                       "a": np.arange(9_000, dtype=np.int64)})
    got = sorted_group_sum(_ds(df, 12), key_cols=["k"], sum_cols=["a"]).to_pandas()
    assert len(got) == 1 and int(got["sum(a)"][0]) == int(df["a"].sum())
