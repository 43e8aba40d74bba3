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
