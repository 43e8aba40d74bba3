"""percentile_band tests (functions/quality.py).

The hard value oracle runs in the auto-discovered parity sweep
(``docs_quality_band``); here we test band-boundary semantics, tie
handling, descending mode, and degenerate inputs.
"""

import pyarrow as pa
import pytest

from logjuicer_ray.functions.quality import percentile_band


def _ds(values):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "id": pa.array(range(len(values)), pa.int64()),
        "v": pa.array(values, pa.int64()),
    }))


def test_band_is_inclusive_and_exact(ray_session):
    # 11 rows -> pct_rank = rnk-1 / 10 = 0.0, 0.1, ..., 1.0
    out = percentile_band(_ds(list(range(11))), value_col="v", tie_col="id",
                          lo=0.1, hi=0.9).to_pandas().sort_values("rnk")
    assert list(out["v"]) == list(range(1, 10))  # drops v=0 and v=10
    assert out["pct_rank"].iloc[0] == pytest.approx(0.1)
    assert out["pct_rank"].iloc[-1] == pytest.approx(0.9)


def test_ties_break_by_tie_col(ray_session):
    # all-equal values: order (and the band) decided purely by id
    out = percentile_band(_ds([5] * 10), value_col="v", tie_col="id",
                          lo=0.0, hi=0.5).to_pandas().sort_values("rnk")
    assert list(out["id"]) == list(range(5))  # pct k/9 <= 0.5 ⇔ k <= 4


def test_descending_mode(ray_session):
    out = percentile_band(_ds(list(range(10))), value_col="v", tie_col="id",
                          lo=0.0, hi=0.2, descending=True
                          ).to_pandas().sort_values("rnk")
    assert list(out["v"]) == [9, 8]  # top of the distribution ranks first


def test_single_row(ray_session):
    out = percentile_band(_ds([7]), value_col="v", tie_col="id",
                          lo=0.0, hi=1.0).to_pandas()
    assert len(out) == 1 and out["pct_rank"].iloc[0] == 0.0


def test_partition_invariance(ray_session):
    base = percentile_band(_ds(list(range(50))), value_col="v",
                           tie_col="id", lo=0.2, hi=0.8
                           ).to_pandas().sort_values("rnk").reset_index(drop=True)
    rep = percentile_band(_ds(list(range(50))).repartition(9), value_col="v",
                          tie_col="id", lo=0.2, hi=0.8
                          ).to_pandas().sort_values("rnk").reset_index(drop=True)
    assert base.equals(rep)
