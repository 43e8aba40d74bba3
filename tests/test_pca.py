"""Distributed PCA tests (functions/pca.py).

The hard value oracle for the moment partials runs in the auto-discovered
parity sweep (``embedding_covariance``); here we verify the eigensolve and
projection against a direct numpy PCA of the same (quantized) matrix, plus
partition invariance of the exact integer moments.
"""

import numpy as np
import pyarrow as pa
import pytest

from logjuicer_ray.functions.pca import (
    SCALE,
    moment_partials,
    pca_components,
    pca_project,
)

RNG = np.random.default_rng(11)
DIM, N = 12, 200


def _vectors():
    # anisotropic cloud: two dominant directions plus noise
    base = RNG.normal(size=(N, DIM)).astype(np.float32)
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    base += 0.5
    return base


@pytest.fixture(scope="module")
def vecs():
    return _vectors()


def _ds(vecs, nparts=1):
    import ray.data as rd

    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(nparts) if nparts > 1 else ds


def _quantized(vecs):
    return np.floor(vecs.astype(np.float64) * SCALE) / SCALE


def test_moments_match_numpy_exactly(ray_session, vecs):
    rows = moment_partials(_ds(vecs)).to_pandas()
    q = np.floor(vecs.astype(np.float64) * SCALE).astype(np.int64)
    s2 = q.T @ q
    for r in rows.itertuples():
        assert r.sxy == s2[r.i, r.j]
        if r.i == r.j:
            assert r.sx == q[:, r.i].sum()
    assert rows["n"].sum() == N
    assert len(rows) == DIM * (DIM + 1) // 2


def test_moments_partition_invariant(ray_session, vecs):
    a = moment_partials(_ds(vecs)).to_pandas().sort_values(
        ["i", "j"]).reset_index(drop=True)
    b = moment_partials(_ds(vecs, nparts=9)).to_pandas().sort_values(
        ["i", "j"]).reset_index(drop=True)
    assert a.equals(b)  # int64 partials: bit-identical, not just close


def test_components_match_direct_eigh(ray_session, vecs):
    mean, w = pca_components(_ds(vecs), k=4)
    x = _quantized(vecs)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs_np = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    want = vecs_np[:, order]
    for c in range(4):
        m = np.argmax(np.abs(want[:, c]))
        if want[m, c] < 0:
            want[:, c] = -want[:, c]
    assert np.allclose(w, want, atol=1e-6)
    # dominant axes recovered in order
    assert np.abs(w[0, 0]) > 0.9 and np.abs(w[1, 1]) > 0.9


def test_projection_centers_and_orders_variance(ray_session, vecs):
    mean, w = pca_components(_ds(vecs), k=4)
    out = pca_project(_ds(vecs, nparts=5), mean, w).to_pandas()
    y = np.vstack(out.sort_values("vec_id")["pca"].to_numpy())
    x = _quantized(vecs)
    assert np.allclose(y, (x - x.mean(axis=0)) @ w, atol=1e-9)
    var = y.var(axis=0)
    assert np.all(np.diff(var) <= 1e-9)  # non-increasing component variance
    assert np.allclose(y.mean(axis=0), 0, atol=1e-9)
