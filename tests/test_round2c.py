"""Round-2 additions: sub-line explode (BytesLines analog), simhash
candidate pairs → connected components, and their driver-query twins."""

import numpy as np
import pyarrow as pa
import pytest


# --- explode_lines ----------------------------------------------------------

def _turns_tbl(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows]),
        }
    )


def test_explode_lines_batch_multiline():
    from logjuicer_ray.sources.transcripts import explode_lines_batch

    batch = _turns_tbl(
        [
            ("a", 0, "one line"),
            ("a", 1, "first\nsecond\nthird"),
            ("b", 0, ""),
            ("b", 1, None),
            ("b", 2, "x\n"),
        ]
    )
    out = explode_lines_batch(batch)
    assert out.column("text").to_pylist() == [
        "one line", "first", "second", "third", "", "", "x", "",
    ]
    assert out.column("line_idx").to_pylist() == [0, 0, 1, 2, 0, 0, 0, 1]
    # parent columns replicated per line
    assert out.column("turn_idx").to_pylist() == [0, 1, 1, 1, 0, 1, 2, 2]
    assert out.column("conv_id").to_pylist()[:4] == ["a", "a", "a", "a"]


def test_explode_lines_byte_cap_per_line():
    from logjuicer_ray.sources.transcripts import explode_lines_batch

    long = "y" * 9000
    batch = _turns_tbl([("a", 0, f"short\n{long}")])
    out = explode_lines_batch(batch, max_line_bytes=6000)
    texts = out.column("text").to_pylist()
    assert texts[0] == "short"
    assert len(texts[1]) == 6000  # capped per sub-line, not per turn


def test_explode_lines_dataset_identity_on_single_line(ray_session):
    import ray.data as rd

    from logjuicer_ray.sources.transcripts import explode_lines

    batch = _turns_tbl([("a", i, f"line {i} body") for i in range(50)])
    out = explode_lines(rd.from_arrow(batch)).to_pandas()
    assert len(out) == 50
    assert (out["line_idx"] == 0).all()


# --- simhash candidate pairs + connected components -------------------------

def test_simhash_cc_matches_union_find(ray_session):
    """Engine CC labels over simhash candidate pairs == union-find over the
    same pairs computed driver-side."""
    import ray.data as rd

    from logjuicer_ray.functions.dedup import (
        connected_components,
        simhash_candidate_pairs,
    )

    rng = np.random.default_rng(7)
    base = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "delta", "eps"], 30))
        for _ in range(40)
    ]
    texts, ids = [], []
    for i, b in enumerate(base):
        texts.append(b)
        ids.append(2 * i)
        texts.append(b + " zeta")  # near-dup neighbor
        ids.append(2 * i + 1)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}))
    pairs = simhash_candidate_pairs(docs)
    pair_rows = pairs.to_pandas()

    # union-find oracle
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pair_rows["doc_id"], pair_rows["dup_of"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for x in list(parent):
        r = find(x)
        if r != x:
            want[x] = r

    got_df = connected_components(pairs).to_pandas()
    got = dict(zip(got_df["doc_id"].astype(int), got_df["component"].astype(int)))
    assert got == want
    assert len(want) > 0  # the planted near-dups actually bucket together


# --- driver queries ---------------------------------------------------------

def test_turn_lines_query_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    out = e.queries()["turn_lines"]("/root/testdata/sf0.001").to_pandas()
    sql = e.oracle_sql()["turn_lines"].replace("sf0.01", "sf0.001")
    want = duckdb.sql(sql).df()
    assert len(out) == len(want)
    assert (out["n_lines"].to_numpy() == want["n_lines"].to_numpy()).all()
    assert (out["n_bytes"].to_numpy() == want["n_bytes"].to_numpy()).all()
    assert (out["max_line_idx"].to_numpy() == want["max_line_idx"].to_numpy()).all()


def test_simhash_cc_query_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    out = e.queries()["simhash_cc_docs"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(e.oracle_sql()["simhash_cc_docs"]).df()
    assert len(out) == len(want)
    assert (out["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (out["component"].to_numpy() == want["component"].to_numpy()).all()


def test_connected_components_distributed_parity(ray_session):
    """driver_pair_rows=0 forces the join-based distributed path; labels
    must match the driver union-find path exactly."""
    import ray.data as rd

    from logjuicer_ray.functions.dedup import connected_components

    rng = np.random.default_rng(11)
    # random sparse graph incl. a long chain (deep component) and singleton pairs
    a = rng.integers(0, 300, 400)
    b = rng.integers(0, 300, 400)
    chain = [(i, i + 1) for i in range(500, 540)]
    ids = list(a) + [p[0] for p in chain]
    dups = list(b) + [p[1] for p in chain]
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([int(x) for x in ids], pa.int64()),
                "dup_of": pa.array([int(x) for x in dups], pa.int64()),
            }
        )
    )
    fast = connected_components(pairs).to_pandas().sort_values("doc_id")
    dist = (
        connected_components(pairs, driver_pair_rows=0, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(fast["doc_id"]) == list(dist["doc_id"])
    assert list(fast["component"]) == list(dist["component"])
    # chain end reaches chain head: diameter-40 component fully resolved
    comp = dict(zip(fast["doc_id"], fast["component"]))
    assert comp[539] == 500
