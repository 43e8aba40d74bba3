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


# --- split_multiline_turns pipeline parity -----------------------------------

def _pack_multiline(table, lines_per_record=3):
    """Driver-side inverse of explode_lines: pack consecutive turns of a
    conversation into one multiline record (text joined with \\n); the
    record inherits the first line's role/tool/ts."""
    import pandas as pd

    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="stable")
    recs = []
    for conv_id, g in df.groupby("conv_id", sort=False):
        for rec_idx, start in enumerate(range(0, len(g), lines_per_record)):
            chunk = g.iloc[start : start + lines_per_record]
            first = chunk.iloc[0]
            recs.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": rec_idx,
                    "role": first["role"],
                    "tool": first["tool"],
                    "ts": first["ts"],
                    "text": "\n".join(chunk["text"].tolist()),
                }
            )
    return pa.Table.from_pandas(pd.DataFrame(recs), preserve_index=False)


def _pre_split(packed):
    """Expected semantics: each embedded line is its own turn, turn_idx is
    the per-conversation line ordinal, role/tool/ts inherited per record."""
    import pandas as pd

    df = packed.to_pandas().sort_values(["conv_id", "turn_idx"], kind="stable")
    rows = []
    ordinal: dict = {}
    for rec in df.itertuples(index=False):
        for line in rec.text.split("\n"):
            i = ordinal.get(rec.conv_id, 0)
            ordinal[rec.conv_id] = i + 1
            rows.append(
                {
                    "conv_id": rec.conv_id,
                    "turn_idx": i,
                    "role": rec.role,
                    "tool": rec.tool,
                    "ts": rec.ts,
                    "text": line,
                }
            )
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def test_split_multiline_turns_report_parity(ray_session):
    """train+report over multiline records with split_multiline_turns=True
    equals the same pipeline over the pre-split per-line input."""
    import pandas.testing as pdt
    import pyarrow.compute as pc
    import ray.data as rd

    from logjuicer_ray.config import PipelineConfig
    from logjuicer_ray.pipelines.report import run_errors_report, run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.synth import generate_turns

    table = generate_turns(0.00005)
    assert not any("\n" in (t or "") for t in table.column("text").to_pylist()[:500])
    base = table.filter(pc.equal(table.column("split"), "baseline")).drop_columns(["split"])
    target = table.filter(pc.equal(table.column("split"), "target")).drop_columns(["split"])

    packed_base, packed_target = _pack_multiline(base), _pack_multiline(target)
    split_base, split_target = _pre_split(packed_base), _pre_split(packed_target)

    cfg_pack = PipelineConfig(split_multiline_turns=True)
    cfg_flat = PipelineConfig()

    model_pack = train(rd.from_arrow(packed_base), cfg_pack)
    model_flat = train(rd.from_arrow(split_base), cfg_flat)
    out_pack = run_report(rd.from_arrow(packed_target), model_pack, cfg_pack)
    out_flat = run_report(rd.from_arrow(split_target), model_flat, cfg_flat)

    for key in ("anomalies", "reports", "unknown"):
        got = out_pack[key].to_pandas().reset_index(drop=True)
        want = out_flat[key].to_pandas().reset_index(drop=True)
        pdt.assert_frame_equal(got, want, check_dtype=False)
    assert len(out_flat["anomalies"].to_pandas()) > 0

    err_pack = run_errors_report(rd.from_arrow(packed_target), cfg_pack)
    err_flat = run_errors_report(rd.from_arrow(split_target), cfg_flat)
    pdt.assert_frame_equal(
        err_pack["anomalies"].to_pandas().reset_index(drop=True),
        err_flat["anomalies"].to_pandas().reset_index(drop=True),
        check_dtype=False,
    )


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
