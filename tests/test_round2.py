"""Round-2 regression tests: per-anomaly role/tool attribution, byte-capped
long lines, reference-exact UID alternation, crc-collision-safe exact dedup,
deterministic knn tie-breaks."""

from zlib import crc32

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from logjuicer_ray.config import PipelineConfig
from logjuicer_ray.pipelines.report import run_report
from logjuicer_ray.pipelines.train import train
from logjuicer_ray.tokenizer import _uid_regex_match, process


def _turns_table(rows):
    """rows: (conv_id, turn_idx, role, text, tool)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.nulls(len(rows), pa.timestamp("ms")),
        }
    )


class TestMixedRoleAttribution:
    def test_anomaly_carries_its_turns_role_and_tool(self, ray_session):
        """A conversation mixing user/assistant/tool turns: each reported
        anomaly must carry the role/tool of ITS turn, not the conversation's
        first row's (stages/context.py per-anomaly attribution)."""
        base_rows = []
        for role, tool in [("user", ""), ("assistant", ""), ("tool", "bash")]:
            for i in range(40):
                base_rows.append(
                    ("base", len(base_rows), role, f"routine {role} message alpha beta", tool)
                )
        # target: same routine lines per role + one planted anomaly per role
        tgt_rows = []
        idx = 0
        planted = {}
        for role, tool in [("user", ""), ("assistant", ""), ("tool", "bash")]:
            for i in range(10):
                tgt_rows.append(("conv-mixed", idx, role, f"routine {role} message alpha beta", tool))
                idx += 1
            anomaly_text = f"catastrophic {role} explosion unseen words {role}qq zz{role}"
            planted[anomaly_text] = (role, tool, idx)
            tgt_rows.append(("conv-mixed", idx, role, anomaly_text, tool))
            idx += 1
        base = rd.from_arrow(_turns_table(base_rows))
        target = rd.from_arrow(_turns_table(tgt_rows))
        cfg = PipelineConfig()
        model = train(base, cfg)
        out = run_report(target, model, cfg)
        anoms = out["anomalies"].to_pandas()
        assert len(anoms) == 3
        for _, a in anoms.iterrows():
            role, tool, turn = planted[a["text"]]
            assert a["role"] == role, (a["text"], a["role"])
            assert a["tool"] == tool
            assert a["turn_idx"] == turn

    def test_mixed_role_groups_score_against_their_own_index(self, ray_session):
        """role/tool is also the index group: a line routine for role A but
        unseen for role B must be an anomaly when spoken by B."""
        base_rows = [("b", i, "user", "the shared refrain tune", "") for i in range(30)]
        base_rows += [("b2", i, "assistant", "completely different content here", "") for i in range(30)]
        # same text: known for the user group (no anomaly), unseen for the
        # assistant group (anomaly) — per-conversation dedup kept out of the
        # way by using two conversations
        tgt_rows = [
            ("t1", 0, "user", "the shared refrain tune", ""),
            ("t2", 0, "assistant", "the shared refrain tune", ""),
        ]
        base = rd.from_arrow(_turns_table(base_rows))
        target = rd.from_arrow(_turns_table(tgt_rows))
        model = train(base, PipelineConfig())
        out = run_report(target, model, PipelineConfig())
        anoms = out["anomalies"].to_pandas()
        assert list(anoms["conv_id"]) == ["t2"]
        assert list(anoms["role"]) == ["assistant"]


class TestLongLineCap:
    def test_text_column_is_byte_capped_everywhere(self, ray_session):
        """Lines longer than 6000 bytes are truncated at ingest so tokens,
        anomaly text, contexts and byte counters all see the capped line
        (iterator.rs:155-157); a multi-byte char straddling the cut drops."""
        filler = "x" * 5998
        long_line = filler + "éé"  # 6002 bytes: cut lands mid-'é'
        base_rows = [("b", i, "user", "plain baseline line", "") for i in range(20)]
        tgt_rows = [
            ("t", 0, "user", "plain baseline line", ""),
            ("t", 1, "user", long_line, ""),
        ]
        base = rd.from_arrow(_turns_table(base_rows))
        target = rd.from_arrow(_turns_table(tgt_rows))
        model = train(base, PipelineConfig())
        out = run_report(target, model, PipelineConfig())
        anoms = out["anomalies"].to_pandas()
        assert len(anoms) == 1
        got = anoms["text"][0]
        expected = (filler + "éé").encode()[:6000].decode("utf-8", "ignore")
        assert got == expected
        assert len(got.encode()) <= 6000
        # counters use the capped bytes too
        reports = out["reports"].to_pandas()
        assert int(reports["byte_count"][0]) == len("plain baseline line".encode()) + len(
            expected.encode()
        )

    def test_oracle_parity_with_long_lines(self, ray_session):
        from tests._oracle import oracle_report

        filler = "y" * 7000
        base_rows = [("b", i, "user", "common line here", "") for i in range(10)]
        tgt_rows = [("t", i, "user", "common line here", "") for i in range(3)]
        tgt_rows.append(("t", 3, "user", filler + " anomaly tail zzqq", ""))
        base_t = _turns_table(base_rows)
        tgt_t = _turns_table(tgt_rows)
        model = train(rd.from_arrow(base_t), PipelineConfig())
        out = run_report(rd.from_arrow(tgt_t), model, PipelineConfig())
        got = out["anomalies"].to_pandas()
        want, _, _ = oracle_report(base_t, tgt_t)
        assert len(got) == len(want)
        for g, w in zip(got.itertuples(), want):
            assert g.text == w["text"]
            assert g.turn_idx == w["turn_idx"]


class TestUidAlternation:
    def test_latest_none_take_no_separators(self):
        # reference regex: ^(:*[hex]+[:.-]*|latest|none|rabbitmq-...)+$ —
        # separators belong to the hex branch only
        assert not _uid_regex_match("latest-abc".lower() if False else "latest-abc")
        assert not _uid_regex_match("none:")
        assert not _uid_regex_match("latest.")
        assert _uid_regex_match("latest")
        assert _uid_regex_match("none")
        assert _uid_regex_match("abc-latest")  # hex branch eats 'abc-'
        assert _uid_regex_match("latestabc")
        assert _uid_regex_match("abc:")
        assert not _uid_regex_match(":latest")

    def test_fuzz_against_reference_regex(self):
        import random
        import re

        ref = re.compile(
            r"^(:*[\[\]0-9a-fA-FxZ,]+[:.-]*|(latest|none)|rabbitmq-cluster-id-.*)+$"
        )
        random.seed(7)
        alphabet = list("abcf19:.-xZ,[]gL") + ["latest", "none"]
        for _ in range(4000):
            w = "".join(random.choice(alphabet) for _ in range(random.randint(1, 5)))
            assert _uid_regex_match(w) == bool(ref.match(w)), w


class TestExactDedupCollisionSafety:
    @staticmethod
    def _collision_pair():
        seen = {}
        i = 0
        while True:
            s = f"document body number {i} with content"
            h = crc32(s.encode())
            if h in seen and seen[h] != s:
                return seen[h], s
            seen[h] = s
            i += 1

    def test_crc_collision_does_not_drop_distinct_texts(self, ray_session):
        from logjuicer_ray.functions.dedup import exact_dedup

        a, b = self._collision_pair()
        assert a != b and crc32(a.encode()) == crc32(b.encode())
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array([a, b, a, "unique other"], pa.string()),
            }
        )
        out = exact_dedup(rd.from_arrow(docs)).to_pandas().sort_values("doc_id")
        # a (min id 1), b (id 2, same crc but different text), "unique other"
        assert list(out["doc_id"]) == [1, 2, 4]


class TestKnnTieBreak:
    def test_ties_resolve_by_vec_id(self, ray_session):
        from logjuicer_ray.functions.knn import knn_brute_force

        # 40 identical vectors (all cosine ties) spread over several blocks
        vecs = [[1.0, 0.0, 0.0]] * 40
        ids = list(range(100, 140))
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                }
            )
        ).repartition(8)
        out = knn_brute_force(ds, np.array([[1.0, 0.0, 0.0]]), k=5).to_pandas()
        assert list(out["vec_id"]) == [100, 101, 102, 103, 104]
