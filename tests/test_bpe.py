"""BPE tokenizer training/encoding tests (functions/bpe.py).

The hard value oracle for ``initial_pair_counts`` runs in the
auto-discovered parity sweep (``bpe_pair_counts_docs``); here we verify the
merge loop against an INDEPENDENT naive sequential implementation
(recount-everything-per-merge, Sennrich et al. 2016 Fig. 1 style), the
driver/distributed path equality, partition invariance, and encode
semantics (lossless roundtrip, memo correctness).
"""

import pyarrow as pa
import pytest

from logjuicer_ray.functions.bpe import (
    END,
    _MergeApplier,
    bpe_encode,
    bpe_train,
    initial_pair_counts,
    word_frequencies,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest",
    "",          # empty doc: contributes nothing
    None,        # NULL doc: contributes nothing
    "  spaced   out   tokens  ",
]


def _naive_bpe(word_counts: dict, num_merges: int, min_count: int):
    """Naive reference: full recount per merge (no incremental updates)."""
    vocab = {tuple(w) + (END,): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((pair[0], pair[1], cnt))
        merged = pair[0] + pair[1]
        new_vocab = {}
        for syms, c in vocab.items():
            i, out = 0, []
            while i < len(syms):
                if (i < len(syms) - 1
                        and syms[i] == pair[0] and syms[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _word_counts(corpus):
    wc = {}
    for doc in corpus:
        for w in (doc or "").split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def _docs(corpus=CORPUS):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(corpus)), pa.int64()),
        "text": pa.array(corpus, pa.string()),
    }))


@pytest.fixture(scope="module")
def trained(ray_session):
    return bpe_train(_docs(), num_merges=25, min_count=2)


def test_word_frequencies(ray_session):
    got = {r["word"]: r["cnt"] for r in word_frequencies(_docs()).take_all()}
    assert got == _word_counts(CORPUS)


def test_initial_pair_counts(ray_session):
    got = {(r["lhs"], r["rhs"]): r["pair_count"]
           for r in initial_pair_counts(_docs()).take_all()}
    want = {}
    for w, c in _word_counts(CORPUS).items():
        syms = tuple(w) + (END,)
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            want[p] = want.get(p, 0) + c
    assert got == want


def test_train_matches_naive_reference(trained):
    want = _naive_bpe(_word_counts(CORPUS), num_merges=25, min_count=2)
    got = list(zip(trained.column("lhs").to_pylist(),
                   trained.column("rhs").to_pylist(),
                   trained.column("pair_count").to_pylist()))
    assert got == want
    assert trained.column("rank").to_pylist() == list(range(len(want)))
    # sanity: the classic corpus learns 'low' and 'est</w>' early
    joined = {l + r for l, r, _ in got}
    assert "lo" in joined or "low" in joined


def test_distributed_path_identical(ray_session, trained):
    # force the distributed merge loop (vocab never fits 0 rows)
    dist = bpe_train(_docs(), num_merges=25, min_count=2,
                     driver_vocab_rows=0)
    assert dist.equals(trained)


def test_partition_invariance(ray_session, trained):
    repart = bpe_train(_docs().repartition(7), num_merges=25, min_count=2)
    assert repart.equals(trained)


def test_encode_roundtrip_and_memo(ray_session, trained):
    out = bpe_encode(_docs(), trained).to_pandas().set_index("doc_id")
    for i, doc in enumerate(CORPUS):
        words = (doc or "").split()
        symbols = out.loc[i, "bpe_text"].split() if out.loc[i, "bpe_text"] else []
        # lossless: stripping markers and re-joining reconstructs the doc's words
        rebuilt = "".join(symbols).replace(END, " ").split()
        assert rebuilt == words, (i, doc, symbols)
        assert out.loc[i, "n_bpe_tokens"] == len(symbols)
        # every word ends with an end-marker-bearing symbol
        assert "".join(symbols).count(END) == len(words)


def test_encode_against_applier(trained):
    # the dictionary-encode path must equal direct per-word application
    applier = _MergeApplier(list(zip(trained.column("lhs").to_pylist(),
                                     trained.column("rhs").to_pylist())))
    assert applier("lowest") == applier("lowest")  # memo stability
    fresh = _MergeApplier(list(zip(trained.column("lhs").to_pylist(),
                                   trained.column("rhs").to_pylist())))
    for w in ["low", "lower", "newest", "widest", "unseen", "xyzzy"]:
        assert applier(w) == fresh(w)
        assert "".join(applier(w)) == w + END


def test_min_count_stops_early(ray_session):
    # a corpus where every pair occurs once: min_count=2 learns nothing
    docs = _docs(["ab cd", "ef gh"])
    t = bpe_train(docs, num_merges=10, min_count=3)
    assert t.num_rows == 0
