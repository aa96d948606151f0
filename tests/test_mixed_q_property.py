"""Randomized differential test for mixed boolean queries: 60 seeded random
(terms + phrases, op/mm/slop) combinations checked against an independent
pure-Python reference that computes match sets from the raw texts --
phrase-clause membership via exhaustive alignment enumeration (no greedy
logic shared with the engine), clause counting per the documented rule
(a doc matches >=1 clause under OR, >=mm with minimum-should-match, all
clauses under AND)."""

import itertools

import numpy as np
import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index

VOCAB = ["red", "blue", "green", "gold", "iron", "clay", "wolf", "moon"]


def _texts(rng, n):
    out = []
    for _ in range(n):
        k = int(rng.integers(3, 12))
        out.append(" ".join(VOCAB[int(i)] for i in rng.integers(0, len(VOCAB), k)))
    return out


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    import pandas as pd
    rng = np.random.default_rng(91)
    texts = _texts(rng, 60)
    rows = [
        {"conv_id": f"c{i:03d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": None, "ts": pd.Timestamp(1704067200 + i * 60, unit="s")}
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    idx_dir = str(tmp_path_factory.mktemp("mixprop"))
    build_index(spark, df, idx_dir,
                BuildConfig(build_id="mp", segment_size=16, block_size=8))
    return texts, BM25Index(spark, idx_dir)


def _phrase_hits(tokens, terms, slop):
    """Independent: does ANY alignment of `terms` fit within slop?"""
    plists = []
    for j, t in enumerate(terms):
        ps = [i - j for i, tok in enumerate(tokens) if tok == t]
        if not ps:
            return False
        plists.append(ps)
    return any(
        max(c) - min(c) <= slop for c in itertools.product(*plists)
    )


def test_mixed_match_sets_random(corpus):
    texts, idx = corpus
    tok_docs = [t.split() for t in texts]
    rng = np.random.default_rng(5)
    for trial in range(60):
        n_terms = int(rng.integers(0, 3))
        n_phrases = int(rng.integers(1, 3))
        if n_terms == 0 and n_phrases < 2:
            n_phrases = 2  # ensure the MIXED path (not the lone-phrase route)
        terms = [VOCAB[int(i)] for i in rng.integers(0, len(VOCAB), n_terms)]
        terms = list(dict.fromkeys(terms))
        phrases = []
        for _ in range(n_phrases):
            plen = int(rng.integers(2, 4))
            ph = [VOCAB[int(i)] for i in rng.integers(0, len(VOCAB), plen)]
            phrases.append((ph, int(rng.integers(0, 4))))
        op = "AND" if rng.random() < 0.3 else "OR"
        mm = int(rng.integers(2, 4)) if (op == "OR" and rng.random() < 0.4) else None

        q = " ".join(
            terms
            + [f'"{" ".join(p)}"' + (f"~{s}" if s else "") for p, s in phrases]
        )
        n_clauses = len(terms) + len(phrases)

        want = set()
        for d, toks in enumerate(tok_docs):
            nc = sum(t in toks for t in terms)
            nc += sum(_phrase_hits(toks, p, s) for p, s in phrases)
            if op == "AND":
                ok = nc == n_clauses
            elif mm is not None:
                ok = nc >= min(mm, n_clauses) and nc >= mm
            else:
                ok = nc >= 1
            if ok:
                want.add(d)
        if mm is not None and mm > n_clauses:
            want = set()

        got = {
            int(r["doc_id"])
            for r in idx._matched_ids(q, op=op, mm=mm).collect()
        }
        assert got == want, (
            f"trial={trial} q={q!r} op={op} mm={mm} "
            f"missing={want - got} extra={got - want}"
        )
