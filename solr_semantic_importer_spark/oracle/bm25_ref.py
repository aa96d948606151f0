"""Pure-Python/numpy BM25 reference implementation (the parity oracle).

Defines "the reference semantics" our Spark engine must be rank-identical to
(SURVEY.md section 5.2): Lucene-default BM25 as installed by the importer's
configsets -- no <similarity> override in either solrconfig.xml and
luceneMatchVersion 9.10 (default-base-config/solrconfig.xml:38) implies
BM25Similarity(k1=1.2, b=0.75) with

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

Documented deviation (SURVEY.md section 2.7 I2): Lucene quantizes dl to one
byte; we define the semantics with EXACT dl, computed in float64. Sort order:
score desc, doc_id asc (Solr's internal-docid tie-break, SURVEY O2).

q.op=OR (solr9_response.json:9): a document matches if it contains ANY query
term; scores sum over matching terms.
"""

from __future__ import annotations

import math
from collections import Counter

from ..functions.analysis import expand_query_terms

K1 = 1.2
B = 0.75


class BM25Oracle:
    """In-memory index over a list of (doc_id, text) pairs.

    ``analyzer``: "text_general" (default) or "text_en" -- shares the SAME
    analysis functions as the engine (functions/analysis.py), so chain
    disagreement is impossible by construction."""

    def __init__(
        self, docs: list[tuple[int, str | None]], analyzer: str = "text_general"
    ):
        from ..functions.analysis import POSITION_ANALYZERS, QUERY_ANALYZERS

        self._terms_of = QUERY_ANALYZERS[analyzer]
        posmap_of = POSITION_ANALYZERS[analyzer]
        self.doc_ids = [d for d, _ in docs]
        self.tfs: dict[int, Counter] = {}
        self.positions: dict[int, dict[str, list[int]]] = {}
        self.dl: dict[int, int] = {}
        self.df: Counter = Counter()
        for doc_id, text in docs:
            pos = posmap_of(text)
            self.positions[doc_id] = pos
            c = Counter({t: len(ps) for t, ps in pos.items()})
            self.tfs[doc_id] = c
            self.dl[doc_id] = sum(c.values())
            for t in c:
                self.df[t] += 1
        self.n = len(docs)
        self.avgdl = (sum(self.dl.values()) / self.n) if self.n else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score_doc(self, doc_id: int, terms: list[str]) -> float:
        s = 0.0
        dl = self.dl[doc_id]
        norm = K1 * (1.0 - B + B * (dl / self.avgdl if self.avgdl else 0.0))
        tf = self.tfs[doc_id]
        for t in terms:
            f = tf.get(t, 0)
            if f:
                s += self.idf(t) * f * (K1 + 1.0) / (f + norm)
        return s

    def search(
        self,
        query: str,
        k: int = 10,
        op: str = "OR",
        synonyms: bool = False,
        allowed: set[int] | None = None,
    ) -> list[tuple[int, float]]:
        terms = self._terms_of(query)
        if synonyms:
            terms = expand_query_terms(terms)
        terms = list(dict.fromkeys(terms))
        if not terms:
            return []
        cands: set[int] | None = None
        for t in terms:
            has = {d for d, c in self.tfs.items() if t in c}
            if op == "AND":
                cands = has if cands is None else (cands & has)
            else:
                cands = has if cands is None else (cands | has)
        cands = cands or set()
        if allowed is not None:
            cands &= allowed
        scored = [(d, self.score_doc(d, terms)) for d in cands]
        scored.sort(key=lambda x: (-round(x[1], 6), x[0]))
        return scored[:k]

    def search_phrase(
        self, phrase: str, k: int = 10, allowed: set[int] | None = None
    ) -> list[tuple[int, float]]:
        """Lucene PhraseQuery-under-BM25: freq = #occurrences of the exact
        consecutive term sequence; idf weight = sum of term idfs."""
        terms = list(self._terms_of(phrase))
        if not terms:
            return []
        if len(terms) == 1:
            return self.search(phrase, k=k, allowed=allowed)
        # Lucene sums idf over the phrase's term array (duplicates counted)
        idf_sum = sum(self.idf(t) for t in terms)
        scored = []
        for d in self.doc_ids:
            if allowed is not None and d not in allowed:
                continue
            pos = self.positions[d]
            if any(t not in pos for t in terms):
                continue
            starts = set(pos[terms[0]])
            for j, t in enumerate(terms[1:], start=1):
                starts &= {p - j for p in pos[t]}
                if not starts:
                    break
            freq = len(starts)
            if not freq:
                continue
            dl = self.dl[d]
            denom = freq + K1 * (1.0 - B + B * (dl / self.avgdl if self.avgdl else 0.0))
            scored.append((d, idf_sum * freq * (K1 + 1.0) / denom))
        scored.sort(key=lambda x: (-round(x[1], 6), x[0]))
        return scored[:k]
