"""Solr ``/analysis/field`` handler: per-stage token streams.

Solr's field-analysis endpoint (the Admin UI "Analysis" screen posts to
it) shows the token stream AFTER EACH stage of a fieldType's chain — the
tool users reach for when a query unexpectedly misses ("did the stemmer
eat my token? did stop drop it?"). This handler reproduces it for every
chain whose pipeline is the linear Solr-schema shape this engine
registers (tokenize -> [token transform, e.g. elision] -> stop ->
[post-stop transform] -> [stem]; `functions/analysis.py` CHAIN_STAGES):
the built-in text_general / text_en plus every `register_analysis_chain`
fieldType (the 31 configset languages, phonetic_en, text_ws, ...).
Chains whose analysis is not token->token (WDG splitting, CJK/ja/th
bigram fallbacks) have no stage table and fail loud — the composed
result for those is still available through ``analyze_query``.

Response shape (Solr's, trimmed to the fields this engine tracks):

    {"analysis": {"field_types": {<chain>: {"index": [
        ["<stage name>", [{"text": t, "start": s, "end": e,
                           "position": p}, ...]],
        ...]}}}}

Stage names are this engine's (documented deviation: Solr emits Lucene
class names like ``org.apache.lucene.analysis.core.StopFilter``; the
engine's stages are not those classes, and naming them so would claim a
fidelity that isn't there). Offsets are char offsets into the ORIGINAL
text (Solr's start/end), positions are the token indexes BEFORE stop
removal stays (stop-gap positions — the same convention the positional
index uses, `analysis.py` positions_of).
"""

from __future__ import annotations

from typing import Any

from ..functions.analysis import CHAIN_STAGES, QUERY_ANALYZERS

__all__ = ["solr_analyze_field"]


def _tokens_with_offsets(text: str, tre) -> list[dict]:
    out = []
    for pos, m in enumerate(tre.finditer(text.lower())):
        out.append({"text": m.group(0), "start": m.start(),
                    "end": m.end(), "position": pos})
    return out


def solr_analyze_field(fieldtype: str, text: str) -> dict[str, Any]:
    """Run ``text`` through ``fieldtype``'s chain, capturing the stream
    after every stage. See module docstring for the response shape."""
    if fieldtype not in CHAIN_STAGES:
        known = sorted(set(QUERY_ANALYZERS) - set(CHAIN_STAGES))
        raise ValueError(
            f"/analysis/field: no stage table for {fieldtype!r} "
            f"(stage-analyzable: {sorted(CHAIN_STAGES)}; composed-only "
            f"chains: {known})"
        )
    if text is None:
        text = ""
    st = CHAIN_STAGES[fieldtype]
    stages: list[tuple[str, list[dict]]] = []

    # stage 1: tokenizer (the frozen lowercasing regex tokenizer -- the
    # engine lowercases BEFORE tokenizing, so there is no separate LCF
    # stage; the tokenizer stage already shows lowercased text)
    stream = _tokens_with_offsets(text, st["token_re"])
    stages.append(("tokenizer(lowercase)", list(stream)))

    def _apply(stage_name: str, fn) -> None:
        nonlocal stream
        nxt = []
        for t in stream:
            v = fn(t["text"])
            if v:
                nxt.append({**t, "text": v})
        stream = nxt
        stages.append((stage_name, list(stream)))

    if st["token_transform"] is not None:
        _apply("token_transform", st["token_transform"])
    stop = st["stop"]
    if stop:
        _apply("stop", lambda t: None if t in stop else t)
    if st["post_stop_transform"] is not None:
        _apply("post_stop_transform", st["post_stop_transform"])
    if st["stem"] is not None:
        _apply("stem", st["stem"])

    # invariant: the final stage's texts == the composed analyzer's output
    # (same callables, same order) -- checked here so a drift between the
    # stage table and the composed chain can never mislead a user
    composed = QUERY_ANALYZERS[fieldtype](text)
    final = [t["text"] for t in stages[-1][1]]
    if final != composed:
        raise AssertionError(
            f"/analysis/field stage table diverged from the composed "
            f"chain for {fieldtype!r}: {final} != {composed}"
        )

    return {
        "analysis": {
            "field_types": {
                fieldtype: {"index": [[n, toks] for n, toks in stages]}
            }
        }
    }
