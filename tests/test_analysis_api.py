"""/analysis/field handler (query/analysis_api.py): per-stage token
streams for built-in and configset language chains, offset/position
integrity, and the composed-chain invariant."""

import pytest

from solr_semantic_importer_spark.functions.lang_chains import (
    register_language_chains,
)
from solr_semantic_importer_spark.query.analysis_api import solr_analyze_field

REF_LANG = "/root/reference/src/main/resources/default-base-config/lang"


def _stages(resp, chain):
    return dict(resp["analysis"]["field_types"][chain]["index"])


def test_text_general_tokenizer_stage_only():
    resp = solr_analyze_field("text_general", "Hello, World! 42")
    st = _stages(resp, "text_general")
    assert list(st) == ["tokenizer(lowercase)"]
    toks = st["tokenizer(lowercase)"]
    assert [(t["text"], t["position"]) for t in toks] == [
        ("hello", 0), ("world", 1), ("42", 2)]
    # offsets index the ORIGINAL text
    assert toks[0]["start"] == 0 and toks[0]["end"] == 5
    assert toks[1]["start"] == 7 and toks[1]["end"] == 12


def test_text_en_stop_and_stem_stages():
    resp = solr_analyze_field("text_en", "the running tables")
    st = _stages(resp, "text_en")
    assert list(st) == ["tokenizer(lowercase)", "stop", "stem"]
    assert [t["text"] for t in st["tokenizer(lowercase)"]] == [
        "the", "running", "tables"]
    # 'the' dropped by stop; positions keep the stop gap
    assert [(t["text"], t["position"]) for t in st["stop"]] == [
        ("running", 1), ("tables", 2)]
    assert [t["text"] for t in st["stem"]] == ["run", "tabl"]


def test_french_chain_elision_and_minimal_stem():
    register_language_chains(REF_LANG)
    resp = solr_analyze_field("text_fr", "L'avion des chevaux")
    st = _stages(resp, "text_fr")
    names = list(st)
    assert names[0] == "tokenizer(lowercase)" and "stop" in names
    final = [t["text"] for t in st[names[-1]]]
    # composed-chain invariant is asserted inside the handler; spot-check
    # the retrieval-effect essentials: stopwords gone, stem applied
    assert "des" not in final and "l" not in final
    assert any(t.startswith("cheva") for t in final)


def test_unknown_and_nonlinear_chains_fail_loud():
    with pytest.raises(ValueError, match="no stage table"):
        solr_analyze_field("text_en_splitting", "Wi-Fi")
    with pytest.raises(ValueError, match="no stage table"):
        solr_analyze_field("nope", "x")


def test_empty_and_none_text():
    resp = solr_analyze_field("text_en", "")
    st = _stages(resp, "text_en")
    assert all(toks == [] for toks in st.values())
    assert solr_analyze_field("text_en", None)


def test_analysis_field_arabic_persian_stages():
    # the ar/fa chains register token/post-stop transforms — the stage
    # table must exist and agree with the composed analyzer (the handler
    # asserts the invariant internally)
    from solr_semantic_importer_spark.functions.lang_chains import (
        register_language_chains,
    )
    from solr_semantic_importer_spark.query.analysis_api import (
        solr_analyze_field,
    )
    register_language_chains(
        "/root/reference/src/main/resources/default-base-config/lang",
        languages=["ar", "fa"], prefix="aa_", overwrite=True)
    r = solr_analyze_field("aa_ar", "والكتاب الكبير")
    names = [n for n, _ in r["analysis"]["field_types"]["aa_ar"]["index"]]
    assert names == ["tokenizer(lowercase)", "stop",
                     "post_stop_transform", "stem"]
    final = r["analysis"]["field_types"]["aa_ar"]["index"][-1][1]
    assert any(t["text"] == "كتاب" for t in final)  # wal- stripped
    r2 = solr_analyze_field("aa_fa", "كتابي")
    stages = dict(r2["analysis"]["field_types"]["aa_fa"]["index"])
    assert stages["token_transform"][0]["text"] == "کتابی"
