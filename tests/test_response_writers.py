"""Response writers: wt=json/xml/csv serializations of the /select dict."""

import csv as _csv
import io
import json
import xml.etree.ElementTree as ET

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.response_writers import render_response
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def resp(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=20, turns_per_conv=4, seed=43)
    d = str(tmp_path_factory.mktemp("wt"))
    build_index(spark, df, d, BuildConfig(build_id="wt", **CFG))
    idx = BM25Index(spark, d)
    return solr_select(idx, {
        "q": "error", "rows": 3, "facet": "true", "facet.field": "role",
    })


def test_wt_json_roundtrips(resp):
    out = json.loads(render_response(resp, "json"))
    assert out["response"]["numFound"] == resp["response"]["numFound"]
    assert [d["doc_id"] for d in out["response"]["docs"]] == \
        [d["doc_id"] for d in resp["response"]["docs"]]


def test_wt_xml_shape(resp):
    root = ET.fromstring(render_response(resp, "xml"))
    assert root.tag == "response"
    result = root.find("./result[@name='response']")
    assert int(result.get("numFound")) == resp["response"]["numFound"]
    docs = result.findall("doc")
    assert len(docs) == len(resp["response"]["docs"])
    # typed leaves: doc_id is a numeric element named doc_id
    first = docs[0]
    el = first.find("*[@name='doc_id']")
    assert el.tag in ("int", "long")
    assert int(el.text) == resp["response"]["docs"][0]["doc_id"]
    # facet section survives as nested lst
    assert root.find("./lst[@name='facet_counts']") is not None


def test_wt_csv_parses(resp):
    out = render_response(resp, "csv")
    rows = list(_csv.reader(io.StringIO(out)))
    header, data = rows[0], rows[1:]
    assert "doc_id" in header and len(data) == len(resp["response"]["docs"])
    i = header.index("doc_id")
    assert [int(r[i]) for r in data] == \
        [d["doc_id"] for d in resp["response"]["docs"]]


def test_wt_unknown_fails(resp):
    with pytest.raises(ValueError):
        render_response(resp, "python")
