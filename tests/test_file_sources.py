"""TSV (MS MARCO-shaped) + seed JSON sources (SURVEY S6/S7)."""

import os

from solr_semantic_importer_spark.sources.files import msmarco_tsv, seed_json


def test_msmarco_tsv_roundtrip(spark, tmp_path):
    p = tmp_path / "docs.tsv"
    rows = [
        ("D1", "http://a", "Title One", "body text one"),
        ("D2", "http://b", "Title Two", "body\ttext two has no tab actually"),
        ("D3", "http://c", "Title Three", "third body"),
    ]
    with open(p, "w") as f:
        f.write("D0\tmalformed-row-with-too-few-cols\n")  # dropped
        for r in rows[:2]:
            f.write("\t".join(r[:3]) + "\t" + r[3].replace("\t", " ") + "\n")
        f.write("\t".join(rows[2]) + "\n")
    df = msmarco_tsv(spark, str(p))
    got = sorted((r["docid"], r["title"]) for r in df.collect())
    assert got == [("D1", "Title One"), ("D2", "Title Two"), ("D3", "Title Three")]
    assert df.columns == ["docid", "url", "title", "body"]


def test_seed_json_strips_internal(spark, tmp_path):
    p = tmp_path / "seed.json"
    p.write_text(
        '[{"id": "a", "title": "t1", "_version_": 123},'
        ' {"id": "b", "title": "t2", "_version_": 456}]'
    )
    df = seed_json(spark, str(p))
    assert "_version_" not in df.columns
    assert sorted(r["id"] for r in df.collect()) == ["a", "b"]
