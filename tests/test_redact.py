"""PII redaction: placeholder substitution, audit counts, order semantics."""

from pyspark.sql import functions as F

from solr_semantic_importer_spark.operators.redact import pii_counts, redact_pii


def test_redact_and_counts(spark):
    rows = [
        (0, "mail me at a.b+c@test.org or 192.168.0.1"),
        (1, "call +1 415 555 0199 now"),
        (2, "clean text, no pii here"),
        (3, "two mails x@y.io z@w.co and ip 10.0.0.7"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    c = pii_counts(F.col("t"))
    out = {
        r["id"]: r
        for r in df.select(
            "id", redact_pii(F.col("t")).alias("clean"),
            *[v.alias(k) for k, v in c.items()],
        ).collect()
    }
    assert out[0]["clean"] == "mail me at <EMAIL> or <IP>"
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 1, 0)
    assert out[1]["clean"] == "call <PHONE> now"
    assert out[1]["n_phone"] == 1
    assert out[2]["clean"] == rows[2][1]  # untouched
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[3]["n_email"] == 2 and out[3]["n_ipv4"] == 1


def test_ip_adjacent_to_cjk_is_redacted(spark):
    # Java's \b is Unicode-aware (no boundary between 京 and 1), so a
    # boundary-anchored pattern would LEAK this IP on the Spark side while
    # the RE2 oracle caught it; the boundary-free pattern redacts it and
    # behaves identically in both engines
    df = spark.createDataFrame([(0, "東京10.0.3.7 です")], "id long, t string")
    r = df.select(redact_pii(F.col("t")).alias("c")).collect()[0]
    assert r["c"] == "東京<IP> です"


def test_unknown_kind_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(F.col("t"), kinds=("email", "ip"))


def test_email_digits_not_double_counted_as_phone(spark):
    # the email is redacted before the phone pattern runs, so its digit
    # run never registers as a phone
    df = spark.createDataFrame([(0, "reach 123456789012@corp.example")], "id long, t string")
    c = pii_counts(F.col("t"))
    r = df.select(*[v.alias(k) for k, v in c.items()]).collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 0
