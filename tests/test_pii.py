"""PII scan: planted-string detection/redaction semantics and the
zero-shuffle plan contract."""

from __future__ import annotations

from gpd_lite_toolbox_spark.text.pii import pii_scan


def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "mail me at jo.doe+spam@sub.example.co.uk or jo@ex.io today"),
        (2, "ssn 123-45-6789 phone 555-867-5309 alt 555.123.4567"),
        (3, "hosts 10.0.0.1 and 192.168.250.3; not 555.123.4567.9999.1"),
        (4, "clean text with numbers 12345 and dots a.b.c"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r.asDict() for r in pii_scan(df).collect()}

    assert out[1]["n_email"] == 2 and out[1]["n_pii"] == 2
    assert "<EMAIL>" in out[1]["text"] and "@" not in out[1]["text"]

    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 2
    assert out[2]["text"] == "ssn <SSN> phone <PHONE> alt <PHONE>"

    assert out[3]["n_ipv4"] >= 2
    assert "10.0.0.1" not in out[3]["text"]
    assert "192.168.250.3" not in out[3]["text"]

    assert out[4]["n_pii"] == 0 and out[4]["text"] == rows[3][1]
    assert out[5]["n_pii"] == 0 and out[5]["text"] == ""


def test_pii_scan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a@b.io")], ["id", "text"])
    plan = pii_scan(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
