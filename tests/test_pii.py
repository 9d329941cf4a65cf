"""PII detection/redaction goldens (operators/pii.py).

The oracle-parity suite hash-checks the declared query end-to-end;
these goldens pin the per-pattern semantics on adversarial literals —
overlap precedence (SSN vs phone), multi-match counting, idempotence,
and clean-text passthrough."""

from __future__ import annotations

from play_with_pulsar_spark.operators import pii


def _scan(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in pii.scan_pii(df).collect()}


def test_scan_pii_planted_golden(spark):
    out = _scan(
        spark,
        [
            (1, "mail jane.doe+x@sub.example.org today"),
            (2, "call 415-555-0042 or 212.555.9999"),
            (3, "host 192.168.1.254 ssn 123-45-6789"),
            (4, "nothing sensitive here"),
        ],
    )
    assert (out[1]["n_email"], out[1]["pii_total"]) == (1, 1)
    assert out[1]["redacted"] == "mail <EMAIL> today"
    # both dash- and dot-joined 3-3-4 runs are phones, not IPs
    assert (out[2]["n_phone"], out[2]["n_ipv4"]) == (2, 0)
    assert out[2]["redacted"] == "call <PHONE> or <PHONE>"
    assert (out[3]["n_ipv4"], out[3]["n_ssn"], out[3]["n_phone"]) == (1, 1, 0)
    assert out[3]["redacted"] == "host <IPV4> ssn <SSN>"
    assert out[4]["pii_total"] == 0
    assert out[4]["redacted"] == "nothing sensitive here"


def test_ssn_phone_precedence(spark):
    """3-2-4 digit runs are SSNs; the 3-3-4 phone pattern must not
    half-eat them (ordering is part of the operator contract)."""
    out = _scan(spark, [(1, "987-65-4321 then 987-654-4321")])
    assert (out[1]["n_ssn"], out[1]["n_phone"]) == (1, 1)
    assert out[1]["redacted"] == "<SSN> then <PHONE>"


def test_redaction_idempotent(spark):
    """Placeholders contain no digits or '@', so a second redaction
    pass is a no-op — the shipped corpus can be re-screened safely."""
    df = spark.createDataFrame(
        [(1, "a@b.io 10.0.0.1 415-555-0042 987-65-4321")], "doc_id long, text string"
    )
    once = pii.scan_pii(df).select("doc_id", "redacted")
    twice = pii.scan_pii(once.withColumnRenamed("redacted", "text"))
    row = twice.collect()[0]
    assert row["pii_total"] == 0
    assert row["redacted"] == once.collect()[0]["redacted"]
