"""PII redaction: pattern semantics, rule order, count/replace pairing,
and the cross-engine dialect restriction (Java regex vs RE2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.redaction import PII_RULES, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return redact_pii(df).collect()[0]


def test_each_class_detected_and_replaced(spark):
    r = _one(
        spark,
        "mail a.b+c@ex-ample.co.uk host 192.168.0.1 ssn 123-45-6789 tel 555-123-4567",
    )
    assert (r.n_email, r.n_ipv4, r.n_ssn, r.n_phone) == (1, 1, 1, 1)
    assert r.redacted == "mail <EMAIL> host <IP> ssn <SSN> tel <PHONE>"


def test_email_consumes_dotted_numeric_host_before_ip_rule(spark):
    # rule ORDER contract: a numeric-dotted mail host must be consumed
    # by the email token — the IP rule alone would have matched the
    # embedded 127.0.0.1 and split the address
    r = _one(spark, "x bob@127.0.0.1.mx y")
    assert r.redacted == "x <EMAIL> y"
    assert r.n_email == 1


def test_ssn_and_phone_shapes_do_not_cross_match(spark):
    r = _one(spark, "a 123-45-6789 b 123-456-7890 c")
    assert (r.n_ssn, r.n_phone) == (1, 1)
    assert r.redacted == "a <SSN> b <PHONE> c"


def test_word_boundaries_guard_partial_numbers(spark):
    # longer digit runs must NOT match the bounded patterns
    r = _one(spark, "id 1234-45-6789 ip 1192.168.0.1234 ok 10.0.0.1")
    assert r.n_ssn == 0 and r.n_ipv4 == 1
    assert "<IP>" in r.redacted and "<SSN>" not in r.redacted


def test_clean_text_passes_through_unchanged(spark):
    r = _one(spark, "nothing personal here")
    assert r.redacted == "nothing personal here"
    assert (r.n_email, r.n_ipv4, r.n_ssn, r.n_phone) == (0, 0, 0, 0)


def test_rules_use_portable_regex_subset():
    # no backreferences / lookaround — the RE2-compatible contract
    for _, pattern, _tok in PII_RULES:
        assert "(?=" not in pattern and "(?!" not in pattern
        assert "\\1" not in pattern


def test_redaction_is_pure_projection(spark, sf_dir):
    from vector_db_handler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = (
        redact_pii(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "redaction must not shuffle"
