"""PII redaction: regex semantics shared by the Spark engine and the
DuckDB oracle (functions/pii.py)."""

from pyspark.sql import functions as F

from apollo_service_spark.functions import pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        pii.count_emails(F.col("text")).alias("e"),
        pii.count_phones(F.col("text")).alias("p"),
        pii.count_ipv4(F.col("text")).alias("i"),
        pii.redact_pii(F.col("text")).alias("r"),
    ).collect()[0]


def test_redacts_all_three_types(spark):
    r = _one(
        spark,
        "mail a.b+c@sub.example.org, call +1-555-012-3456, host 10.0.3.255 end",
    )
    assert (r["e"], r["p"], r["i"]) == (1, 1, 1)
    assert r["r"] == "mail <EMAIL>, call <PHONE>, host <IP> end"


def test_counts_multiple_and_replace_all(spark):
    r = _one(spark, "x@y.com and z@w.net; 1.2.3.4 5.6.7.8")
    assert (r["e"], r["i"]) == (2, 2)
    assert r["r"] == "<EMAIL> and <EMAIL>; <IP> <IP>"


def test_no_false_positives_on_plain_text(spark):
    text = "the quick brown fox jumps over 12 lazy dogs at example.com"
    r = _one(spark, text)
    # bare domain (no local part) and a lone number are not PII
    assert (r["e"], r["p"], r["i"]) == (0, 0, 0)
    assert r["r"] == text


def test_phone_requires_separators_ip_requires_four_octets(spark):
    r = _one(spark, "15550123456 is not a phone; 1.2.3 is not an ip")
    assert (r["p"], r["i"]) == (0, 0)


def test_patterns_identical_in_duckdb(spark):
    """The exact pattern strings must behave the same under DuckDB's RE2 —
    the oracle-gate contract at the unit level."""
    import duckdb

    text = "a@b.co +44-201-555-0199 192.168.0.1 not@an 1.2.3.4.5"
    con = duckdb.connect()
    duck = con.execute(
        "SELECT len(regexp_extract_all($t, $e)), len(regexp_extract_all($t, $p)),"
        " len(regexp_extract_all($t, $i)),"
        " regexp_replace(regexp_replace(regexp_replace($t, $e, '<EMAIL>', 'g'),"
        "   $p, '<PHONE>', 'g'), $i, '<IP>', 'g')",
        {"t": text, "e": pii.EMAIL_PATTERN, "p": pii.PHONE_PATTERN, "i": pii.IPV4_PATTERN},
    ).fetchone()
    con.close()
    r = _one(spark, text)
    assert (r["e"], r["p"], r["i"], r["r"]) == duck


def test_phone_without_country_code(spark):
    """The country group is optional — local 3-group formats redact too
    (review finding r4)."""
    r = _one(spark, "call 555-012-3456 or +1-555-012-3456 today")
    assert r["p"] == 2
    assert r["r"] == "call <PHONE> or <PHONE> today"
