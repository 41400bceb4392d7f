"""Text-stats operator semantics: keyword matching, sanitizers."""

from pyspark.sql import functions as F

from apollo_service_spark.functions import textstats, urlkit


def test_keyword_match_counts_loose_vs_strict(spark):
    """loose = substring, strict = word-boundary AND loose — the reference's
    has_loose_match / has_word_match pair (fb_scrape_service.py:155-177)."""
    posts = spark.createDataFrame(
        [
            ("the window slides",),    # loose 'win' (substring), not strict
            ("we win today",),         # loose + strict 'win'
            ("nothing relevant",),
            (None,),                   # null text matches nothing
        ],
        "text string",
    )
    out = {
        r["keyword"]: (r["loose_matches"], r["strict_matches"])
        for r in textstats.keyword_match_counts(
            posts, F.col("text"), ["win", "slid"]
        ).collect()
    }
    assert out["win"] == (2, 1)
    assert out["slid"] == (1, 0)


def test_keyword_match_counts_escapes_metacharacters(spark):
    """'a.b' must match only the literal 'a.b' (re.escape parity,
    fb_scrape_service.py:186) — unescaped it would also match 'axb'."""
    posts = spark.createDataFrame(
        [("contains a.b literal",), ("contains axb imposter",)],
        "text string",
    )
    out = {
        r["keyword"]: (r["loose_matches"], r["strict_matches"])
        for r in textstats.keyword_match_counts(
            posts, F.col("text"), ["a.b"]
        ).collect()
    }
    assert out["a.b"] == (1, 1)


def test_categorize_post_escapes_metacharacters(spark):
    cats = {"dotted": ["a.b"], "parens": ["x(y)"]}
    df = spark.createDataFrame(
        [("has a.b here",), ("has axb here",), ("",)], "text string"
    )
    got = [
        r["c"]
        for r in df.select(
            textstats.categorize_post(F.col("text"), cats).alias("c")
        ).collect()
    ]
    assert got == ["dotted", "other", "uncategorized"]


def test_sanitize_filename_spark_matches_python(spark):
    names = [
        'report<2024>:"final"',
        "a/b\\c|d?e*f",
        "clean-name.txt",
        "",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r["name"]: r["out"]
        for r in df.select(
            "name", urlkit.sanitize_filename(F.col("name")).alias("out")
        ).collect()
    }
    for n in names:
        assert got[n] == urlkit.sanitize_filename_py(n), n
    assert got['report<2024>:"final"'] == "report_2024___final_"
