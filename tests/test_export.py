"""Training-corpus export plan: ok-filter, annotation gates, exact dedup,
near-dup drop composition (plans/export.py)."""

from __future__ import annotations

from scrape_spark.plans.export import annotate, export_corpus

GOOD = (
    "The quick brown fox jumps over the lazy dog and the dog is not amused. "
) * 10  # long, wordy english → high quality


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key long, content_text string, status_code int"
    )


def test_export_gates_and_exact_dedup(spark):
    df = _df(
        spark,
        [
            (1, GOOD, 200),
            (2, GOOD, 200),          # byte-duplicate → dropped (min id kept)
            (3, "x", 200),           # too short → quality gate
            (4, GOOD + "tail", 200),  # distinct text survives
            (5, GOOD, 404),          # fetch error → ok-filter
            (6, None, 200),          # no text → ok-filter
        ],
    )
    out = export_corpus(df, min_quality=0.5)
    rows = {r.key: r for r in out.collect()}
    assert set(rows) == {1, 4}
    assert rows[1].lang == "en"
    assert rows[1].n_tokens == 150
    assert 0.0 <= rows[1].quality <= 1.0


def test_export_lang_filter(spark):
    es = ("el perro y los gatos de las casas y el sol y los rios de la mar. ") * 10
    df = _df(spark, [(1, GOOD, 200), (2, es, 200)])
    assert {r.key for r in export_corpus(df, langs=["es"]).collect()} == {2}
    assert {r.key for r in export_corpus(df, langs=["en", "es"]).collect()} == {1, 2}


def test_export_neardup_minhash_drops_losers(spark):
    near = GOOD + "one extra sentence changes almost nothing here today."
    df = _df(spark, [(1, GOOD, 200), (2, near, 200), (3, "totally different "
                                                      "content about spark "
                                                      "partitions and shuffles "
                                                      "at scale " * 8, 200)])
    out = export_corpus(df, neardup="minhash", threshold=0.5)
    keys = {r.key for r in out.collect()}
    assert keys == {1, 3}  # 2 is a near-dup of 1 → min-id representative kept


def test_annotate_is_pure_projection(spark):
    """No shuffle in the annotation stage: the plan has no Exchange."""
    df = _df(spark, [(1, GOOD, 200)])
    plan = annotate(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_token_count_ws_equals_word_split(spark):
    """regexp_count('\\S+') must equal size(filter(split(trim)))) for every
    string — the codegen-friendly rewrite may not drift from the oracle's
    split semantics (adversarial cases: empty, spaces-only, leading/
    trailing/mixed whitespace, tabs/newlines, unicode, null)."""
    from pyspark.sql import functions as F

    from scrape_spark.functions.textstats import token_count_ws, words

    cases = ["", " ", "   ", "a", " a ", "a b", "a  b", "\ta\nb\r c ",
             "éé ü 中文 字", "ab", ".,;", "a " * 100, None]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    rows = df.select(
        "t",
        token_count_ws("t").alias("fast"),
        F.size(words("t")).alias("ref"),
    ).collect()
    for r in rows:
        if r.t is None:
            assert r.fast is None or r.fast == -1  # matches size(null) behavior
        else:
            assert r.fast == r.ref, r.t


def test_annotate_stays_in_whole_stage_codegen(spark):
    """The annotation projection (the export hot path) must sit inside a
    WholeStageCodegen span — the reason token_count_ws avoids higher-order
    functions."""
    from scrape_spark.plans.export import annotate

    df = spark.createDataFrame([(1, "the quick brown fox", 200)],
                               "key long, content_text string, status_code int")
    plan = annotate(df)._jdf.queryExecution().executedPlan().toString()
    assert "*(" in plan
