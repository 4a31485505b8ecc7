"""Caller-parameterized stop-list tests (r14): the Gopher screen's
rule 7 and the boilerplate density rescue take the stop list as caller
data (multilingual corpora), defaults unchanged."""

from __future__ import annotations

from tax_compliance_engine_spark.operators import textops


def test_rule_quality_screen_caller_stopwords(spark):
    """Gopher rule 7 with a caller stop list: a German document clears
    the >= 2 distinct-stop-words rule under a German list but not the
    English default; all other rule signals identical (only the stop
    rule reads the list)."""
    german = ["der", "die", "das", "und", "ist", "ein", "zu", "mit"]
    words = ("das ist ein langes deutsches Dokument und die Pruefung "
             "zeigt dass die Regeln mit einer Liste arbeiten ")
    text = (words * 5).strip()
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    de = textops.rule_quality_screen(docs, stopwords=german).collect()[0]
    en = textops.rule_quality_screen(docs).collect()[0]
    assert de.rule_stopwords and de.n_stop_hits >= 2
    assert not en.rule_stopwords
    assert de.n_words == en.n_words
    assert de.rules_passed == en.rules_passed + 1
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        textops.rule_quality_screen(docs, stopwords=[])
