"""BPE merge training: argmax/tie-break contract, replace-based merge
application (including its documented deviation from skip-scan on
runs >= 4), and the one-corpus-scan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_handler_spark.operators.bpe import bpe_train_merges, word_frequencies


def _docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                 "doc_id long, text string")


def test_first_merge_is_most_frequent_pair(spark):
    docs = _docs(spark, ["abab abab", "abab", "cd"])
    out = bpe_train_merges(docs, n_merges=3).collect()
    # 'abab' x3 contributes pairs: (a,b) x2, (b,a) x1 per word
    assert (out[0]["left"], out[0]["right"], out[0]["pair_freq"]) == ("a", "b", 6)
    # leftmost replace merges the FIRST occurrence only ('ab a b'):
    # the leftover (a,b) x3 ties with (ab,a) x3 and wins on lex order
    assert (out[1]["left"], out[1]["right"], out[1]["pair_freq"]) == ("a", "b", 3)
    # now ' ab ab ' x3: the pair (ab, ab) tops round 3
    assert (out[2]["left"], out[2]["right"]) == ("ab", "ab")
    assert out[2]["merged"] == "abab"


def test_tie_breaks_lexicographic(spark):
    docs = _docs(spark, ["zy xw"])  # pairs (z,y) and (x,w), both freq 1
    out = bpe_train_merges(docs, n_merges=1).collect()
    assert (out[0]["left"], out[0]["right"]) == ("x", "w")


def test_replace_semantics_on_symbol_runs(spark):
    # documented deviation: leftmost non-overlapping replace turns
    # b b b b into [bb, b, b] (the next-round pair (b,b) still exists)
    docs = _docs(spark, ["bbbb"])
    out = bpe_train_merges(docs, n_merges=2).collect()
    assert (out[0]["left"], out[0]["right"], out[0]["pair_freq"]) == ("b", "b", 3)
    # round 2 on ' bb b b ': pairs (bb,b) x1, (b,b) x1 -> tie, (b,b) wins lex
    assert (out[1]["left"], out[1]["right"]) == ("b", "b")


def test_non_alpha_words_excluded(spark):
    docs = _docs(spark, ["ab ab 12 a-b  ab"])
    wf = {r.w: r.freq for r in word_frequencies(docs).collect()}
    assert wf == {"ab": 3}


def test_one_corpus_scan(spark, sf_dir):
    from vector_db_handler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        word_frequencies(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1


def test_segment_words_round_trips_trained_merges(spark):
    from vector_db_handler_spark.operators.bpe import (
        bpe_segment_words,
        word_frequencies,
    )

    docs = _docs(spark, ["ababc ababc", "cd cd cd"])
    merges = [
        (r["left"], r["right"])
        for r in bpe_train_merges(docs, n_merges=3).orderBy("step").collect()
    ]
    seg = {
        r.w: (r.sym.strip(), r.n_tokens)
        for r in bpe_segment_words(word_frequencies(docs), merges).collect()
    }
    # applying the trainer's own merges reproduces its final state:
    # every token count must match a manual replay of the merge list
    def replay(word):
        s = " " + " ".join(word) + " "
        for l, r in merges:
            s = s.replace(f" {l} {r} ", f" {l}{r} ")
        return s.strip(), len(s.split())

    for w in ("ababc", "cd"):
        assert seg[w] == replay(w), (w, seg[w], replay(w), merges)
