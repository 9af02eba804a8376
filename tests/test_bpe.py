"""BPE tokenizer (functions/text.py): three implementations of one spec
— Catalyst replace-chain, Arrow pandas UDF, driver-side pure Python —
must agree token-for-token, and the spec must behave like textbook BPE
(rank order, exhaustive within the pass bound, merged symbols are atomic).
"""

from pyspark.sql import functions as F

import data_ingestor_py_spark.functions.text as T

ADVERSARIAL = [
    "the then there and in inn",          # chained merges th -> the
    "hahahahaha ththththth",              # adjacent-repeat chains (pass bound)
    "aaaa bbbb anand andand",             # repeats + rule-output adjacency
    "to too tour ou out stand standing",  # prefix collisions st/to/ou
    "x",                                  # single char
    "",                                   # empty text
    "  double  spaces  ",                 # empty split tokens filtered
    "line\nbreak inside",                 # \n inside a token ((?s) dotall)
    "inginginging rerere ererer",         # output symbols re-pairing
    "punctuation, doesn't; stop! 12345",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_catalyst_udf_and_reference_agree(spark):
    df = _df(spark, ADVERSARIAL)
    got = {
        r["doc_id"]: (r["cat"], r["udf"])
        for r in df.select(
            "doc_id",
            T.bpe_token_count("text").alias("cat"),
            T.bpe_token_count_udf()(F.col("text")).alias("udf"),
        ).collect()
    }
    for i, text in enumerate(ADVERSARIAL):
        want = T.bpe_count_reference(text)
        assert got[i] == (want, want), f"{text!r}: {got[i]} != {want}"


def test_merge_semantics_hand_checked():
    # 'the': t+h -> th, th+e -> the => 1 token
    assert T._bpe_count_word("the", T.DEFAULT_BPE_MERGES, 4) == 1
    # 'then': the + n (no rule for (the, n)) => the, n = 2
    assert T._bpe_count_word("then", T.DEFAULT_BPE_MERGES, 4) == 2
    # 'standing': s+t -> st, a+n -> an, an+d -> and? 'st and ing' pieces:
    # s t a n d i n g -> st, and, ing = 3
    assert T._bpe_count_word("standing", T.DEFAULT_BPE_MERGES, 4) == 3
    # rank order matters: 'ina' -> in (rank 3) wins over a+n; i n a -> in, a
    assert T._bpe_count_word("ina", T.DEFAULT_BPE_MERGES, 4) == 2
    # merged symbols are atomic: 'tho' -> th, o (h never re-pairs out of th)
    assert T._bpe_count_word("tho", T.DEFAULT_BPE_MERGES, 4) == 2


def test_adjacent_repeat_chain_reaches_fixpoint():
    # (t,h) occurrences overlap at boundaries in 'ththth...': one replace
    # pass misses every other one; BPE_PASSES=4 must reach the fixpoint
    # for chains far longer than natural words
    for n in range(1, 12):
        w = "th" * n
        assert T._bpe_count_word(w, [("t", "h")], T.BPE_PASSES) == n


def test_unmerged_text_counts_chars(spark):
    # no rule applies to 'zqx': every char is its own token
    assert T.bpe_count_reference("zqx zz") == 5
    got = _df(spark, ["zqx zz"]).select(
        T.bpe_token_count("text").alias("n")
    ).first()["n"]
    assert got == 5


def test_custom_merges_and_null(spark):
    merges = [("a", "b"), ("ab", "c")]
    df = spark.createDataFrame(
        [(0, "abc ab abab"), (1, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["cat"], r["udf"])
        for r in df.select(
            "doc_id",
            T.bpe_token_count("text", merges).alias("cat"),
            T.bpe_token_count_udf(merges)(F.col("text")).alias("udf"),
        ).collect()
    }
    # 'abc'->abc(1), 'ab'->ab(1), 'abab'->ab,ab(2) = 4
    assert got[0] == (4, 4)
    assert got[1] == (0, 0)  # NULL text counts zero in the UDF
    assert T.bpe_count_reference("abc ab abab", merges) == 4


def test_catalyst_plan_stays_jvm_side(spark):
    df = _df(spark, ADVERSARIAL).select(
        T.bpe_token_count("text").alias("n")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
