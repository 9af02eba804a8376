"""Round-4 text-pipeline operators: Gopher-style repetition metrics, PII
redaction, and temperature-weighted domain mixture sampling — checked
against independent Python references and for their at-scale plan shapes."""

import re
from collections import Counter

from pyspark.sql import functions as F

from data_ingestor_py_spark.functions.text import (
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    mixture_sample,
    redact_pii,
    repetition_metrics,
)


def _py_repetition(text, line_len=10):
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    grams = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)] if n >= 2 else []
    top2 = max(Counter(grams).values()) if grams else 0
    n_lines = -(-n // line_len)
    lines = [" ".join(toks[i * line_len:(i + 1) * line_len]) for i in range(n_lines)]
    dup = n_lines - len(set(lines))
    nd = len(set(toks))
    flag = (top2 * 5 > len(grams)) or (dup * 10 > n_lines * 3) or (nd * 5 < n)
    return (n, len(grams), top2, n_lines, dup, nd, flag)


def test_repetition_metrics_vs_python(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        n, g, top2, nl, dup, nd, flag = _py_repetition(r["text"])
        o = out[r["doc_id"]]
        got = (o["n_tokens"], o["n_2grams"], o["top2_cnt"], o["n_lines"],
               o["dup_lines"], o["n_distinct"], o["is_repetitive"])
        assert got == (n, g, top2, nl, dup, nd, flag), r["doc_id"]


def test_repetition_flags_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [(1, "spam ham " * 50), (2, "a b c d e f g h i j k l m n o p q r s t"),
         (3, "x"), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert out[1]["is_repetitive"]  # one 2-gram dominates + dup lines
    assert not out[2]["is_repetitive"]
    assert out[3]["n_2grams"] == 0 and out[3]["top2_cnt"] == 0
    assert out[4]["n_tokens"] == 0 and not out[4]["is_repetitive"]
    assert out[4]["n_lines"] == 0 and out[4]["dup_lines"] == 0


def test_repetition_plan_is_shuffle_free(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = repetition_metrics(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii(spark):
    docs = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io and d@e.org now"),
         (2, "server 10.0.255.1 peer 192.168.1.77"),
         (3, "call +4915123456789 or +14155550123"),
         (4, "clean text with at @ sign but no pii 1.2"),
         (5, "combo u@v.co 8.8.8.8 +123456789")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert out[2]["n_ips"] == 2 and out[2]["clean_text"] == "server <IP> peer <IP>"
    assert out[3]["n_phones"] == 2 and out[3]["clean_text"] == "call <PHONE> or <PHONE>"
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[4]["clean_text"] == "clean text with at @ sign but no pii 1.2"
    assert out[5]["clean_text"] == "combo <EMAIL> <IP> <PHONE>"
    # the patterns are RE2-safe: python's re (sanity twin) agrees
    for pat in (PII_EMAIL, PII_IPV4, PII_PHONE):
        re.compile(pat)


def test_redact_pii_ipv4_hardened(spark):
    """ADVICE r4: the IPv4 pattern is \\b-anchored, octet-constrained, and
    swallows trailing dotted runs — no '<IP>.5' partial leakage, no
    matches on 999.999.999.999 or inside version-string word runs."""
    docs = spark.createDataFrame(
        [(1, "run 1.2.3.4.5 end"),          # whole run redacted
         (2, "bad 999.999.999.999 left"),   # not an address
         (3, "glued x1.2.3.4x left"),       # inside a word run
         (4, "real 255.255.255.255 edge"),
         (5, "v1.2.3 semver left")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["clean_text"] == "run <IP> end" and out[1]["n_ips"] == 1
    assert out[2]["clean_text"] == "bad 999.999.999.999 left" and out[2]["n_ips"] == 0
    assert out[3]["clean_text"] == "glued x1.2.3.4x left" and out[3]["n_ips"] == 0
    assert out[4]["clean_text"] == "real <IP> edge" and out[4]["n_ips"] == 1
    assert out[5]["clean_text"] == "v1.2.3 semver left" and out[5]["n_ips"] == 0


def test_mixture_sample_properties(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    target = 400
    got = mixture_sample(docs, target)
    n = got.count()
    # integer-exact expected size: within 20% of target on this corpus
    assert abs(n - target) < target * 0.2, n
    # content-stable: same sample under a different partitioning
    again = mixture_sample(docs.repartition(7), target)
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # alpha=0.5 damping: hot domains get a SMALLER share of the sample than
    # of the corpus, small domains a larger one
    corpus = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sample = {r["source"]: r["n"] for r in
              got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    hot = max(corpus, key=corpus.get)
    cold = min(corpus, key=corpus.get)
    tot = sum(corpus.values())
    assert sample.get(hot, 0) / n < corpus[hot] / tot
    assert sample.get(cold, 0) / n > corpus[cold] / tot * 0.9


def test_mixture_sample_saturates_tiny_domain(spark):
    docs = spark.createDataFrame(
        [(i, "big") for i in range(5000)] + [(9900 + i, "tiny") for i in range(3)],
        "doc_id long, source string",
    )
    # keep-prob for 'tiny' is w*T/(n*Z); at T=300 it exceeds 1 -> keep-all
    got = mixture_sample(docs, 300, domain_col="source")
    by = {r["source"]: r["n"] for r in
          got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by.get("tiny") == 3  # keep-all saturation for the tiny domain


def test_mixture_sample_plan_broadcasts_stats(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = mixture_sample(docs, 50)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
