"""End-to-end corpus-hygiene pipeline composition: the stage order
SCALE.md prescribes (quality filter → exact dedup → decontaminate →
split → stratified mix), driven as one chained DataFrame program the way
a user would compose it."""

from __future__ import annotations

import pyspark.sql.functions as F

from pentaho_kettle_spark.functions.dedup import decontaminate, exact_dedup
from pentaho_kettle_spark.functions.sampling import (
    stratified_sample,
    train_eval_split,
)
from pentaho_kettle_spark.functions.text import gopher_quality


def test_hygiene_pipeline_end_to_end(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and that was fine "
        "to be sure of it with plenty of words appended here so the "
        "gopher word-count rule is satisfied for this document "
    )
    rows = []
    for i in range(40):
        rows.append((i, base + f"unique tail number {i} " + " ".join(f"w{i}_{j}" for j in range(10)), "en"))
    # exact duplicates of doc 0 (normalize-equal)
    rows.append((100, rows[0][1].upper(), "en"))
    # a junk doc the quality filter must drop
    rows.append((101, "### ### ... ###", "en"))
    # a doc leaking the benchmark prompt
    bench_text = "which river is the longest river in the world by length"
    rows.append((102, base + bench_text + " padded with extra words", "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    bench = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")

    # 1. quality gate (cheapest first: zero-shuffle)
    q = gopher_quality(docs, min_words=10)
    clean = docs.join(
        q.filter(F.col("gopher_pass") == 1).select("doc_id"), "doc_id"
    )
    # 2. exact dedup (normalized-text hash)
    deduped = exact_dedup(clean, "text", "doc_id")
    # 3. benchmark decontamination
    decon = decontaminate(deduped, bench, "text", "doc_id", k_shingle=5, min_hits=2)
    kept = deduped.join(
        decon.filter(F.col("contaminated") == 0).select("doc_id"), "doc_id"
    )
    # 4. deterministic split + stratified mix over the training half
    split = train_eval_split(kept, 0.25, "doc_id")
    train = split.filter(F.col("split") == "train").drop("split")
    mix = stratified_sample(train, ["lang"], 10, "doc_id")

    ids = {r.doc_id for r in mix.collect()}
    assert len(ids) == 10
    assert 101 not in ids  # junk: failed the quality gate
    assert 102 not in ids  # contaminated: shares >= 2 bench 5-grams
    assert 100 not in ids  # exact dup of doc 0 (doc 0 is the keeper)
    # pipeline is deterministic end-to-end
    ids2 = {
        r.doc_id
        for r in stratified_sample(train.repartition(5), ["lang"], 10, "doc_id").collect()
    }
    assert ids2 == ids
