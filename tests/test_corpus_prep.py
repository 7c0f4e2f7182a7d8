"""corpus_prep pipeline semantics: stage precedence, auditable totals,
kept set = deduplicated survivor corpus."""

from pyspark.sql import functions as F

from geowave_spark.operators import dedup as OD


def test_corpus_prep_stage_accounting(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = OD.corpus_prep(docs).cache()
    n = docs.count()
    by_stage = {r.stage: r.cnt for r in out.groupBy("stage").agg(F.count("*").alias("cnt")).collect()}
    # every document gets exactly one verdict, no NULL stage
    assert sum(by_stage.values()) == n and None not in by_stage
    assert set(by_stage) <= set(OD.PREP_STAGES)
    # the synthetic corpus exercises these gates at any sf (exact dups
    # only appear at sf>=0.01, so exact_dup is not in the must-fire set)
    for stage in ("lang", "kept", "near_dup"):
        assert by_stage.get(stage, 0) > 0, stage

    # precedence: every doc predicted non-en is labeled 'lang', never a
    # later stage (first-gate-wins)
    non_en = out.filter(F.col("pred_lang") != "en")
    assert non_en.filter(F.col("stage") != "lang").count() == 0

    # kept docs are pairwise exact-distinct: re-running exact dedup on the
    # kept set finds only singleton groups
    kept_ids = out.filter(F.col("stage") == "kept").select("doc_id")
    kept_docs = docs.join(kept_ids, "doc_id")
    regroup = OD.exact_dedup(kept_docs).filter(F.col("n_docs") > 1).count()
    assert regroup == 0
    out.unpersist()


def test_text_features_arrow_equals_catalyst_twins(spark, sf_dir):
    """The combined Arrow kernel (text_features_arrow) is bit-identical to
    lang_id + quality_score over the whole corpus — including the
    round-HALF_UP doubles (Decimal(repr(x)) twin of Catalyst round)."""
    import numpy as np

    from geowave_spark.operators import text as OTX
    from geowave_spark.sources import tables as TB

    docs = TB.load_tables(spark, sf_dir, names=("documents",))["documents"]
    tf = OTX.text_features_arrow(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    li = OTX.lang_id(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    qs = OTX.quality_score(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("pred_lang", "n_tokens", "best_hits"):
        assert (tf[c].values == li[c].values).all(), c
    for c in ("n_chars_calc", "mean_token_len", "punct_ratio", "stopword_ratio", "quality"):
        a, b = tf[c].values, qs[c].values
        assert np.array_equal(a, b), c  # bitwise for doubles: no tolerance
