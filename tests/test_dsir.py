"""DSIR importance resampling: weights, signal, determinism, plan shape."""

import pytest
from pyspark.sql import functions as F

from lotad_spark.pipeline import (
    dsir_resample,
    dsir_weights,
    ngram_features,
)
from lotad_spark.sources import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


@pytest.fixture(scope="module")
def weights(docs):
    return dsir_weights(
        docs, docs.filter(F.col("lang") == "en")
    ).cache()


class TestNgramFeatures:
    def test_unigrams_and_bigrams_counted(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a")], ["doc_id", "text"]
        )
        # grams: a, b, a, "a b", "b a" -> 5 occurrences total
        feat = ngram_features(df)
        assert feat.agg(F.sum("tf")).collect()[0][0] == 5

    def test_single_token_has_no_bigrams(self, spark):
        df = spark.createDataFrame([(1, "  solo  ")], ["doc_id", "text"])
        assert ngram_features(df).agg(F.sum("tf")).collect()[0][0] == 1

    def test_null_and_empty_text_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "x y")], ["doc_id", "text"]
        )
        ids = {r["doc_id"] for r in ngram_features(df).collect()}
        assert ids == {3}


class TestDsirWeights:
    def test_target_docs_score_higher(self, docs, weights):
        by_lang = (
            weights.join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.avg("weight").alias("avg_w"))
        )
        rows = {r["lang"]: r["avg_w"] for r in by_lang.collect()}
        en = rows.pop("en")
        assert all(en > v for v in rows.values()), rows

    def test_partitioning_invariant(self, docs):
        tgt = docs.filter(F.col("lang") == "en")
        a = sorted(map(tuple, dsir_weights(docs, tgt).collect()))
        b = sorted(
            map(
                tuple,
                dsir_weights(docs.repartition(7), tgt.repartition(3)).collect(),
            )
        )
        assert a == b

    def test_every_doc_weighted(self, docs, weights):
        n_docs = docs.filter(F.col("text").isNotNull()).count()
        assert weights.count() == n_docs

    def test_ratio_join_broadcasts_and_no_cartesian(self, docs, weights):
        plan = weights._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestDsirResample:
    def test_exactly_k_selected_deterministically(self, weights):
        a = sorted(r["doc_id"] for r in dsir_resample(weights, 25).collect())
        b = sorted(r["doc_id"] for r in dsir_resample(weights, 25).collect())
        assert len(a) == 25 and a == b

    def test_salt_changes_selection(self, weights):
        a = {r["doc_id"] for r in dsir_resample(weights, 25).collect()}
        b = {r["doc_id"] for r in dsir_resample(weights, 25, salt="other").collect()}
        assert a != b

    def test_selection_biased_toward_target(self, docs, weights):
        sel = dsir_resample(weights, 100).join(
            docs.select("doc_id", "lang"), "doc_id"
        )
        en_frac_sel = sel.filter(F.col("lang") == "en").count() / 100
        en_frac_all = docs.filter(F.col("lang") == "en").count() / docs.count()
        assert en_frac_sel > en_frac_all

    def test_topk_plans_as_take_ordered(self, weights):
        plan = (
            dsir_resample(weights, 10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan, plan


class TestDsirCli:
    def test_cli_command(self, spark, sf_dir, tmp_path):
        from click.testing import CliRunner

        from lotad_spark.cli import cli

        out = str(tmp_path / "dsir")
        result = CliRunner().invoke(
            cli,
            [
                "dsir-select",
                "--documents", f"{sf_dir}/documents.parquet",
                "--target-filter", "lang = 'en'",
                "--output", out,
                "--k", "10",
            ],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        assert "resampled 10" in result.output
        sel = spark.read.parquet(f"{out}/selected")
        assert sel.count() == 10
        assert set(sel.columns) == {"doc_id", "n_grams", "weight"}
