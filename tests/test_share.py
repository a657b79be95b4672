"""Shared-relation storage policy (lotad_spark/pipeline/_share.py).

Corpus-proportional multi-consumer relations route through
``share_corpus``: locally a lazy localCheckpoint, and with
``spark.lotad.sharedRelations=reliable`` a lazy reliable checkpoint
whose shards survive executor loss. Values must be identical on both
routes (SCALING.md "Shared-relation storage policy").
"""

import os
import tempfile

from pyspark.sql import functions as F

from lotad_spark.pipeline._share import SHARE_MODE_CONF, share_corpus


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestShareCorpus:
    def test_local_default_materializes_once_same_values(self, spark):
        df = spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 7).alias("b")
        )
        shared = share_corpus(df)
        # two consumers of the shared relation agree with the unshared
        agg = shared.groupBy("b").count()
        joined = shared.join(shared.select("id"), "id")
        assert _rows(agg) == _rows(df.groupBy("b").count())
        assert joined.count() == 100
        # local mode truncates lineage into an RDD scan
        plan = shared._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan, plan

    def test_reliable_mode_routes_through_checkpoint_dir(self, spark):
        ckdir = tempfile.mkdtemp(prefix="share_ck_")
        spark.sparkContext.setCheckpointDir(ckdir)
        spark.conf.set(SHARE_MODE_CONF, "reliable")
        try:
            df = spark.range(0, 50).select(
                F.col("id"), (F.col("id") * 3).alias("v")
            )
            shared = share_corpus(df)
            assert _rows(shared) == _rows(df)
            # the checkpoint actually landed in the reliable dir
            found = [
                os.path.join(r, f)
                for r, _, fs in os.walk(ckdir)
                for f in fs
            ]
            assert found, f"no checkpoint files under {ckdir}"
        finally:
            spark.conf.unset(SHARE_MODE_CONF)

    def test_consumers_see_identical_values_both_modes(self, spark):
        df = spark.range(0, 64).select(
            F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("h")
        )
        local_rows = _rows(share_corpus(df))
        ckdir = tempfile.mkdtemp(prefix="share_ck2_")
        spark.sparkContext.setCheckpointDir(ckdir)
        spark.conf.set(SHARE_MODE_CONF, "reliable")
        try:
            reliable_rows = _rows(share_corpus(df))
        finally:
            spark.conf.unset(SHARE_MODE_CONF)
        assert local_rows == reliable_rows
