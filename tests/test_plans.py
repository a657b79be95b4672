"""Physical-plan regression tests — the scale properties the engine
promises (pruning, pushdown, broadcast, vectorized-only Python) must stay
visible in the executed plan, not just hold by accident."""

import pyspark.sql.functions as F
import pytest

from lotad_spark.operators.diff import diff_tables
from lotad_spark.sources.parquet import ParquetDatabase


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return ParquetDatabase(spark, sf_dir, "db").table("customer")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestDiffPlans:
    def test_ignore_column_prunes_parquet_scan(self, customer):
        r = diff_tables(
            customer, customer.filter("c_custkey != 5"), ignore_columns=["c_name"]
        )
        scans = [l for l in _plan(r.diff).splitlines() if "FileScan" in l]
        assert scans and all("c_name" not in l for l in scans)

    def test_side_filters_pushed_into_scan(self, customer):
        r = diff_tables(customer, customer.filter("c_custkey != 5"))
        plan = _plan(r.diff)
        assert "NOT (c_custkey" in plan  # filter reached DataFilters

    def test_json_free_path_has_no_python(self, customer):
        r = diff_tables(customer, customer, json_strings=False)
        plan = _plan(r.diff)
        assert "EvalPython" not in plan

    def test_default_path_is_arrow_vectorized_only(self, customer):
        plan = _plan(diff_tables(customer, customer).diff)
        assert "BatchEvalPython" not in plan  # never row-at-a-time


class TestJsonProbeFastPath:
    """r19: above JSON_PROBE_MIN_BYTES the default path runs a scan-only
    JSON-presence probe and compiles provably JSON-free inputs to the
    pure-JVM hash — the ArrowEvalPython node must vanish from the plan
    while the diff rows stay identical."""

    def test_json_free_input_routes_fast(self, customer, monkeypatch):
        import lotad_spark.operators.diff as diff_mod

        monkeypatch.setattr(diff_mod, "JSON_PROBE_MIN_BYTES", 0)
        r = diff_tables(customer, customer.filter("c_custkey != 5"))
        assert r.hash_path == "fast"
        assert "EvalPython" not in _plan(r.diff)
        # identical rows to the unconditional Arrow plan
        monkeypatch.setattr(diff_mod, "JSON_PROBE_MIN_BYTES", 1 << 60)
        arrow = diff_tables(customer, customer.filter("c_custkey != 5"))
        assert arrow.hash_path == "arrow"
        assert sorted(map(tuple, r.diff.collect())) == sorted(
            map(tuple, arrow.diff.collect())
        )

    def test_json_bearing_input_keeps_arrow(self, spark, monkeypatch):
        import lotad_spark.operators.diff as diff_mod

        monkeypatch.setattr(diff_mod, "JSON_PROBE_MIN_BYTES", 0)
        d1 = spark.createDataFrame(
            [(1, '{"a":1,"b":2}'), (2, "plain")], "id bigint, payload string"
        )
        d2 = spark.createDataFrame(
            [(1, '{ "b": 2, "a": 1 }'), (2, "plain")],
            "id bigint, payload string",
        )
        r = diff_tables(d1, d2)
        assert r.hash_path == "arrow"
        assert "ArrowEvalPython" in _plan(r.diff)
        # formatting-only JSON differences still cancel on the probed path
        assert r.diff.count() == 0

    def test_below_floor_skips_probe(self, customer):
        # tiny input, default floor: no probe job, unconditional Arrow
        r = diff_tables(customer, customer)
        assert r.hash_path == "arrow"


class TestGroupbyDiffPlans:
    def test_survivor_aggregate_shuffles_hash_only(self, customer):
        """The scale property of the groupby strategy: the aggregation
        exchange must carry (hashed_row, observed_in) ONLY — never the data
        columns. A data column appearing under the hash aggregate's
        exchange means the round-3 full-row-shuffle regression is back."""
        r = diff_tables(customer, customer.filter("c_custkey != 5"),
                        strategy="groupby")
        plan = _plan(r.diff)
        # Locate the aggregate exchange: hashpartitioning on hashed_row.
        agg_exchanges = [
            l for l in plan.splitlines()
            if "Exchange hashpartitioning(hashed_row" in l
        ]
        assert agg_exchanges, plan
        assert all("c_name" not in l and "c_acctbal" not in l
                   for l in agg_exchanges)

    def test_semi_join_back_broadcasts_small_survivors(self, customer):
        """AQE should turn the phase-2 semi-join into a broadcast when the
        survivor set is small (the common case: little real drift)."""
        r = diff_tables(customer, customer.filter("c_custkey != 5"),
                        strategy="groupby")
        r.diff.count()  # let AQE finalize
        plan = _plan(r.diff)
        assert "LeftSemi" in plan
        assert "BroadcastHashJoin" in plan, plan


class TestWindowDiffPlans:
    def test_single_exchange(self, customer):
        """The defining property of the default (window) strategy: ONE
        exchange for the whole diff — the window shuffles by hash and the
        trailing exact-duplicate collapse reuses that partitioning. A
        second exchange means the distinct regressed to its own shuffle."""
        r = diff_tables(customer, customer.filter("c_custkey != 5"))
        plan = _plan(r.diff)
        exchanges = [
            l for l in plan.splitlines()
            if "Exchange" in l and "Reused" not in l
        ]
        assert len(exchanges) == 1, plan
        assert "hashpartitioning(hashed_row" in exchanges[0]


class TestTextPlans:
    def test_corpus_filter_single_scan_no_joins(self, spark, sf_dir):
        """The training gate is ONE projection: a join or exchange here
        means the expression composition regressed to self-joins."""
        from lotad_spark.pipeline.text import corpus_filter

        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        plan = _plan(corpus_filter(d))
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert plan.count("FileScan") == 1


class TestPairingPlans:
    def test_simhash_pairing_no_cartesian(self, spark, sf_dir):
        from lotad_spark.pipeline.dedup import simhash_near_dup_pairs

        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        plan = _plan(simhash_near_dup_pairs(d))
        assert "CartesianProduct" not in plan

class TestProbePlans:
    def test_wizard_probe_broadcasts(self, customer, spark, sf_dir):
        supplier = ParquetDatabase(spark, sf_dir, "db").table("supplier")
        sample = (
            customer.select(F.col("c_nationkey").alias("s_nationkey"))
            .distinct()
            .limit(10000)
        )
        probe = supplier.join(F.broadcast(sample), "s_nationkey", "left_semi")
        assert "BroadcastHashJoin" in _plan(probe)

    def test_ann_corpus_scan_not_shuffled_before_scoring(self, spark, sf_dir):
        from lotad_spark.pipeline.similarity import cosine_topk

        e = ParquetDatabase(spark, sf_dir, "db").table("embeddings")
        plan = _plan(cosine_topk(e.filter("vec_id < 3"), e, k=3))
        # query side broadcast → corpus side scored without a pre-join shuffle
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


class TestTemporalPlans:
    def test_asof_is_window_not_inequality_join(self, spark, sf_dir):
        """The scale property of asof_join: one hash exchange on the key
        feeding a Window — never a join that pairs left rows with every
        earlier right row."""
        from lotad_spark.operators import asof_join

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        orders = ParquetDatabase(spark, sf_dir, "db").table("orders")
        plan = _plan(
            asof_join(
                ev.select("event_id", "user_id", "ts"),
                orders.select("o_custkey", "o_orderdate", "o_orderkey"),
                key="user_id",
                right_key="o_custkey",
                left_ts="ts",
                right_ts="o_orderdate",
                value_cols=["o_orderkey"],
            )
        )
        assert "Join" not in plan  # no join operator of any kind
        assert "Window" in plan
        assert plan.count("Exchange hashpartitioning(_asof_k") == 1

    def test_range_join_is_equi_join_no_nested_loop(self, spark, sf_dir):
        """Bin bucketing must surface as a hash-joinable equi-condition:
        no BroadcastNestedLoopJoin / CartesianProduct in the plan."""
        from lotad_spark.operators import range_join

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        pts = ev.select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        ivs = ev.select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
            F.col("ts").alias("w_end"),
        )
        plan = _plan(
            range_join(
                pts,
                ivs,
                point_col="v_ts",
                start_col="w_start",
                end_col="w_end",
                bin_width=3600.0,
                point_key="v_user",
                interval_key="p_user",
            )
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan

    def test_rollup_merge_never_rereads_raw(self, spark, sf_dir):
        """Coarsening a rollup must aggregate rollup rows only — exactly
        one FileScan in the merged plan (the original fine scan), with
        partial aggregation map-side combined."""
        from lotad_spark.operators import merge_rollup, rollup_time_bucket

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        minutes = rollup_time_bucket(
            ev, ts_col="ts", value_col="value", unit="minute"
        )
        plan = _plan(merge_rollup(minutes, unit="hour"))
        assert plan.count("FileScan") == 1
        assert "partial_sum" in plan.lower() or "HashAggregate" in plan


class TestRollupPlans:
    def test_gapfill_single_scan_no_data_window(self, spark, sf_dir):
        """Gapfill must read raw ONCE (the rollup scan) and run its LOCF
        window partitioned by series — never a global single-partition
        window over data rows."""
        from lotad_spark.operators import gapfill_rollup, rollup_time_bucket

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        hours = rollup_time_bucket(
            ev, ts_col="ts", value_col="value", unit="hour",
            dims=["event_type"],
        )
        plan = _plan(gapfill_rollup(hours, unit="hour", dims=["event_type"]))
        assert plan.count("FileScan") <= 2  # rollup reused, not re-derived
        # the LOCF window partitions by the series key
        assert "windowspecdefinition(event_type" in plan

    def test_twa_is_one_key_exchange(self, spark, sf_dir):
        from lotad_spark.operators import time_weighted_sum

        ev = ParquetDatabase(spark, sf_dir, "db").table("events")
        plan = _plan(
            time_weighted_sum(
                ev, key_col="user_id", ts_col="ts", value_col="value",
                tiebreak_col="event_id",
            )
        )
        # one exchange for the lead() window; the aggregation reuses the
        # user_id partitioning instead of shuffling again
        assert plan.count("Exchange hashpartitioning(user_id") == 1
        assert "Join" not in plan


class TestSkewedDiffPlans:
    """Duplicate-key skew on the diff path. The diff's shuffle key is the
    content hash, so a dominant key MEANS identical duplicate rows — which
    compress to ~nothing in the shuffle, making them INVISIBLE to AQE's
    byte-based skew-join detection (verified empirically: 50k constant
    copies never trip skewedPartitionThresholdInBytes). The engineered
    mitigation is therefore the groupby strategy's map-side partial
    aggregation, which collapses every duplicate before the exchange —
    pinned here — while the AQE skew-join config is proven live for the
    genuinely byte-skewed joins it CAN see."""

    def _skewed(self, spark, customer, n=5000):
        const = customer.limit(1)
        copies = (
            spark.range(n)
            .crossJoin(F.broadcast(const))
            .drop("id")
            .select(*customer.columns)
        )
        return customer.unionByName(copies)

    def test_groupby_partial_agg_absorbs_duplicate_skew(self, spark, customer):
        """With one row duplicated thousands of times on both sides, the
        groupby strategy's phase-1 shuffle must carry map-side-combined
        partials (one (hash, side-set) per map task), never the raw
        duplicate stream — and the duplicates must cancel exactly."""
        skew1 = self._skewed(spark, customer)
        skew2 = self._skewed(spark, customer.filter("c_custkey != 5"))
        r = diff_tables(skew1, skew2, strategy="groupby", json_strings=False)
        plan = _plan(r.diff)
        # partial aggregation below the exchange = map-side combine
        # (min/max over provenance: primitive buffers keep phase 1 in
        # codegen HashAggregate rather than ObjectHashAggregate)
        assert "partial_min" in plan and "partial_max" in plan, plan
        rows = r.diff.collect()
        assert len(rows) == 1 and rows[0]["c_custkey"] == 5

    def test_window_strategy_correct_under_duplicate_skew(self, spark, customer):
        """The window strategy stays CORRECT under duplicate skew (all
        copies land in one window partition and cancel); the groupby
        strategy is the scale path for dup-heavy tables (see diff.py)."""
        skew1 = self._skewed(spark, customer)
        skew2 = self._skewed(spark, customer.filter("c_custkey != 5"))
        r = diff_tables(skew1, skew2, strategy="window", json_strings=False)
        rows = r.diff.collect()
        assert len(rows) == 1 and rows[0]["c_custkey"] == 5

    def test_auto_routes_skewed_input_to_groupby(self, spark, customer, monkeypatch):
        """The auto router's duplicate-density probe must send dup-heavy
        inputs to the map-side-combine plan (the scale-safe choice: AQE
        provably cannot split the window plan's row-count-bound skewed
        partition). Size floor dropped and probe fraction raised so the
        small in-memory fixture both crosses the probe threshold and
        yields a stable density estimate."""
        from lotad_spark.operators import diff as diff_mod

        monkeypatch.setattr(diff_mod, "AUTO_PROBE_MIN_BYTES", 0)
        monkeypatch.setattr(diff_mod, "AUTO_PROBE_FRACTION", 0.5)
        skew1 = self._skewed(spark, customer)
        skew2 = self._skewed(spark, customer.filter("c_custkey != 5"))
        r = diff_tables(skew1, skew2, strategy="auto", json_strings=False)
        assert r.strategy_used == "groupby"
        rows = r.diff.collect()
        assert len(rows) == 1 and rows[0]["c_custkey"] == 5

    def test_auto_routes_uniform_input_to_window(self, spark, customer, monkeypatch):
        """Near-unique hashes must route to the single-exchange window
        plan — including the no-drift case where every hash appears once
        per side (the per-side density measurement must not count
        cross-side matched pairs as duplicates)."""
        from lotad_spark.operators import diff as diff_mod

        monkeypatch.setattr(diff_mod, "AUTO_PROBE_MIN_BYTES", 0)
        monkeypatch.setattr(diff_mod, "AUTO_PROBE_FRACTION", 0.5)
        r = diff_tables(
            customer,
            customer.filter("c_custkey != 5"),
            strategy="auto",
            json_strings=False,
        )
        assert r.strategy_used == "window"
        rows = r.diff.collect()
        assert len(rows) == 1 and rows[0]["c_custkey"] == 5

    def test_auto_small_input_skips_probe(self, spark, customer):
        """Below AUTO_PROBE_MIN_BYTES the router picks window from the
        driver-side size stat alone — no probe job, diff stays lazy."""
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        r = diff_tables(customer, customer, strategy="auto", json_strings=False)
        assert r.strategy_used == "window"
        assert tracker.getJobIdsForGroup(None) == before  # nothing executed

    def test_aqe_skew_join_fires_under_session_config(self, spark):
        """The session's AQE skew-join machinery must actually engage when
        a join-side partition is byte-skewed (incompressible payload under
        one key): the finalized plan carries SortMergeJoin(skew=true).
        Thresholds are lowered to make fixture-scale bytes trip the same
        detection that fires at production partition sizes."""
        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            left = spark.range(50000).select(
                F.lit(0).alias("k"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            ).unionByName(
                spark.range(1000).select(
                    (F.col("id") % 7 + 1).cast("int").alias("k"),
                    F.lit("x").alias("payload"),
                )
            )
            right = spark.range(8).select(
                F.col("id").cast("int").alias("k"), F.lit("r").alias("rv")
            )
            j = left.join(right, "k", "inner")
            assert len(j.collect()) == 51000
            plan = _plan(j)
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan, plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestEditDistancePlans:
    """The r13 scale-killer, fixed r14: PassJoin's candidate exchange
    must carry (xxhash64(segment), id, length, position) ONLY — texts
    are cut and hashed map-side, dropped before the join, and
    re-joined by id after the id-pair distinct. A bare text attribute
    (s#N / t#N / _s#N / _t#N) under the segment-hash exchange means
    the O(len²)-bytes-per-document shuffle is back."""

    _TEXT_ATTR = r"(?<![\w])_?[st]#\d+"

    @staticmethod
    def _exchange_blocks(df):
        """(input_line, arguments_line) for every Exchange operator in
        the formatted physical plan."""
        import re

        s = df.sparkSession._jvm.org.apache.spark.sql.api.python \
            .PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        out = []
        for block in re.split(r"\n\(\d+\) ", s):
            if not block.startswith("Exchange"):
                continue
            inp = next(
                (l for l in block.splitlines() if l.startswith("Input")), ""
            )
            args = next(
                (l for l in block.splitlines() if l.startswith("Arguments")),
                "",
            )
            out.append((inp, args))
        return out

    def test_pairs_candidate_exchange_carries_no_text(self, spark):
        import re

        from lotad_spark.pipeline import edit_distance_pairs

        df = spark.createDataFrame(
            [(i, f"string number {i}") for i in range(20)],
            "doc_id bigint, text string",
        )
        blocks = self._exchange_blocks(edit_distance_pairs(df, k=2))
        seg_exchanges = [b for b in blocks if "_sh" in b[1]]
        assert seg_exchanges, blocks  # the candidate join must exist
        for inp, args in seg_exchanges:
            assert not re.search(self._TEXT_ATTR, inp), (inp, args)
        # the id-pair distinct (partitioned by BOTH ids) is id-only too
        pair_exchanges = [
            b for b in blocks if "id_a#" in b[1] and "id_b#" in b[1]
        ]
        assert pair_exchanges, blocks
        for inp, args in pair_exchanges:
            assert not re.search(self._TEXT_ATTR, inp), (inp, args)

    def test_search_no_exchange_carries_text(self, spark):
        import re

        from lotad_spark.pipeline import edit_distance_search

        corpus = spark.createDataFrame(
            [(i, f"string number {i}") for i in range(20)],
            "doc_id bigint, text string",
        )
        queries = spark.createDataFrame(
            [(100, "string number 1")], "query_id bigint, text string"
        )
        blocks = self._exchange_blocks(
            edit_distance_search(corpus, queries, k_max=2, topn=3)
        )
        assert blocks  # the rank window shuffles (query_id, id, distance)
        for inp, args in blocks:
            assert not re.search(self._TEXT_ATTR, inp), (inp, args)


class TestHeavyHittersPlans:
    def test_one_corpus_scan_in_verify_plan(self, spark, sf_dir):
        """heavy_hitters' returned plan must read the corpus ONCE (the
        exact-verify pass), take candidates from the collected local
        summary, and leave NOTHING cached — a second FileScan means
        the r13 separate n_total pass is back; an InMemoryRelation
        means the r14 persist leak is back."""
        from lotad_spark.pipeline import heavy_hitters

        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        plan = _plan(heavy_hitters(d, phi=0.01))
        assert plan.count("FileScan") == 1, plan
        assert "MapInPandas" not in plan, plan  # MG pass never re-runs
        assert "InMemoryRelation" not in plan, plan  # no cache leak
        # collected candidates enter as a local/parallelized relation
        assert "LocalTableScan" in plan or "ExistingRDD" in plan, plan


class TestWebPlans:
    def test_html_extract_single_scan_no_exchange(self, spark, sf_dir):
        """The extraction chain is ONE projection fused into the scan:
        an Exchange or Join here means the regexp chain regressed to
        something non-streaming."""
        from lotad_spark.pipeline.web import html_to_text

        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        pages = d.select("doc_id", F.col("text").alias("html"))
        plan = _plan(html_to_text(pages))
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "EvalPython" not in plan  # zero UDFs
        assert plan.count("FileScan") == 1

    def test_extract_links_no_exchange(self, spark, sf_dir):
        from lotad_spark.pipeline.web import extract_links

        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        pages = d.select("doc_id", F.col("text").alias("html"))
        plan = _plan(extract_links(pages))
        assert "Exchange" not in plan
        assert "Generate explode" in plan
        assert "EvalPython" not in plan


class TestMediaStagePlans:
    def test_pdf_extract_single_arrow_stage_no_exchange(self, spark, sf_dir):
        """extract_pdf_text is ONE Arrow mapInPandas over the scan — an
        Exchange or a second FileScan means the per-payload parse
        stopped living inside the scan stage."""
        from lotad_spark.pipeline.pdf import extract_pdf_text

        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        media = d.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("content"),
        )
        plan = _plan(extract_pdf_text(media))
        assert "Exchange" not in plan
        assert plan.count("FileScan") == 1
        assert plan.count("MapInPandas") == 1

    def test_image_hashes_multi_kind_single_stage(self, spark, sf_dir):
        """The unified hash stage: two hash kinds still cost ONE
        mapInPandas (one decode) over one scan."""
        from lotad_spark.pipeline.multimodal import image_hashes

        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        media = d.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("content"),
        )
        plan = _plan(image_hashes(media, kinds=("ahash", "dhash")))
        assert "Exchange" not in plan
        assert plan.count("FileScan") == 1
        assert plan.count("MapInPandas") == 1


class TestR17MediaPlans:
    """r17 faces keep the scan-stage shape: one FileScan, one Arrow
    stage, zero exchanges."""

    def _media(self, spark, sf_dir):
        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        return d.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("content"),
        )

    def test_audio_tags_single_stage(self, spark, sf_dir):
        from lotad_spark.pipeline.multimodal import audio_tags

        plan = _plan(audio_tags(self._media(spark, sf_dir)))
        assert "Exchange" not in plan
        assert plan.count("FileScan") == 1
        assert plan.count("MapInPandas") == 1

    def test_audio_fingerprint_single_stage(self, spark, sf_dir):
        from lotad_spark.pipeline.multimodal import audio_fingerprint

        plan = _plan(audio_fingerprint(self._media(spark, sf_dir)))
        assert "Exchange" not in plan
        assert plan.count("FileScan") == 1
        assert plan.count("MapInPandas") == 1

    def test_http_unwrap_single_arrow_stage(self, spark, sf_dir):
        """warc_http_unwrap + the charset-ladder text projection stay
        ONE Arrow stage over the binary scan — the wire decode must
        not introduce an exchange or a Python round-trip beyond the
        single mapInPandas."""
        from lotad_spark.sources.warc import (
            unwrapped_body_text,
            warc_http_unwrap,
        )

        d = ParquetDatabase(spark, sf_dir, "db").table("documents")
        media = d.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("content"),
        )
        plan = _plan(unwrapped_body_text(warc_http_unwrap(media)))
        assert "Exchange" not in plan
        assert plan.count("FileScan") == 1
        assert plan.count("MapInPandas") == 1
        assert "EvalPython" not in plan.replace("MapInPandas", "")
