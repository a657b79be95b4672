"""Edit-distance similarity join (pipeline/dedup.py
edit_distance_pairs): the PassJoin segment filter must lose NOTHING —
pinned by exact equality with an independent brute-force DP reference
(a genuinely different Levenshtein implementation, so a convention the
Spark path and the DuckDB oracle might share still gets caught)."""

class TestEditDistancePairs:
    """PassJoin edit-similarity join: exact equality with a brute-force
    DP reference on a randomized mutation corpus, under multiple
    partitionings; NULL/empty/short-string arms; validation."""

    @staticmethod
    def _lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def test_matches_brute_force(self, spark):
        import random

        rng = random.Random(71)
        alpha = "abcdef"
        rows = []
        for i in range(120):
            s = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 18)))
            rows.append((i, s))
            if i % 4 == 0:  # mutated twin, 1-2 random edits
                t = list(s)
                for _ in range(rng.randint(1, 2)):
                    op = rng.choice("ids")
                    p = rng.randrange(max(1, len(t)))
                    if op == "i":
                        t.insert(p, rng.choice(alpha))
                    elif op == "d" and t:
                        del t[p]
                    elif t:
                        t[p] = rng.choice(alpha)
                rows.append((i + 1000, "".join(t)))
        rows.append((5000, None))
        rows.append((5001, ""))  # short-string arm
        k = 2
        clean = [(i, s) for i, s in rows if s is not None]
        want = set()
        for x in range(len(clean)):
            for y in range(x + 1, len(clean)):
                (ia, sa), (ib, sb) = clean[x], clean[y]
                d = self._lev(sa, sb)
                if d <= k:
                    want.add((min(ia, ib), max(ia, ib), d))
        from lotad_spark.pipeline import edit_distance_pairs

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        for parts in (1, 7):
            got = {
                (r.id_a, r.id_b, r.distance)
                for r in edit_distance_pairs(
                    df.repartition(parts), k=k
                ).collect()
            }
            assert got == want, parts
        assert len(want) > 50  # the fixture is non-trivial

    def test_k1_and_short_strings(self, spark):
        from lotad_spark.pipeline import edit_distance_pairs

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "ab"), (4, "abc"), (5, "xyz")],
            "doc_id bigint, text string",
        )
        got = {
            (r.id_a, r.id_b, r.distance)
            for r in edit_distance_pairs(df, k=1).collect()
        }
        assert got == {(1, 2, 1), (1, 3, 1), (2, 3, 1), (3, 4, 1)}

    def test_validation(self, spark):
        import pytest

        from lotad_spark.pipeline import edit_distance_pairs

        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="k must be"):
            edit_distance_pairs(df, k=0)


class TestEditDistanceSearch:
    """The search face: per-query top-n under Levenshtein <= k_max must
    equal brute force INCLUDING the (distance, id) rank order."""

    def test_matches_brute_force_with_ranking(self, spark):
        import random

        from lotad_spark.pipeline import edit_distance_search

        rng = random.Random(83)
        alpha = "abcdefg"
        corpus = [
            (i, "".join(rng.choice(alpha) for _ in range(rng.randint(1, 16))))
            for i in range(200)
        ]
        queries = []
        for qi in range(12):
            t = list(rng.choice(corpus)[1])
            for _ in range(rng.randint(0, 2)):
                op = rng.choice("ids")
                p = rng.randrange(max(1, len(t)))
                if op == "i":
                    t.insert(p, rng.choice(alpha))
                elif op == "d" and t:
                    del t[p]
                elif t:
                    t[p] = rng.choice(alpha)
            queries.append((qi, "".join(t)))
        k, topn = 2, 4
        want = set()
        for qi, qt in queries:
            scored = sorted(
                (TestEditDistancePairs._lev(s, qt), cid)
                for cid, s in corpus
                if TestEditDistancePairs._lev(s, qt) <= k
            )
            for rank, (d, cid) in enumerate(scored[:topn], 1):
                want.add((qi, cid, d, rank))
        cdf = spark.createDataFrame(corpus, "doc_id bigint, text string")
        qdf = spark.createDataFrame(queries, "query_id bigint, text string")
        for parts in (1, 6):
            got = {
                (r.query_id, r.doc_id, r.distance, r.rank)
                for r in edit_distance_search(
                    cdf.repartition(parts), qdf, k_max=k, topn=topn
                ).collect()
            }
            assert got == want, parts

    def test_validation(self, spark):
        import pytest

        from lotad_spark.pipeline import edit_distance_search

        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        q = spark.createDataFrame([(1, "x")], "query_id bigint, text string")
        with pytest.raises(ValueError, match="k_max"):
            edit_distance_search(df, q, k_max=0)
        with pytest.raises(ValueError, match="topn"):
            edit_distance_search(df, q, topn=0)

    def test_broadcast_plan(self, spark):
        """The corpus must never shuffle: the candidate join is a
        broadcast of the query substrings — plan-pinned."""
        from lotad_spark.pipeline import edit_distance_search

        df = spark.createDataFrame(
            [(i, f"abcde{i}") for i in range(30)], "doc_id bigint, text string"
        )
        q = spark.createDataFrame([(1, "abcde1")], "query_id bigint, text string")
        plan = (
            edit_distance_search(df, q)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestMinhashArrowKernel:
    """r19: at K >= MINHASH_ARROW_MIN_PERMS the permutation minima
    pre-reduce in one vectorized Arrow stage. The two paths must be
    value-identical (bit-exact int64 arithmetic, SQL null semantics)
    and the production-K plan must show the Arrow stage replacing the
    shingle-row-wide aggregate input."""

    def _sigs(self, docs, k):
        import lotad_spark.pipeline.dedup as dd

        return dd.minhash_signatures(
            dd.shingles(docs, distinct=False), num_perms=k
        )

    def test_arrow_matches_sql_tower(self, spark, monkeypatch):
        import lotad_spark.pipeline.dedup as dd

        docs = spark.createDataFrame(
            [(i, f"w{i % 7} x{i % 3} common words here {i}") for i in range(40)]
            + [(100, None), (None, "aa bb cc dd ee")],
            "doc_id bigint, text string",
        )
        def key(rows):  # None-safe sort key across the null-id group
            return sorted(
                (tuple((v is None, v) for v in r) for r in rows)
            )

        arrow = self._sigs(docs, 64).collect()
        monkeypatch.setattr(dd, "MINHASH_ARROW_MIN_PERMS", 10**9)
        sql = self._sigs(docs, 64).collect()
        assert key(arrow) == key(sql)

    def test_production_k_plan_has_arrow_stage(self, spark):
        docs = spark.createDataFrame(
            [(1, "aa bb cc dd")], "doc_id bigint, text string"
        )
        plan = (
            self._sigs(docs, 128)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "MapInArrow" in plan or "PythonMapInArrow" in plan

    def test_oracle_k_stays_pure_jvm(self, spark):
        docs = spark.createDataFrame(
            [(1, "aa bb cc dd")], "doc_id bigint, text string"
        )
        plan = (
            self._sigs(docs, 8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "MapInArrow" not in plan and "EvalPython" not in plan
