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
