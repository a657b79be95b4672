"""Canonical-hash semantics (pins the reference's get_row_hash behavior,
lotad/utils.py:19-77, via our implementation)."""

import pandas as pd
from pyspark.sql import functions as F

from lotad_spark.hashing import canonical_value_hash, with_row_hash


class TestCanonicalValueHash:
    def test_primitives_are_str(self):
        assert canonical_value_hash(1) == "1"
        assert canonical_value_hash("1") == "1"  # type-insensitive by design
        assert canonical_value_hash(None) == "None"
        assert canonical_value_hash(1.5) == "1.5"

    def test_dict_key_order_insensitive(self):
        a = canonical_value_hash('{"a": 1, "b": 2}')
        b = canonical_value_hash('{"b": 2, "a": 1}')
        assert a == b
        assert len(a) == 16  # hex digest

    def test_dict_value_change_detected(self):
        assert canonical_value_hash('{"a": 1}') != canonical_value_hash('{"a": 2}')

    def test_list_order_insensitive(self):
        a = canonical_value_hash('[{"x": 1}, {"y": 2}]')
        b = canonical_value_hash('[{"y": 2}, {"x": 1}]')
        assert a == b

    def test_list_element_change_detected(self):
        assert canonical_value_hash("[1, 2]") != canonical_value_hash("[1, 3]")

    def test_nested_recursion(self):
        a = canonical_value_hash('{"outer": {"a": 1, "b": [2, 3]}}')
        b = canonical_value_hash('{"outer": {"b": [3, 2], "a": 1}}')
        assert a == b  # inner list reorder + key reorder both canonicalized

    def test_url_encoded_json(self):
        plain = canonical_value_hash('{"a": 1}')
        encoded = canonical_value_hash("%7B%22a%22%3A%201%7D")
        assert plain == encoded

    def test_non_json_bracket_string_passthrough(self):
        assert canonical_value_hash("[not json") == "[not json"

    def test_json_numeric_vs_string_insensitive(self):
        # str(1) == "1" inside the recursion → {"a": 1} ≡ {"a": "1"}
        assert canonical_value_hash('{"a": 1}') == canonical_value_hash('{"a": "1"}')


class TestRowHashColumn:
    def test_equal_rows_equal_hash(self, spark):
        df = spark.createDataFrame(
            [(1, "x", 1.5), (1, "x", 1.5), (2, "y", None)], "a long, b string, c double"
        )
        rows = with_row_hash(df).collect()
        assert rows[0].hashed_row == rows[1].hashed_row
        assert rows[0].hashed_row != rows[2].hashed_row

    def test_json_string_canonicalized_in_plan(self, spark):
        df = spark.createDataFrame(
            [(1, '{"a": 1, "b": 2}'), (2, '{"b": 2, "a": 1}'), (3, '{"a": 9}')],
            "id long, props string",
        )
        rows = {r.id: r.hashed_row for r in with_row_hash(df, ["props"]).collect()}
        assert rows[1] == rows[2]
        assert rows[1] != rows[3]

    def test_nested_struct_and_array(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2], "tags": [["b", "a"], ["a", "b"]]})
        )
        rows = {r.id: r.hashed_row for r in with_row_hash(df, ["tags"]).collect()}
        assert rows[1] == rows[2]  # array order-insensitive

    def test_null_and_none_string_collide(self, spark):
        # str(None) == "None" — reference parity (lotad/utils.py:75-77)
        df = spark.createDataFrame([(1, None), (2, "None")], "id long, v string")
        rows = {r.id: r.hashed_row for r in with_row_hash(df, ["v"]).collect()}
        assert rows[1] == rows[2]

    def test_boolean_str_parity(self, spark):
        # str(True) == "True" — a boolean column must hash identically to
        # its pre-stringified copy (reference lotad/utils.py:75-77).
        df = spark.createDataFrame(
            [(1, True, "True"), (2, False, "False")], "id long, b boolean, s string"
        )
        hb = {r.id: r.hashed_row for r in with_row_hash(df, ["b"]).collect()}
        hs = {r.id: r.hashed_row for r in with_row_hash(df, ["s"]).collect()}
        assert hb == hs

    def test_null_boolean_is_none_not_false(self, spark):
        # Regression: when/otherwise sent NULL to "False"; NULL must render
        # "None" so NULL-vs-False drifts are reported.
        df = spark.createDataFrame(
            [(1, None), (2, False), (3, True)], "id long, b boolean"
        )
        h = {r.id: r.hashed_row for r in with_row_hash(df, ["b"]).collect()}
        assert h[1] != h[2]
        assert h[1] != h[3]
        dfs = spark.createDataFrame([(1, "None")], "id long, b string")
        assert h[1] == with_row_hash(dfs, ["b"]).collect()[0].hashed_row

    def test_fast_path_matches_for_plain_values(self, spark):
        df = spark.createDataFrame([(1, "plain", 2.0)], "a long, b string, c double")
        slow = with_row_hash(df, json_strings=True).collect()[0].hashed_row
        fast = with_row_hash(df, json_strings=False).collect()[0].hashed_row
        assert slow == fast

    def test_column_order_irrelevant(self, spark):
        df1 = spark.createDataFrame([(1, "x")], "a long, b string")
        df2 = spark.createDataFrame([("x", 1)], "b string, a long")
        h1 = with_row_hash(df1).collect()[0].hashed_row
        h2 = with_row_hash(df2).collect()[0].hashed_row
        assert h1 == h2  # members sorted by column name

    def test_no_python_udf_for_non_string_fast_path(self, spark):
        df = spark.createDataFrame([(1, 2.0)], "a long, c double")
        plan = with_row_hash(df)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestSqlRegisteredUdf:
    """get_row_hash registered for SQL — reference parity with the per-
    connection UDF registration (lotad/connection.py:133,247)."""

    def test_sql_matches_python_reference(self, spark):
        from lotad_spark.hashing import canonical_value_hash

        spark.createDataFrame(
            [(1, '{"b": 2, "a": 1}'), (2, "plain")], "id long, payload string"
        ).createOrReplaceTempView("sqludf_t")
        got = {
            r.id: r.h
            for r in spark.sql(
                "SELECT id, get_row_hash(payload) AS h FROM sqludf_t"
            ).collect()
        }
        assert got[1] == canonical_value_hash('{"b": 2, "a": 1}')
        assert got[2] == "plain"

    def test_sql_json_key_order_invariant(self, spark):
        row = spark.sql(
            "SELECT get_row_hash('{\"a\": 1, \"b\": [2, 3]}') = "
            "get_row_hash('{\"b\": [3, 2], \"a\": 1}') AS eq"
        ).collect()[0]
        assert row.eq is True

    def test_whole_row_shape(self, spark):
        spark.createDataFrame([(1, "x")], "a long, b string").createOrReplaceTempView(
            "sqludf_row"
        )
        out = spark.sql(
            "SELECT get_row_hash(to_json(struct(*))) AS h FROM sqludf_row"
        ).collect()
        assert len(out) == 1 and len(out[0].h) == 16  # 64-bit hex digest
