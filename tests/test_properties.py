"""Property-based invariants of the canonical hash (hypothesis).

These pin the reference semantics (lotad/utils.py:19-77) over arbitrary
JSON-ish values, not just the hand-picked cases."""

import json
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from lotad_spark.hashing import canonical_value_hash

# JSON-ish scalar/structure generator (bounded depth/size for speed).
_scalars = st.one_of(
    st.integers(-(10**9), 10**9),
    st.text(max_size=12),
    st.booleans(),
    st.none(),
)
_json_vals = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=8), children, max_size=5),
    ),
    max_leaves=12,
)


def _shuffle_structure(v, rng: random.Random):
    """Reorder dict keys and list elements recursively — must not change
    the canonical hash."""
    if isinstance(v, dict):
        items = [(k, _shuffle_structure(x, rng)) for k, x in v.items()]
        rng.shuffle(items)
        return dict(items)
    if isinstance(v, list):
        out = [_shuffle_structure(x, rng) for x in v]
        rng.shuffle(out)
        return out
    return v


class TestCanonicalHashProperties:
    @settings(max_examples=150, deadline=None)
    @given(_json_vals, st.integers(0, 2**31))
    def test_structure_order_never_matters(self, value, seed):
        a = json.dumps(value)
        b = json.dumps(_shuffle_structure(value, random.Random(seed)))
        assert canonical_value_hash(a) == canonical_value_hash(b)

    @settings(max_examples=100, deadline=None)
    @given(st.dictionaries(st.text(max_size=8), _scalars, min_size=1, max_size=5))
    def test_value_change_always_detected(self, d):
        a = json.dumps(d)
        k = next(iter(d))
        mutated = {**d, k: "___changed___"}
        if str(d[k]) == "___changed___":
            return
        assert canonical_value_hash(a) != canonical_value_hash(json.dumps(mutated))

    @settings(max_examples=100, deadline=None)
    @given(st.integers(-(10**12), 10**12))
    def test_numeric_string_insensitive(self, n):
        # str(n) == canonical member of both int and its string form
        assert canonical_value_hash(n) == canonical_value_hash(str(n))

    @settings(max_examples=50, deadline=None)
    @given(_json_vals)
    def test_hash_is_deterministic(self, value):
        s = json.dumps(value)
        assert canonical_value_hash(s) == canonical_value_hash(s)
