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


class TestPdfCodecProperties:
    """r16 PDF filter codecs: encoder/decoder round-trips over
    arbitrary byte strings (the encoders live in the fixture module;
    the decoders are the product code under test)."""

    @given(st.binary(max_size=4096), st.sampled_from([0, 1]))
    @settings(max_examples=60, deadline=None)
    def test_lzw_round_trip(self, data, early):
        from __spark_entry__ import _lzw_encode_fixture
        from lotad_spark.pipeline.pdf import _lzw_decode

        enc = _lzw_encode_fixture(data, early=early)
        assert _lzw_decode(enc, early, 1 << 26) == data

    @given(st.binary(min_size=0, max_size=2048))
    @settings(max_examples=60, deadline=None)
    def test_lzw_kwkwk_heavy_round_trip(self, data):
        # low-entropy alphabets maximize KwKwK and table growth
        from __spark_entry__ import _lzw_encode_fixture
        from lotad_spark.pipeline.pdf import _lzw_decode

        low = bytes(b % 3 for b in data)
        assert _lzw_decode(_lzw_encode_fixture(low), 1, 1 << 26) == low

    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=0, max_value=12),
        st.binary(min_size=0, max_size=512),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_predictor_round_trip(self, cols, rows, raw):
        from __spark_entry__ import _png_predict_fixture
        from lotad_spark.pipeline.pdf import _apply_predictor

        data = (raw * (cols * rows // max(len(raw), 1) + 1))[: cols * rows]
        filt = _png_predict_fixture(data, cols)
        assert _apply_predictor(filt, 12, 1, 8, cols) == data

    @given(st.binary(max_size=2048))
    @settings(max_examples=60, deadline=None)
    def test_lzw_decoder_never_hangs_on_garbage(self, junk):
        from lotad_spark.pipeline.pdf import _PdfError, _lzw_decode

        try:
            _lzw_decode(junk, 1, 1 << 20)
        except _PdfError:
            pass  # rejection is fine; crashing/hanging is not
