"""Property-based robustness tests (hypothesis): the kernels are total
functions — arbitrary input never raises, output is deterministic, and the
canonical JSON is always parseable.  (The reference relies on example
tests only, SURVEY.md §5 'Not used: property-based testing' — we add it.)"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from exstruct_spark.config import ExtractOptions
from exstruct_spark.kernels.coerce import coerce_scalar
from exstruct_spark.kernels.dom import decode_html_bytes, parse_html, strip_tags_text
from exstruct_spark.kernels.extract import extract_document
from exstruct_spark.kernels.serialize import canonical_json, strip_empty


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_coerce_total_and_typed(s):
    v = coerce_scalar(s)
    assert isinstance(v, (int, float, str))
    assert coerce_scalar(s) == v  # deterministic
    # coerced numerics survive JSON round-trip with type intact
    assert type(json.loads(json.dumps(v))) is type(v)


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_extract_document_total(raw):
    rec = extract_document("u://prop", raw)
    assert rec["status"] in ("ok", "fallback")
    parsed = json.loads(rec["extraction_json"])
    assert parsed["doc"] == "u://prop"
    # deterministic
    assert extract_document("u://prop", raw) == rec


@given(st.text(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_dom_total(s):
    root = parse_html(s)
    root.text_content()
    strip_tags_text(s)
    decode_html_bytes(s.encode("utf-8", errors="ignore"))


_JSONish = st.recursive(
    st.none() | st.booleans() | st.integers(-2**31, 2**31) | st.text(max_size=12),
    lambda inner: st.lists(inner, max_size=4)
    | st.dictionaries(st.text(max_size=6), inner, max_size=4),
    max_leaves=20,
)


@given(_JSONish)
@settings(max_examples=300, deadline=None)
def test_strip_empty_idempotent_and_serializable(v):
    once = strip_empty(v)
    assert strip_empty(once) == once  # idempotent
    s = canonical_json(v)
    json.loads(s)  # always valid JSON
    assert canonical_json(json.loads(s)) == s  # canonical fixpoint


def test_alpha_keys_option():
    html = (
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
    ).encode()
    rec = extract_document("u", html, ExtractOptions(alpha_keys=True))
    t = json.loads(rec["extraction_json"])["tables"][0]
    assert t["rows"][0]["c"] == {"A": "h1", "B": "h2"}
    assert t["rows"][1]["c"] == {"A": 1, "B": 2}
