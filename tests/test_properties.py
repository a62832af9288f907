"""Property-based tests (hypothesis) over the pure-Python cores that the
Spark operators are built from: URL canonicalization, the dedup fold
comparator, Bloom-filter indexing, and extraction robustness."""

from __future__ import annotations

import re
import string

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from commoncrawl_spark.functions.extract import extract_from_warc_bytes
from commoncrawl_spark.functions.urls import (
    canonicalize_url_py,
    canonicalize_urls_series,
)
from commoncrawl_spark.operators.dedup import (
    choose_better_record_py,
    deduplicate_records_py,
)
from commoncrawl_spark.operators.seen_set import _bloom_params, _key_indices

_host = st.from_regex(r"[a-z0-9]([a-z0-9\-]{0,20}[a-z0-9])?(\.[a-z]{2,6}){1,2}",
                      fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~\-]{0,12}){0,5}/?", fullmatch=True)
_query = st.one_of(st.just(""), st.from_regex(r"\?[a-z]=[0-9]{1,4}", fullmatch=True))
_frag = st.one_of(st.just(""), st.just("#top"))
_scheme = st.sampled_from(["http://", "https://", "https://www."])


@st.composite
def urls(draw):
    return draw(_scheme) + draw(_host) + draw(_path) + draw(_query) + draw(_frag)


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_and_scheme_insensitive(url):
    c1 = canonicalize_url_py(url)
    # idempotent when re-wrapped in a scheme
    assert canonicalize_url_py("https://" + c1) == c1
    # scheme and www never survive
    assert not c1.startswith(("http://", "https://", "www."))
    # query/fragment dropped
    assert "?" not in c1 and "#" not in c1


@given(st.lists(urls(), min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_vectorized_canonicalize_matches_scalar(batch):
    got = canonicalize_urls_series(pd.Series(batch), punycode=False).tolist()
    want = [canonicalize_url_py(u) for u in batch]
    assert got == want


_record = st.fixed_dictionaries(
    {
        "url": st.just("https://example.test/a"),
        "status": st.sampled_from(["200", "301", "404", "503", ""]),
        "mime_detected": st.sampled_from(
            ["text/html", "application/pdf", "", None]
        ),
        "length": st.one_of(
            st.integers(0, 10**6).map(str), st.just("x"), st.just("")
        ),
        "timestamp": st.from_regex(r"20[0-2][0-9]{11}", fullmatch=True),
    }
)


@given(_record, _record)
@settings(max_examples=300, deadline=None)
def test_fold_comparator_invariants(a, b):
    w = choose_better_record_py(a, b)
    assert w is a or w is b  # winner always one of the inputs
    # criterion 1 dominates: a 200 never loses to a non-200
    if a.get("status") == "200" and b.get("status") != "200":
        assert w is a
    if b.get("status") == "200" and a.get("status") != "200":
        assert w is b


@given(st.lists(_record, min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_fold_winner_in_best_status_tier(records):
    out = deduplicate_records_py(records, lambda u: u)
    (winner,) = out.values()
    if any(r.get("status") == "200" for r in records):
        assert winner.get("status") == "200"


_sha1_hex = st.from_regex(r"[0-9a-f]{40}", fullmatch=True)


@given(st.lists(_sha1_hex, min_size=1, max_size=500, unique=True),
       st.floats(0.001, 0.1))
@settings(max_examples=50, deadline=None)
def test_bloom_zero_false_negatives(keys, fp_rate):
    m, k = _bloom_params(len(keys), fp_rate)
    s = pd.Series(keys)
    idx = _key_indices(s, m, k)
    bits = np.zeros(m // 8, dtype=np.uint8)
    flat = idx.ravel()
    np.bitwise_or.at(bits, flat // 8, (1 << (flat % 8)).astype(np.uint8))
    # probe with the identical index function: every member must hit
    probe = _key_indices(s, m, k)
    hit = np.ones(len(keys), dtype=bool)
    for j in range(k):
        hit &= (bits[probe[:, j] // 8] >> (probe[:, j] % 8) & 1).astype(bool)
    assert hit.all()


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_extraction_never_raises(blob):
    out = extract_from_warc_bytes(blob)
    assert isinstance(out, dict)
    assert out.get("error") is not None or out.get("text") is not None


@given(st.text(alphabet=string.printable, min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_extraction_handles_arbitrary_html_fragments(fragment):
    payload = (
        b"WARC/1.0\r\nX: y\r\n\r\nHTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n\r\n"
        + fragment.encode("utf-8", "ignore")
    )
    out = extract_from_warc_bytes(payload)
    assert isinstance(out, dict)
