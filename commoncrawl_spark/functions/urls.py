"""URL canonicalization and keying.

Semantics from the reference's ``normalize_url``
(``/root/reference/download_and_merge.py:187-196``, identical copies at
cc_merge_indexes.py:154-163 and main_merge_and_deduplicate.py:11-20):

    parsed = urlparse(url)
    netloc = parsed.netloc.lower();  strip leading "www."
    path   = parsed.path.rstrip("/")
    key    = netloc + path            # drops scheme, query, fragment
    (on any parse error: the raw url)

Two implementations with identical outputs on the URL domain the engine
sees (scheme://host/path[?query][#frag]):

- ``canonicalize_url_col``  — pure Catalyst expression chain (regexp), the
  hot path: JVM-side, codegen'd, no Python.
- ``canonicalize_urls_series`` / ``canonicalize_udf`` — vectorized pandas
  path adding punycode (IDNA) host normalization per the north rule; used
  when URLs may carry non-ASCII hosts.

Keys: the engine's seen-set key is ``sha1(canonical_url)`` (north rule);
the reference's per-record file id was ``md5(url)``
(download_warc_segments.py:46-48) — kept as ``page_id_col`` for parity.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


def canonicalize_url_col(url: Column) -> Column:
    """Catalyst-native canonical URL: lower(host) minus www., path minus
    trailing '/', query/fragment dropped. NULL-safe; non-URL strings pass
    through unchanged (the reference's ``except: return url``)."""
    # strip scheme, then split "netloc" = up to first '/', path = the rest
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    netloc = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    netloc = F.regexp_replace(netloc, r"^www\.", "")
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    # no scheme separator -> urlparse sees an empty netloc and the whole
    # string (minus query/fragment) as the path; case is preserved
    bare = F.regexp_replace(F.regexp_extract(url, r"^([^?#]*)", 1), r"/+$", "")
    return F.when(url.rlike(_SCHEME_RE), F.concat(netloc, path)).otherwise(bare)


def host_col(url: Column) -> Column:
    """Lowercased registrable host (netloc minus www. and port) — the
    politeness-scheduler partition key."""
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    netloc = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    netloc = F.regexp_replace(netloc, r"^www\.", "")
    return F.regexp_replace(netloc, r":\d+$", "")


def url_key_col(url: Column) -> Column:
    """Seen-set key: sha1 hex of the canonical URL (north rule)."""
    return F.sha1(canonicalize_url_col(url))


def page_id_col(url: Column) -> Column:
    """Reference-parity record id: md5 hex of the *raw* url
    (download_warc_segments.py:46-48)."""
    return F.md5(url)


def surt_col(url: Column) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform — the key format
    of real Common Crawl CDX indexes and OpenWayback):
    ``com,example)/path?query`` — host labels reversed and comma-joined,
    lowercased, www. and port dropped, ``)`` separator, path+query
    lowercased, fragment dropped, trailing slash trimmed.

    The point at corpus scale is LOCALITY: a table sorted (or
    range-partitioned) on the SURT clusters every URL of a registrable
    domain — and all its subdomains — into one contiguous range, so
    "everything under example.com" is a prefix scan with partition
    pruning instead of a full-table host filter. Pure Catalyst: one
    array_reverse over the split host labels."""
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    netloc = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    netloc = F.regexp_replace(netloc, r"^www\.", "")
    netloc = F.regexp_replace(netloc, r":\d+$", "")
    rev_host = F.array_join(F.reverse(F.split(netloc, r"\.")), ",")
    # trailing-slash trim applies to the PATH only — a slash ending a
    # query value (?next=/home/) is data and must survive
    path = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)),
        r"/+$", "")
    query = F.lower(F.regexp_extract(rest, r"^[^#?]*(\?[^#]*)", 1))
    return F.concat(rev_host, F.lit(")"), path, query)


def url_features(url: Column) -> dict[str, Column]:
    """URL structure signals for frontier prioritization and URL-level
    quality filtering (the FineWeb-style URL heuristics): crawl
    schedulers prefer shallow, parameter-free, human-readable URLs;
    deep paths, long query strings, and digit-heavy segments correlate
    with calendars, session ids, faceted-search explosions, and
    pagination traps. All pure Catalyst regex/array expressions over
    the same scheme/netloc split as :func:`canonicalize_url_col` —
    scan-stage, no shuffle, exact DuckDB twins (RE2-safe patterns).

    Signals: ``path_depth`` (non-empty path segments), ``path_len``
    (path characters), ``n_params`` (&-separated query parameters),
    ``is_homepage`` (empty path, no query), ``digit_ratio`` (digits /
    path characters, 4dp), ``url_len``.
    """
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(rest, r"^[^#?]*\?([^#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    path_digits = F.length(F.regexp_replace(path, r"[^0-9]", ""))
    return {
        "path_depth": F.size(segs),
        "path_len": F.length(path),
        "n_params": F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&"))),
        "is_homepage": (F.size(segs) == 0) & (query == ""),
        "digit_ratio": F.round(
            path_digits
            / F.greatest(F.length(path), F.lit(1)).cast("double"), 4),
        "url_len": F.length(url),
    }


# --------------------------------------------------------------------------
# Python / pandas path (oracle + punycode variant)
# --------------------------------------------------------------------------

def canonicalize_url_py(url: str, punycode: bool = False) -> str:
    """Reference-faithful scalar canonicalization (the test oracle)."""
    try:
        parsed = urlparse(url)
        netloc = parsed.netloc.lower()
        if netloc.startswith("www."):
            netloc = netloc[4:]
        if punycode and netloc and not netloc.isascii():
            host, sep, port = netloc.partition(":")
            try:
                host = host.encode("idna").decode("ascii")
            except UnicodeError:
                pass
            netloc = host + sep + port
        path = parsed.path.rstrip("/")
        return f"{netloc}{path}"
    except Exception:  # noqa: BLE001 - reference behavior (bare except)
        return url


def canonicalize_urls_series(urls: pd.Series, punycode: bool = True) -> pd.Series:
    """Vectorized canonicalization over an Arrow batch; fast path via pandas
    string ops, falling back per-value only for non-ASCII hosts. NULL in ->
    NULL out, matching the Catalyst path exactly."""
    null_mask = urls.isna()
    s = urls.fillna("")
    has_scheme = s.str.match(_SCHEME_RE)
    rest = s.str.replace(_SCHEME_RE, "", regex=True)
    netloc = rest.str.extract(r"^([^/?#]*)", expand=False).str.lower()
    netloc = netloc.str.replace(r"^www\.", "", regex=True)
    path = rest.str.extract(r"^[^/?#]*([^?#]*)", expand=False)
    path = path.str.replace(r"/+$", "", regex=True)
    bare = s.str.extract(r"^([^?#]*)", expand=False).str.replace(r"/+$", "", regex=True)
    out = (netloc + path).where(has_scheme, bare)
    if punycode:
        non_ascii = out.map(lambda v: not v.isascii(), na_action="ignore").fillna(False)
        if non_ascii.any():
            out.loc[non_ascii] = urls[non_ascii].map(
                lambda u: canonicalize_url_py(u, punycode=True)
            )
    if null_mask.any():
        out = out.where(~null_mask, None)
    return out


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Arrow-vectorized canonical URL with punycode host normalization."""
    return canonicalize_urls_series(urls, punycode=True)


def url_template_col(url: Column) -> Column:
    """Collapse a URL to its structural template: digit runs in the
    path become ``D``, every query VALUE becomes ``V`` (keys are
    structure, values are data). Calendars, session ids, pagination,
    and faceted-search explosions generate unbounded distinct URLs
    from a handful of templates — the crawler-trap signature
    ``host_trap_stats`` aggregates. Scan-stage regex, RE2-safe. The
    template's host prefix IS :func:`host_col` — the trap aggregation
    groups on the same key, and any future host normalization change
    moves both together."""
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    netloc = host_col(url)
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1),
        r"[0-9]+", "D")
    query = F.regexp_extract(rest, r"^[^#?]*(\?[^#]*)", 1)
    query = F.regexp_replace(query, r"=[^&#]*", "=V")
    return F.concat(netloc, path, query)


# second-level labels that act as public suffixes under a 2-letter ccTLD
# (PSL-lite: the handful that covers the overwhelming majority of
# multi-label registrations; the full Mozilla Public Suffix List is a
# data-file drop-in replacing this set — the column logic is unchanged)
_PSL_LITE_2LD = ("co", "com", "net", "org", "gov", "ac", "edu")


def registered_domain_col(host: Column) -> Column:
    """Registered (pay-level) domain of a hostname — the key the
    Common Crawl domain-level web graph aggregates on: ``a.b.co.uk`` ->
    ``b.co.uk``, ``www.example.org`` -> ``example.org``, bare or
    single-label hosts pass through. Heuristic PSL-lite rule: take the
    last THREE labels when the TLD is 2 letters and the second-level
    label is a known public-suffix word (co/com/net/org/gov/ac/edu),
    else the last two. Pure per-row array expressions — scan-stage,
    no shuffle, replayable in any SQL engine."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    sld = F.element_at(labels, -2)
    take3 = (
        (n >= F.lit(3))
        & (F.length(tld) == 2)
        & sld.isin(*_PSL_LITE_2LD)
    )
    last = lambda k: F.concat_ws(  # noqa: E731
        ".", F.slice(labels, n - k + 1, k))
    return (
        F.when(n <= 1, host)
        .when(take3, last(3))
        .otherwise(last(2))
    )
