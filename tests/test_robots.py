"""robots.txt parsing (Catalyst fold) vs the pure-Python oracle, plus
end-to-end gating through apply_robots."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from commoncrawl_spark.operators.schedule import (
    apply_robots,
    parse_robots_py,
    parse_robots_txt,
)

CASES = [
    # the classic: one star group
    "User-agent: *\nDisallow: /private\nDisallow: /tmp\nCrawl-delay: 2",
    # group for another bot only
    "User-agent: badbot\nDisallow: /",
    # consecutive user-agents sharing a group, star among them
    "User-agent: badbot\nUser-agent: *\nDisallow: /x",
    # star group ends when a new group starts
    "User-agent: *\nDisallow: /a\n\nUser-agent: bot\nDisallow: /b",
    # empty disallow = allow all; comments; mixed case; CRLF
    "user-AGENT: *   # hi\r\nDISALLOW:\r\ndisallow: /c # tail\r\ncrawl-delay: 0.5",
    # unparseable delay ignored, later delay wins
    "User-agent: *\nCrawl-delay: soon\nCrawl-delay: 3\nDisallow: /d",
    # no star group at all
    "User-agent: a\nDisallow: /x\n\nUser-agent: b\nDisallow: /y",
    # rules before any user-agent line are ignored
    "Disallow: /early\nUser-agent: *\nDisallow: /late",
    # Allow collected for the star group only
    "User-agent: *\nAllow: /public\nDisallow: /\n\n"
    "User-agent: bot\nAllow: /bot-only",
    "",
]


@pytest.mark.spark
def test_parse_robots_matches_oracle_on_cases(spark):
    df = spark.createDataFrame(
        [(f"h{i}.test", t) for i, t in enumerate(CASES)], "host string, robots_txt string"
    )
    got = {
        r["host"]: (list(r["disallow_prefixes"] or []),
                    list(r["allow_prefixes"] or []), r["crawl_delay_s"])
        for r in parse_robots_txt(df).collect()
    }
    for i, t in enumerate(CASES):
        assert got[f"h{i}.test"] == parse_robots_py(t), f"case {i}: {t!r}"


line_st = st.one_of(
    st.sampled_from(["User-agent: *", "User-agent: bot", "user-agent: Other"]),
    st.sampled_from(["Disallow: /a", "Disallow: /b/c", "Disallow:", "disallow: /"]),
    st.sampled_from(["Crawl-delay: 1", "Crawl-delay: 2.5", "crawl-delay: x"]),
    st.sampled_from(["", "# comment", "Allow: /ok", "Sitemap: http://s"]),
)


@pytest.mark.spark
@settings(max_examples=25, deadline=None)
@given(st.lists(line_st, max_size=12))
def test_parse_robots_matches_oracle_fuzz(spark, lines):
    text = "\n".join(lines)
    df = spark.createDataFrame([("h.test", text)], "host string, robots_txt string")
    r = parse_robots_txt(df).first()
    assert (list(r["disallow_prefixes"] or []),
            list(r["allow_prefixes"] or []),
            r["crawl_delay_s"]) == parse_robots_py(text)


@pytest.mark.spark
def test_parsed_rules_gate_the_frontier(spark):
    robots_raw = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /private\nCrawl-delay: 2")],
        "host string, robots_txt string",
    )
    rules = parse_robots_txt(robots_raw)
    frontier = spark.createDataFrame(
        [
            ("a.test", "https://a.test/private/x"),
            ("a.test", "https://a.test/public/y"),
            ("b.test", "https://b.test/private/z"),  # no rules -> permissive
        ],
        "host string, url string",
    )
    kept = {r["url"] for r in apply_robots(frontier, rules).collect()}
    assert kept == {"https://a.test/public/y", "https://b.test/private/z"}


@pytest.mark.spark
def test_fetch_robots_rules_through_transport(spark, tmp_path):
    """robots.txt bodies fetched through the transport seam and parsed
    JVM-side; an unreachable host yields no row (permissive default),
    and the rules gate a real crawl round."""
    from pyspark.sql import functions as F

    from commoncrawl_spark.operators.schedule import (
        apply_robots,
        fetch_robots_rules,
    )
    from commoncrawl_spark.sources.transport import LookupJoinTransport

    robots_pages = spark.createDataFrame(
        [
            ("https://a.test/robots.txt",
             b"User-agent: *\nDisallow: /private\nCrawl-delay: 2"),
            ("https://b.test/robots.txt", b"User-agent: *\nDisallow:"),
            # c.test has no robots.txt -> not_found -> permissive
        ],
        "url string, html binary",
    )
    hosts = spark.createDataFrame(
        [("a.test",), ("b.test",), ("c.test",)], "host string"
    )
    rules = fetch_robots_rules(hosts, LookupJoinTransport(robots_pages))
    got = {r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay_s"])
           for r in rules.collect()}
    assert got == {"a.test": (["/private"], 2.0), "b.test": ([], None)}

    frontier = spark.createDataFrame(
        [("https://a.test/private/x",), ("https://a.test/ok",),
         ("https://c.test/anything",)],
        "url string",
    )
    kept = {r["url"] for r in apply_robots(frontier, rules).collect()}
    assert kept == {"https://a.test/ok", "https://c.test/anything"}


@pytest.mark.spark
def test_allow_longest_match_precedence(spark):
    """RFC 9309 longest-match: Disallow:/ + Allow:/public admits
    /public/* only; a deeper Disallow re-blocks under an Allow; equal
    lengths are least-restrictive (Allow wins)."""
    robots_raw = spark.createDataFrame(
        [("h.test",
          "User-agent: *\nDisallow: /\nAllow: /public\n"
          "Disallow: /public/private\nAllow: /dup\nDisallow: /dup")],
        "host string, robots_txt string")
    rules = parse_robots_txt(robots_raw)
    urls = ["https://h.test/", "https://h.test/x",
            "https://h.test/public/a", "https://h.test/public/private/b",
            "https://h.test/dup/z"]
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    kept = {r["url"] for r in apply_robots(frontier, rules).collect()}
    assert kept == {"https://h.test/public/a", "https://h.test/dup/z"}


@pytest.mark.spark
def test_wildcard_and_anchor_rules(spark):
    """RFC 9309 pattern metacharacters: '*' matches any sequence, a
    trailing '$' anchors the end; regex specials in rules are literal;
    Allow wildcards participate in longest-match precedence."""
    robots_raw = spark.createDataFrame(
        [("h.test",
          "User-agent: *\n"
          "Disallow: /*.pdf$\n"
          "Disallow: /tmp*trash\n"
          "Disallow: /a+b\n"           # '+' is literal, not regex
          "Disallow: /docs/\n"
          "Allow: /docs/*/public\n")],
        "host string, robots_txt string")
    rules = parse_robots_txt(robots_raw)
    urls = {
        "https://h.test/x/report.pdf": False,      # *.pdf$ blocks
        "https://h.test/x/report.pdf.html": True,  # anchor: not an end match
        "https://h.test/tmp123trash/z": False,     # mid-wildcard blocks
        "https://h.test/a+b/c": False,             # literal '+' blocks
        "https://h.test/aab/c": True,              # would match only as regex
        "https://h.test/docs/x": False,            # plain prefix blocks
        "https://h.test/docs/x/public/y": True,    # longer Allow wildcard wins
    }
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    kept = {r["url"] for r in apply_robots(frontier, rules).collect()}
    for u, want_kept in urls.items():
        assert (u in kept) == want_kept, u


# ---------------------------------------------------------------------------
# robots / politeness compliance audit
# ---------------------------------------------------------------------------

def test_compliance_audit_counts_violations(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.schedule import (
        parse_robots_txt, robots_compliance_audit)
    robots = parse_robots_txt(spark.createDataFrame([
        Row(host="a.test",
            robots_txt="User-agent: *\nDisallow: /private\nCrawl-delay: 3"),
        Row(host="b.test",
            robots_txt="User-agent: *\nDisallow: /priv*"),
    ]))
    log = spark.createDataFrame([
        # a.test: one disallowed fetch + one 1s gap under the 3s delay
        Row(host="a.test", url="https://a.test/page/1", fetched_at=0.0),
        Row(host="a.test", url="https://a.test/private/x", fetched_at=1.0),
        Row(host="a.test", url="https://a.test/page/2", fetched_at=10.0),
        # b.test: wildcard-disallowed fetch, no delay declared
        Row(host="b.test", url="https://b.test/priv/zz", fetched_at=0.0),
        Row(host="b.test", url="https://b.test/ok", fetched_at=0.5),
        # c.test: no robots row at all -> fully compliant
        Row(host="c.test", url="https://c.test/x", fetched_at=0.0),
    ])
    out = {r["host"]: r
           for r in robots_compliance_audit(log, robots).collect()}
    a = out["a.test"]
    assert (a["n_fetches"], a["n_disallowed"], a["n_delay_violations"]) \
        == (3, 1, 1)
    assert a["min_gap_s"] == 1.0 and not a["compliant"]
    b = out["b.test"]
    assert (b["n_disallowed"], b["n_delay_violations"]) == (1, 0)
    assert not b["compliant"]
    c = out["c.test"]
    assert c["n_disallowed"] == 0 and c["min_gap_s"] is None
    assert c["compliant"]


def test_compliance_audit_allow_override_and_plan(spark):
    from pyspark.sql import Row
    from commoncrawl_spark.operators.schedule import (
        parse_robots_txt, robots_compliance_audit)
    robots = parse_robots_txt(spark.createDataFrame([
        Row(host="a.test",
            robots_txt="User-agent: *\nDisallow: /p\nAllow: /p/ok"),
    ]))
    log = spark.createDataFrame([
        Row(host="a.test", url="https://a.test/p/ok/1", fetched_at=0.0),
        Row(host="a.test", url="https://a.test/p/bad", fetched_at=9.0),
    ])
    out = robots_compliance_audit(log, robots)
    row = out.collect()[0]
    assert row["n_disallowed"] == 1  # /p/ok survives by longest-match Allow
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import sys
    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    from scripts.plan_audit import partitionless_windows
    assert partitionless_windows(plan) == []
