"""Per-host politeness scheduling with hot-host salting (W5).

The reference paces fetches with ``time.sleep(0.2)`` between serial
requests (fetch_guardian_fulltext.py:130) and caps concurrency
(download_warc_segments.py:30, download_and_merge.py:18) — a global
budget over a single-host corpus (create_tasks.py:10 is 100%
theguardian.com). The engine generalizes that to a per-host, per-round
fetch budget: each crawl round may take at most ``budget`` URLs per
host, ordered by frontier priority.

A naive ``Window.partitionBy(host)`` puts the entire 10^10-URL frontier
of a single-host corpus into ONE shuffle partition. The scheduler
therefore selects in two stages:

1. **salted local top-B** — window over ``(host, salt)`` where
   ``salt = pmod(xxhash64(url_sha1), K)``; each of the K sub-partitions
   keeps its own top-``budget`` rows. The per-host top-``budget`` set is
   a subset of the union of per-salt top-``budget`` sets, so no winner
   is lost, and no shuffle partition ever holds more than ~1/K of a hot
   host's frontier.
2. **exact top-B per host** — a second window over ``host`` alone, but
   now over at most ``K * budget`` rows per host, so the skewed
   partition is bounded by construction, not by data.

Both stages are plain window ``row_number`` — JVM, codegen, AQE-skew
friendly. Priority order is the reference's deterministic crawl order:
(crawl_rank, page, line_no) (SURVEY.md §3 "crawl-ordering determinism").

Robots gating (north rule): a broadcast join against the per-host rules
table; a URL whose path starts with any disallowed prefix never enters
the schedule.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import host_col

DEFAULT_PRIORITY = ("crawl_rank", "page", "line_no")


def with_host(df: DataFrame, url_col: str = "url", out_col: str = "host") -> DataFrame:
    return df.withColumn(out_col, host_col(F.col(url_col)))


def url_path_col(url):
    """Path component of a URL column (scheme/host stripped, query kept off)."""
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    return F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)


def robots_rules_col(txt):
    """Parse raw robots.txt text into ``struct(disallow_prefixes
    array<string>, allow_prefixes array<string>, crawl_delay_s double)``
    for the ``*`` user-agent — entirely Catalyst (one ``aggregate`` fold
    over the lines), so a table of millions of fetched robots bodies
    parses JVM-side with no Python.

    Semantics (the common-crawler simplification of RFC 9309): groups are
    runs of consecutive ``User-agent:`` lines followed by rules; a group
    applies iff any of its agents is ``*``; ``Disallow:``/``Allow:`` with
    an empty value are no-ops; the last ``Crawl-delay:`` in an applicable
    group wins; ``#`` comments stripped; keys case-insensitive.
    Allow/Disallow precedence (longest prefix wins, Allow on ties — RFC
    9309 §2.4.2's least-restrictive rule) is decided at match time in
    ``apply_robots``; ``*``/``$`` pattern metacharacters are not
    interpreted (prefix semantics, the common simplification).
    """
    lines = F.transform(
        F.split(txt, r"\r?\n"),
        lambda l: F.trim(F.regexp_replace(l, "#.*$", "")),
    )
    init = F.struct(
        F.lit(False).alias("active"),
        F.lit(False).alias("prev_ua"),
        F.array().cast("array<string>").alias("dis"),
        F.array().cast("array<string>").alias("alw"),
        F.lit(None).cast("double").alias("delay"),
    )

    def step(acc, l):
        low = F.lower(l)
        val = F.trim(F.regexp_replace(l, r"^[A-Za-z\-]+\s*:", ""))
        is_ua = low.rlike(r"^user-agent\s*:")
        is_dis = low.rlike(r"^disallow\s*:")
        is_alw = low.rlike(r"^allow\s*:")
        is_delay = low.rlike(r"^crawl-delay\s*:")
        is_star = is_ua & (val == "*")
        active = (
            F.when(is_ua & acc["prev_ua"], acc["active"] | is_star)
            .when(is_ua, is_star)
            .otherwise(acc["active"])
        )
        return F.struct(
            active.alias("active"),
            is_ua.alias("prev_ua"),
            F.when(is_dis & acc["active"] & (val != ""),
                   F.array_append(acc["dis"], val))
            .otherwise(acc["dis"]).alias("dis"),
            F.when(is_alw & acc["active"] & (val != ""),
                   F.array_append(acc["alw"], val))
            .otherwise(acc["alw"]).alias("alw"),
            F.when(is_delay & acc["active"],
                   F.coalesce(val.try_cast("double"), acc["delay"]))
            .otherwise(acc["delay"]).alias("delay"),
        )

    return F.aggregate(
        lines, init, step,
        lambda acc: F.struct(
            acc["dis"].alias("disallow_prefixes"),
            acc["alw"].alias("allow_prefixes"),
            acc["delay"].alias("crawl_delay_s"),
        ),
    )


def parse_robots_txt(df: DataFrame, host_col_name: str = "host",
                     text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> the rules table ``apply_robots`` consumes."""
    rules = robots_rules_col(F.col(text_col))
    return df.select(
        host_col_name,
        rules["disallow_prefixes"].alias("disallow_prefixes"),
        rules["allow_prefixes"].alias("allow_prefixes"),
        rules["crawl_delay_s"].alias("crawl_delay_s"),
    )


def parse_robots_py(text: str) -> tuple[list[str], list[str], float | None]:
    """Pure-Python oracle for robots_rules_col (same simplified RFC 9309
    semantics), used by tests only. Returns (disallow, allow, delay)."""
    import re

    active = prev_ua = False
    dis: list[str] = []
    alw: list[str] = []
    delay: float | None = None
    for raw in re.split(r"\r?\n", text):
        line = re.sub(r"#.*$", "", raw).strip()
        low = line.lower()
        val = re.sub(r"^[A-Za-z\-]+\s*:", "", line).strip()
        if re.match(r"^user-agent\s*:", low):
            is_star = val == "*"
            active = (active or is_star) if prev_ua else is_star
            prev_ua = True
            continue
        if re.match(r"^disallow\s*:", low):
            if active and val:
                dis.append(val)
        elif re.match(r"^allow\s*:", low):
            if active and val:
                alw.append(val)
        elif re.match(r"^crawl-delay\s*:", low):
            if active:
                try:
                    delay = float(val)
                except ValueError:
                    pass
        prev_ua = False
    return dis, alw, delay


def fetch_robots_rules(hosts: DataFrame, transport,
                       scheme: str = "https") -> DataFrame:
    """hosts(host, ...) -> the per-host rules table ``apply_robots``
    consumes, by fetching ``{scheme}://{host}/robots.txt`` through the
    injectable transport (S5 seam, sources/transport.py) and parsing the
    bodies JVM-side (``robots_rules_col`` — a Catalyst fold, no Python).

    Hosts whose robots fetch fails get NO row: absent hosts are
    permissive in ``apply_robots`` — the reference-faithful default (the
    reference has no robots handling at all) and the common-crawler
    convention for unreachable robots. One row per host, so the result
    is broadcast-sized even at millions of hosts."""
    batch = hosts.select("host").distinct().withColumn(
        "url",
        F.concat(F.lit(scheme + "://"), F.col("host"), F.lit("/robots.txt")),
    )
    fetched = transport.fetch(batch)
    txt = (
        fetched.filter(F.col("_fetch_error").isNull())
        .select("host", F.col("html").cast("string").alias("robots_txt"))
    )
    return parse_robots_txt(txt)


def with_robots_verdict(frontier: DataFrame, robots: DataFrame,
                        url_col: str = "url") -> DataFrame:
    """Frontier joined to per-host rules plus a ``robots_blocked``
    verdict column (RFC 9309 longest-match, Allow wins ties) — the
    shared kernel of :func:`apply_robots` (which filters on it) and
    :func:`robots_compliance_audit` (which counts it). Rule columns
    are carried through; callers drop what they don't need.

    ``robots(host, disallow_prefixes: array<string>[, allow_prefixes,
    crawl_delay_s])`` is tiny (one row per host) — broadcast, never
    shuffled. Hosts absent from the table are allowed (reference
    behavior: no robots handling at all, so the default must be
    permissive)."""
    has_allow = "allow_prefixes" in robots.columns
    cols = (["host", "disallow_prefixes"]
            + (["allow_prefixes"] if has_allow else [])
            + (["crawl_delay_s"] if "crawl_delay_s" in robots.columns else []))
    rules = F.broadcast(robots.select(*cols))
    df = frontier if "host" in frontier.columns else with_host(frontier, url_col)
    joined = df.join(rules, "host", "left")
    path = url_path_col(F.col(url_col))

    def rule_matches(p):
        """RFC 9309 rule match: plain rules are path prefixes (fast
        startswith); rules carrying '*' (any-sequence) or a trailing
        '$' (end anchor) compile to a per-row regex — escape regex
        specials, strip the anchor, widen the wildcard."""
        anchored = p.endswith("$")
        body = F.when(anchored, F.regexp_replace(p, r"\$$", "")).otherwise(p)
        esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
        wild = F.regexp_replace(esc, r"\*", ".*")
        rx = F.concat(F.lit("^"), wild,
                      F.when(anchored, F.lit("$")).otherwise(F.lit("")))
        return F.when(p.rlike(r"[*]|\$$"), F.regexp_like(path, rx)) \
            .otherwise(path.startswith(p))

    def longest_match(arr_col: str):
        # length of the longest matching rule (0 = none); RFC 9309
        # measures specificity in rule octets
        return F.aggregate(
            F.coalesce(F.col(arr_col), F.array()),
            F.lit(0),
            lambda acc, p: F.greatest(
                acc, F.when(rule_matches(p), F.length(p)).otherwise(0)),
        )

    # RFC 9309 §2.4.2 longest-match precedence; equal lengths are
    # least-restrictive, i.e. Allow wins the tie. Without an allow
    # column the allow side is the constant 0 (pure disallow gating).
    la = longest_match("allow_prefixes") if has_allow else F.lit(0)
    blocked = longest_match("disallow_prefixes") > la
    return joined.withColumn("robots_blocked", blocked)


def apply_robots(frontier: DataFrame, robots: DataFrame,
                 url_col: str = "url") -> DataFrame:
    """Drop URLs disallowed by per-host rules (see
    :func:`with_robots_verdict` for the match semantics and the
    broadcast shape). ``crawl_delay_s``, when present, is carried
    through for budget derivation (see select_polite_batch)."""
    has_allow = "allow_prefixes" in robots.columns
    drop = (["disallow_prefixes", "robots_blocked"]
            + (["allow_prefixes"] if has_allow else []))
    return (
        with_robots_verdict(frontier, robots, url_col)
        .filter(~F.col("robots_blocked"))
        .drop(*drop)
    )


def robots_compliance_audit(
    fetch_log: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetched_at",
    host_col_name: str = "host",
) -> DataFrame:
    """Post-hoc compliance report over what the crawler ACTUALLY
    fetched — the audit table a crawl operator (or an abuse complaint)
    reads: per host, how many fetches hit robots-disallowed paths, and
    how many consecutive-fetch gaps undercut the host's Crawl-delay.
    A scheduler bug, a stale robots cache, or a retry path that skips
    the politeness gate all surface here; the reference has no robots
    handling at all (SURVEY §2.5 W5), which this table would score as
    n_disallowed = every fetch of a disallowed path.

    Output per host: ``n_fetches``, ``n_disallowed`` (RFC 9309
    longest-match verdicts via :func:`with_robots_verdict`),
    ``n_delay_violations`` (gaps below ``crawl_delay_s``; hosts with
    no declared delay never violate), ``min_gap_s`` (tightest observed
    spacing, 6dp; null for single-fetch hosts), and ``compliant``.

    Scale shape: the rules join is the same |hosts|-row broadcast as
    apply_robots; the gap check is one lag window PARTITIONED BY host
    ordered by (ts, url) — deterministic under same-second fetches —
    and one map-side-partial host aggregate. No Python."""
    # with_robots_verdict joins rules on the literal 'host' column;
    # normalize a differently-named input up front so the verdict,
    # the gap window, and the rollup all key on the SAME column (a
    # half-honored rename would attribute violations to the wrong
    # host), then restore the caller's name on output.
    log = (fetch_log.withColumnRenamed(host_col_name, "host")
           if host_col_name != "host" else fetch_log)
    v = with_robots_verdict(log, robots, url_col)
    if "crawl_delay_s" not in v.columns:
        v = v.withColumn("crawl_delay_s", F.lit(None).cast("double"))
    w = Window.partitionBy("host").orderBy(
        F.col(ts_col).asc(), F.col(url_col).asc())
    gap = F.col(ts_col).cast("double") - F.lag(
        F.col(ts_col).cast("double")).over(w)
    per = v.withColumn("_gap", gap)
    out = (
        per.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum(F.col("robots_blocked").cast("long"))
            .alias("n_disallowed"),
            F.sum(
                F.when(
                    F.col("_gap").isNotNull()
                    & F.col("crawl_delay_s").isNotNull()
                    & (F.col("_gap") < F.col("crawl_delay_s")),
                    F.lit(1)).otherwise(F.lit(0)).cast("long"))
            .alias("n_delay_violations"),
            F.round(F.min("_gap"), 6).alias("min_gap_s"),
        )
        .withColumn(
            "compliant",
            (F.col("n_disallowed") == 0)
            & (F.col("n_delay_violations") == 0))
    )
    return (out.withColumnRenamed("host", host_col_name)
            if host_col_name != "host" else out)


def crawl_budget(
    frontier: DataFrame,
    total_budget: int,
    round_seconds: float = 3600.0,
    robots: DataFrame | None = None,
    p_col: str = "p_changed",
    quality_col: str | None = None,
    host_col: str = "host",
    min_per_host: int = 0,
) -> DataFrame:
    """Per-host fetch quotas for one crawl round: split a global
    ``total_budget`` across hosts in proportion to expected VALUE, then
    clamp to what each host permits and holds. The value weight is
    ``mean(quality) * Σ p_changed`` — the expected number of
    changed-and-worth-having pages (:func:`temporal.recrawl_schedule`'s
    ``p_changed`` summed over the host's pending URLs, optionally
    scaled by a host quality prior); the clamps are the politeness
    ceiling ``floor(round_seconds / crawl_delay_s)`` (robots
    crawl-delay — a host allowing one fetch per 30 s can absorb at most
    120 fetches in an hour round no matter its weight) and the pending
    count. The result's ``quota`` column is exactly what
    :func:`select_polite_batch` takes as ``budget_col``, closing the
    loop: budget -> polite top-k -> fetch.

    Shares are rounded to 6dp before the floor (the engine's
    cross-engine float convention), so quotas are a pure function of
    the inputs. Floor + clamps means Σ quota ≤ total_budget + #hosts ·
    ``min_per_host`` — largest-remainder exactness is not worth a
    second shuffle.

    Scale shape (10^9 pending URLs, 10^7 hosts):
    - ONE map-side-partial aggregate on the host key is the only
      corpus-scale pass;
    - the robots frame (one slim row per host) joins the per-host
      frame host-to-host; the weight total rides a 1-row broadcast
      crossJoin (the ``lm.py`` totals pattern) — no driver collect, no
      window anywhere.

    Returns ``(host_col, n_pending, expected_changed, host_quality,
    politeness_cap, quota)``.
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    qual = (F.avg(F.col(quality_col)) if quality_col is not None
            else F.lit(1.0))
    per_host = (
        frontier.groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("n_pending"),
            F.sum(F.col(p_col)).alias("expected_changed"),
            qual.alias("host_quality"),
        )
    )
    if robots is not None:
        # one row per host, most-restrictive delay wins: a multi-row
        # robots frame (per-user-agent rows, an un-deduped log) would
        # otherwise fan out per_host through the join, double-count its
        # weight in the total, and emit duplicate quota rows
        delay = (
            robots.groupBy(host_col)
            .agg(F.max(F.col("crawl_delay_s").cast("double"))
                 .alias("_delay"))
        )
        per_host = per_host.join(F.broadcast(delay), host_col, "left")
        cap = F.when(
            F.col("_delay") > 0,
            F.floor(F.lit(float(round_seconds)) / F.col("_delay"))
            .cast("long"),
        ).otherwise(F.lit(None).cast("long"))
    else:
        cap = F.lit(None).cast("long")
    per_host = per_host.withColumn("politeness_cap", cap)
    if robots is not None:
        per_host = per_host.drop("_delay")
    weight = F.round(
        F.greatest(F.col("host_quality"), F.lit(0.0))
        * F.greatest(F.col("expected_changed"), F.lit(0.0)), 6)
    per_host = per_host.withColumn("_w", weight)
    tot = per_host.agg(F.sum("_w").alias("_tot"))
    share = F.when(
        F.col("_tot") > 0,
        F.floor(F.round(
            F.lit(float(total_budget)) * F.col("_w") / F.col("_tot"), 6))
        .cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        per_host.crossJoin(F.broadcast(tot))
        .withColumn(
            "quota",
            F.least(
                F.col("n_pending"),
                F.coalesce(F.col("politeness_cap"), F.col("n_pending")),
                F.greatest(share, F.lit(int(min_per_host)).cast("long")),
            ),
        )
        .select(
            host_col, "n_pending",
            F.round("expected_changed", 6).alias("expected_changed"),
            F.round("host_quality", 6).alias("host_quality"),
            "politeness_cap", "quota",
        )
    )


def aimd_host_rates(
    fetch_log: DataFrame,
    host_col_name: str = "host",
    ts_col: str = "ts",
    ok_col: str = "ok",
    init_rate: float = 1.0,
    add: float = 0.25,
    beta: float = 0.5,
    min_rate: float = 0.125,
    max_rate: float = 8.0,
    recent_k: int = 512,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Adaptive per-host politeness rates via AIMD (the TCP congestion
    control rule, applied to crawling): replay each host's recent fetch
    outcomes in time order — a success ADDS ``add`` req/s (capped at
    ``max_rate``), a failure (429/5xx/timeout) MULTIPLIES by ``beta``
    (floored at ``min_rate``). Static crawl-delay budgets
    (:func:`crawl_budget`) obey what robots.txt *declares*; AIMD obeys
    what the server *does* — backing off fast on pressure signals and
    re-probing additively, which is how polite crawlers discover safe
    rates for the long tail of hosts that declare nothing.

    Determinism contract: all defaults are exact binary fractions
    (0.25, 0.5, 0.125, 8.0), so the fold's float state is bit-exact and
    a SQL oracle replaying the same fold matches hash-for-hash. Events
    tie on ``ts`` break by ``tiebreak_cols``.

    Scale shape (10^9 log rows, 10^7 hosts, 1000 executors):
    - ONE hash exchange on the host key; the fold is a scan-stage
      ``aggregate`` lambda over each host's sorted outcome array —
      no window, no Python, no second shuffle;
    - per-host state is bounded by construction: only the LAST
      ``recent_k`` outcomes fold (older history is controller-dead
      anyway — it would be multiplied/capped away), so a hot host
      contributes ``recent_k`` array slots, not its full log;
    - the output is one slim row per host: feed ``rate`` into
      :func:`crawl_budget`'s politeness ceiling or derive
      ``delay = 1/rate`` for the fetch scheduler.

    Returns ``(host, n_events, n_failures, rate)``.
    """
    for name, v in (("init_rate", init_rate), ("add", add),
                    ("min_rate", min_rate), ("max_rate", max_rate)):
        if v <= 0:
            raise ValueError(f"{name} must be > 0, got {v}")
    if not 0.0 < beta < 1.0:
        raise ValueError(f"beta must be in (0, 1), got {beta}")
    ev = F.struct(
        F.col(ts_col).alias("ts"),
        *[F.col(c).alias(c) for c in tiebreak_cols],
        F.col(ok_col).cast("boolean").cast("double").alias("code"),
    )
    grouped = (
        fetch_log.groupBy(F.col(host_col_name).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(~F.col(ok_col).cast("boolean"), 1).otherwise(0))
            .alias("n_failures"),
            F.sort_array(F.collect_list(ev)).alias("_evs"),
        )
    )
    codes = F.transform(F.col("_evs"), lambda e: e["code"])
    recent = F.when(
        F.size(codes) > recent_k,
        F.slice(codes, F.size(codes) - F.lit(recent_k - 1), recent_k),
    ).otherwise(codes)
    rate = F.aggregate(
        recent,
        F.lit(float(init_rate)),
        lambda acc, x: F.when(
            x >= 1.0, F.least(acc + F.lit(float(add)),
                              F.lit(float(max_rate)))
        ).otherwise(
            F.greatest(acc * F.lit(float(beta)), F.lit(float(min_rate)))
        ),
    )
    return grouped.select("host", "n_events", "n_failures",
                          rate.alias("rate"))


def _ring_pos(s):
    """First 8 md5 hex chars as a long in [0, 2^32) — the module-wide
    engine-reproducible uniform hash (selection._md5_u32 convention)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def consistent_host_shards(
    hosts: DataFrame,
    n_shards: int,
    vnodes: int = 64,
    host_col_name: str = "host",
    salt: str = "ring",
) -> DataFrame:
    """Consistent-hash assignment of hosts to fetcher shards (Karger et
    al., STOC 1997 — the memcached/Dynamo ring): each shard owns
    ``vnodes`` pseudo-random ring positions; a host belongs to the
    shard owning the first position clockwise of the host's own hash.
    Why not ``pmod(hash, n)``: resizing the fetcher pool re-shuffles
    EVERY host's affinity (connection pools, robots caches, DNS, AIMD
    rate state all go cold); on the ring, adding a shard steals only
    ~1/(n+1) of each shard's arc and every moved host moves TO the new
    shard — nothing migrates between survivors. Virtual nodes bound the
    arc-size variance so shard load stays even.

    Hashes are the engine-reproducible md5-u32 convention
    (``selection._md5_u32``), so a SQL oracle replays the ring exactly.

    Scale shape: the ring is ``n_shards * vnodes`` rows — config-sized
    — and BROADCASTS; assignment is one map-side-partial ``min_by``
    aggregation per host over the broadcast ring (wrap-around via a
    global-min fallback). No shuffle of the host table beyond its own
    distinct.

    Returns ``(host, shard)``, one row per distinct host.
    """
    if n_shards < 1 or vnodes < 1:
        raise ValueError(
            f"n_shards and vnodes must be >= 1, got {n_shards}/{vnodes}")
    spark = hosts.sparkSession
    ring = (
        spark.range(n_shards).select(F.col("id").alias("shard"))
        .crossJoin(spark.range(vnodes).select(F.col("id").alias("_v")))
        .select(
            "shard",
            _ring_pos(F.concat(
                F.lit(salt + "-"), F.col("shard").cast("string"),
                F.lit("-"), F.col("_v").cast("string"))).alias("pos"))
    )
    h = (
        hosts.select(F.col(host_col_name).alias("host"))
        .filter(F.col("host").isNotNull())
        .distinct()
        .withColumn("_hp", _ring_pos(F.col("host")))
    )
    # deterministic ties: order by (pos, shard), not pos alone
    key = F.struct(F.col("pos"), F.col("shard"))
    clockwise = F.when(F.col("pos") >= F.col("_hp"), key)
    return (
        h.crossJoin(F.broadcast(ring))
        .groupBy("host")
        .agg(
            F.min_by("shard", clockwise).alias("_cw"),
            F.min_by("shard", key).alias("_wrap"),
        )
        .select("host", F.coalesce("_cw", "_wrap").alias("shard"))
    )


def fetch_timetable(
    batch: DataFrame,
    rates: DataFrame,
    round_start: float = 0.0,
    default_rate: float = 1.0,
    host_col_name: str = "host",
    priority_cols: Sequence[str] = ("url",),
) -> DataFrame:
    """Turn a selected polite batch plus per-host rates into a concrete
    dispatch timetable: the k-th URL of a host (0-based, in priority
    order) fires at ``round_start + k / rate`` — the executable
    artifact a fetcher pool consumes, closing the politeness loop
    (:func:`aimd_host_rates` measures what the server tolerates,
    :func:`select_polite_batch` decides WHAT to fetch, this decides
    WHEN). Hosts missing a rate row pace at ``default_rate`` req/s.

    Adds ``host_seq`` (0-based position within the host) and
    ``fetch_at`` (seconds, rounded 6dp). The within-host ordering is
    ``priority_cols`` — deterministic, so re-planning a round
    reproduces the identical timetable (resume safety).

    Scale shape: one window over the HOST key (a real partition key —
    never partition-less; per-host batch size is already bounded by
    the politeness budget upstream) and one slim broadcast-friendly
    join for the rates. No Python.
    """
    w = Window.partitionBy(host_col_name).orderBy(
        *[F.col(c) for c in priority_cols])
    r = rates.select(F.col(host_col_name),
                     F.col("rate").alias("_rate"))
    return (
        batch.withColumn("host_seq", F.row_number().over(w) - 1)
        .join(F.broadcast(r), host_col_name, "left")
        .withColumn(
            "fetch_at",
            F.round(
                F.lit(float(round_start))
                + F.col("host_seq")
                / F.coalesce(F.col("_rate"), F.lit(float(default_rate))),
                6))
        .drop("_rate")
    )


def select_polite_batch(
    frontier: DataFrame,
    budget_per_host: int,
    salt_buckets: int = 16,
    priority_cols: Sequence[str] = DEFAULT_PRIORITY,
    key_col: str = "url_sha1",
    budget_col: str | None = None,
) -> DataFrame:
    """Top-``budget_per_host`` URLs per host by priority, skew-safely.

    Exactness argument: any row in the true per-host top-B is in the
    top-B of its own salt bucket (removing rows from other buckets only
    improves its rank), so stage 1 never discards a stage-2 winner.

    ``budget_col`` (optional, e.g. derived from robots crawl_delay_s)
    gives a per-host budget; it is clamped to ``budget_per_host``, which
    stage 1 uses as the global cap (required for the exactness argument).
    """
    df = frontier if "host" in frontier.columns else with_host(frontier)
    order = [F.col(c).asc() for c in priority_cols]

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets)).cast("int")
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= budget_per_host)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    limit = (
        F.least(F.coalesce(F.col(budget_col), F.lit(budget_per_host)),
                F.lit(budget_per_host))
        if budget_col is not None
        else F.lit(budget_per_host)
    )
    return (
        survivors.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= limit)
    )


def explore_exploit_budget(
    hosts: DataFrame,
    total_budget: int,
    epsilon: float = 0.1,
    host_col_name: str = "host",
    score_col: str = "score",
    known_col: str = "known",
) -> DataFrame:
    """Epsilon-greedy split of a global crawl budget: ``(1-eps)`` of it
    EXPLOITS hosts with observed value (allocated proportional to
    ``score_col`` — pages/quality/change-rate, whatever the crawl
    optimizes), ``eps`` EXPLORES hosts never crawled (uniform, since
    there is no evidence to weight by). Pure exploitation starves the
    frontier of new-host evidence and locks in the seed bias; this is
    the standard bandit fix, made deterministic so a resumed round
    re-plans identically.

    Quotas are floors of 6dp-rounded shares (the :func:`crawl_budget`
    convention); the explore pot's remainder goes +1 each to the
    ``pot % n_new`` new hosts with the smallest ``md5(host)`` — a
    deterministic pseudo-random choice, not a window over arrival
    order. Hosts with a zero/null score and ``known=true`` get quota 0
    (they earned no budget); unknown hosts always get >= the uniform
    floor.

    Scale shape: two 1-row aggregates (score total, new-host count)
    broadcast back via crossJoin; the remainder pick is an
    ``orderBy().limit()`` TakeOrderedAndProject over new hosts, never
    a global window. Returns ``(host, known, quota)``.
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    if not 0.0 <= epsilon <= 1.0:
        raise ValueError(f"epsilon must be in [0, 1], got {epsilon}")
    h = hosts.select(
        F.col(host_col_name).alias("host"),
        F.coalesce(F.col(score_col).cast("double"), F.lit(0.0))
        .alias("_score"),
        F.coalesce(F.col(known_col).cast("boolean"), F.lit(False))
        .alias("known"),
    )
    exploit_pot = int((1.0 - epsilon) * total_budget)
    explore_pot = total_budget - exploit_pot
    totals = h.agg(
        F.sum(F.when(F.col("known"), F.col("_score")).otherwise(0.0))
        .alias("_tscore"),
        F.sum(F.when(~F.col("known"), 1).otherwise(0)).alias("_nnew"),
    )
    base = h.crossJoin(F.broadcast(totals))
    known_quota = F.when(
        F.col("_tscore") > 0,
        F.floor(F.round(F.lit(float(exploit_pot))
                        * F.col("_score") / F.col("_tscore"), 6)),
    ).otherwise(F.lit(0))
    new_floor = F.when(
        F.col("_nnew") > 0,
        F.floor(F.lit(float(explore_pot)) / F.col("_nnew")),
    ).otherwise(F.lit(0))
    # +1 remainder to the md5-smallest new hosts (bounded top-k pick)
    rem = (
        h.filter(~F.col("known"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("_nnew") > 0)
        .select("host", F.md5(F.col("host")).alias("_o"),
                (F.lit(explore_pot) % F.col("_nnew")).alias("_r"))
    )
    bonus_hosts = (
        rem.orderBy("_o", "host")
        .limit(explore_pot)  # upper bound; exact cut via _rank below
        .select("host", "_o", "_r")
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("_o", "host", "_r")))
             .alias("_rs"))
        .select(F.posexplode("_rs").alias("_pos", "_x"))
        .filter(F.col("_pos") < F.col("_x._r"))
        .select(F.col("_x.host").alias("host"), F.lit(1).alias("_bonus"))
    )
    return (
        base.join(bonus_hosts, "host", "left")
        .select(
            "host", "known",
            F.when(F.col("known"), known_quota)
            .otherwise(new_floor + F.coalesce("_bonus", F.lit(0)))
            .cast("long").alias("quota"),
        )
    )


# ---------------------------------------------------------------------------
# per-IP politeness: vhosts sharing a server share a budget
# ---------------------------------------------------------------------------

def resolve_host_ips(
    hosts: DataFrame,
    n_ips: int = 256,
    host_col_name: str = "host",
    resolver=None,
) -> DataFrame:
    """Host -> IP assignment table ``(host, ip)`` for server-level
    politeness. Per-host politeness is not enough on the real web:
    shared hosting and CDNs put thousands of vhosts behind one server,
    so a crawler polite to every HOST can still hammer one IP (the
    server-level queues of Heritrix and the per-server budgets of
    IRLbot, Lee et al. TWEB'09, exist for exactly this).

    ``resolver`` is the injection seam for real DNS (the transport-seam
    convention, sources/transport.py): a callable mapping a DataFrame
    of hosts to (host, ip) rows. The default — sandbox and tests — is
    a deterministic stand-in: ip index = md5-prefix(host) mod n_ips
    rendered as ``10.0.x.y``. md5, not xxhash64, so the DuckDB oracle
    replays the assignment (the _ring_pos / selection._md5_u32
    convention). Collisions are the point: n_ips below the host count
    models co-hosting.

    Scale shape: one scan-stage expression over the |hosts|-row table;
    the output is the broadcast side of every downstream join."""
    if resolver is not None:
        return resolver(hosts)
    h = hosts.select(host_col_name).distinct()
    idx = F.pmod(_ring_pos(F.col(host_col_name)), F.lit(n_ips))
    return h.select(
        host_col_name,
        F.concat(F.lit("10.0."), (idx / 256).cast("int").cast("string"),
                 F.lit("."), F.pmod(idx, F.lit(256)).cast("string"))
        .alias("ip"))


def select_ip_polite_batch(
    frontier: DataFrame,
    host_ips: DataFrame,
    budget_per_ip: int,
    salt_buckets: int = 16,
    priority_cols: Sequence[str] = ("url",),
    host_col_name: str = "host",
) -> DataFrame:
    """Top-``budget_per_ip`` URLs per server IP, round-robin-fair
    across the IP's vhosts, skew-safely.

    Ranking: ``host_rank`` = position within (ip, host) by priority;
    the IP's batch is ordered (host_rank, host, priority) — i.e. every
    vhost's head-of-line URL first, then every second URL, ... — so a
    budget of B on an IP with H vhosts gives each vhost floor(B/H) or
    ceil(B/H) slots (weighted fair queueing's round-robin case), never
    one greedy vhost starving the rest.

    Skew: a shared-hosting IP with 10^5 vhosts would put its whole
    frontier slice in one window partition, so stage 1 pre-truncates
    within (ip, salt-of-host) — host is finer than the salt bucket, so
    ``host_rank`` is computable before the global per-IP window, and
    any row in the true per-IP top-B is in its bucket's top-B
    (removing other buckets' rows only improves its composite rank):
    the salted two-stage is EXACT, the select_polite_batch argument.

    Output: frontier columns + ``ip``, ``host_rank``, ``ip_rank``
    (<= budget_per_ip). Hosts with no IP row are dropped — an
    unresolvable host cannot be fetched politely or otherwise."""
    df = (frontier if host_col_name in frontier.columns
          else with_host(frontier, out_col=host_col_name))
    order = [F.col(c).asc() for c in priority_cols]
    joined = df.join(
        F.broadcast(host_ips.select(host_col_name, "ip")), host_col_name)

    wh = Window.partitionBy("ip", host_col_name).orderBy(*order)
    ranked = joined.withColumn("host_rank", F.row_number().over(wh))

    comp = [F.col("host_rank").asc(), F.col(host_col_name).asc(), *order]
    salted = ranked.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(host_col_name)), F.lit(salt_buckets))
        .cast("int"))
    w1 = Window.partitionBy("ip", "_salt").orderBy(*comp)
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= budget_per_ip)
        .drop("_rn1", "_salt"))
    w2 = Window.partitionBy("ip").orderBy(*comp)
    return (
        survivors.withColumn("ip_rank", F.row_number().over(w2))
        .filter(F.col("ip_rank") <= budget_per_ip))
