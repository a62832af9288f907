"""The crawl plan: frontier round loop with politeness, retries, resume.

This is the engine's replacement for the reference's stage scripts and
their retry loops (ST3: download_and_merge.py:118-182 — failed tasks
become the next round's input, until drained) and append-only checkpoint
logs (ST4: download_and_merge.py:167-171, download_warc_segments.py:73-81).

One **round** =
    frontier ──robots gate──▶ polite batch (per-host budget, salted)
            ──fetch (lookup join vs pages)──▶ extract (Arrow UDF)
            ──commit: articles / failures / trace / metrics / seen / frontier

State lives in snapshot tables (tables.SnapshotTable — Iceberg-style
atomic commits), so a crash at any point resumes from the last committed
frontier snapshot; per-table round metadata makes round replay
exactly-once (a table that already committed round R skips its append —
all round outputs are deterministic functions of the round-R frontier).

Scale notes (10^10 URLs, 1000 executors):
- the fetch is an injectable Transport (sources.transport): the default
  lookup join broadcasts the *batch* (hosts x budget rows) only while it
  is provably small (``broadcast_batch_limit``); a web-shaped batch joins
  un-hinted so AQE + a bucketed pages layout keep the 100 TB side
  un-shuffled either way;
- the politeness window is salted (operators.schedule) so a single-host
  corpus — the reference's actual shape, create_tasks.py:10 — cannot
  create a straggler partition;
- the seen-set anti-join uses the partitioned-Bloom prefilter above
  ``bloom_threshold`` keys (operators.seen_set);
- transient failures re-enter the frontier with exponential backoff
  (``not_before_round``), the reference's 2*2^attempt retry pacing
  (download_warc_segments.py:66-70) at round granularity.
"""

from __future__ import annotations

import os
import time
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import best_capture_per_url, dedup_first_seen
from ..operators.extraction import extract_articles, split_articles
from ..operators.schedule import apply_robots, select_polite_batch, with_host
from ..operators.seen_set import (
    SEEN_SCHEMA,
    anti_join_seen,
    with_url_key,
)
from ..tables import SnapshotTable

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_sha1", T.StringType(), False),
        T.StructField("host", T.StringType()),
        T.StructField("crawl_rank", T.IntegerType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("line_no", T.IntegerType()),
        T.StructField("attempt", T.IntegerType()),
        # earliest round this row may be scheduled (retry backoff, ST3);
        # 0 for seeded/discovered rows
        T.StructField("not_before_round", T.IntegerType()),
    ]
)

PRIORITY = ("crawl_rank", "page", "line_no")


class CrawlJob:
    """Checkpoint-resumable crawl over a pages table.

    All state under ``checkpoint_dir``; constructing a second CrawlJob on
    the same directory resumes exactly where the first stopped.
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        budget_per_host: int = 200,
        salt_buckets: int = 16,
        max_retries: int = 3,
        bloom_threshold: int = 2_000_000,
        round_seconds: float | None = None,
        broadcast_batch_limit: int = 1_000_000,
        transport=None,
        retry_backoff: bool = True,
        backoff_cap_rounds: int = 300,
        seen_state: str = "bloom",
    ):
        if seen_state not in ("bloom", "cuckoo"):
            raise ValueError(
                f"seen_state must be 'bloom' or 'cuckoo', got {seen_state!r}")
        self.spark = spark
        self.dir = checkpoint_dir
        self.budget = budget_per_host
        self.salt_buckets = salt_buckets
        self.max_retries = max_retries
        self.bloom_threshold = bloom_threshold
        # fetch-join strategy cutover: batches at or under this row count
        # are broadcast (the single-host reference shape); larger batches
        # join un-hinted so AQE and the bucketed pages layout decide
        self.broadcast_batch_limit = broadcast_batch_limit
        # injectable fetch stage (sources.transport.Transport); None ->
        # LookupJoinTransport over the ``pages`` argument of run_round
        self.transport = transport
        # reference retry pacing (download_warc_segments.py:66-70): a row
        # failing on attempt a becomes eligible again after
        # min(2 * 2^a, cap) rounds (1 round ~ 1 s of the reference's
        # per-request sleep; the 300 cap is download_and_merge.py:179's
        # 300 s ceiling). retry_backoff=False restores retry-next-round.
        self.retry_backoff = retry_backoff
        self.backoff_cap_rounds = backoff_cap_rounds
        # cross-round filter state (BloomSeenSet or CuckooSeenSet per
        # seen_state): built lazily the first time the seen table crosses
        # bloom_threshold, then extended incrementally per round
        # (_note_seen_keys). In-memory only — a resumed job rebuilds it
        # from the seen table on first use. 'cuckoo' costs ~2x the blob
        # bytes but supports in-place DELETION, which makes
        # evict_for_recrawl cheap at 10^10 keys.
        self.seen_state = seen_state
        self._bloom = None
        # when set and robots carries crawl_delay_s, a host's per-round
        # budget becomes min(budget_per_host, floor(round_seconds / delay))
        # — the politeness rate the reference enforced with time.sleep(0.2)
        # (fetch_guardian_fulltext.py:130), generalized per host
        self.round_seconds = round_seconds
        t = lambda name: SnapshotTable(os.path.join(checkpoint_dir, name))  # noqa: E731
        self.frontier = t("frontier")
        self.seen = t("seen")
        self.articles = t("articles")
        self.failures = t("failures")
        self.trace = t("trace")
        self.metrics = t("metrics")
        self.lineage = t("lineage")

    # -- seeding ---------------------------------------------------------------

    def seed_from_cdx(
        self,
        cdx: DataFrame,
        crawl_order: Sequence[str] | None = None,
        arrival_cols: Sequence[str] = ("crawl", "page", "line_no"),
    ) -> int:
        """CDX records -> deduped, 200-filtered, unseen frontier (stage 1+2
        of the reference pipeline: dedup A2 then the status-200 gate F1).

        ``crawl_order`` fixes crawl_rank = position in the INDEXES list
        (create_tasks.py:12); default = lexicographic (CC-MAIN-YYYY-WW names
        sort chronologically, matching the list's order).
        """
        best = best_capture_per_url(cdx, arrival_cols=arrival_cols)
        best = best.filter(F.col("status") == "200")
        if crawl_order is not None:
            rank_map = F.create_map(
                *[x for i, c in enumerate(crawl_order) for x in (F.lit(c), F.lit(i))]
            )
            # crawls ABSENT from crawl_order rank LAST (len(order)), not
            # NULL: Spark's ascending sort puts NULLs FIRST, which would
            # silently schedule unlisted crawls ahead of every crawl the
            # caller explicitly prioritized
            ranked = best.withColumn(
                "crawl_rank",
                F.coalesce(rank_map[F.col("crawl")],
                           F.lit(len(crawl_order))).cast("int"))
        else:
            from pyspark.sql import Window

            w = Window.orderBy("crawl")
            ranks = (
                best.select("crawl").distinct()
                .withColumn("crawl_rank", (F.dense_rank().over(w) - 1).cast("int"))
            )
            ranked = best.join(F.broadcast(ranks), "crawl")

        frontier = (
            with_host(with_url_key(ranked))
            .select(
                "url", "url_sha1", "host", "crawl_rank",
                F.col("page").cast("int").alias("page"),
                F.col("line_no").cast("int").alias("line_no"),
                F.lit(0).alias("attempt"),
                F.lit(0).alias("not_before_round"),
            )
        )
        frontier = self._filter_unseen(frontier)
        self.frontier.overwrite(frontier, {"round": self.next_round()})
        if not self.seen.exists():
            self.seen.overwrite(
                self.spark.createDataFrame([], SEEN_SCHEMA), {"round": -1}
            )
        return self.frontier.read(self.spark).count()

    def seed_from_feeds(
        self,
        feeds: DataFrame,
        ref_date: str = "2100-01-01",
        xml_col: str = "xml",
        url_col: str = "feed_url",
    ) -> int:
        """Feed-driven (re)seeding — the news-crawl entry point: poll
        results (``feed_url, xml``) become entry links, freshness maps
        into the frontier's existing priority triple (``page`` = days
        from the normalized published date to ``ref_date``, so fresher
        entries schedule first; dateless entries sink at 99999;
        ``crawl_rank`` = ``line_no`` = 0), duplicate links across
        feeds collapse first-priority-wins on the canonical key, the
        seen set filters re-announced URLs, and the survivors MERGE
        into the current frontier (unlike ``seed_from_cdx``'s
        overwrite — feeds are polled into a live crawl). Returns the
        frontier size after the merge.

        Scale shape: feed parsing rides the scan, the dedup is a
        min_by partial aggregate on the key (never a window), the
        membership check is the job's crossover-aware anti-join, and
        the merge re-dedups only on the slim key."""
        from ..operators.links import extract_feed_entries

        ent = extract_feed_entries(feeds, xml_col=xml_col,
                                   url_col=url_col)
        cand = with_host(with_url_key(
            ent.select(F.col("link").alias("url"), "published")))
        staleness = F.coalesce(
            F.datediff(F.lit(ref_date).cast("date"),
                       F.col("published").cast("date")),
            F.lit(99999)).cast("int")
        rows = cand.select(
            "url", "url_sha1", "host",
            F.lit(0).alias("crawl_rank"),
            staleness.alias("page"),
            F.lit(0).alias("line_no"),
            F.lit(0).alias("attempt"),
            F.lit(0).alias("not_before_round"),
        )
        rows = self._filter_unseen(rows)
        existing = self.frontier.read_or_empty(self.spark, FRONTIER_SCHEMA)
        merged = dedup_first_seen(
            existing.unionByName(rows.select(
                *[f.name for f in FRONTIER_SCHEMA.fields])),
            key_cols=["url_sha1"],
            arrival_cols=["crawl_rank", "page", "line_no", "url"],
        )
        self.frontier.overwrite(merged, {"round": self.next_round(),
                                         "seeded_from": "feeds"})
        if not self.seen.exists():
            self.seen.overwrite(
                self.spark.createDataFrame([], SEEN_SCHEMA), {"round": -1}
            )
        return self.frontier.read(self.spark).count()

    # -- seen-set membership -----------------------------------------------------

    def _filter_unseen(self, candidates: DataFrame) -> DataFrame:
        """Anti-join candidates against the seen set, choosing the side of
        the small/large crossover automatically: below ``bloom_threshold``
        keys the plain JVM anti-join wins outright (measured — BASELINE.md
        round-2 probe numbers); above it, a ``BloomSeenSet`` is built ONCE
        and kept across rounds — per-round cost is the probe plus an exact
        join on the ~1% survivors, and ``_note_seen_keys`` extends the
        blobs incrementally instead of rebuilding from 10^10 keys."""
        if self._bloom is not None:
            # steady state: never re-read or re-count the (10^10-row)
            # seen table once the cross-round Bloom state exists —
            # _note_seen_keys keeps it in sync with every commit
            return self._bloom.unseen(candidates)
        seen = self.seen.read_or_empty(self.spark, SEEN_SCHEMA)
        n_seen = seen.count()
        if n_seen > self.bloom_threshold:
            self._bloom = self._make_state(seen)
            return self._bloom.unseen(candidates)
        if n_seen:
            return anti_join_seen(candidates, seen)
        return candidates

    def _make_state(self, seen: DataFrame):
        if self.seen_state == "cuckoo":
            from ..operators.cuckoo import CuckooSeenSet

            return CuckooSeenSet(seen)
        from ..operators.seen_set import BloomSeenSet

        return BloomSeenSet(seen)

    def _note_seen_keys(self, done_keys: DataFrame) -> None:
        """Keep the cross-round Bloom state in sync with the seen table."""
        if self._bloom is not None:
            self._bloom.add(done_keys)

    def evict_for_recrawl(self, urls: DataFrame, requeue: bool = True) -> int:
        """Recrawl scheduling: make previously-fetched URLs fetchable again.

        ``urls`` needs a ``url`` column (``url_sha1`` is derived if absent;
        a pre-keyed frame is used as-is). Three coordinated updates:

        * the persistent seen table loses the keys — via a NEW snapshot,
          so the pre-eviction membership stays time-travelable;
        * the cross-round filter state follows: in-place fingerprint
          deletion when ``seen_state='cuckoo'`` (delta-sized work — the
          reason the cuckoo variant exists); the Bloom state, which
          cannot delete, is released and lazily rebuilt on next use;
        * with ``requeue=True``, the URLs re-enter the frontier BELOW
          every queued row (crawl_rank = max + 1, url_sha1 tie-break —
          the same deterministic placement as discovered links), so a
          recrawl never starves fresh seeds and replays stay ordered.

        Only keys actually in the seen set count; returns how many were
        evicted. Reference analog: deleting output files so the resume
        scan re-queues them (download_warc_segments.py:163-171 existence
        check) — here a metadata operation instead of filesystem surgery.
        """
        keyed = urls if "url_sha1" in urls.columns else with_url_key(urls)
        cols = ["url_sha1"] + (["url"] if "url" in keyed.columns else [])
        if requeue and "url" not in keyed.columns:
            # validate BEFORE mutating: raising after the seen-table
            # overwrite would leave the keys evicted but never requeued
            # — gone from seen AND from the frontier
            raise ValueError("requeue=True needs a url column")
        seen_df = self.seen.read_or_empty(self.spark, SEEN_SCHEMA)
        evict = (
            keyed.select(*cols).dropDuplicates(["url_sha1"])
            .join(seen_df, "url_sha1", "left_semi").persist()
        )
        n = evict.count()
        if n == 0:
            evict.unpersist()
            return 0
        # keep the snapshot's round marker: _append_once replay detection
        # compares it against the NEXT round's number, which must not match
        snap = self.seen.snapshot()
        prev_round = snap["metadata"].get("round", -1) if snap else -1
        self.seen.overwrite(
            seen_df.join(evict.select("url_sha1"), "url_sha1", "left_anti"),
            {"round": prev_round, "evicted": n},
        )
        if self._bloom is not None:
            if hasattr(self._bloom, "remove"):
                self._bloom.remove(evict.select("url_sha1"))
            else:
                self._bloom.release()
                self._bloom = None  # rebuilt from the table on next use
        if requeue:
            rnd = self.next_round()
            frontier = self._read_frontier()
            next_rank = (frontier.agg(F.max("crawl_rank")).first()[0] or 0) + 1
            rows = with_host(evict).select(
                "url", "url_sha1", "host",
                F.lit(int(next_rank)).cast("int").alias("crawl_rank"),
                F.lit(0).cast("int").alias("page"),
                F.lit(0).cast("int").alias("line_no"),
                F.lit(0).cast("int").alias("attempt"),
                F.lit(0).cast("int").alias("not_before_round"),
            ).join(frontier.select("url_sha1"), "url_sha1", "left_anti")
            self.frontier.overwrite(
                frontier.unionByName(rows), {"round": rnd, "recrawl": n})
        evict.unpersist()
        return n

    def evict_stale(
        self,
        captures: DataFrame,
        as_of,
        threshold: float = 0.5,
        default_rate_per_day: float = 0.1,
        requeue: bool = True,
        key_col: str = "url",
        ts_col: str = "ts",
        digest_col: str = "digest",
        tiebreak_cols=(),
    ) -> int:
        """Freshness-driven recrawl: the Cho-Garcia-Molina policy wired
        to the eviction mechanism. From each URL's capture history
        (``captures``: key, ts, content digest per fetch), estimate the
        Poisson change rate (``capture_change_stats``), compute
        P(changed since last capture) as of ``as_of``
        (``recrawl_schedule``), and evict every URL whose ``p_changed >=
        threshold`` via :meth:`evict_for_recrawl` — hot pages re-enter
        the frontier, cold ones stay seen. Returns the evicted count.

        The ``default_rate_per_day`` governs single-capture URLs (no
        interval evidence): raise it to make never-revisited pages age
        into recrawl faster. The whole policy is one shuffle over the
        capture log (the change-stats window + agg) before the eviction
        anti-joins — no Python, safe at full capture-log scale."""
        from ..operators.temporal import (
            capture_change_stats,
            recrawl_schedule,
        )

        stats = capture_change_stats(
            captures, key_col=key_col, ts_col=ts_col,
            digest_col=digest_col, tiebreak_cols=tiebreak_cols)
        sched = recrawl_schedule(
            stats, as_of, default_rate_per_day=default_rate_per_day)
        stale = sched.filter(F.col("p_changed") >= F.lit(threshold)).select(
            F.col(key_col).alias("url"))
        return self.evict_for_recrawl(stale, requeue=requeue)

    def _read_frontier(self) -> DataFrame:
        """Read the frontier snapshot, defaulting columns added since the
        checkpoint was written (schema evolution: a pre-backoff frontier
        lacks not_before_round; resuming it must not break — the frontier
        commit is the resume authority)."""
        df = self.frontier.read(self.spark)
        if "not_before_round" not in df.columns:
            df = df.withColumn("not_before_round", F.lit(0).cast("int"))
        return df

    # -- round bookkeeping -------------------------------------------------------

    def next_round(self) -> int:
        snap = self.frontier.snapshot()
        return 0 if snap is None else int(snap["metadata"].get("round", 0))

    def _append_once(self, table: SnapshotTable, df: DataFrame, rnd: int) -> bool:
        """Exactly-once per round: skip if this table already committed rnd
        (crash-between-commits replay safety; outputs are deterministic).
        Returns whether an append actually happened (False = replay skip)."""
        snap = table.snapshot()
        if snap is not None and snap["metadata"].get("round") == rnd:
            return False
        table.append(df, {"round": rnd})
        return True

    # -- the round ---------------------------------------------------------------

    def run_round(
        self,
        pages: DataFrame,
        robots: DataFrame | None = None,
        transient_fail: Column | None = None,
        discover_links: bool = False,
    ) -> dict[str, int]:
        """Execute one crawl round; returns counters. Empty frontier -> {}.

        ``discover_links=True`` turns the job into a link-FOLLOWING
        crawler: hrefs of this round's fetched pages (minus the seen set
        and the current frontier) enter the next frontier with
        deterministic priority below every seeded URL — crawl_rank =
        seeded max + 1, ordered by url_sha1 — so replaying a crashed
        round still reproduces the same schedule. Off by default: the
        reference's frontier comes entirely from the CDX index, and its
        crawl-ordering trace (SURVEY.md §3) is only comparable without
        discovered URLs."""
        rnd = self.next_round()
        frontier = self._read_frontier()

        # retry backoff (ST3): rows still backing off are not eligible
        eligible = frontier.filter(F.col("not_before_round") <= F.lit(rnd))
        gated = apply_robots(eligible, robots) if robots is not None else eligible
        budget_col = None
        if self.round_seconds is not None and "crawl_delay_s" in gated.columns:
            gated = gated.withColumn(
                "_budget",
                F.floor(F.lit(self.round_seconds)
                        / F.greatest(F.col("crawl_delay_s"), F.lit(1e-3)))
                .cast("int"),
            )
            budget_col = "_budget"
        # url_sha1 tie-break makes the priority a TOTAL order: seeded rows
        # never tie (arrival seq is unique), but discovered rows share
        # (crawl_rank, page, line_no) and must still schedule
        # deterministically.
        batch = select_polite_batch(
            gated, self.budget, self.salt_buckets, PRIORITY + ("url_sha1",),
            budget_col=budget_col,
        ).drop("crawl_delay_s", "_budget").persist()
        n_selected = batch.count()
        if n_selected == 0:
            batch.unpersist()
            # look only at rows still BACKING OFF (not_before > rnd): a
            # permanently-gated row (robots, zero budget) with
            # not_before_round = 0 must not mask waiting retries — min
            # over the whole frontier would return 0 and terminate the
            # crawl with retries silently abandoned
            nxt = (
                frontier.filter(F.col("not_before_round") > rnd)
                .agg(F.min("not_before_round")).first()[0]
            )
            if nxt is None:
                return {}  # drained, or only permanently-gated rows remain
            # fast-forward the round clock to the earliest eligibility —
            # metadata-only: the frontier data is byte-identical, so a
            # retag re-references the committed files instead of
            # rewriting a potentially 10^9-row table per idle round
            self.frontier.retag({"round": int(nxt)})
            return {
                "round": rnd, "selected": 0, "fetched": 0, "extract_ok": 0,
                "extract_failed": 0, "retried": 0, "exhausted": 0,
                "discovered": 0, "fast_forward_to": int(nxt),
            }

        # fetch stage (J2/S6) through the injectable transport seam; the
        # default lookup join broadcasts the batch only under
        # broadcast_batch_limit (size-aware — see sources.transport).
        # persisted: consumed by the ok/fail splits, the failures commit,
        # the per-host metrics, and counters.
        from ..sources.transport import LookupJoinTransport

        transport = self.transport or LookupJoinTransport(
            pages, self.broadcast_batch_limit, transient_fail
        )
        result = transport.fetch(batch, n_rows_hint=n_selected).persist()
        fetched = result.filter(F.col("_fetch_error").isNull()).drop("_fetch_error")
        missing = result.filter(F.col("_fetch_error").isNotNull()).drop("html")

        extracted = extract_articles(fetched).persist()
        ok, extract_failed = split_articles(extracted)

        # ---- commits (deterministic; _append_once makes replay idempotent) ----
        self._append_once(
            self.articles, ok.withColumn("round", F.lit(rnd)), rnd
        )
        retryable = missing.filter(F.col("attempt") < self.max_retries)
        exhausted = missing.filter(F.col("attempt") >= self.max_retries)
        perm_failures = (
            extract_failed.select("url", "reason")
            .unionByName(exhausted.select(
                "url",
                F.coalesce(F.col("_fetch_error"), F.lit("fetch_failed"))
                .alias("reason"),
            ))
            .withColumn("round", F.lit(rnd))
        )
        self._append_once(self.failures, perm_failures, rnd)
        self._append_once(
            self.trace,
            batch.select(
                F.lit(rnd).alias("round"), "host", "host_rank",
                "crawl_rank", "page", "line_no", "url",
            ),
            rnd,
        )
        done_keys = (
            fetched.select("url_sha1")
            .unionByName(exhausted.select("url_sha1"))
        )
        per_host = (
            batch.groupBy("host")
            .agg(F.count("*").alias("n_selected"))
            .join(
                fetched.groupBy("host").agg(F.count("*").alias("n_fetched")),
                "host", "left",
            )
            .join(
                missing.groupBy("host").agg(F.count("*").alias("n_fetch_failed")),
                "host", "left",
            )
            .select(
                F.lit(rnd).alias("round"), "host", "n_selected",
                F.coalesce("n_fetched", F.lit(0)).alias("n_fetched"),
                F.coalesce("n_fetch_failed", F.lit(0)).alias("n_fetch_failed"),
            )
        )
        self._append_once(self.metrics, per_host, rnd)
        # per-partition lineage: which physical partition produced how many
        # fetched rows this round, with the key range it covered (audit
        # trail for a 1000-executor run; partition ids are physical, so
        # this table is observability, not part of the deterministic state)
        per_part = (
            fetched.groupBy(F.spark_partition_id().alias("part_id"))
            .agg(
                F.count("*").alias("n_rows"),
                F.min("url_sha1").alias("min_key"),
                F.max("url_sha1").alias("max_key"),
            )
            .select(F.lit(rnd).alias("round"), "part_id", "n_rows",
                    "min_key", "max_key")
        )
        self._append_once(self.lineage, per_part, rnd)
        new_seen = done_keys.distinct()
        if self._append_once(self.seen, new_seen, rnd):
            # extend the cross-round Bloom state only when the table
            # actually advanced
            self._note_seen_keys(new_seen)
        elif self._bloom is not None:
            # replay of a round whose seen commit landed: the crash may
            # have hit BETWEEN that commit and the in-memory state
            # update, in which case the blobs lack this round's keys —
            # a false-negative window the exactness contract forbids.
            # Drop the state; the next unseen() rebuilds it from the
            # committed table (which includes the keys). Replays are
            # crash recovery, so the rebuild cost is fine.
            self._bloom.release()
            self._bloom = None

        # reference pacing mapped to rounds: failing on attempt a defers
        # re-eligibility by min(2*2^a, cap) rounds (2*2^attempt seconds at
        # download_warc_segments.py:66-70; 300 s cap at
        # download_and_merge.py:179). Off -> retry next round (round 1
        # behavior). Computed from the PRE-increment attempt.
        backoff = (
            F.least(F.lit(2) * F.pow(F.lit(2.0), F.col("attempt")),
                    F.lit(float(self.backoff_cap_rounds))).cast("int")
            if self.retry_backoff else F.lit(1)
        )
        requeued = (
            retryable
            .withColumn("not_before_round", (F.lit(rnd) + backoff).cast("int"))
            .withColumn("attempt", F.col("attempt") + 1)
            .select(*[f.name for f in FRONTIER_SCHEMA.fields])
        )
        hint = (
            F.broadcast if n_selected <= self.broadcast_batch_limit
            else (lambda df: df)
        )
        remaining = (
            frontier.join(hint(batch.select("url_sha1")), "url_sha1", "left_anti")
            .unionByName(requeued)
        )
        n_discovered = 0
        new_rows = None
        if discover_links:
            from ..operators.links import candidate_links

            # membership through _filter_unseen so a long discovery crawl
            # pays the Bloom probe, not a per-round exact anti-join
            # against the ever-growing seen table
            cands = (
                self._filter_unseen(candidate_links(fetched))
                .join(remaining.select("url_sha1"), "url_sha1", "left_anti")
            )
            next_rank = (frontier.agg(F.max("crawl_rank")).first()[0] or 0) + 1
            new_rows = with_host(cands).select(
                "url", "url_sha1", "host",
                F.lit(int(next_rank)).cast("int").alias("crawl_rank"),
                F.lit(0).cast("int").alias("page"),
                F.lit(0).cast("int").alias("line_no"),
                F.lit(0).cast("int").alias("attempt"),
                F.lit(0).cast("int").alias("not_before_round"),
            ).persist()
            n_discovered = new_rows.count()
            remaining = remaining.unionByName(new_rows)
        # one aggregate job per persisted frame instead of five count()
        # jobs: at steady state a round is dominated by fixed per-job
        # scheduling latency, so collapsing actions is the lever
        fail = F.col("_fetch_error").isNotNull()
        rc = result.agg(
            F.count(F.when(~fail, 1)).alias("fetched"),
            F.count(F.when(fail & (F.col("attempt") < self.max_retries), 1))
            .alias("retried"),
            F.count(F.when(fail & (F.col("attempt") >= self.max_retries), 1))
            .alias("exhausted"),
        ).first()
        ec = extracted.agg(
            F.count(F.when(F.col("article.error").isNull(), 1)).alias("ok"),
            F.count(F.when(F.col("article.error").isNotNull(), 1))
            .alias("failed"),
        ).first()
        counters = {
            "round": rnd,
            "selected": n_selected,
            "fetched": int(rc["fetched"]),
            "extract_ok": int(ec["ok"]),
            "extract_failed": int(ec["failed"]),
            "retried": int(rc["retried"]),
            "exhausted": int(rc["exhausted"]),
            "discovered": n_discovered,
        }
        # frontier commit LAST: it is the resume authority. Crash before this
        # line -> the whole round replays; _append_once skips re-commits.
        self.frontier.overwrite(remaining, {"round": rnd + 1, **{
            k: v for k, v in counters.items() if k != "round"
        }})
        batch.unpersist()
        result.unpersist()
        extracted.unpersist()
        if new_rows is not None:  # unconditional: zero-discovery rounds too
            new_rows.unpersist()
        return counters

    def run(
        self,
        pages: DataFrame,
        robots: DataFrame | None = None,
        transient_fail: Column | None = None,
        max_rounds: int | None = None,
        discover_links: bool = False,
    ) -> list[dict[str, int]]:
        """Drive rounds until the frontier drains (or max_rounds)."""
        out = []
        while max_rounds is None or len(out) < max_rounds:
            t0 = time.monotonic()
            c = self.run_round(pages, robots, transient_fail, discover_links)
            if not c:
                break
            c["wall_s"] = round(time.monotonic() - t0, 3)
            out.append(c)
        return out

    # -- views -------------------------------------------------------------------

    def articles_df(self) -> DataFrame:
        return self.articles.read(self.spark)

    def seen_df(self) -> DataFrame:
        return self.seen.read(self.spark)

    def trace_df(self) -> DataFrame:
        return self.trace.read(self.spark)

    def metrics_df(self) -> DataFrame:
        return self.metrics.read(self.spark)
