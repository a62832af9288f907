"""Host mirror detection: find host pairs serving the same content.

Crawl frontiers waste budget on mirrors (same site under several
domains: CDNs, country TLDs, scraped re-hosts). The classic detector
(Bharat & Broder, "Mirror, mirror on the web", WWW 1999) is
content-overlap between hosts: two hosts sharing a large fraction of
their page fingerprints are mirrors, and the crawler keeps one.

Scale shape — all Catalyst, no Python:

1. distinct ``(host, fingerprint)`` — one exchange on the pair.
2. drop ubiquitous fingerprints (shared by > ``max_hosts_per_fp``
   hosts): shared boilerplate ("404 not found", cookie banners) is not
   mirror evidence, and it is exactly the skew that would blow up the
   self-join — a fingerprint on h hosts contributes h^2 pairs. The cap
   bounds per-key join fan-out to max_hosts_per_fp^2 regardless of
   corpus size (the same guard simhash/minhash use via banding).
3. self-join on the 32-byte fingerprint, count shared fingerprints per
   host pair (host_a < host_b) — shuffle rows are slim (fp, host).
4. overlap = shared / min(|A|, |B|) (containment, so a small full
   mirror of a large site still scores 1.0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_content_overlap(
    df: DataFrame,
    host_col: str = "host",
    fp_col: str = "fingerprint",
    max_hosts_per_fp: int = 50,
) -> DataFrame:
    """Content-overlap per host pair: ``(host_a, host_b, shared,
    n_a, n_b, overlap)`` with host_a < host_b, ``shared`` = distinct
    fingerprints on both, ``n_*`` = distinct fingerprints per host, and
    ``overlap = shared / min(n_a, n_b)`` rounded to 6 (the containment
    coefficient). Fingerprints on more than ``max_hosts_per_fp`` hosts
    are excluded from ``shared`` (boilerplate guard + skew bound) but
    still count toward ``n_*`` (they are real pages of each host)."""
    hf = df.select(F.col(host_col).alias("host"),
                   F.col(fp_col).alias("fp")).distinct()
    totals = hf.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    rare = (
        hf.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nh"))
        .filter(F.col("_nh") <= max_hosts_per_fp)
        .select("fp")
    )
    hf2 = hf.join(rare, "fp", "left_semi")
    a = hf2.select(F.col("host").alias("host_a"), "fp")
    b = hf2.select(F.col("host").alias("host_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(totals.withColumnRenamed("host", "host_a")
                   .withColumnRenamed("n", "n_a"), "host_a")
        .join(totals.withColumnRenamed("host", "host_b")
              .withColumnRenamed("n", "n_b"), "host_b")
        .select(
            "host_a", "host_b", "shared", "n_a", "n_b",
            F.round(
                F.col("shared")
                / F.least("n_a", "n_b").cast("double"), 6
            ).alias("overlap"),
        )
    )


def mirror_hosts(
    df: DataFrame,
    host_col: str = "host",
    fp_col: str = "fingerprint",
    threshold: float = 0.8,
    max_hosts_per_fp: int = 50,
) -> DataFrame:
    """Host pairs whose content overlap >= ``threshold`` — candidates
    for frontier collapse (crawl host_a, skip host_b). Same plan as
    :func:`host_content_overlap` plus the filter."""
    ov = host_content_overlap(df, host_col, fp_col, max_hosts_per_fp)
    return ov.filter(F.col("overlap") >= F.lit(threshold))
