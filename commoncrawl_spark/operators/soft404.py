"""Soft-404 detection: status-200 responses that are really error pages.

A crawler that trusts HTTP status codes indexes millions of "page not
found" bodies served with 200 — and, worse, treats them as fresh content
during recrawl (the reference pipeline keeps any status-200 capture:
filter_200_jsonl.py:46-62 has no content gate at all). Two published
detection methods, both implemented here as pure Catalyst expressions:

1. **Content-signal classifier** — error-phrase density, error-shaped
   title, and abnormally short body combined into a bounded score
   (the heuristic-gate family used by link-rot studies, e.g. Meneses &
   Furuta JCDL'11 "Getting to the '404'").
2. **Probe similarity** (Bar-Yossef, Broder, Kumar & Tomkins, WWW'04,
   "Sic Transit Gloria Telae") — fetch a known-nonexistent URL per host
   once; any page whose body is near-identical to that host's error
   probe IS the host's error page, whatever it says. Implemented as a
   broadcast join on host + word-shingle Jaccard, reusing the dedup
   family's shingle column.

Scale shape (100 TB contract):
- the content classifier is scan-stage expression work — no shuffle, no
  Python, pushdown-friendly; it composes with the extraction projection
  so 10^10 pages are triaged in the same pass that reads them;
- the probe path joins pages to ONE probe row per host — the probe table
  is |hosts|-sized (millions, not billions) and broadcast; the Jaccard
  is evaluated per page against its single matched probe, so the join
  output is exactly |pages| rows — never a pair blowup.

Every expression has an exact DuckDB list/regex twin, so both paths are
full-oracle (rows + schema + value hash) in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analytics import tokens_col
from .text_dedup import shingles_col

# Lowercase error-phrase alternation. Kept deliberately literal (no \b
# metachars beyond the alternation) so the same pattern string runs
# unchanged under Spark's Java regex and DuckDB's RE2.
SOFT404_PHRASES = (
    "page not found",
    "404",
    "not be found",
    "does not exist",
    "no longer available",
    "has been removed",
    "has been deleted",
    "nothing was found",
    "an error occurred",
)

TITLE_PHRASES = ("404", "not found", "error", "page missing")

# Bodies shorter than this many word tokens count as "short" — error
# pages are chrome plus one apology sentence.
SHORT_DOC_TOKENS = 40


def _phrase_pattern(phrases: tuple[str, ...]) -> str:
    return "|".join(phrases)


def soft404_signal_cols(text: Column, title: Column) -> dict[str, Column]:
    """Content signals for the classifier path:

    - ``err_hits``: occurrences of any error phrase in the lowercased
      body (capped at 3 when scored — one apology repeated fifty times
      in page chrome should not dominate);
    - ``title_err``: 1 if the lowercased title contains an error phrase
      (titles are the strongest single signal — servers template them);
    - ``n_tokens``: body word count;
    - ``soft404_score``: ``0.4*title_err + 0.25*min(err_hits, 3)
      + 0.2*short`` rounded 4dp, range [0, 1.35] — body evidence alone
      caps at 0.75 (three phrase hits), so two body hits (0.5) still
      sit below the default 0.6 threshold without the title or
      short-body signal. Fixed constants: portable and auditable.
    """
    body = F.lower(F.coalesce(text, F.lit("")))
    ttl = F.lower(F.coalesce(title, F.lit("")))
    err_hits = F.regexp_count(
        body, F.lit(_phrase_pattern(SOFT404_PHRASES))).cast("int")
    title_err = F.when(
        ttl.rlike(_phrase_pattern(TITLE_PHRASES)), F.lit(1)
    ).otherwise(F.lit(0))
    n_tokens = F.size(tokens_col(body)).cast("int")
    short = F.when(n_tokens < SHORT_DOC_TOKENS, F.lit(1)).otherwise(F.lit(0))
    score = F.round(
        title_err * F.lit(0.4)
        + F.least(err_hits, F.lit(3)) * F.lit(0.25)
        + short * F.lit(0.2),
        4,
    )
    return {
        "err_hits": err_hits,
        "title_err": title_err,
        "n_tokens": n_tokens,
        "soft404_score": score,
    }


def detect_soft404(
    df: DataFrame,
    text_col: str = "text",
    title_col: str = "title",
    threshold: float = 0.6,
) -> DataFrame:
    """Classifier path: input columns + the four signals +
    ``is_soft404`` (score >= threshold). Default 0.6 requires the title
    signal OR strong body evidence plus shortness — a lone "404" in a
    long legitimate article (e.g. a news story ABOUT errors) scores
    0.25 and survives.

    Scan-stage expressions only — zero shuffle, zero Python."""
    sig = soft404_signal_cols(F.col(text_col), F.col(title_col))
    out = df
    for name, col in sig.items():
        out = out.withColumn(name, col)
    return out.withColumn(
        "is_soft404", F.col("soft404_score") >= F.lit(threshold))


def soft404_by_probe(
    pages: DataFrame,
    probes: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    probe_text_col: str = "probe_text",
    sim_threshold: float = 0.9,
    shingle_n: int = 3,
) -> DataFrame:
    """Probe path (Bar-Yossef et al. WWW'04): ``probes`` holds one row
    per host — the body served for a known-nonexistent URL on that host
    (fetched once per host through the transport seam, outside this
    operator). A page is a soft 404 iff its body's word-shingle Jaccard
    similarity to its host's probe body >= ``sim_threshold`` (0.9
    default: error templates embed the requested path, so even the
    host's own error pages differ slightly — near-identity, not
    equality).

    Output: pages' columns + ``probe_jaccard`` (4dp) + ``is_soft404``
    (false, jaccard null, for hosts with no probe row — absence of
    evidence never condemns a page).

    Scale shape: broadcast the |hosts|-row probe table; one shingle
    array per page and per probe, one Jaccard per page — output is
    |pages| rows exactly. The shingle column is the dedup family's
    (text_dedup.shingles_col — arrays_zip form, tokenizer evaluated
    O(n) not O(n^2))."""
    p = probes.select(
        F.col(host_col),
        shingles_col(F.col(probe_text_col), n=shingle_n)
        .alias("_probe_shingles"),
    )
    joined = pages.withColumn(
        "_page_shingles", shingles_col(F.col(text_col), n=shingle_n)
    ).join(F.broadcast(p), on=host_col, how="left")
    inter = F.size(F.array_intersect("_page_shingles", "_probe_shingles"))
    union = F.size(F.array_union("_page_shingles", "_probe_shingles"))
    jac = F.when(
        F.col("_probe_shingles").isNotNull() & (union > 0),
        F.round(inter.cast("double") / union, 4),
    )
    return (
        joined
        .withColumn("probe_jaccard", jac)
        .withColumn(
            "is_soft404",
            F.coalesce(F.col("probe_jaccard") >= F.lit(sim_threshold),
                       F.lit(False)))
        .drop("_page_shingles", "_probe_shingles")
    )
