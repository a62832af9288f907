"""Text-analysis functions for training-data pipelines.

All pure Catalyst column expressions (JVM, codegen) — language ID,
quality scoring, token counting, document fingerprinting. These extend
the reference's capabilities toward a large-scale corpus pipeline; the
reference itself only measures text length (read_jsonl.ipynb cell 1).
Deterministic and portable: every function has an exact SQL equivalent
(the DuckDB oracles in __spark_entry__.py), so nothing here depends on
Spark-private hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.analytics import tokens_col

# Tiny per-language stopword inventories — enough signal for a
# deterministic n-gram/stopword-ratio heuristic; swap in fastText at
# deployment (model file absent in this environment).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "that", "is", "was", "for", "with",
           "on", "as", "are", "at", "this", "have", "from", "not", "they"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein",
           "eine", "zu", "den", "im", "auf", "sich", "des", "dem", "war"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans",
           "que", "qui", "pour", "pas", "sur", "avec", "au", "par", "ce"],
}

# BPE-ish pretokenizer: letter runs, digit runs, single punctuation marks
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.,;:!?]"


def _stopword_hits(tokens: Column, lang: str) -> Column:
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(vocab, t)))


def _argmax_label(scores: list[tuple[str, Column]],
                  default: str = "und") -> Column:
    """Label of the max score; ties break in list order (earlier wins);
    ``default`` when every score is 0. Shared by language_id_col and
    line_language_mix so the tie semantics cannot drift."""
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit(default)
    for lang, s in reversed(scores):  # earlier labels win ties: apply last
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def language_id_col(text: Column) -> Column:
    """Predicted language = argmax over per-language stopword hit counts;
    'und' (undetermined) when no language scores a single hit. Ties break
    in en > de > fr order (deterministic)."""
    toks = tokens_col(text)
    return _argmax_label(
        [(lang, _stopword_hits(toks, lang)) for lang in ("en", "de", "fr")])


def line_language_mix(text: Column) -> dict[str, Column]:
    """Per-line language composition — the mixed-language detector
    (CCNet-family pipelines drop or split code-switched pages; a
    document whose lines predict different languages is exactly that
    case). Returns ``n_lines`` (non-blank), ``n_langs`` (distinct
    non-'und' line predictions), ``dominant_lang`` (most frequent line
    language incl. 'und', ties in en > de > fr > und order), and
    ``mixed`` (n_langs >= 2). language_id_col composed inside a
    ``transform`` lambda — still one scan-stage expression, no shuffle,
    no Python, exact DuckDB twin.

    Perf note: this is the pure-expression form — the per-line
    prediction array is embedded in each returned column, so a select
    of all four re-evaluates it ~10x per row. Prefer
    ``language_mix_stats`` (below), which binds lines and predictions
    to real columns across projections (measured 8x faster for the
    full four-column select)."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    preds = F.transform(lines, lambda l: language_id_col(l))
    counts = {
        lang: F.size(F.filter(preds, lambda p: p == F.lit(lang)))
        for lang in ("en", "de", "fr", "und")
    }
    # und participates in the argmax (an all-und doc is dominant-und)
    # but loses every tie to a real language — hence last in the order
    dominant = _argmax_label(
        [(lang, counts[lang]) for lang in ("en", "de", "fr", "und")])
    n_langs = sum(
        ((counts[lang] > 0).cast("int") for lang in ("en", "de", "fr")),
        F.lit(0),
    )
    return {
        "n_lines": F.size(lines),
        "n_langs": n_langs,
        "dominant_lang": F.when(F.size(lines) > 0, dominant),
        "mixed": F.when(F.size(lines) > 0, n_langs >= 2),
    }


def language_mix_stats(df, text: Column, keep_cols: list[str]):
    """DataFrame form of :func:`line_language_mix` — identical output
    semantics (same tie order, same null gating), restructured so the
    expensive arrays are computed ONCE per row: the non-blank line
    array, then the per-line prediction array, then the four per-language
    counts are each bound to real columns across successive projections,
    and the final select reads only bound attributes. Returns
    ``keep_cols + [n_lines, n_langs, dominant_lang, mixed]``.

    Why not one select over line_language_mix's dict: an expression
    referenced inside a higher-order-function lambda (or repeated
    across output columns — HOF trees are excluded from codegen
    subexpression elimination) is re-evaluated per use, so the
    one-select form runs the per-line language vote ~10x per row
    (measured 8x slower at sf0.1). Still zero shuffle and zero Python —
    the projections fuse into one codegen stage with the arrays as
    locals."""
    langs = ("en", "de", "fr", "und")
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    step = (
        df.select(*keep_cols, lines.alias("_lines"))
        .select(
            *keep_cols,
            F.size("_lines").alias("n_lines"),
            F.transform(F.col("_lines"),
                        lambda l: language_id_col(l)).alias("_preds"),
        )
        .select(
            *keep_cols,
            "n_lines",
            *[F.size(F.filter(F.col("_preds"), lambda p: p == F.lit(lang)))
              .alias(f"_c_{lang}") for lang in langs],
        )
    )
    counts = [(lang, F.col(f"_c_{lang}")) for lang in langs]
    n_langs = sum(
        ((F.col(f"_c_{lang}") > 0).cast("int") for lang in ("en", "de", "fr")),
        F.lit(0),
    )
    return step.select(
        *keep_cols,
        "n_lines",
        n_langs.alias("n_langs"),
        F.when(F.col("n_lines") > 0, _argmax_label(counts))
        .alias("dominant_lang"),
        F.when(F.col("n_lines") > 0, n_langs >= 2).alias("mixed"),
    )


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish pretoken count (letter runs / digit runs / punct marks) —
    the corpus-size currency of training pipelines."""
    return F.regexp_count(text, F.lit(BPE_RE))


def quality_features(text: Column) -> dict[str, Column]:
    """Raw quality signals: length, token stats, punctuation and stopword
    ratios. All ratios guarded against empty text."""
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_toks = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / safe_toks, 4
        ),
        "punct_ratio": F.round(F.regexp_count(text, F.lit(PUNCT_RE)) / safe_chars, 4),
        "stopword_ratio": F.round(_stopword_hits(toks, "en") / safe_toks, 4),
    }


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score: rewards stopword density and moderate
    token length, penalizes punctuation soup and trivially short docs.
    Weights are heuristic constants — the *shape* (pure column expression,
    single pass, no shuffle) is the deliverable."""
    f = quality_features(text)
    len_ok = F.when(f["n_tokens"] >= 20, F.lit(1.0)).otherwise(
        f["n_tokens"].cast("double") / 20.0
    )
    stop = F.least(f["stopword_ratio"] * 2.5, F.lit(1.0))
    punct = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 5.0)
    return F.round(0.4 * len_ok + 0.4 * stop + 0.2 * punct, 4)


def repetition_signals(text: Column) -> dict[str, Column]:
    """Gopher-style repetition / boilerplate signals (Rae et al. 2021,
    table A1 family): duplicate-line fractions, bullet/ellipsis line
    fractions, symbol-to-word ratio, alphabetic-word fraction. Pure
    Catalyst array expressions — one pass, no shuffle, no Python — and
    every signal has an exact DuckDB equivalent (oracle-checked), so the
    filter is portable and auditable.

    Line signals use trimmed non-blank lines; word signals use raw
    whitespace words (not the lowercased token stream — Gopher's rules
    are about surface form, e.g. ALL-CAPS and symbols count as-is).
    """
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    uniq = F.array_distinct(lines)
    line_chars = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    uniq_chars = F.aggregate(uniq, F.lit(0), lambda a, l: a + F.length(l))
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    word_chars = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    return {
        "n_lines": n_lines,
        "n_words": n_words,
        "mean_word_len": F.round(word_chars / safe_words, 4),
        "dup_line_frac": F.round(
            F.lit(1.0) - F.size(uniq) / safe_lines, 4),
        "dup_line_char_frac": F.round(
            F.lit(1.0)
            - uniq_chars / F.greatest(line_chars, F.lit(1)).cast("double"), 4),
        "bullet_line_frac": F.round(
            F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]")))
            / safe_lines, 4),
        "ellipsis_line_frac": F.round(
            F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
            / safe_lines, 4),
        "symbol_word_ratio": F.round(
            (F.regexp_count(text, F.lit("#"))
             + F.regexp_count(text, F.lit(r"(\.\.\.|…)"))) / safe_words, 4),
        "alpha_word_frac": F.round(
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
            / safe_words, 4),
    }


def gopher_keep_col(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> Column:
    """Gopher's document-level keep rule as one boolean column: word-count
    bounds, mean word length in [3, 10], symbol-to-word < 0.1, bullet
    lines < 90%, ellipsis lines < 30%, alphabetic words > 80%, duplicate
    lines < 30% (by count and by character mass). Thresholds are the
    published constants; word bounds are parameters because corpus units
    differ (pages vs chunks)."""
    r = repetition_signals(text)
    return (
        (r["n_words"] >= min_words) & (r["n_words"] <= max_words)
        & (r["mean_word_len"] >= 3) & (r["mean_word_len"] <= 10)
        & (r["symbol_word_ratio"] < 0.1)
        & (r["bullet_line_frac"] < 0.9)
        & (r["ellipsis_line_frac"] < 0.3)
        & (r["alpha_word_frac"] > 0.8)
        & (r["dup_line_frac"] < 0.3)
        & (r["dup_line_char_frac"] < 0.3)
    )


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace/punct-normalized lowercase
    text — equal for docs differing only in spacing/punctuation. (A rolling
    shingle hash lives in text_dedup.minhash_signature; this is the cheap
    exact-dup key.)"""
    norm = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
    return F.md5(norm)


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# Patterns chosen to behave identically under Java regex (Spark) and RE2
# (DuckDB oracle): no backrefs, no lookaround. Order matters — emails are
# replaced before the IPv4/phone passes can see their digit runs.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b|\+[0-9]{7,15}"),
]


# Payment-card candidates: 13-19 digits with optional single space/dash
# separators. Candidate extraction is a regex; VALIDATION is the Luhn
# checksum (ISO/IEC 7812) — digit runs are everywhere (ids, timestamps,
# phone numbers), and the mod-10 check is what separates a plausible
# card number from noise, cutting false positives ~10x. Works under
# both Java regex and RE2 (no backrefs, no lookaround).
CARD_CANDIDATE_RE = r"\b(?:[0-9][ \-]?){12,18}[0-9]\b"


def card_candidates_col(text: Column) -> Column:
    """Array of separator-stripped 13-19-digit candidate strings —
    scan-stage: one regexp_extract_all + a per-element replace."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(CARD_CANDIDATE_RE), F.lit(0)),
        lambda c: F.regexp_replace(c, r"[ \-]", ""),
    )


def luhn_valid_col(digits: Column) -> Column:
    """Luhn mod-10 checksum over a digit string (ISO/IEC 7812): from
    the RIGHT, double every second digit, subtract 9 when the double
    exceeds 9, valid iff the sum is divisible by 10. One integer fold
    over the character positions — pure Catalyst, engine-replayable."""
    n = F.length(digits)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc + F.when(
            (n - i) % 2 == 1,
            F.when(digits.substr(i, F.lit(1)).cast("int") * 2 > 9,
                   digits.substr(i, F.lit(1)).cast("int") * 2 - 9)
            .otherwise(digits.substr(i, F.lit(1)).cast("int") * 2),
        ).otherwise(digits.substr(i, F.lit(1)).cast("int")),
    )
    return total % 10 == 0


def card_counts_col(text: Column) -> Column:
    """struct(n_card_candidates, n_cards_valid) — the audit pair for
    payment-card PII: how many card-SHAPED digit runs, and how many
    pass Luhn. Filtering policy belongs to the caller (valid cards are
    near-certain PII; a high candidate count alone is usually a spec
    sheet or a log file)."""
    cands = card_candidates_col(text)
    return F.struct(
        F.size(cands).alias("n_card_candidates"),
        F.size(F.filter(cands, luhn_valid_col)).alias("n_cards_valid"),
    )


def redact_pii_col(text: Column, token: str = "<PII:{kind}>") -> Column:
    """Replace emails, IPv4 addresses, and phone numbers with typed
    placeholder tokens — the standard scrub before corpus release.
    Three codegen regexp_replace passes, no Python; at 100 TB this runs
    in the scan stage like every other text function here."""
    out = text
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token.format(kind=kind))
    return out


def pii_counts_col(text: Column) -> Column:
    """struct(n_email, n_ipv4, n_phone) — audit counts for filtering
    documents whose PII density is too high to salvage by redaction."""
    return F.struct(*[
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS
    ])


# ---------------------------------------------------------------------------
# text normalization (pre-tokenization cleanup)
# ---------------------------------------------------------------------------

# Each pass is a codegen'd regexp_replace, chosen to behave identically
# under Java regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
# Order matters: typography folds before whitespace collapse, control
# strip before trim. Full NFC normalization has no Catalyst builtin —
# that pass is the documented pandas-UDF slot (same pattern as the
# punycode path in functions/urls.py); everything below stays JVM-side.
NORMALIZE_PASSES = [
    # control characters except \t and \n (DEL included)
    (r"[\x00-\x08\x0b-\x1f\x7f]", ""),
    # zero-width space/joiners and the BOM
    (r"[\x{200b}-\x{200d}\x{feff}]", ""),
    # typographic single/double quotes -> ASCII
    (r"[\x{2018}-\x{201b}]", "'"),
    (r"[\x{201c}-\x{201f}]", "\""),
    # en/em/horizontal-bar dashes -> hyphen; ellipsis -> dots
    (r"[\x{2013}-\x{2015}]", "-"),
    (r"\x{2026}", "..."),
    # NBSP and narrow NBSP -> plain space
    (r"[\x{00a0}\x{202f}]", " "),
    # collapse runs of spaces/tabs; strip spaces around newlines BEFORE
    # squeezing newline runs — otherwise a blank line containing a space
    # ("\n \n") hides the run from the squeeze and the result is not a
    # fixpoint; then 3+ newlines -> paragraph break
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
]


def nfc_normalize_series(texts):
    """Unicode NFC on a pandas Series (None-safe) — the engine-neutral
    core of :func:`nfc_normalize_col`, importable for tests. Matches
    DuckDB's ``nfc_normalize()`` (both implement Unicode NFC)."""
    import unicodedata

    return texts.map(
        lambda t: None if t is None else unicodedata.normalize("NFC", t))


def nfc_normalize_col(text: Column) -> Column:
    """Unicode NFC normalization (canonical composition: ``e`` +
    combining acute -> ``é``) — the pass CCNet-style pipelines apply
    BEFORE tokenization so combining-mark spellings dedupe/tokenize
    identically to their composed twins. NFC has no Catalyst builtin,
    so this is the fifth sanctioned Arrow-batched pandas-UDF expression
    (policy: functions/udfs.py); stdlib ``unicodedata``, vectorized,
    never per-row Python in the executor loop. Compose it with
    :func:`normalize_text_col` (NFC first — canonical composition can
    produce characters the regexp passes then fold)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):  # pragma: no cover - executed on executors
        return nfc_normalize_series(s)

    return _nfc(text)


def char_entropy_col(text: Column) -> Column:
    """Character-level Shannon entropy (bits/char) — the gibberish /
    keyboard-mash / base64-blob detector: natural language sits ~3.5-4.5
    bits, repeated junk near 0, random binary-as-text near log2(charset).
    Pure higher-order array expressions (O(distinct_chars x len) per
    row, fine at document sizes), no shuffle, exact DuckDB twin. Empty
    text scores null."""
    # split('') emits boundary empties in some engines: drop them so the
    # char multiset (and the DuckDB twin) is exactly the text's chars
    chars = F.filter(F.split(text, ""), lambda x: x != "")
    n = F.size(chars)
    uniq = F.array_distinct(chars)
    terms = F.transform(
        uniq,
        lambda c: (
            F.size(F.filter(chars, lambda x: x == c)).cast("double") / n
        ),
    )
    ent = -F.aggregate(
        terms, F.lit(0.0), lambda acc, p: acc + p * F.log2(p))
    return F.when(n > 0, F.round(ent, 6))


def compression_ratio_series(texts):
    """Pandas path: zlib-compressed size / raw utf-8 size per document —
    the classic redundancy signal (heavily repeated boilerplate
    compresses far below natural text). Shared by the Spark UDF and the
    pytest oracle so both are the same bytes-level computation."""
    import zlib

    def one(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return None
        return round(len(zlib.compress(raw)) / len(raw), 6)

    return texts.map(one)


def compression_ratio_col(text: Column) -> Column:
    """zlib compression ratio as an Arrow-batched pandas UDF — the
    fourth sanctioned Python expression (bytes-level DEFLATE has no
    Catalyst equivalent; see functions/udfs.py policy). Vectorized,
    never per-row Python in the executor loop."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s):  # pragma: no cover - executed on executors
        return compression_ratio_series(s)

    return _ratio(text)


def normalize_text_col(text: Column) -> Column:
    """Pre-tokenization text cleanup (the CCNet/RefinedWeb normalization
    stage): strip control and zero-width characters, fold typographic
    quotes/dashes/ellipses to ASCII, convert NBSP to space, collapse
    whitespace runs, and trim. A chain of codegen regexp_replace passes
    — runs in the scan stage, no shuffle, no Python."""
    out = text
    for pat, rep in NORMALIZE_PASSES:
        out = F.regexp_replace(out, pat, rep)
    # trim() strips only spaces; edge newlines/tabs must go too
    return F.regexp_replace(out, r"^\s+|\s+$", "")


def html_quality_cols(html: Column) -> dict[str, Column]:
    """Structural HTML quality signals (the jusText/Boilerpipe family —
    page-level gates that run BEFORE extraction, on the raw markup):

    - ``n_tags`` / ``n_links``: tag and anchor counts;
    - ``visible_len``: length of the text after script/style blocks and
      all tags are stripped and whitespace collapsed (entities are NOT
      decoded — a documented simplification; both engines see the same
      bytes so the oracle is exact);
    - ``anchor_len``: total visible length inside ``<a>`` elements;
    - ``link_density``: anchor_len / visible_len — the classic
      boilerplate gate (nav/footer chrome is mostly linked text);
    - ``text_tag_ratio``: visible_len / n_tags — markup-heavy pages
      (trackers, widget soup) score low.

    Ratios round to 4dp, guarded against zero denominators. Pure
    scan-stage regex expressions — no parse, no shuffle, no Python;
    every pattern is Java/RE2-portable so DuckDB replays it verbatim.
    The MiniSoup DOM (functions/extract.py) is for extraction; these
    gates exist so 10^10 fetched pages can be triaged without ever
    building a tree."""
    s = html.cast("string")
    noscript = F.regexp_replace(
        F.regexp_replace(s, r"(?is)<script[^>]*>.*?</script>", " "),
        r"(?is)<style[^>]*>.*?</style>", " ")
    visible = F.trim(F.regexp_replace(
        F.regexp_replace(noscript, r"<[^>]*>", " "), r"\s+", " "))
    anchors = F.regexp_extract_all(
        noscript, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), F.lit(1))
    anchor_vis = F.transform(
        anchors,
        lambda a: F.trim(F.regexp_replace(
            F.regexp_replace(a, r"<[^>]*>", " "), r"\s+", " ")),
    )
    anchor_len = F.aggregate(
        anchor_vis, F.lit(0).cast("long"), lambda acc, a: acc + F.length(a))
    n_tags = F.regexp_count(s, F.lit(r"<[A-Za-z!/]"))
    n_links = F.regexp_count(s, F.lit(r"(?i)<a\b"))
    visible_len = F.length(visible).cast("long")
    return {
        "n_tags": n_tags.cast("long"),
        "n_links": n_links.cast("long"),
        "visible_len": visible_len,
        "anchor_len": anchor_len,
        "link_density": F.round(
            anchor_len / F.greatest(visible_len, F.lit(1)), 4),
        "text_tag_ratio": F.round(
            visible_len / F.greatest(n_tags.cast("long"), F.lit(1)), 4),
    }


def readability_signals(text: Column) -> dict[str, Column]:
    """Flesch reading ease + Flesch-Kincaid grade (Kincaid et al. 1975)
    — the classic surface-form readability pair, a standard web-text
    quality facet alongside the Gopher rules: too-easy text is often
    listicles/spam, too-hard is often OCR noise or legalese.

    Heuristic syllables (no dictionary at corpus scale): maximal
    ``[aeiouy]+`` runs per lowercased token, floor 1 per word.
    Sentences: ``[.!?]+``-delimited segments containing at least one
    alphanumeric. Pure Catalyst array expressions — one pass, zero
    shuffle, scan-stage pushdown-friendly — and every term has an exact
    DuckDB list-lambda twin, so the score is portable and auditable.

    ``ease  = 206.835 - 1.015*(words/sentences) - 84.6*(syll/words)``
    ``grade = 0.39*(words/sentences) + 11.8*(syll/words) - 15.59``
    (both denominators floored at 1; empty text scores as 0 words /
    1 sentence, ease 206.835 - 84.6*0 ... i.e. degenerate but defined).
    """
    low = F.lower(text)
    words = tokens_col(text)
    n_words = F.size(words)
    syll = F.aggregate(
        words,
        F.lit(0),
        lambda a, w: a + F.greatest(
            F.size(F.filter(F.split(w, "[^aeiouy]+"), lambda s: s != "")),
            F.lit(1)),
    )
    sents = F.size(F.filter(
        F.split(low, r"[.!?]+"), lambda s: s.rlike("[a-z0-9]")))
    safe_w = F.greatest(n_words, F.lit(1)).cast("double")
    safe_s = F.greatest(sents, F.lit(1)).cast("double")
    wps = n_words / safe_s
    spw = syll / safe_w
    return {
        "n_words": n_words,
        "n_sentences": sents,
        "n_syllables": syll,
        "reading_ease": F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6),
        "fk_grade": F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6),
    }


# ---------------------------------------------------------------------------
# Mojibake (encoding damage) detection + repair
# ---------------------------------------------------------------------------

# UTF-8 bytes decoded as Latin-1/cp1252 leave unmistakable multi-char
# scars: the UTF-8 lead byte surfaces as \u00c3/\u00c2/\u00e2 and the
# continuation bytes as symbol (sometimes invisible C1) chars -- hence
# the \uXXXX escapes below; several scars are unprintable. The
# common-web subset covers the overwhelming mass of real damage; repair
# maps each scar back to the intended code point. Ordered longest-first
# so three-byte scars never half-repair via a shorter prefix rule.
MOJIBAKE_MAP: tuple[tuple[str, str], ...] = (
    ("\u00e2\u20ac\u2122", "\u2019"),  # a-circ euro tm  -> right single quote
    ("\u00e2\u20ac\u02dc", "\u2018"),  # a-circ euro ~   -> left single quote
    ("\u00e2\u20ac\u0153", "\u201c"),  # a-circ euro oe  -> left double quote
    ("\u00e2\u20ac\u009d", "\u201d"),  # a-circ euro C1  -> right double quote
    ("\u00e2\u20ac\u201c", "\u2013"),  # a-circ euro ldq -> en dash
    ("\u00e2\u20ac\u201d", "\u2014"),  # a-circ euro rdq -> em dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # a-circ euro brokenbar -> ellipsis
    ("\u00c3\u00a9", "\u00e9"),  # A-tilde copyright -> e-acute
    ("\u00c3\u00a8", "\u00e8"),  # A-tilde diaeresis -> e-grave
    ("\u00c3\u00a0", "\u00e0"),  # A-tilde nbsp      -> a-grave
    ("\u00c3\u00bc", "\u00fc"),  # A-tilde 1/4       -> u-umlaut
    ("\u00c3\u00b6", "\u00f6"),  # A-tilde pilcrow   -> o-umlaut
    ("\u00c3\u00a4", "\u00e4"),  # A-tilde currency  -> a-umlaut
    ("\u00c3\u00b1", "\u00f1"),  # A-tilde plusminus -> n-tilde
    ("\u00c3\u00a7", "\u00e7"),  # A-tilde section   -> c-cedilla
    ("\u00c2\u00a0", "\u00a0"),  # A-circ nbsp       -> nbsp
)


def mojibake_count_col(text: Column) -> Column:
    """Number of known mojibake scars in ``text`` -- pure Catalyst:
    counting via length-delta per pattern (replace with empty, divide
    by pattern length), summed; no regex backtracking, no Python."""
    total = F.lit(0).cast("long")
    for bad, _ in MOJIBAKE_MAP:
        n = (F.length(text)
             - F.length(F.replace(text, F.lit(bad), F.lit("")))) / len(bad)
        total = total + n.cast("long")
    return total


def fix_mojibake_col(text: Column) -> Column:
    """Repair the known scars, longest-first (MOJIBAKE_MAP order), as a
    chain of literal ``replace`` expressions -- whole-stage-codegen'd,
    byte-deterministic, and exactly replayable by a SQL replace chain.
    Scars outside the map pass through untouched (measure with
    :func:`mojibake_count_col` before/after to find residue)."""
    out = text
    for bad, good in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


# Writing-system ranges for script profiling. Explicit codepoint ranges
# (not \p{Script=...}) so Java-regex (Spark) and RE2 (DuckDB oracle)
# agree character-for-character; blocks chosen to cover the major
# Common-Crawl scripts without overlap.
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "A-Za-z\\u00C0-\\u024F"),
    ("cyrillic", "\\u0400-\\u04FF"),
    ("arabic", "\\u0600-\\u06FF"),
    ("cjk", "\\u3040-\\u30FF\\u4E00-\\u9FFF\\uAC00-\\uD7AF"),
)


def script_count_cols(text: Column) -> dict[str, Column]:
    """Per-script character counts plus the dominant script — the
    writing-system histogram CC-style pipelines use next to language ID
    (a 'lang=en' page that is 60% CJK is a mislabel; a Latin/Cyrillic
    half-split is real code-switching or encoding damage that CCNet-
    style per-line language filters should see).

    Counting is ``length(text) - length(regexp_replace(text, class,
    ''))`` per script class — pure scan-stage codegen, one pass per
    script over the text expression, no explode and no Python.
    ``dominant`` is the max-count script, ties broken by the
    ``SCRIPT_RANGES`` order (latin first), 'none' when every count is
    zero. Returns ``{'n_<script>': Column, ..., 'dominant': Column}``.
    """
    out: dict[str, Column] = {}
    for name, ranges in SCRIPT_RANGES:
        out[f"n_{name}"] = (
            F.length(text)
            - F.length(F.regexp_replace(text, f"[{ranges}]", ""))
        ).cast("long")
    best = F.lit("none")
    best_n = F.lit(0).cast("long")
    for name, _ in SCRIPT_RANGES:
        n = out[f"n_{name}"]
        take = n > best_n  # strict: earlier scripts win ties
        best = F.when(take, F.lit(name)).otherwise(best)
        best_n = F.when(take, n).otherwise(best_n)
    out["dominant"] = best
    return out


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020, JMLR 21(140) §2.2)
# ---------------------------------------------------------------------------

# A line survives only if it ends in a terminal punctuation mark — C4's
# list: period, exclamation mark, question mark, or end quotation mark.
C4_TERMINAL_RE = r'[.!?"]$'

# Tiny stand-in for C4's "List of Dirty, Naughty, Obscene or Otherwise
# Bad Words" — the membership TEST is the operator; the list is config.
C4_BAD_WORDS = ("badword1", "badword2")


def c4_kept_lines(text: Column, min_words: int = 3) -> Column:
    """The line-level half of C4 cleaning (Raffel et al. 2020 §2.2):
    split on newline, trim, and keep a line only if it (a) ends in a
    terminal punctuation mark, (b) has at least ``min_words``
    whitespace words (C4 uses 3), and (c) does not mention
    ``javascript`` (case-insensitive word match — C4 drops any line
    with the word "Javascript", aimed at please-enable-JS boilerplate).

    Returns ``array<string>`` of surviving lines. Pure scan-stage
    array lambdas — no explode, no shuffle, no Python — with an exact
    DuckDB ``list_filter`` equivalent, so the pass is oracle-checkable
    and portable."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    def _keep(l: Column) -> Column:
        n_words = F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
        return (
            l.rlike(C4_TERMINAL_RE)
            & (n_words >= min_words)
            & ~F.lower(l).rlike(r"\bjavascript\b")
        )
    return F.filter(lines, _keep)


def c4_signals(
    text: Column,
    min_words: int = 3,
    min_sentences: int = 5,
    bad_words: tuple[str, ...] = C4_BAD_WORDS,
) -> dict[str, Column]:
    """Full C4 page cleaning (Raffel et al. 2020 §2.2) as one dict of
    scan-stage columns: line filtering via :func:`c4_kept_lines`, then
    the page-level gates — drop the whole page if any (lowercased
    whitespace) word is on the bad-words list, if it contains the
    phrase ``lorem ipsum``, if it contains a curly brace ``{`` (code),
    or if the CLEANED text has fewer than ``min_sentences`` sentences.

    Sentence counting is deterministic by construction: the count of
    ``.``/``!``/``?`` marks in the kept lines (C4 used a sentence
    splitter; this engine-neutral approximation is exact for the
    terminal-punctuated lines the line filter admits, and has a
    byte-identical DuckDB replay).

    ``drop_reason`` precedence (first match wins): ``bad_word`` >
    ``lorem_ipsum`` > ``curly_brace`` > ``too_few_sentences`` >
    ``kept``. Everything is a per-row expression — zero exchanges at
    any corpus size; at 10^10 pages this pass rides the scan."""
    kept = c4_kept_lines(text, min_words=min_words)
    clean_text = F.array_join(kept, "\n")
    words = F.filter(
        F.transform(F.split(F.lower(text), r"\s+"), lambda w: F.trim(w)),
        lambda w: w != "",
    )
    has_bad = F.arrays_overlap(
        words, F.array(*[F.lit(w) for w in bad_words]))
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    n_sentences = F.regexp_count(clean_text, F.lit(r"[.!?]")).cast("long")
    reason = (
        F.when(has_bad, F.lit("bad_word"))
        .when(has_lorem, F.lit("lorem_ipsum"))
        .when(has_brace, F.lit("curly_brace"))
        .when(n_sentences < min_sentences, F.lit("too_few_sentences"))
        .otherwise(F.lit("kept"))
    )
    lines_all = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    return {
        "n_lines": F.size(lines_all).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
        "n_sentences": n_sentences,
        "clean_text": clean_text,
        "keep": reason == "kept",
        "drop_reason": reason,
    }
