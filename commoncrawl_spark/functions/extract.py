"""Article extraction — the single shared module behind both the Spark
pandas UDF and the pure-Python test oracle.

Semantics mirror the reference pipeline's extraction stage
(``/root/reference/extract_from_warc.py:33-156``):

1. ``html_from_warc(warc_bytes)``  — gunzip (pass-through on non-gzip),
   split WARC header / HTTP header / body on the first two ``\\r\\n\\r\\n``,
   charset from the HTTP header ``charset=`` regex, else
   ``charset_normalizer.from_bytes().best()``, else utf-8-ignore
   (extract_from_warc.py:33-56).
2. ``extract_article(html)`` — Guardian-style selector chains: headline
   ``h1[class~=content__headline]``, ``time[itemprop=datePublished]@datetime``,
   ``a[rel=author]``, body ``div[itemprop=articleBody]`` falling back to
   ``div[class~=content__article-body]`` with script/style/aside decomposed
   and ``get_text('\\n', strip=True)``; three-fallback chains for the
   signposting / section-label / keyword tag lists, excluding literal
   ``home`` (extract_from_warc.py:58-156).

bs4/lxml are not available in this environment, so the DOM layer is a
small stdlib ``html.parser`` tree (``MiniSoup``) that implements exactly
the query surface the extractor needs. Because the UDF and the oracle
import *this same module*, byte-identity of extracted text between the
Spark path and the oracle path holds by construction; tests additionally
pin golden outputs so the module itself can't drift silently.
"""

from __future__ import annotations

import gzip
import re
from html.parser import HTMLParser
from typing import Any, Iterable, Optional

try:  # pragma: no cover - present in this environment via requests
    from charset_normalizer import from_bytes as _cn_from_bytes
except ImportError:  # pragma: no cover
    _cn_from_bytes = None

# --------------------------------------------------------------------------
# Mini DOM
# --------------------------------------------------------------------------

_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# attributes bs4 treats as whitespace-separated lists (the subset we match on)
_MULTI_VALUED_ATTRS = frozenset({"class", "rel"})


class Node:
    """One element in the mini DOM tree."""

    __slots__ = ("name", "attrs", "children", "parent", "_by_name")

    def __init__(self, name: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[Any] = []  # Node | str (text)
        self.parent = parent
        # document root only: tag-name -> nodes in document (pre-)order,
        # filled by _TreeBuilder; lets doc-rooted find() skip full scans
        self._by_name: dict[str, list["Node"]] | None = None

    # -- attribute access ---------------------------------------------------
    def __getitem__(self, key: str) -> str:
        return self.attrs[key]

    def get(self, key: str, default: Any = None) -> Any:
        return self.attrs.get(key, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    # -- traversal ----------------------------------------------------------
    def iter_descendants(self) -> Iterable["Node"]:
        """Pre-order descendants, iteratively (nested generators are the
        hot path's biggest constant factor)."""
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))

    def _attached_to(self, root: "Node") -> bool:
        """True if self is still in root's tree (decompose() detaches)."""
        n = self
        while n is not None:
            if n is root:
                return True
            n = n.parent
        return False

    def _matches(self, name: str | list[str] | None,
                 class_re: re.Pattern | None,
                 attrs: dict[str, Any] | None) -> bool:
        if name is not None:
            if isinstance(name, (list, tuple, set, frozenset)):
                if self.name not in name:
                    return False
            elif self.name != name:
                return False
        if class_re is not None:
            if not any(class_re.search(c) for c in self.classes):
                return False
        if attrs:
            for key, want in attrs.items():
                if want is True:  # attribute-presence test (href=True)
                    if key not in self.attrs:
                        return False
                    continue
                have = self.attrs.get(key)
                if have is None:
                    return False
                if key in _MULTI_VALUED_ATTRS:
                    if want != have and want not in have.split():
                        return False
                elif have != want:
                    return False
        return True

    def find(self, name=None, class_=None, attrs=None, **kw) -> "Node | None":
        pat, att = _as_re(class_), _merge(attrs, kw)
        if self._by_name is not None and isinstance(name, str):
            # index order == pre-order, so "first live match" is identical
            # to a traversal; liveness walk handles decomposed subtrees
            for n in self._by_name.get(name, ()):
                if n._matches(None, pat, att) and n._attached_to(self):
                    return n
            return None
        for n in self.iter_descendants():
            if n._matches(name, pat, att):
                return n
        return None

    def find_all(self, name=None, class_=None, attrs=None, **kw) -> list["Node"]:
        pat, att = _as_re(class_), _merge(attrs, kw)
        if self._by_name is not None and isinstance(name, str):
            return [
                n for n in self._by_name.get(name, ())
                if n._matches(None, pat, att) and n._attached_to(self)
            ]
        return [n for n in self.iter_descendants() if n._matches(name, pat, att)]

    # -- mutation -----------------------------------------------------------
    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None

    # -- text ---------------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts: list[str] = []
        self._collect_text(parts)
        if strip:
            parts = [p.strip() for p in parts]
            parts = [p for p in parts if p]
        return separator.join(parts)

    def _collect_text(self, out: list[str]) -> None:
        for child in self.children:
            if isinstance(child, Node):
                child._collect_text(out)
            else:
                out.append(child)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.name} {self.attrs}>"


def _as_re(class_) -> re.Pattern | None:
    if class_ is None:
        return None
    if isinstance(class_, re.Pattern):
        return class_
    return re.compile(re.escape(str(class_)))


def _merge(attrs: dict | None, kw: dict) -> dict:
    merged = dict(attrs or {})
    merged.update(kw)
    return merged


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.root._by_name = {}
        self._stack = [self.root]
        # script/style raw-text (CDATA) handling comes from html.parser
        # itself; no extra state needed here

    def handle_starttag(self, tag: str, attrs) -> None:
        attr_map: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_map:  # first occurrence wins, like browsers
                attr_map[k] = v if v is not None else ""
        node = Node(tag, attr_map, parent=self._stack[-1])
        self._stack[-1].children.append(node)
        self.root._by_name.setdefault(tag, []).append(node)
        if tag not in _VOID_ELEMENTS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        attr_map = {k: (v if v is not None else "") for k, v in attrs}
        node = Node(tag, attr_map, parent=self._stack[-1])
        self._stack[-1].children.append(node)
        self.root._by_name.setdefault(tag, []).append(node)

    def handle_endtag(self, tag: str) -> None:
        # pop to the nearest matching open tag; ignore stray closers
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# --------------------------------------------------------------------------
# Stage 1: WARC bytes -> HTML string  (extract_from_warc.py:33-56)
# --------------------------------------------------------------------------

_CHARSET_RE = re.compile(rb"charset=([\w\-]+)", re.IGNORECASE)


def html_from_warc(warc_bytes: bytes) -> str:
    """Decode a stored WARC segment (gzip member of WARC-header + HTTP-header
    + HTML body) into an HTML string, reproducing the reference's charset
    fallback chain bit-for-bit."""
    try:
        raw = gzip.decompress(warc_bytes)
    except (OSError, gzip.BadGzipFile):
        raw = warc_bytes

    header_end = raw.find(b"\r\n\r\n")
    if header_end == -1:
        return raw.decode("utf-8", errors="ignore")
    http_header_end = raw.find(b"\r\n\r\n", header_end + 4)
    if http_header_end == -1:
        return raw.decode("utf-8", errors="ignore")

    http_headers = raw[header_end + 4 : http_header_end]
    body = raw[http_header_end + 4 :]

    match = _CHARSET_RE.search(http_headers)
    if match:
        try:
            encoding = match.group(1).decode("ascii")
            return body.decode(encoding, errors="ignore")
        except (LookupError, UnicodeDecodeError):
            pass

    if _cn_from_bytes is not None:
        best = _cn_from_bytes(body).best()
        if best is not None:
            return str(best)
        return body.decode("utf-8", errors="ignore")
    # deterministic fallback when charset_normalizer is absent
    return body.decode("utf-8", errors="ignore")


# --------------------------------------------------------------------------
# Stage 2: HTML string -> article struct  (extract_from_warc.py:58-156)
# --------------------------------------------------------------------------

_RE_HEADLINE = re.compile(r"content__headline")
_RE_BODY = re.compile(r"content__article-body")
_RE_SIGNPOSTING = re.compile(r"signposting")
_RE_SIGNPOSTING_ITEM = re.compile(r"signposting__item")
_RE_SUBNAV_LIST = re.compile(r"subnav__list")
_RE_SUBNAV_ITEM = re.compile(r"subnav__item")
_RE_SUBNAV_LINK = re.compile(r"subnav-link")
_RE_LABELS = re.compile(r"content__labels")
_RE_SECTION_LABEL_LINK = re.compile(r"content__section-label__link")
_RE_KEYWORDS = re.compile(r"submeta__keywords")
_RE_SUBMETA_LINK = re.compile(r"submeta__link")
_RE_KEYWORD_LIST = re.compile(r"keyword-list")
_RE_SUBMETA_LINKS = re.compile(r"submeta__links")


def extract_article(html: str) -> dict[str, Any]:
    """Extract the 7-field article struct from Guardian-style HTML."""
    soup = parse_html(html)

    title_tag = soup.find("h1", class_=_RE_HEADLINE)
    title = title_tag.get_text(strip=True) if title_tag else None

    time_tag = soup.find("time", attrs={"itemprop": "datePublished"})
    publish_time = (
        time_tag["datetime"] if time_tag and "datetime" in time_tag.attrs else None
    )

    author_tag = soup.find("a", attrs={"rel": "author"})
    author = author_tag.get_text(strip=True) if author_tag else None

    body_tag = soup.find("div", attrs={"itemprop": "articleBody"})
    if not body_tag:
        body_tag = soup.find("div", class_=_RE_BODY)
    text = ""
    if body_tag:
        for element in body_tag.find_all(["script", "style", "aside"]):
            element.decompose()
        text = body_tag.get_text(separator="\n", strip=True)

    signposting_tags: list[str] = []
    signposting_ul = soup.find("ul", class_=_RE_SIGNPOSTING)
    if signposting_ul:
        for li in signposting_ul.find_all("li", class_=_RE_SIGNPOSTING_ITEM):
            a_tag = li.find("a")
            if a_tag:
                tag_text = a_tag.get_text(strip=True)
                if tag_text.lower() != "home":
                    signposting_tags.append(tag_text)
    if not signposting_tags:
        subnav_ul = soup.find("ul", class_=_RE_SUBNAV_LIST)
        if subnav_ul:
            for li in subnav_ul.find_all("li", class_=_RE_SUBNAV_ITEM):
                a_tag = li.find("a", class_=_RE_SUBNAV_LINK)
                if a_tag:
                    tag_text = a_tag.get_text(strip=True)
                    if tag_text.lower() != "home":
                        signposting_tags.append(tag_text)
    if not signposting_tags:
        labels_div = soup.find("div", class_=_RE_LABELS)
        if labels_div:
            for a_tag in labels_div.find_all("a", attrs={"href": True}):
                tag_text = a_tag.get_text(strip=True)
                if tag_text.lower() != "home":
                    signposting_tags.append(tag_text)

    section_labels: list[str] = []
    labels_div = soup.find("div", class_=_RE_LABELS)
    if labels_div:
        for a_tag in labels_div.find_all("a", class_=_RE_SECTION_LABEL_LINK):
            section_labels.append(a_tag.get_text(strip=True))

    keyword_tags: list[str] = []
    keywords_div = soup.find("div", class_=_RE_KEYWORDS)
    if keywords_div:
        for a_tag in keywords_div.find_all("a", class_=_RE_SUBMETA_LINK):
            keyword_tags.append(a_tag.get_text(strip=True))
    if not keyword_tags:
        keyword_list = soup.find("ul", class_=_RE_KEYWORD_LIST)
        if keyword_list:
            for a_tag in keyword_list.find_all("a", attrs={"itemprop": "keywords"}):
                keyword_tags.append(a_tag.get_text(strip=True))
    if not keyword_tags:
        submeta_links = soup.find("ul", class_=_RE_SUBMETA_LINKS)
        if submeta_links:
            for a_tag in submeta_links.find_all("a", class_=_RE_SUBMETA_LINK):
                keyword_tags.append(a_tag.get_text(strip=True))

    return {
        "title": title,
        "publish_time": publish_time,
        "author": author,
        "text": text,
        "signposting_tags": signposting_tags,
        "section_labels": section_labels,
        "keyword_tags": keyword_tags,
    }


def extract_from_warc_bytes(warc_bytes: Optional[bytes]) -> dict[str, Any]:
    """Full per-record pipeline: WARC bytes -> article struct + error channel.

    Mirrors process_single_file (extract_from_warc.py:158-185): empty HTML
    or empty extracted text are failures routed to the error side-channel,
    never silently dropped.
    """
    try:
        if not warc_bytes:
            raise ValueError("Empty WARC bytes.")
        html = html_from_warc(bytes(warc_bytes))
        if not html or not html.strip():
            raise ValueError("Extracted HTML is empty.")
        article = extract_article(html)
        if not article.get("text") or not article["text"].strip():
            raise ValueError("Extracted article text is empty.")
        article["error"] = None
        return article
    except Exception as exc:  # noqa: BLE001 - error side-channel by design
        return {
            "title": None,
            "publish_time": None,
            "author": None,
            "text": None,
            "signposting_tags": None,
            "section_labels": None,
            "keyword_tags": None,
            "error": f"{type(exc).__name__}: {exc}",
        }


def sniff_mime_col(payload):
    """Content-type detection from leading MAGIC BYTES — the
    ``content_mime_detected`` field cc-index serves next to the
    server-declared Content-Type (servers lie: text/html labels on
    PDFs and gzip are routine in real crawls, and the extraction
    router must dispatch on the BYTES). Binary signatures are matched
    on the hex of the first 8 octets (PDF, gzip, zip, PNG, JPEG, GIF;
    RIFF containers route by the format tag at offset 9-12 — WebP vs
    WAV vs AVI); text types on a whitespace-tolerant, case-insensitive
    prefix of the decoded string (HTML doctype/tag, XML declaration,
    JSON value); anything else falls back to ``text/plain`` when the
    256-byte head is NUL-free, ``application/octet-stream`` otherwise.

    Pure Catalyst expressions (hex/substring/rlike chain) — runs in
    the scan stage over the fat payload column with no Python and no
    shuffle, so MIME routing composes into the same pass as the
    header split (C4) and charset sniff (C5).
    """
    from pyspark.sql import functions as F

    h = F.hex(F.substring(payload, 1, 8))
    s = payload.cast("string")
    head = F.substring(s, 1, 64)
    return (
        F.when(h.startswith("255044462D"), "application/pdf")      # %PDF-
        .when(h.startswith("1F8B"), "application/gzip")
        .when(h.startswith("504B0304"), "application/zip")
        .when(h.startswith("89504E470D0A1A0A"), "image/png")
        .when(h.startswith("FFD8FF"), "image/jpeg")
        .when(h.startswith("474946383761"), "image/gif")           # GIF87a
        .when(h.startswith("474946383961"), "image/gif")           # GIF89a
        # RIFF is a CONTAINER: the format tag at offset 9-12 decides
        # (WebP images are ubiquitous web bytes — audio would misroute)
        .when(h.startswith("52494646"),
              F.when(F.hex(F.substring(payload, 9, 4)) == "57454250",
                     "image/webp")                                 # WEBP
              .when(F.hex(F.substring(payload, 9, 4)) == "57415645",
                    "audio/x-wav")                                 # WAVE
              .when(F.hex(F.substring(payload, 9, 4)) == "41564920",
                    "video/x-msvideo")                             # AVI
              .otherwise("application/x-riff"))
        .when(head.rlike(r"(?i)^\s*<(!doctype\s+html|html)"), "text/html")
        .when(head.rlike(r"^\s*<\?xml"), "application/xml")
        .when(head.rlike(r'^\s*[\[{]'), "application/json")
        .when(F.substring(s, 1, 256).contains("\x00"),
              "application/octet-stream")
        .otherwise("text/plain")
    )


# --------------------------------------------------------------------------
# Publication-date extraction (CC-News-style article dating)
# --------------------------------------------------------------------------

# candidate sources in precedence order: (label, where, pattern).
# Each pattern is RE2/Java-compatible (no lookaround) so the Spark and
# DuckDB sides run the SAME regex. regexp_extract returns '' on miss
# in both engines.
PUB_DATE_SOURCES: tuple[tuple[str, str, str], ...] = (
    ("og_meta", "html",
     r'<meta[^>]*property="article:published_time"[^>]*content="([^"]+)"'),
    ("meta_date", "html",
     r'<meta[^>]*name="date"[^>]*content="([^"]+)"'),
    ("time_tag", "html", r'<time[^>]+datetime="([^"]+)"'),
    ("json_ld", "html", r'"datePublished"\s*:\s*"([^"]+)"'),
    ("url_path", "url", r"/(\d{4}/\d{2}/\d{2})/"),
    ("text_iso", "html", r"(\d{4}-\d{2}-\d{2})"),
)

PUB_DATE_MIN_YEAR = 1995
PUB_DATE_MAX_YEAR = 2035


def publication_date_cols(html, url) -> dict:
    """Article publication date from page bytes + URL, the CC-News
    dating chain: OpenGraph ``article:published_time`` > ``<meta
    name="date">`` > ``<time datetime>`` > JSON-LD ``datePublished`` >
    a ``/YYYY/MM/DD/`` URL segment > the first bare ISO date in the
    page. The FIRST candidate that parses to a calendar-valid,
    plausible date (year in [1995, 2035]) wins — a malformed or
    implausible higher-precedence match falls through instead of
    nulling the row, because boilerplate misdates (cache timestamps,
    1970 epochs, 9999 placeholders) are endemic in web pages.

    Returns ``{"pub_date": yyyy-MM-dd string or null,
    "date_source": label or 'none'}``. Pure scan-stage regexes and a
    when-chain — zero exchanges, zero Python; every pattern and the
    validity rule replay verbatim in DuckDB (regexp_extract +
    try_cast), so the chain is fully oracle-checkable.

    Expression-tree discipline (the mmr_rerank lesson): the cascade is
    a COALESCE over per-source validated candidates, each independent
    of the others — a fold of when(prev.isNull() & ok, ...) chains
    would embed every earlier level's regex subtree twice per step,
    doubling the tree per source (2^6 copies; measured 15 s instead
    of ~1 s at sf0.1)."""
    from pyspark.sql import functions as F  # keep module import-light

    valid: list = []
    for label, col_name, pat in PUB_DATE_SOURCES:
        raw = F.regexp_extract(html if col_name == "html" else url, pat, 1)
        iso = F.substring(F.replace(raw, F.lit("/"), F.lit("-")), 1, 10)
        d = F.try_to_timestamp(iso, F.lit("yyyy-MM-dd")).cast("date")
        ok = (d.isNotNull()
              & (F.year(d) >= PUB_DATE_MIN_YEAR)
              & (F.year(d) <= PUB_DATE_MAX_YEAR))
        valid.append((label, F.when(ok, d)))
    parsed = F.coalesce(*[v for _, v in valid])
    source = F.lit(None).cast("string")
    for label, v in reversed(valid):
        source = F.when(v.isNotNull(), F.lit(label)).otherwise(source)
    return {
        "pub_date": F.date_format(parsed, "yyyy-MM-dd"),
        "date_source": F.coalesce(source, F.lit("none")),
    }
