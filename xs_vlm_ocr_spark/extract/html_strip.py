"""HTML boilerplate stripping via text-density / link-density heuristics.

Arc90-readability / trafilatura-style block scoring, stdlib-only and
fully deterministic. Reference analogue: the local deterministic
extractor (reference src/adapters/TesseractAdapter.cpp:95-246) plus the
GLM output-cleanup chain (reference src/adapters/GLMAdapter.cpp:472-497);
per BASELINE.json:north_star this is extraction stage (a).

Algorithm:
  * parse with ``html.parser`` (entity refs converted);
  * drop entire subtrees of boilerplate containers (nav/footer/header/
    aside/script/style/form/...);
  * attribute text to the innermost open block element (p, h1-h6, li,
    td, pre, blockquote, div, ...); text inside <a> also counts toward
    the block's link length;
  * keep a block iff its whitespace-normalized text meets a per-tag
    minimum length and its link density (link chars / total chars) is
    below a per-tag ceiling — this kills nav lists, link farms, footers;
  * emit kept blocks in document order (by first-character position).
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser

# Subtrees dropped wholesale.
DROP_TAGS = frozenset(
    "script style nav footer header aside form noscript button select "
    "option iframe svg template".split()
)

# Elements that own text. Innermost-open-block attribution.
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li td th pre blockquote div article section "
    "main figcaption dd dt summary".split()
)

# Void elements never get a closing tag; treat <br> as whitespace.
VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

# (min_chars, max_link_density) per tag class.
_HEADING = frozenset("h1 h2 h3 h4 h5 h6".split())
_LIST = frozenset(("li",))
DEFAULT_MIN_CHARS = 25
DEFAULT_MAX_LINK_DENSITY = 0.33
HEADING_MIN_CHARS = 8
LIST_MIN_CHARS = 40
LIST_MAX_LINK_DENSITY = 0.20


def _keep(tag: str, text: str, link_chars: int) -> bool:
    n = len(text)
    if n == 0:
        return False
    density = link_chars / n
    if tag in _HEADING:
        return n >= HEADING_MIN_CHARS and density <= DEFAULT_MAX_LINK_DENSITY
    if tag in _LIST:
        return n >= LIST_MIN_CHARS and density <= LIST_MAX_LINK_DENSITY
    return n >= DEFAULT_MIN_CHARS and density <= DEFAULT_MAX_LINK_DENSITY


class _Block:
    __slots__ = ("tag", "start_pos", "chunks", "link_chars", "in_drop")

    def __init__(self, tag: str, start_pos: int, in_drop: bool) -> None:
        self.tag = tag
        self.start_pos = start_pos
        self.chunks: list[str] = []
        self.link_chars = 0
        self.in_drop = in_drop


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.a_depth = 0
        self.pos = 0  # monotone text-event counter -> document order
        self.open_blocks: list[_Block] = []
        self.segments: list[tuple[int, str]] = []  # (start_pos, normalized text)

    # -- tag events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in VOID_TAGS:
            if tag == "br" and self.open_blocks:
                self.open_blocks[-1].chunks.append(" ")
            return
        if tag in DROP_TAGS:
            self.drop_depth += 1
            return
        if tag == "a":
            self.a_depth += 1
            return
        if tag in BLOCK_TAGS:
            self.open_blocks.append(_Block(tag, self.pos, self.drop_depth > 0))

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            if self.drop_depth > 0:
                self.drop_depth -= 1
            return
        if tag == "a":
            if self.a_depth > 0:
                self.a_depth -= 1
            return
        if tag in BLOCK_TAGS:
            blocks = self.open_blocks
            # fast path: well-nested close of the innermost block (the
            # overwhelmingly common case — measured ~17% of strip_html
            # CPU went to the generic scan below)
            if blocks and blocks[-1].tag == tag:
                self._finalize(blocks.pop())
                return
            # close the innermost matching block (tolerant of misnesting)
            for i in range(len(blocks) - 1, -1, -1):
                if blocks[i].tag == tag:
                    # implicitly close anything opened after it too
                    for blk in reversed(blocks[i:]):
                        self._finalize(blk)
                    del blocks[i:]
                    break

    def handle_data(self, data: str) -> None:
        if self.drop_depth > 0 or not data:
            return
        if data.isspace():  # == `not data.strip()` for non-empty data, no alloc
            if self.open_blocks:
                self.open_blocks[-1].chunks.append(" ")
            return
        self.pos += 1
        if self.open_blocks:
            blk = self.open_blocks[-1]
            blk.chunks.append(data)
            if self.a_depth > 0:
                blk.link_chars += len(" ".join(data.split()))

    # -- finalization ---------------------------------------------------
    def _finalize(self, blk: _Block) -> None:
        if blk.in_drop:
            return
        text = " ".join("".join(blk.chunks).split())
        if _keep(blk.tag, text, blk.link_chars):
            self.segments.append((blk.start_pos, text))

    def finish(self) -> list[str]:
        for blk in reversed(self.open_blocks):
            self._finalize(blk)
        self.open_blocks.clear()
        self.segments.sort(key=lambda s: s[0])
        return [t for _, t in self.segments]


def strip_html_stdlib(html: str) -> list[str]:
    """html.parser-driven variant — the cross-check implementation
    (slower; kept for parity tests against the fast tokenizer)."""
    if not html:
        return []
    parser = _Extractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # html.parser is tolerant; anything pathological -> best effort
        pass
    return parser.finish()


# -------------------------------------------------------- fast tokenizer

# One compiled scan: comments / doctype / tags (quoted attrs may contain
# '>') / text runs. ~4x faster than html.parser's per-tag regex dance,
# which dominates extraction CPU (and at 32 workers, the memory bus).
_TOKEN = None


def _token_re():
    global _TOKEN
    if _TOKEN is None:
        import re

        _TOKEN = re.compile(
            r"<!--.*?-->"                                     # comment
            r"|<!\[CDATA\[.*?\]\]>"                           # cdata
            r"|<[!?][^>]*>"                                   # doctype / pi
            r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)"           # 1:close 2:name
            r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>"             # 3:attrs
            r"|([^<]+)",                                      # 4:text
            re.DOTALL,
        )
    return _TOKEN


def strip_html(html: str) -> list[str]:
    """Return main-content text segments of *html* in document order.

    Regex-tokenized event loop feeding the same block state machine as
    the html.parser variant; outputs are identical on well-formed input
    (tests/test_extract_core.py cross-checks both on the full corpus).
    """
    if not html:
        return []
    ex = _Extractor()
    # bound-method locals: the loop runs once per token and the
    # attribute lookups are measurable at corpus scale
    handle_data, handle_starttag, handle_endtag = (
        ex.handle_data, ex.handle_starttag, ex.handle_endtag)
    has_amp = "&" in html
    raw_text_until: str | None = None  # inside <script>/<style>: raw text mode
    for m in _token_re().finditer(html):
        # one C call for all groups (the per-token .group() calls used to
        # be ~10% of extraction CPU at corpus scale)
        closing, name, attrs, text = m.group(1, 2, 3, 4)
        if text is not None:
            if raw_text_until is not None:
                continue  # raw content of a drop tag: ignore entirely
            if has_amp and "&" in text:
                text = unescape(text)
            handle_data(text)
            continue
        if name is None:
            continue  # comment / doctype
        name = name.lower()
        if raw_text_until is not None:
            # only the matching close tag leaves raw-text mode
            if closing and name == raw_text_until:
                raw_text_until = None
                handle_endtag(name)
            continue
        if closing:
            handle_endtag(name)
        else:
            # most tags carry no attrs: skip the rstrip alloc for ""
            self_closing = bool(attrs) and attrs.rstrip().endswith("/")
            handle_starttag(name, ())
            if name in ("script", "style") and not self_closing:
                raw_text_until = name
            elif self_closing and (
                name in DROP_TAGS or name in BLOCK_TAGS or name == "a"
            ):
                handle_endtag(name)
    return ex.finish()
