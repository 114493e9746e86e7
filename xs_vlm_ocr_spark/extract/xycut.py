"""PDF layout parsing: XY-cut reading-order recovery + paragraph merge.

Deterministic, stdlib-only. Reference analogue: the Paddle layout-parsing
operator (doc -> layout regions -> ordered markdown text, reference
src/adapters/PaddleAdapter.cpp:69-386); per BASELINE.json:north_star this
is extraction stage (b).

Input line spans carry ``"x0,y0,x1,y1|content"`` with normalized page
coordinates in [0, 1] (y grows downward). The classic recursive XY-cut:

  * find the widest gap in the y-projection profile; if it clears
    ``Y_GAP_MIN``, cut horizontally (top region first);
  * else find the widest gap in the x-projection; if it clears
    ``X_GAP_MIN``, cut vertically (left region first) — this recovers
    column order in 2-3 column layouts;
  * at a leaf, sort lines by (y0, x0) and merge consecutive lines into a
    paragraph while the vertical gap stays within one line-height.

All comparisons are on parsed decimal floats of fixed-precision inputs,
so ordering is reproducible across platforms.
"""

from __future__ import annotations

from typing import NamedTuple

X_GAP_MIN = 0.05  # column gutter threshold
Y_GAP_MIN = 0.05  # section-band threshold
PARA_GAP_FACTOR = 1.0  # new paragraph when gap > factor * prev line height
MAX_DEPTH = 12


class Line(NamedTuple):
    x0: float
    y0: float
    x1: float
    y1: float
    content: str


def parse_pdf_line(text: str) -> Line | None:
    """Parse ``"x0,y0,x1,y1|content"``; None if malformed."""
    head, sep, content = text.partition("|")
    if not sep:
        return None
    parts = head.split(",")
    if len(parts) != 4:
        return None
    try:
        # direct indexing: a genexpr-unpack here was ~3% of extraction CPU
        return Line(float(parts[0]), float(parts[1]),
                    float(parts[2]), float(parts[3]), content)
    except ValueError:
        return None


def _widest_gap(intervals: list[tuple[float, float]]) -> tuple[float, float]:
    """Widest interior gap of the union of intervals; (width, cut_at)."""
    ivs = sorted(intervals)
    best_w, best_at = 0.0, 0.0
    cur_end = ivs[0][1]
    for lo, hi in ivs[1:]:
        if lo > cur_end:
            w = lo - cur_end
            if w > best_w:
                best_w, best_at = w, (cur_end + lo) / 2.0
        if hi > cur_end:
            cur_end = hi
    return best_w, best_at


def _xycut(lines: list[Line], depth: int, out: list[list[Line]]) -> None:
    if not lines:
        return
    if len(lines) == 1 or depth >= MAX_DEPTH:
        out.append(lines)
        return
    y_w, y_at = _widest_gap([(ln.y0, ln.y1) for ln in lines])
    x_w, x_at = _widest_gap([(ln.x0, ln.x1) for ln in lines])
    # cut on the widest qualifying gap of either axis (a column gutter
    # beats a narrower section gap; a full-width band beats the gutter);
    # exact tie prefers the horizontal (y) cut
    cuts: list[tuple[float, str, float]] = []
    if y_w >= Y_GAP_MIN:
        cuts.append((y_w, "y", y_at))
    if x_w >= X_GAP_MIN:
        cuts.append((x_w, "x", x_at))
    for _, axis, at in sorted(cuts, key=lambda c: (-c[0], c[1] != "y")):
        if axis == "y":
            first = [ln for ln in lines if ln.y1 <= at]
            second = [ln for ln in lines if ln.y1 > at]
        else:
            first = [ln for ln in lines if ln.x1 <= at]
            second = [ln for ln in lines if ln.x1 > at]
        if first and second:
            _xycut(first, depth + 1, out)
            _xycut(second, depth + 1, out)
            return
    out.append(lines)


def _merge_paragraphs(leaf: list[Line]) -> list[str]:
    # full-tuple key: ties on (y0, x0) — e.g. identical boxes — must not
    # fall back to input arrival order (permutation invariance)
    ordered = sorted(leaf, key=lambda ln: (ln.y0, ln.x0, ln.y1, ln.x1, ln.content))
    paras: list[str] = []
    buf: list[str] = []
    prev: Line | None = None
    for ln in ordered:
        if prev is not None:
            gap = ln.y0 - prev.y1
            height = max(prev.y1 - prev.y0, 1e-6)
            if gap > PARA_GAP_FACTOR * height:
                paras.append(" ".join(buf))
                buf = []
        txt = " ".join(ln.content.split())
        if txt:
            buf.append(txt)
        prev = ln
    if buf:
        paras.append(" ".join(buf))
    return [p for p in paras if p]


def xycut_paragraphs(line_texts: list[str]) -> list[str]:
    """Reading-order paragraphs from raw ``pdf_line`` span texts."""
    lines = [ln for t in line_texts if (ln := parse_pdf_line(t)) is not None]
    if not lines:
        return []
    leaves: list[list[Line]] = []
    _xycut(lines, 0, leaves)
    paras: list[str] = []
    for leaf in leaves:
        paras.extend(_merge_paragraphs(leaf))
    return paras
