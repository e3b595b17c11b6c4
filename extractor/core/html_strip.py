"""HTML main-content extraction + DOM reference-block detection.

Re-derives the capability of ``prepareHTML``/``mapHTML``
(``LOCDB-V3/xmlProcessing.py:179-397``) without BeautifulSoup/lxml
(offline sandbox): a single pass with stdlib ``html.parser`` emits flat
text blocks with ancestry features, then

- a boilerpipe-style word-count / link-density classifier (public
  algorithm: Kohlschuetter et al., "Boilerplate Detection using Shallow
  Text Features", WSDM 2010) keeps main-content blocks — this replaces
  the reference's role for crop_morphology's "find dense text blocks,
  drop page furniture" (``dev-version/crop_morphology.py``) on the DOM
  side, plus the reference's F1-greedy block subset selection
  (``dev-version/crop_morphology.py:137-190``) in spirit;
- reference candidates are lifted from generalized structure instead of
  the reference's five hard-coded site layouts
  (``LOCDB-V3/xmlProcessing.py:185-264``): ``<cite>`` elements,
  ``dl.references`` items, any block under a ``reference``/``citation``
  class, list items under a References/Bibliography heading, and
  ``td[valign=top]`` cells (with ``ref-google``/``ref-xLink`` noise
  spans removed, per layout (e));
- ``cit-*`` classed spans map to structured bib fields (``mapHTML``
  ``LOCDB-V3/xmlProcessing.py:279-397``).

Malformed markup is tolerated: unmatched close tags are ignored,
unclosed tags are popped leniently (§7.4 risk 3 of SURVEY.md).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from extractor.core import refseg
from extractor.core.textnorm import normalize_block, normalize_pre

BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "dd", "dt", "td", "th",
    "tr", "table", "ul", "ol", "dl", "h1", "h2", "h3", "h4", "h5", "h6",
    "pre", "blockquote", "figcaption", "cite", "body", "nav", "header",
    "footer", "aside", "form", "figure",
}
SKIP_TAGS = {"script", "style", "noscript", "svg", "template", "head", "iframe"}
BOILER_TAGS = {"nav", "header", "footer", "aside", "form"}
VOID_TAGS = {"br", "hr", "img", "meta", "link", "input", "area", "base",
             "col", "embed", "source", "track", "wbr"}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

BOILER_CLASS_RE = re.compile(
    r"(?:^|[\s_-])(nav|menu|sidebar|footer|header|banner|advert|ads?|"
    r"cookie|social|share|breadcrumb|promo|widget|related|comment)s?(?:$|[\s_-])",
    re.IGNORECASE,
)
REF_CLASS_RE = re.compile(r"(reference|citation)", re.IGNORECASE)
REF_NOISE_RE = re.compile(r"ref-(google|xlink)", re.IGNORECASE)
_CIT_FIELD_RE = re.compile(r"\bcit-([a-z-]+)\b", re.IGNORECASE)

# boilerpipe NumWordsRulesClassifier thresholds (WSDM'10 paper, public)
_LD_CURR = 0.333333
_LD_PREV = 0.555556

# layout (c) "['...']" wrap. The quote is REQUIRED: a bare leading
# "[" is a citation marker ("[1] Smith..."), not a wrap, and must
# survive into raw — matching the pdf/plain paths.
_WRAP_RE = re.compile(r"^\[['\"]\s*|\s*['\"]\]$")

# class/id-string -> (boiler, ref, noise) regex flags, memoized: real
# pages repeat the same class strings hundreds of times (nav items,
# list rows), so one dict hit replaces up to 4 regex searches. Pure
# function of the string; bounded (cleared at 4096 distinct strings).
_CLS_FLAG_CACHE: dict[str, tuple[bool, bool, bool]] = {}


_NO_FLAGS = (False, False, False)


def _cls_flags(cls: str) -> tuple[bool, bool, bool]:
    f = _CLS_FLAG_CACHE.get(cls)
    if f is None:
        if len(_CLS_FLAG_CACHE) > 4096:
            _CLS_FLAG_CACHE.clear()
        f = (BOILER_CLASS_RE.search(cls) is not None,
             REF_CLASS_RE.search(cls) is not None,
             REF_NOISE_RE.search(cls) is not None)
        _CLS_FLAG_CACHE[cls] = f
    return f

# differential-test hook: tests flip this to compare the fast tokenizer
# against the stdlib state machine on the same corpus
_use_stdlib_parser = False


# stack frames are plain tuples (tag, boiler, ref_kind, noise,
# cit_field) — constructed ~300k times per 6k pages; tuple creation +
# index access beats a __slots__ class by ~2x on this path
_F_TAG, _F_BOILER, _F_REF, _F_NOISE, _F_CIT = range(5)


class _Block:
    __slots__ = ("tag", "boiler", "ref_kind", "parts", "anchor_chars",
                 "chars", "cit_fields", "heading", "pre", "_text")

    def __init__(self, tag, boiler, ref_kind):
        self.tag = tag
        self.boiler = boiler
        self.ref_kind = ref_kind
        self.parts: list[str] = []
        self.anchor_chars = 0
        self.chars = 0
        self.cit_fields: dict[str, list[str]] = {}
        self.heading = tag in HEADING_TAGS
        # preformatted blocks keep their line structure (code/console
        # payloads in agent transcripts lose meaning fully flattened)
        self.pre = tag == "pre"
        self._text: str | None = None

    @property
    def text(self) -> str:
        # cached: classify + emit + ref-lift each read it, and parts
        # never mutate after the block is flushed
        if self._text is None:
            joined = "".join(self.parts)
            self._text = (normalize_pre(joined) if self.pre
                          else normalize_block(joined))
        return self._text


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.stack: list[tuple] = []
        self.blocks: list[_Block] = []
        self.cur: _Block | None = None
        self.skip_depth = 0
        self.anchor_depth = 0
        self.after_ref_heading = False
        # >0 while inside <table>: non-citation rows/cells merge into
        # ONE block instead of per-cell micro-blocks, so a data table
        # aggregates enough words to classify on its own content
        # (link-farm layout tables still die by link density);
        # citation cells (ref_kind set, e.g. td[valign=top]) keep
        # their per-cell blocks
        self.table_depth = 0
        # same for non-citation <dl>: dt/dd alternate 1-word terms and
        # short definitions — per-item blocks kept the terms and
        # dropped every definition; merged, the list classifies as one
        # unit (dl.references keeps per-item ref blocks via ref_kind)
        self.dl_depth = 0

    # -- frame helpers ------------------------------------------------
    def _attrs(self, attrs):
        d = {}
        for k, v in attrs:
            d[k.lower()] = v or ""
        return d

    def _flush(self):
        if self.cur is not None and self.cur.chars > 0:
            self.blocks.append(self.cur)
        self.cur = None

    def _open_block(self, tag):
        self._flush()
        top = self.stack[-1] if self.stack else None
        self.cur = _Block(
            tag,
            top[_F_BOILER] if top else False,
            top[_F_REF] if top else None,
        )

    # -- parser events ------------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in VOID_TAGS:
            if tag in ("br", "hr") and self.cur is not None:
                self.cur.parts.append(" ")
                self.cur._text = None
            return
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            return
        stack = self.stack
        top = stack[-1] if stack else None
        if attrs:
            a = self._attrs(attrs)
            cls_attr = a.get("class", "")
            cls = "{} {}".format(cls_attr, a.get("id", ""))
            has_cls = len(cls) > 1
        else:
            a = None
            cls_attr = ""
            cls = " "
            has_cls = False

        # attr-free fast path: most tags carry no class/id, and every
        # regex below can only fire on class/id content
        flags = _cls_flags(cls) if has_cls else _NO_FLAGS
        boiler = (top[_F_BOILER] if top else False) or tag in BOILER_TAGS \
            or flags[0]
        ref_kind = top[_F_REF] if top else None
        if ref_kind is None:
            if tag == "cite":
                ref_kind = "cite"
            elif tag == "dl" and "references" in cls.lower():
                ref_kind = "dl"
            elif flags[1] and not flags[0]:
                ref_kind = "class"
            elif tag in ("ol", "ul") and self.after_ref_heading:
                ref_kind = "list"
            elif tag == "td" and a is not None \
                    and a.get("valign", "").lower() == "top":
                ref_kind = "td"
        noise = (top[_F_NOISE] if top else False) or flags[2]
        if cls_attr:
            m = _CIT_FIELD_RE.search(cls_attr)
            cit_field = m.group(1).lower() if m else (top[_F_CIT] if top else None)
        else:
            cit_field = top[_F_CIT] if top else None

        stack.append((tag, boiler, ref_kind, noise, cit_field))
        if tag == "a":
            self.anchor_depth += 1
        if tag in BLOCK_TAGS:
            merged = ((self.table_depth > 0
                       and tag in ("table", "tr", "td", "th"))
                      or (self.dl_depth > 0 and tag in ("dl", "dt", "dd")))
            if (merged and ref_kind is None and self.cur is not None
                    and self.cur.ref_kind is None):
                # merged table cell / dl item: separator, same block
                if self.cur.parts:
                    self.cur.parts.append(" ")
                    self.cur._text = None
            else:
                self._open_block(tag)
        if tag == "table":
            self.table_depth += 1
        elif tag == "dl":
            self.dl_depth += 1

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in SKIP_TAGS:
            if self.skip_depth > 0:
                self.skip_depth -= 1
            return
        if tag in VOID_TAGS:
            return
        # lenient pop: only if tag is open somewhere
        stack = self.stack
        depth = None
        for i in range(len(stack) - 1, -1, -1):
            if stack[i][_F_TAG] == tag:
                depth = i
                break
        if depth is None:
            return
        for frame in reversed(stack[depth:]):
            # every depth counter must track IMPLICIT pops too: an
            # unclosed <table> removed by an ancestor's </div> would
            # otherwise leave table_depth stuck >0 and fuse every
            # later table's surroundings into one block (same rule
            # anchor_depth already followed)
            if frame[_F_TAG] == "a" and self.anchor_depth > 0:
                self.anchor_depth -= 1
            elif frame[_F_TAG] == "table" and self.table_depth > 0:
                self.table_depth -= 1
            elif frame[_F_TAG] == "dl" and self.dl_depth > 0:
                self.dl_depth -= 1
        del stack[depth:]
        if tag in BLOCK_TAGS:
            merged = ((self.table_depth > 0
                       and tag in ("table", "tr", "td", "th"))
                      or (self.dl_depth > 0 and tag in ("dl", "dt", "dd")))
            if (merged and self.cur is not None
                    and self.cur.ref_kind is None):
                # still inside a merged table/dl: separator, keep block
                if self.cur.parts:
                    self.cur.parts.append(" ")
                    self.cur._text = None
                return
            if tag in HEADING_TAGS and self.cur is not None:
                self.after_ref_heading = refseg.is_anchor_line(self.cur.text)
            elif tag not in ("ol", "ul", "li"):
                if self.cur is not None and self.cur.chars > 0:
                    self.after_ref_heading = False
            self._flush()
            top = stack[-1] if stack else None
            self.cur = _Block(
                top[_F_TAG] if top else "body",
                top[_F_BOILER] if top else False,
                top[_F_REF] if top else None,
            )

    def handle_data(self, data):
        if self.skip_depth > 0 or not data:
            return
        stripped = data.strip()
        if not stripped:
            # whitespace-only node: keep one separator so text across
            # inline-tag boundaries doesn't fuse ("Doe, J." + "1999")
            cur = self.cur
            if cur is not None and cur.parts:
                cur.parts.append(" ")
                cur._text = None
            return
        cur = self.cur
        if cur is None:
            cur = self.cur = _Block("body", False, None)
        stack = self.stack
        top = stack[-1] if stack else None
        if top is not None and top[_F_NOISE]:
            return  # ref-google / ref-xLink spans are dropped entirely
        cur.parts.append(data)
        cur._text = None  # invalidate cache (mid-block reads exist)
        n = len(stripped)
        cur.chars += n
        if self.anchor_depth > 0:
            cur.anchor_chars += n
        if top is not None and top[_F_CIT]:
            cur.cit_fields.setdefault(top[_F_CIT], []).append(
                normalize_block(data)
            )


_STARTTAG_RE = re.compile(
    # tag name: stdlib tagfind_tolerant charset — anything but
    # whitespace, '/', '>', NUL (so malformed "<p<ul>" yields the same
    # junk name "p<ul" the stdlib state machine produces)
    r"<([a-zA-Z][^\t\n\r\f />\x00]*)"
    # attr blob: quotes open a quoted span ONLY in value position
    # (attr NAME, '=', quote), matching stdlib semantics — a bare
    # quote elsewhere (incl. after a junk '=' with no name) is a junk
    # char and the tag still ends at the next '>'
    r"((?:[A-Za-z0-9_:.-]\s*=+\s*\"[^\"]*\""
    r"|[A-Za-z0-9_:.-]\s*=+\s*'[^']*'|[^>])*?)"
    r"(/?)>",
    re.DOTALL)
_ENDTAG_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)[^>]*>")
# stdlib comment close allows whitespace between -- and > (locatecommentclose)
_COMMENT_RE = re.compile(r"<!--.*?--\s*>", re.DOTALL)
_MARKUP_DECL_RE = re.compile(r"<![^>]*>")
_PI_RE = re.compile(r"<\?[^>]*>")
_ATTR_RE = re.compile(
    # attr name first-char rule mirrors stdlib attrfind_tolerant:
    # anything but whitespace//>; later chars also exclude '='
    r"([^\s/>][^\s=/>]*)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?")
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
# a value-position quote that never closes inside the tag: stdlib
# declares the start tag incomplete and emits it as data instead.
# "value position" = after NAME= (a bare quote after a junk '=' that
# starts an attr NAME does not open a value in stdlib)
# stdlib start-tag pathology (verified against html.parser 3.11):
# a CLOSED "name = 'val'" quoted value may be space-separated; an
# UNCLOSED value-position quote makes the whole tag span DATA when
# (a) the '=' directly follows the attr name (check_for_whole returns
# -1 -> chunk-to-'>'), or (b) the quote char closes ANYWHERE later in
# the document (attrfind's quoted value overshoots the tag's '>').
# With a space before '=' and no later close, the '=' reparses as a
# junk attr NAME and the tag stands.
_COMPLETE_VAL_RE = re.compile(r"[A-Za-z0-9_:.-]\s*=+\s*(\"[^\"]*\"|'[^']*')")
_OPEN_QUOTE_RE = re.compile(r"[A-Za-z0-9_:.-](\s*)=+\s*([\"'])")

from html import unescape as _unescape  # noqa: E402  (stdlib, tiny)


def _fast_feed(doc: str, p: "_Extractor") -> None:
    """Regex tokenizer driving the same handler callbacks as stdlib
    ``HTMLParser.feed`` (convert_charrefs semantics: entity-unescaped
    data chunks, lowercased tag names, unescaped attribute values,
    script/style bodies consumed as raw text). ~2x faster than the
    stdlib state machine, which re-matches per-token pure-Python;
    observational equivalence is pinned by the frozen golden corpus
    and a stdlib-vs-fast differential test."""
    pos, n = 0, len(doc)
    find = doc.find
    handle_data = p.handle_data
    handle_start = p.handle_starttag
    handle_end = p.handle_endtag
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            chunk = doc[pos:]
            handle_data(_unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > pos:
            chunk = doc[pos:lt]
            handle_data(_unescape(chunk) if "&" in chunk else chunk)
        nxt = doc[lt + 1: lt + 2]
        if nxt and (nxt.isalpha()):
            m = _STARTTAG_RE.match(doc, lt)
            if m:
                tag, blob, selfclose = m.groups()
                tag = tag.lower()
                mq = None
                if blob and ('"' in blob or "'" in blob):
                    mq = _OPEN_QUOTE_RE.search(
                        _COMPLETE_VAL_RE.sub("", blob))
                if mq is not None and (
                        mq.group(1) == ""
                        or find(mq.group(2), m.end()) >= 0):
                    # unclosed value-position quote: stdlib returns -1
                    # from check_for_whole_start_tag and recovers with
                    # ONE data chunk through the first RAW '>' (which
                    # may sit inside an earlier quoted value), then
                    # resumes parsing there
                    k = find(">", lt + 1)
                    if k >= 0:
                        k += 1
                    else:
                        k = find("<", lt + 1)
                        if k < 0:
                            k = lt + 1
                    chunk = doc[lt:k]
                    handle_data(_unescape(chunk) if "&" in chunk else chunk)
                    pos = k
                    continue
                if selfclose:
                    # stdlib folds a trailing '/' into a preceding
                    # UNQUOTED attr value ('<h2 id=refs/>' -> id='refs/'
                    # and the tag stays open); it self-closes only when
                    # the '/' stands alone after the attrs
                    blob2 = blob + "/"
                    endpos = 0
                    for am in _ATTR_RE.finditer(blob2):
                        endpos = am.end()
                    if endpos == len(blob2):
                        blob = blob2
                        selfclose = ""
                attrs = []
                if blob:
                    for am in _ATTR_RE.finditer(blob):
                        name, v1, v2, v3 = am.groups()
                        v = v1 if v1 is not None else (
                            v2 if v2 is not None else v3)
                        if v and "&" in v:
                            v = _unescape(v)
                        attrs.append((name.lower(), v))
                handle_start(tag, attrs)
                pos = m.end()
                if selfclose:  # self-closing <tag/>
                    handle_end(tag)
                elif tag in _RAWTEXT_CLOSE:
                    # stdlib stays in CDATA mode until an end tag whose
                    # NAME equals the rawtext element; '</scriptTag>' is
                    # emitted as data and scanning continues
                    scan = pos
                    while True:
                        cm = _RAWTEXT_CLOSE[tag].search(doc, scan)
                        if cm is None:
                            handle_data(doc[pos:])
                            pos = n
                            break
                        em = _ENDTAG_RE.match(doc, cm.start())
                        if em and em.group(1).lower() == tag:
                            if cm.start() > pos:
                                handle_data(doc[pos:cm.start()])
                            handle_end(tag)
                            pos = em.end()
                            break
                        if em is None:
                            # candidate without a closing '>': stdlib
                            # treats the rest as raw data
                            handle_data(doc[pos:])
                            pos = n
                            break
                        # wrong-name end tag: stays inside the rawtext
                        scan = em.end()
                continue
        elif nxt == "/":
            m = _ENDTAG_RE.match(doc, lt)
            if m:
                handle_end(m.group(1).lower())
                pos = m.end()
                continue
            third = doc[lt + 2: lt + 3]
            if third == ">":  # '</>' — dropped entirely (HTML5 rule)
                pos = lt + 3
                continue
            if third and not ("a" <= third <= "z" or "A" <= third <= "Z"):
                # end-tag-open + non-ASCII-letter = bogus comment
                # (stdlib's tagfind is ASCII-only — unicode letters
                # like 'À' do NOT start a tag name): consume silently
                # through the next '>'; with no '>' ahead, fall
                # through to the data path (stdlib emits the tail as
                # data at EOF)
                gt = doc.find(">", lt + 2)
                if gt >= 0:
                    pos = gt + 1
                    continue
        elif nxt == "!":
            if doc.startswith("<!--", lt):
                m = _COMMENT_RE.match(doc, lt)
                if m:
                    pos = m.end()
                    continue
                # unterminated comment: stdlib's failed-construct
                # recovery — one data chunk through the next '>'
                # (else to the next '<', else one char), then resume
                k = find(">", lt + 1)
                if k >= 0:
                    k += 1
                else:
                    k = find("<", lt + 1)
                    if k < 0:
                        k = lt + 1
                chunk = doc[lt:k]
                handle_data(_unescape(chunk) if "&" in chunk else chunk)
                pos = k
                continue
            m = _MARKUP_DECL_RE.match(doc, lt)
            if m:
                pos = m.end()
                continue
        elif nxt == "?":
            m = _PI_RE.match(doc, lt)
            if m:
                pos = m.end()
                continue
        # lone '<' / malformed tag: emit as text, continue after it
        handle_data("<")
        pos = lt + 1


# scripts written without inter-word spaces (CJK ideographs, kana,
# hangul, fullwidth/halfwidth forms): whitespace word counts see one
# giant token and the boilerpipe rules reject the whole page. Count
# every 2 such chars as one effective word (avg CJK word ~1.5-2 chars)
# — additive, so pure-Latin pages classify exactly as before.
_CJK_RE = re.compile(
    "[぀-ヿ㐀-䶿一-鿿"
    "가-힯豈-﫿＀-￯]")


def _block_words(text: str) -> int:
    n = len(text.split())
    if text and ord(max(text)) >= 0x3000:  # cheap has-CJK pre-check
        n += len(_CJK_RE.findall(text)) // 2
    return n


def _classify(blocks: list[_Block]) -> list[bool]:
    """boilerpipe NumWordsRulesClassifier over the block sequence,
    with overrides: boiler ancestry always rejects; detected reference
    blocks and clean headings always accept (they carry the content
    contract: the References heading must survive for anchor-based
    downstream segmentation)."""
    words = [_block_words(b.text) for b in blocks]
    ld = [b.anchor_chars / b.chars if b.chars else 1.0 for b in blocks]
    keep = []
    n = len(blocks)
    for i, b in enumerate(blocks):
        if b.boiler:
            keep.append(False)
            continue
        if b.ref_kind is not None:
            keep.append(True)
            continue
        if b.heading and ld[i] == 0.0 and words[i] >= 1:
            keep.append(True)
            continue
        if ld[i] > _LD_CURR:
            keep.append(False)
            continue
        prev_ld = ld[i - 1] if i > 0 else 0.0
        prev_w = words[i - 1] if i > 0 else 0
        next_w = words[i + 1] if i + 1 < n else 0
        if prev_ld <= _LD_PREV:
            keep.append(words[i] > 16 or next_w > 15 or prev_w > 4)
        else:
            keep.append(words[i] > 40 or next_w > 17)
    return keep


def _dom_fields(b: _Block) -> dict | None:
    """mapHTML-style cit-* class field lift (X2)."""
    if not b.cit_fields:
        return None
    g = {k: " ".join(v).strip() for k, v in b.cit_fields.items()}
    f = dict(refseg.EMPTY_FIELDS)
    if "auth" in g:
        f["authors"] = [a.strip() for a in re.split(r";|\band\b", g["auth"]) if a.strip()]
    f["date"] = g.get("pub-date") or None
    f["title"] = g.get("article-title") or g.get("source") or None
    f["journal"] = g.get("jnl-abbrev") or (g.get("source") if g.get("article-title") else None)
    f["location"] = g.get("publ-loc") or None
    f["publisher"] = g.get("publ-name") or None
    f["volume"] = g.get("vol") or None
    fp, lp = g.get("fpage"), g.get("lpage")
    if fp and lp:
        f["pages"] = "{}-{}".format(fp, lp)
    elif fp:
        f["pages"] = fp
    return f


def strip_html(raw_html: str) -> dict:
    """Parse + classify one HTML payload.

    Returns ``{"clean_text": str, "refs": [ref dict]}`` where each ref
    has raw/span_start/span_end/detector='dom'/fields (geometry fields
    are the non-pdf defaults). Spans index into clean_text.
    """
    # streamed-truncation repair (t3 golden shape): a payload cut off
    # mid-tag ends with an unterminated "<tag attr=..." that both
    # tokenizers surface as literal text. If the tail after the last
    # '>' starts a tag that never closes, drop it BEFORE parsing (a
    # pre-pass, so fast/stdlib tokenizer parity is untouched). A bare
    # "a < b" in prose is not a tag start and is left alone — and
    # neither is unspaced math prose like "n<m for the bound to hold":
    # a genuine cut-off tag ends at the name, carries attribute
    # punctuation (= " '), or has at most one bare word after the
    # name; several plain words with no attr chars is a sentence.
    cut = raw_html.rfind("<")
    if cut > raw_html.rfind(">"):
        frag = raw_html[cut + 1:]
        m = re.match(r"[/!?]$|[/!?]?[a-zA-Z][\w.-]*", frag)
        if m:
            rest = frag[m.end():]
            if (not rest or any(c in rest for c in "=\"'")
                    or len(rest.split()) <= 1):
                raw_html = raw_html[:cut]
    p = _Extractor()
    try:
        if _use_stdlib_parser:
            p.feed(raw_html)
            p.close()
        else:
            _fast_feed(raw_html, p)
    except Exception:
        pass  # parsers are non-raising in practice; belt & braces
    p._flush()

    blocks = p.blocks
    keep = _classify(blocks)
    texts: list[str] = []
    offsets: list[int] = []
    pos = 0
    kept_idx: dict[int, int] = {}
    for i, (b, k) in enumerate(zip(blocks, keep)):
        if not k:
            continue
        t = b.text
        if not t:
            continue
        kept_idx[i] = len(texts)
        offsets.append(pos)
        texts.append(t)
        pos += len(t) + 1  # newline join
    clean_text = "\n".join(texts)

    refs: list[dict] = []
    for i, b in enumerate(blocks):
        if b.ref_kind is None or i not in kept_idx:
            continue
        if b.ref_kind in ("dl",) and b.tag == "dt":
            continue  # dt labels excluded (layout b: "minus label")
        raw = _WRAP_RE.sub("", b.text).strip()
        if raw.endswith(".."):
            raw = raw[:-1]  # layout (c) trailing-dot fix
        if len(raw.strip()) <= refseg.MIN_REF_LEN:
            continue
        if not refseg.looks_like_citation(raw):
            continue
        start = offsets[kept_idx[i]]
        block_text = texts[kept_idx[i]]
        inner = block_text.find(raw)
        if inner < 0:
            inner = 0
            raw = block_text if len(block_text.strip()) > refseg.MIN_REF_LEN else raw
        refs.append({
            "raw": raw,
            "span_start": start + inner,
            "span_end": start + inner + len(raw),
            "line_start": -1,
            "line_end": -1,
            "bbox": None,
            "detector": "dom",
            "fields": _dom_fields(b) or refseg.parse_fields(raw),
        })
    return {"clean_text": clean_text, "refs": refs}
