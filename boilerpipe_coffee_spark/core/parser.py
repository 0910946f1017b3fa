"""BoilerpipeParser: SAX event fold -> TextBlock list.

Reimplements ``source/Parser.coffee`` semantics over our scanner,
including the output-visible quirks from SURVEY.md section 2.8:

- Q13 whitespace-only text nodes are dropped entirely; other text
  nodes append raw (untrimmed) to the block buffer.
- Q14 title capture happens at any flush outside <body> whenever the
  last-opened tag is <title>; first non-empty title wins.
- Q15 unknown tags (html, head, p, div, table, li, h1, ...) all take
  the default action: tagLevel++ and a block flush.
- nested <a> triggers the reference's broken recovery path, which is
  a ReferenceError in the compiled JS -> we raise ReferenceThrow so
  callers quarantine the document exactly where the reference crashes.
"""

from __future__ import annotations

from .document import TextBlock, TextDocument
from .htmlsax import sax_parse
from .jsquirks import (
    JS_WS,
    RE_IS_WORD,
    ReferenceThrow,
    strip_whitespace,
    tokenize,
)

_IS_WORD_SEARCH = RE_IS_WORD.search

_JS_WS_SET = frozenset(JS_WS)

# Parser.coffee:256-292 tag-action map
IGNORABLE = "I"
BODY = "B"
ANCHOR = "A"
INLINE = "N"  # InlineNoWhitespace / InlineWhitespace behave identically
DEFAULT = "D"

TAG_ACTIONS: dict[str, str] = {
    "style": IGNORABLE,
    "script": IGNORABLE,
    "option": IGNORABLE,
    "object": IGNORABLE,
    "embed": IGNORABLE,
    "applet": IGNORABLE,
    "noscript": IGNORABLE,
    "a": ANCHOR,
    "body": BODY,
    "strike": INLINE,
    "u": INLINE,
    "b": INLINE,
    "i": INLINE,
    "em": INLINE,
    "strong": INLINE,
    "span": INLINE,
    "sup": INLINE,
    "code": INLINE,
    "tt": INLINE,
    "sub": INLINE,
    "var": INLINE,
    "font": INLINE,
    "abbr": INLINE,
    "acronym": INLINE,
}

_ANCHOR_START = 0  # sentinel tokens (Parser.coffee:25-26); ints are
_ANCHOR_END = 1    # cheaper than strings and cannot collide with text

_MAX_LINE_LENGTH = 80  # Parser.coffee:198

# is-word classification memo: web corpora repeat tokens heavily, and
# is_word(token) is a pure function, so cache it (bounded; values are
# tiny).  Shared across documents within a worker process.
_WORD_MEMO: dict[str, bool] = {}
_WORD_MEMO_CAP = 1 << 16


class BoilerpipeParser:
    """Single-document fold; reusable via parse_document_from_html."""

    def __init__(self) -> None:
        self._reset()

    def _reset(self) -> None:
        # Parser.coffee:43-65 resetToInitialState
        self.title = ""
        self.text_blocks: list[TextBlock] = []
        self.offset = 0
        self.last_start_tag: str | None = None
        self.tag_level = 0
        self.block_tag_level: int | None = None
        self.ignorable_element_depth = 0
        self.in_body = 0
        self.in_anchor = 0
        self.in_anchor_text = False
        self.text_buffer: list[str] = []
        self.token_buffer: list = []
        self.flush = False
        self.block_src_pos = -1

    def parse_document_from_html(self, html: str) -> TextDocument:
        self._reset()
        sax_parse(html, self)
        self.flush_block()  # endParsingDocument (Parser.coffee:82-83)
        return TextDocument(self.title, self.text_blocks)

    # --- SAX handler interface -------------------------------------

    def onopentag(self, name: str) -> None:
        # Parser.coffee:86-119 startElement
        action = TAG_ACTIONS.get(name, DEFAULT)
        if action == IGNORABLE:
            self.ignorable_element_depth += 1
            self.tag_level += 1
        elif action == BODY:
            self.flush_block()
            self.in_body += 1
            self.tag_level += 1
        elif action == ANCHOR:
            self.in_anchor += 1
            self.tag_level += 1
            if self.in_anchor > 1:
                # Parser.coffee:103-107: the recovery path calls a bare
                # (undefined) `endElement` -> ReferenceError in the
                # compiled JS.  Mirror the crash for quarantining.
                raise ReferenceThrow("nested <a> recovery (JS ReferenceError)")
            if self.ignorable_element_depth == 0:
                self.token_buffer.append(_ANCHOR_START)
        elif action == INLINE:
            pass
        else:
            self.tag_level += 1
            self.flush = True
        self.last_start_tag = name

    def ontext(self, text: str, srcpos: int = -1) -> None:
        # Parser.coffee:123-139 foundText
        if self.flush:
            self.flush_block()
        if self.ignorable_element_depth > 0 or not text:
            return
        # Q13: whitespace-only nodes vanish entirely.  Fast path: strip
        # the ASCII whitespace subset (C-speed); only texts that are
        # empty after that, or that start/end with exotic JS whitespace,
        # need the exact JS-class regex.
        st = text.strip(" \n\t\r\f\x0b")
        if not st:
            return
        if (st[0] in _JS_WS_SET or st[-1] in _JS_WS_SET) and not strip_whitespace(
            text
        ):
            return
        self.text_buffer.append(text)
        tokens = tokenize(text)
        if tokens:
            self.token_buffer.extend(tokens)
        if self.block_tag_level is None:
            self.block_tag_level = self.tag_level
        if self.block_src_pos < 0:
            self.block_src_pos = srcpos

    def onclosetag(self, name: str) -> None:
        # Parser.coffee:143-175 endElement
        action = TAG_ACTIONS.get(name, DEFAULT)
        if action == IGNORABLE:
            self.ignorable_element_depth -= 1
            self.tag_level -= 1
            self.flush = True
        elif action == BODY:
            self.flush_block()
            self.in_body -= 1
            self.tag_level -= 1
        elif action == ANCHOR:
            self.in_anchor -= 1
            if self.in_anchor == 0 and self.ignorable_element_depth == 0:
                self.token_buffer.append(_ANCHOR_END)
            self.tag_level -= 1
        elif action == INLINE:
            pass
        else:
            self.tag_level -= 1
            self.flush = True
        if self.flush:
            self.flush_block()

    # --- block emission ---------------------------------------------

    def flush_block(self) -> None:
        # Parser.coffee:179-244
        self.flush = False

        if self.in_body <= 0:
            # Q14 title capture outside <body>
            if self.last_start_tag == "title":
                if not self.title:
                    self.title = strip_whitespace("".join(self.text_buffer))
            self._clear_text_buffer()
            return

        if not self.token_buffer:
            self._clear_text_buffer()
            return

        search = _IS_WORD_SEARCH
        memo = _WORD_MEMO
        num_words = 0
        num_words_in_anchor_text = 0
        num_wrapped_lines = 0
        current_line_length = -1  # don't count the first space
        num_tokens = 0
        num_words_current_line = 0

        in_anchor_text = self.in_anchor_text  # persists across blocks
        for token in self.token_buffer:
            if type(token) is int:  # anchor sentinels
                in_anchor_text = token == _ANCHOR_START
                continue
            w = memo.get(token)
            if w is None:
                w = search(token) is not None
                if len(memo) < _WORD_MEMO_CAP:
                    memo[token] = w
            if w:
                num_tokens += 1
                num_words += 1
                num_words_current_line += 1
                if in_anchor_text:
                    num_words_in_anchor_text += 1
                current_line_length += len(token) + 1
                if current_line_length > _MAX_LINE_LENGTH:
                    num_wrapped_lines += 1
                    current_line_length = len(token)
                    num_words_current_line = 1
            else:
                num_tokens += 1
        self.in_anchor_text = in_anchor_text

        if num_tokens > 0:
            if num_wrapped_lines == 0:
                num_words_in_wrapped_lines = num_words
                num_wrapped_lines = 1
            else:
                num_words_in_wrapped_lines = num_words - num_words_current_line

            tb = TextBlock(
                "".join(self.text_buffer),
                None,
                self.block_tag_level,
                num_words,
                num_words_in_anchor_text,
                num_words_in_wrapped_lines,
                num_wrapped_lines,
                self.offset,
                src_pos=self.block_src_pos,
            )
            self.text_blocks.append(tb)
            self.offset += 1
            # note: blockTagLevel is reset ONLY here, not when a buffer
            # is discarded (Parser.coffee:241 vs :186-191) -- text seen
            # outside <body> can leak a stale tagLevel into the first
            # in-body block.  Output-visible; keep it.
            self.block_tag_level = None

        self._clear_text_buffer()

    def _clear_text_buffer(self) -> None:
        # most flushes arrive with both buffers already empty -- skip
        # the two list allocations in that case
        if self.text_buffer:
            self.text_buffer = []
        if self.token_buffer:
            self.token_buffer = []
        self.block_src_pos = -1


def parse_html(html: str) -> TextDocument:
    return BoilerpipeParser().parse_document_from_html(html)
