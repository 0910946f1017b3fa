"""TextBlock / TextDocument data model.

Semantics match the reference ``source/Document.coffee`` as compiled
(``lib/Boilerpipe.js:100-230``), including its undefined/NaN
arithmetic: every numeric slot that would hold JS ``undefined`` or
``NaN`` holds ``float('nan')`` here, which reproduces JS comparison
results (all ``<``/``>``/``==`` false, ``!=`` true) without special
cases.
"""

from __future__ import annotations

import math

from .jsquirks import NAN, block_trim, js_div, split_word_count

# Document.coffee:7-13
TITLE = "Title"
ARTICLE_METADATA = "ArticleMetadata"
MIGHT_BE_CONTENT = "MightBeContent"
END_OF_TEXT = "EndOfText"

# Document.coffee:16
DEFAULT_FULL_TEXT_WORDS_THRESHOLD = 9


class TextBlock:
    """One visually contiguous run of text (Document.coffee:4-85)."""

    __slots__ = (
        "text",
        "num_words",
        "num_words_in_anchor_text",
        "num_words_in_wrapped_lines",
        "num_wrapped_lines",
        "offset_start",
        "offset_end",
        "tag_level",
        "labels",
        "is_content",
        "text_density",
        "link_density",
        "src_pos",
    )

    def __init__(
        self,
        text=None,
        contained_text_elements=None,  # kept for signature parity; unused (Q1)
        tag_level=None,
        num_words=None,
        num_words_in_anchor_text=None,
        num_words_in_wrapped_lines=None,
        num_wrapped_lines=None,
        offset=None,
        src_pos=-1,
    ):
        # Document.coffee:19 -- text?.replace /^\s+|\n+$/g
        self.text = block_trim(text) if text is not None else None
        # Document.coffee:22 -- numWords || split-count || 0 (quirk Q11:
        # an explicit 0 falls through to the split count)
        if num_words:  # JS truthiness: 0/undefined/NaN falsy
            self.num_words = num_words
        elif text is not None:
            self.num_words = split_word_count(text) or 0
        else:
            self.num_words = 0
        self.num_words_in_anchor_text = (
            NAN if num_words_in_anchor_text is None else num_words_in_anchor_text
        )
        self.num_words_in_wrapped_lines = (
            NAN if num_words_in_wrapped_lines is None else num_words_in_wrapped_lines
        )
        self.num_wrapped_lines = (
            NAN if num_wrapped_lines is None else num_wrapped_lines
        )
        # Document.coffee:26-27 -- `offset or 0`
        self.offset_start = offset if offset else 0
        self.offset_end = offset if offset else 0
        # Document.coffee:28 -- `tagLevel || 0`
        self.tag_level = tag_level if tag_level else 0
        self.labels: list[str] = []
        self.is_content = False
        self.src_pos = src_pos  # ours: absolute char offset of first text
        self.calculate_densities()

    def calculate_densities(self) -> None:
        # Document.coffee:48-58.  NaN == 0 is false, matching JS
        # undefined == 0 / NaN == 0.
        if self.num_words_in_wrapped_lines == 0:
            self.num_words_in_wrapped_lines = self.num_words
            self.num_wrapped_lines = 1
        self.text_density = js_div(
            self.num_words_in_wrapped_lines, self.num_wrapped_lines
        )
        if self.num_words == 0:
            self.link_density = 0.0
        else:
            self.link_density = js_div(
                self.num_words_in_anchor_text, self.num_words
            )

    def merge_next(self, nxt: "TextBlock") -> None:
        # Document.coffee:61-75
        a = "" if self.text is None else self.text
        b = "undefined" if nxt.text is None else nxt.text  # JS string concat
        self.text = a + "\n" + b
        self.num_words = _js_add(self.num_words, nxt.num_words)
        self.num_words_in_anchor_text = _js_add(
            self.num_words_in_anchor_text, nxt.num_words_in_anchor_text
        )
        self.num_words_in_wrapped_lines = _js_add(
            self.num_words_in_wrapped_lines, nxt.num_words_in_wrapped_lines
        )
        self.num_wrapped_lines = _js_add(
            self.num_wrapped_lines, nxt.num_wrapped_lines
        )
        self.offset_start = min(self.offset_start, nxt.offset_start)
        self.offset_end = max(self.offset_end, nxt.offset_end)
        # `@isContent |= nextTextBlock.isContent` -> 0/1 int in JS
        self.is_content = 1 if (self.is_content or nxt.is_content) else 0
        self.labels = self.labels + nxt.labels
        # `Math.min` with our src bookkeeping: keep the earlier source pos
        self.tag_level = min(self.tag_level, nxt.tag_level)
        if nxt.src_pos >= 0 and (self.src_pos < 0 or nxt.src_pos < self.src_pos):
            self.src_pos = nxt.src_pos
        self.calculate_densities()

    def add_label(self, label: str) -> None:
        self.labels.append(label)

    def has_label(self, label: str) -> bool:
        return label in self.labels

    def num_full_text_words(
        self, min_text_density: float = DEFAULT_FULL_TEXT_WORDS_THRESHOLD
    ):
        # Document.coffee:84-85; NaN density -> comparison false -> 0
        return self.num_words if self.text_density >= min_text_density else 0


def _js_add(a, b):
    a = NAN if a is None else a
    b = NAN if b is None else b
    if (isinstance(a, float) and math.isnan(a)) or (
        isinstance(b, float) and math.isnan(b)
    ):
        return NAN
    return a + b


class TextDocument:
    """BoilerpipeTextDocument (Document.coffee:89-130)."""

    __slots__ = ("title", "text_blocks")

    def __init__(self, title: str, text_blocks: list[TextBlock]):
        self.title = title
        self.text_blocks = text_blocks

    def content(self) -> str:
        return self.text(True, False)

    def content_blocks(self) -> list[TextBlock]:
        return [tb for tb in self.text_blocks if tb.is_content]

    def text(self, include_content: bool, include_non_content: bool) -> str:
        out = []
        for tb in self.text_blocks:
            if (tb.is_content and include_content) or (
                not tb.is_content and include_non_content
            ):
                out.append(("" if tb.text is None else tb.text) + "\n")
        return "".join(out)

    def number_of_content_blocks(self) -> int:
        return sum(1 for tb in self.text_blocks if tb.is_content)

    def remove_text_block(self, tb: TextBlock) -> None:
        # CommonExtensions.coffee:42-45 removeObject: splice by identity;
        # missing object would splice(-1,1) (remove last) -- callers only
        # ever pass members, and undefined is a guarded no-op.
        if tb is not None:
            for idx, cur in enumerate(self.text_blocks):
                if cur is tb:
                    del self.text_blocks[idx]
                    return
            del self.text_blocks[-1]  # JS indexOf -1 -> splice(-1,1)
