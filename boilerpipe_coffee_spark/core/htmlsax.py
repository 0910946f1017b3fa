"""From-scratch SAX-style HTML scanner, event-compatible with the
tokenizer/parser the reference depends on (htmlparser2 v3.3.0 as
configured by ``source/Parser.coffee:31-40``: ``xmlMode=false``,
``decodeEntities=false``, ``lowerCaseTags=true``).

Block boundaries, ``tagLevel`` and whitespace handling in the
reference all depend on the *exact* open/text/close event stream, so
this module replicates that stream including its oddities:

- ``openImpliesClose`` auto-closing (``<p><p>``, ``<li><li>``,
  ``<body>`` closing ``<head>``, table rows/cells, form tags).
- void elements fire an immediate close event; ``</p>`` / ``</br>``
  with no matching open synthesize an open+close pair.
- entities are NOT decoded (``&amp;`` stays literal text).
- ``<`` that does not start a construct (``<>``, ``< x``, ``</>``)
  stays inside the running text section; ``<<`` emits a lone ``"<"``
  text event.
- ``<script>``/``<style>`` switch to "special" mode where only a
  matching ``</script``/``</style`` close is recognized and text is
  split at every ``<``.
- comments ``<!-- -->``, CDATA, declarations and PIs are skipped with
  the same end-detection (first ``-->`` / ``]]>`` / ``>``).
- unquoted attribute values may contain ``>`` when it is the first
  character after ``=`` (``<p class=>x>`` consumes ``>x>``).

Rather than a char-at-a-time state machine (too slow in Python), the
scanner jumps between ``<`` positions with ``str.find`` and runs a
small state machine only inside tags; this is what lets the Arrow
batch path parse thousands of docs per task at full CPU.

Events are delivered to a handler object with methods
``onopentag(name)``, ``ontext(text, srcpos)``, ``onclosetag(name)``.
``srcpos`` is the absolute character offset of the text section in
the input, used downstream for block->span attribution (the reference
has no equivalent; it never needs one because it is single-document).
"""

from __future__ import annotations

# htmlparser2 Parser.js:26-51
_FORM_TAGS = frozenset(
    ["input", "option", "optgroup", "select", "button", "datalist", "textarea"]
)
OPEN_IMPLIES_CLOSE: dict[str, frozenset] = {
    "tr": frozenset(["tr", "th", "td"]),
    "th": frozenset(["th"]),
    "td": frozenset(["thead", "td"]),
    "body": frozenset(["head", "link", "script"]),
    "li": frozenset(["li"]),
    "p": frozenset(["p"]),
    "select": _FORM_TAGS,
    "input": _FORM_TAGS,
    "output": _FORM_TAGS,
    "button": _FORM_TAGS,
    "datalist": _FORM_TAGS,
    "textarea": _FORM_TAGS,
    "option": frozenset(["option"]),
    "optgroup": frozenset(["optgroup"]),
}

# htmlparser2 Parser.js:53-74
VOID_ELEMENTS = frozenset(
    [
        "area", "base", "basefont", "br", "col", "command", "embed",
        "frame", "hr", "img", "input", "isindex", "keygen", "link",
        "meta", "param", "source", "track", "wbr",
    ]
)

# htmlparser2 Tokenizer.js:87-89 (NOT unicode, NOT \v)
_WS = " \n\t\f\r"

import re as _re

# Well-formed attribute region: any char except > " ' = flows through
# the name/whitespace states; '=' must introduce a quoted or unquoted
# value.  Wherever this matches, the end '>' is EXACTLY where the
# Tokenizer state machine ends the tag; every other shape (bare quotes
# in names, '=' directly before '>', unterminated values, EOF) falls
# back to the exact state machine.
_ATTR_FAST = _re.compile(
    r"""(?:[^>"'=]|=[ \n\t\f\r]*"[^"]*"|=[ \n\t\f\r]*'[^']*'"""
    r"""|=[ \n\t\f\r]*[^>"' \n\t\f\r]+)*>"""
)

_SPECIAL_NAME = {1: "script", 2: "style"}

# tag-name scans as compiled regexes (C-level) instead of
# char-at-a-time python loops; both stop exactly where the Tokenizer's
# IN_TAG_NAME / IN_CLOSING_TAG_NAME states do
_OPEN_NAME = _re.compile(r"[^/> \n\t\f\r]*")
_CLOSE_NAME = _re.compile(r"[^> \n\t\f\r]*")


class SaxScanner:
    """One reusable scanner; ``parse(html, handler)`` is stateless."""

    def parse(self, html: str, handler) -> None:
        on_open = handler.onopentag
        on_text = handler.ontext
        on_close = handler.onclosetag
        stack: list[str] = []

        def emit_open(name: str) -> None:
            # Parser.js:113-149 onopentagname + onopentagend
            oic = OPEN_IMPLIES_CLOSE.get(name)
            if oic is not None:
                while stack and stack[-1] in oic:
                    on_close(stack.pop())
            if name in VOID_ELEMENTS:
                on_open(name)
                on_close(name)
            else:
                stack.append(name)
                on_open(name)

        def emit_close(name: str) -> None:
            # Parser.js:151-174 onclosetag
            if stack and name not in VOID_ELEMENTS:
                if stack[-1] == name:  # overwhelmingly common fast path
                    stack.pop()
                    on_close(name)
                    return
                pos = -1
                for i in range(len(stack) - 2, -1, -1):
                    if stack[i] == name:
                        pos = i
                        break
                if pos != -1:
                    while len(stack) > pos:
                        on_close(stack.pop())
                elif name == "p":
                    emit_open("p")
                    if stack and stack[-1] == "p":
                        on_close(stack.pop())
            elif name in ("br", "p"):
                emit_open(name)
                if stack and stack[-1] == name:
                    on_close(stack.pop())

        n = len(html)
        pos = 0          # start of the running text section
        i = 0            # scan cursor
        special = 0      # 0 none / 1 script / 2 style

        while True:
            lt = html.find("<", i)
            if lt == -1:
                if pos < n:
                    on_text(html[pos:n], pos)
                break

            if lt + 1 >= n:
                # EOF right after '<': Tokenizer._handleTrailingData falls
                # through to ontext for BEFORE_TAG_NAME.
                if lt > pos:
                    on_text(html[pos:lt], pos)
                on_text("<", lt)
                break

            c = html[lt + 1]

            if special:
                # Tokenizer._stateText always emits the section at '<';
                # in special mode the section then restarts at this '<'.
                if lt > pos:
                    on_text(html[pos:lt], pos)
                    pos = lt
                if c != "/":
                    # BEFORE_TAG_NAME consumes the char after '<' and
                    # returns to TEXT, so a '<' at lt+1 cannot re-split.
                    i = lt + 2
                    continue
                # candidate '</... ' close of the special tag
                j = lt + 2
                while j < n and html[j] in _WS:
                    j += 1
                if j >= n:
                    # EOF in BEFORE_CLOSING_TAG_NAME -> trailing text
                    if pos < n:
                        on_text(html[pos:n], pos)
                    pos = n
                    break
                name = _SPECIAL_NAME[special]
                end = j + len(name)
                if html[j] not in "sS":
                    # BEFORE_SPECIAL_END ('s'?) / BEFORE_CLOSING_TAG_NAME
                    # reprocess this char in TEXT state
                    i = j
                    continue
                # compare the rest of the name char by char; a mismatch
                # is consumed by the AFTER_SCRIPT_x/AFTER_STYLE_x state
                mism = -1
                for off in range(1, len(name)):
                    if j + off >= n or html[j + off].lower() != name[off]:
                        mism = j + off
                        break
                if mism != -1:
                    if mism >= n:
                        # EOF mid-name-compare: trailing text from '<'
                        on_text(html[pos:n], pos)
                        break
                    i = mism + 1
                    continue
                after = html[end] if end < n else None
                if not (after == ">" or (after is not None and after in _WS)):
                    # AFTER_*_5 consumed the char and fell back to TEXT
                    if after is None:
                        on_text(html[pos:n], pos)
                        break
                    i = end + 1
                    continue
                emit_close(name)
                pos = lt  # consumed by close handling below
                special = 0
                gt = html.find(">", end)
                if gt == -1:
                    pos = n
                    break
                pos = i = gt + 1
                continue

            if c == "<":
                # Tokenizer._stateBeforeTagName '<': emit pending section
                # (which is just the previous '<' or preceding text).
                if lt > pos:
                    on_text(html[pos:lt], pos)
                pos = lt
                i = lt + 1
                # emit "<" now and restart at the second '<'
                on_text("<", lt)
                pos = lt + 1
                continue

            if c == ">" or c in _WS:
                # '<>' or '< x': back to TEXT with section still open.
                # Emit the pending pre-'<' section? NO: htmlparser2 emits
                # the section at '<' -- then continues a NEW section that
                # starts at '<'.  Net effect: two ontext events.
                if lt > pos:
                    on_text(html[pos:lt], pos)
                pos = lt
                i = lt + 1
                continue

            if c == "/":
                j = lt + 2
                while j < n and html[j] in _WS:
                    j += 1
                if j >= n:
                    # EOF in BEFORE_CLOSING_TAG_NAME -> trailing text
                    on_text(html[pos:n], pos)
                    break
                if html[j] == ">":
                    # '</>' silently folds into the text section
                    if lt > pos:
                        on_text(html[pos:lt], pos)
                    pos = lt
                    i = j + 1
                    continue
                # closing tag name: until '>' or whitespace
                k = _CLOSE_NAME.match(html, j).end()
                if lt > pos:
                    on_text(html[pos:lt], pos)
                emit_close(html[j:k].lower())
                if k >= n:
                    break
                gt = html.find(">", k)
                if gt == -1:
                    break
                pos = i = gt + 1
                continue

            if c == "!":
                if lt > pos:
                    on_text(html[pos:lt], pos)
                trailing_text = False
                if html.startswith("--", lt + 2):
                    end = html.find("-->", lt + 4)
                    nxt = n if end == -1 else end + 3
                elif html[lt + 2 : lt + 3] == "[" and html[
                    lt + 3 : lt + 8
                ].lower() == "cdata" and html[lt + 8 : lt + 9] == "[":
                    end = html.find("]]>", lt + 9)
                    nxt = n if end == -1 else end + 3
                else:
                    # declaration: BEFORE_DECLARATION consumes one char,
                    # then IN_DECLARATION ends at the next '>'
                    end = html.find(">", lt + 3)
                    nxt = n if end == -1 else end + 1
                    # unterminated declaration: the BEFORE_COMMENT /
                    # BEFORE_CDATA_x / IN_DECLARATION trailing states all
                    # fall through to ontext(data from sectionStart)
                    trailing_text = end == -1
                if nxt >= n:
                    if trailing_text and lt + 2 < n:
                        on_text(html[lt + 2 :], lt + 2)
                    break
                pos = i = nxt
                continue

            if c == "?":
                if lt > pos:
                    on_text(html[pos:lt], pos)
                end = html.find(">", lt + 2)
                if end == -1:
                    # unterminated PI: trailing ontext from sectionStart
                    if lt + 2 < n:
                        on_text(html[lt + 2 :], lt + 2)
                    break
                pos = i = end + 1
                continue

            # --- open tag ---
            if lt > pos:
                on_text(html[pos:lt], pos)
            k = _OPEN_NAME.match(html, lt + 1).end()
            name = html[lt + 1 : k].lower()
            if k >= n:
                # EOF in IN_TAG_NAME: onopentagname fires (stack push +
                # implied closes) but onopentag never does, so the
                # Boilerpipe handler never sees it; the final stack
                # unwind below still emits the close.
                oic = OPEN_IMPLIES_CLOSE.get(name)
                if oic is not None:
                    while stack and stack[-1] in oic:
                        on_close(stack.pop())
                if name not in VOID_ELEMENTS:
                    stack.append(name)
                break

            # attribute region scan (quote-aware) to find the tag end.
            # Fast path: the well-formed-attrs regex (see _ATTR_FAST);
            # anything it cannot prove equivalent falls back to the
            # exact state machine below.
            m = _ATTR_FAST.match(html, k)
            if m is not None:
                gt = m.end() - 1  # position of '>'
                if name in ("script", "style"):
                    special = 1 if name == "script" else 2
                emit_open(name)
                pos = i = gt + 1
                continue

            # States: 0 before/after attr name, 5 in attr name,
            # 1 before-value, 2 dq, 3 sq, 4 nq
            state = 0
            gt = -1
            while k < n:
                ch = html[k]
                if state == 0:
                    if ch == ">":
                        gt = k
                        break
                    if ch == "=":
                        state = 1
                    elif ch not in _WS and ch != "/":
                        state = 5
                elif state == 5:
                    if ch == ">":
                        gt = k
                        break
                    if ch == "=":
                        state = 1
                    elif ch in _WS or ch == "/":
                        state = 0
                elif state == 1:
                    if ch == '"':
                        state = 2
                    elif ch == "'":
                        state = 3
                    elif ch not in _WS:
                        state = 4  # may start with '>' (quirk)
                elif state == 2:
                    if ch == '"':
                        state = 0
                elif state == 3:
                    if ch == "'":
                        state = 0
                else:  # state 4: unquoted value
                    if ch == ">":
                        gt = k
                        break
                    if ch in _WS:
                        state = 0
                k += 1

            if name in ("script", "style"):
                special = 1 if name == "script" else 2

            if gt == -1:
                # EOF inside the tag.  Tokenizer._handleTrailingData only
                # fires onopentagend (-> onopentag) from the
                # before/after-attribute states; quoted/unquoted value
                # and in-name states do not.  For our purposes the
                # before/after states dominate; value states are
                # indistinguishable in effect for Boilerpipe except the
                # missing startElement, so approximate: fire unless we
                # ended inside a value.
                oic = OPEN_IMPLIES_CLOSE.get(name)
                if oic is not None:
                    while stack and stack[-1] in oic:
                        on_close(stack.pop())
                if name not in VOID_ELEMENTS:
                    stack.append(name)
                if state in (0, 1):
                    on_open(name)
                    if name in VOID_ELEMENTS:
                        on_close(name)
                break

            emit_open(name)
            pos = i = gt + 1

        # Parser.onend: close whatever is still open (Parser.js:269-278)
        while stack:
            on_close(stack.pop())


_SCANNER = SaxScanner()


def sax_parse(html: str, handler) -> None:
    _SCANNER.parse(html, handler)
