"""Minimal HTML DOM + CSS-selector subset on the stdlib ``html.parser``.

The reference cleaner (``/root/reference/src/utils/content_cleaner.py``) is built
on BeautifulSoup with the ``html.parser`` builder.  bs4 is not available in this
environment, so this module provides the small surface the cleaner needs —
``find_all`` by tag / class-regex / id-regex, ``decompose``, ``select`` with the
selector grammar actually used by the reference (tag, ``.class``,
``[attr="value"]``, descendant `` `` and child ``>`` combinators), and
``get_text`` — implemented from scratch on ``html.parser``.

Design notes (parity with bs4 + html.parser builder semantics):
  * ``convert_charrefs=True`` (stdlib default) ⇒ entities are decoded once at
    parse time, exactly like bs4.
  * ``<script>``/``<style>`` content arrives via CDATA mode ⇒ raw text, never
    parsed as markup.
  * Unmatched end tags are ignored; void elements never take children.
  * Comments / processing instructions / declarations are dropped (they carry
    no article text; the reference additionally regex-strips ``<!-- -->``
    remnants downstream, see content_cleaner.py:15).
  * ``get_text()`` concatenates text nodes in document order with no separator
    (bs4 default).

This is a hot-path utility: one parse per page inside ``map_batches``.  The
parser is pure-Python but allocation-light (slots, list children, no per-node
dict beyond attrs).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, Optional, Pattern, Union

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    """An element node. Text children are plain ``str`` entries in ``children``."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None, parent: "Node | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[Union["Node", str]] = []
        self.parent = parent

    # -- tree walking -------------------------------------------------------

    def iter_desc(self) -> Iterator["Node"]:
        """All element descendants, document order (self excluded)."""
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))

    def get_text(self) -> str:
        out: list[str] = []
        stack: list[Union[Node, str]] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    # -- mutation -----------------------------------------------------------

    def decompose(self) -> None:
        """Detach this node from its parent (subtree is garbage-collected)."""
        p = self.parent
        if p is not None:
            try:
                p.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    # -- queries ------------------------------------------------------------

    def classes(self) -> list[str]:
        cls = self.attrs.get("class")
        return cls.split() if cls else []

    def find_all(
        self,
        tag: Optional[str] = None,
        class_re: Optional[Pattern] = None,
        id_re: Optional[Pattern] = None,
    ) -> list["Node"]:
        """Descendants matching a tag name and/or class/id regex.

        Regexes use ``re.search`` against each class token (bs4 matches a regex
        against individual class strings) and against the id value.
        """
        out = []
        for n in self.iter_desc():
            if tag is not None and n.name != tag:
                continue
            if class_re is not None:
                if not any(class_re.search(c) for c in n.classes()):
                    continue
            if id_re is not None:
                idv = n.attrs.get("id")
                if idv is None or not id_re.search(idv):
                    continue
            out.append(n)
        return out

    def select(self, selector: str) -> list["Node"]:
        """CSS-selector subset: compound simple selectors joined by descendant
        (whitespace) and child (``>``) combinators. Simple selector parts:
        ``tag``, ``.class``, ``#id``, ``[attr]``, ``[attr="value"]``.
        Returns matches in document order, no duplicates.
        """
        steps = _parse_selector(selector)
        matched = _match_steps(self, steps)
        # document order, dedup
        seen: set[int] = set()
        out = []
        for n in self.iter_desc():
            if id(n) in seen:
                continue
            if n in matched:
                seen.add(id(n))
                out.append(n)
        return out


# ---------------------------------------------------------------------------
# selector engine
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*)
    | \.(?P<cls>[\w-]+)
    | \#(?P<id>[\w-]+)
    | \[(?P<attr>[\w-]+)(?:=(?P<q>["']?)(?P<val>[^\]"']*)(?P=q))?\]
    """,
    re.X,
)


def _parse_selector(selector: str):
    """→ list of (combinator, [conditions]) where combinator ∈ {' ', '>'} and a
    condition is ('tag'|'class'|'id'|'attr', payload)."""
    tokens = re.findall(r">|[^\s>]+", selector.strip())
    steps = []
    comb = " "
    for tok in tokens:
        if tok == ">":
            comb = ">"
            continue
        conds = []
        pos = 0
        while pos < len(tok):
            m = _SIMPLE_RE.match(tok, pos)
            if not m:
                break
            if m.group("tag"):
                conds.append(("tag", m.group("tag").lower()))
            elif m.group("cls"):
                conds.append(("class", m.group("cls")))
            elif m.group("id"):
                conds.append(("id", m.group("id")))
            else:
                conds.append(("attr", (m.group("attr").lower(), m.group("val"))))
            pos = m.end()
        steps.append((comb, conds))
        comb = " "
    return steps


def _node_matches(n: Node, conds) -> bool:
    for kind, payload in conds:
        if kind == "tag":
            if n.name != payload:
                return False
        elif kind == "class":
            if payload not in n.classes():
                return False
        elif kind == "id":
            if n.attrs.get("id") != payload:
                return False
        else:  # attr
            attr, val = payload
            if attr not in n.attrs:
                return False
            if val is not None and n.attrs.get(attr) != val:
                return False
    return True


def _match_steps(root: Node, steps) -> set:
    """Evaluate the selector left→right, narrowing a candidate set."""
    if not steps:
        return set()
    # first step: all descendants of root matching
    _, conds = steps[0]
    current = [n for n in root.iter_desc() if _node_matches(n, conds)]
    for comb, conds in steps[1:]:
        nxt = []
        seen: set[int] = set()
        if comb == ">":
            for base in current:
                for c in base.children:
                    if isinstance(c, Node) and _node_matches(c, conds) and id(c) not in seen:
                        seen.add(id(c))
                        nxt.append(c)
        else:
            for base in current:
                for d in base.iter_desc():
                    if _node_matches(d, conds) and id(d) not in seen:
                        seen.add(id(d))
                        nxt.append(d)
        current = nxt
        if not current:
            break
    return _IdSet(current)


class _IdSet:
    """Identity-based membership wrapper (Nodes are not hashable by value)."""

    __slots__ = ("_ids",)

    def __init__(self, nodes):
        self._ids = set(map(id, nodes))

    def __contains__(self, n) -> bool:
        return id(n) in self._ids


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore unmatched end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # comments / decls / PIs dropped
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


def parse_html(html_content: str) -> Node:
    """Parse an HTML string into a Node tree. Never raises on malformed input
    (html.parser is tolerant); worst case returns a flat tree."""
    builder = _TreeBuilder()
    builder.feed(html_content)
    builder.close()
    return builder.root
