"""Aho-Corasick context graph for keyword spotting.

TPU-native analog of the reference's keyword decoder
(reference: Sources/SpeechWakeWord/ContextGraph.swift:9-210): a trie over
keyword token sequences with Aho-Corasick fail links and output links;
each accepted token advances the state and accumulates a per-token boost;
reaching a keyword's terminal node fires a detection when the accumulated
acoustic score clears the keyword's threshold. Host-side control logic —
the encoder posteriors come from the jitted model.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple


@dataclasses.dataclass
class Keyword:
    name: str
    token_ids: Sequence[int]
    threshold: float = 0.25   # mean per-token acoustic probability
    boost: float = 1.0


class _Node:
    __slots__ = ("children", "fail", "output", "keyword", "depth", "token")

    def __init__(self, token: int = -1, depth: int = 0):
        self.children: Dict[int, "_Node"] = {}
        self.fail: Optional["_Node"] = None
        self.output: Optional["_Node"] = None  # nearest terminal via fail links
        self.keyword: Optional[Keyword] = None
        self.depth = depth
        self.token = token


class ContextGraph:
    def __init__(self, keywords: Sequence[Keyword]):
        self.root = _Node()
        self.keywords = list(keywords)
        for kw in keywords:
            node = self.root
            for tok in kw.token_ids:
                if tok not in node.children:
                    node.children[tok] = _Node(tok, node.depth + 1)
                node = node.children[tok]
            node.keyword = kw
        self._build_fail_links()

    def _build_fail_links(self):
        queue = deque()
        for child in self.root.children.values():
            child.fail = self.root
            queue.append(child)
        while queue:
            node = queue.popleft()
            for tok, child in node.children.items():
                fail = node.fail
                while fail is not self.root and tok not in fail.children:
                    fail = fail.fail
                child.fail = fail.children.get(tok, self.root)
                if child.fail is child:
                    child.fail = self.root
                child.output = child.fail if child.fail.keyword else child.fail.output
                queue.append(child)

    def advance(self, state: Optional[_Node], token: int) -> Tuple[_Node, bool]:
        """Returns (next_state, consumed_on_path)."""
        node = state or self.root
        while node is not self.root and token not in node.children:
            node = node.fail
        nxt = node.children.get(token)
        if nxt is None:
            return self.root, False
        return nxt, True

    def matched_keyword(self, state: _Node) -> Optional[Keyword]:
        if state.keyword:
            return state.keyword
        out = state.output
        while out is not None:
            if out.keyword:
                return out.keyword
            out = out.output
        return None


class StreamingKeywordDecoder:
    """Greedy streaming decoder: feed per-frame (token, prob) posteriors,
    emits (keyword, time, score) when a keyword path completes above its
    threshold (reference: StreamingKwsDecoder.swift)."""

    def __init__(self, graph: ContextGraph, blank_id: int = 0):
        self.graph = graph
        self.blank = blank_id
        self.reset()

    def reset(self):
        self._state = self.graph.root
        self._scores: List[float] = []
        self._last_token = self.blank

    def step(self, token: int, prob: float, time_s: float) -> Optional[Tuple[str, float, float]]:
        if token == self.blank or token == self._last_token:
            self._last_token = token
            return None
        self._last_token = token
        state, consumed = self.graph.advance(self._state, token)
        if not consumed:
            self._state = self.graph.root
            self._scores = []
            # the token may begin a new keyword
            state, consumed = self.graph.advance(self._state, token)
            if not consumed:
                return None
        self._state = state
        self._scores.append(prob)
        kw = self.graph.matched_keyword(state)
        if kw is not None:
            mean_prob = sum(self._scores[-len(kw.token_ids):]) / len(kw.token_ids)
            score = mean_prob * kw.boost
            self.reset()
            if score >= kw.threshold:
                return (kw.name, time_s, score)
        return None
