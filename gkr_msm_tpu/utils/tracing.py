"""Span-tree wall-clock tracing (SURVEY.md §5 aux subsystems).

The reference instruments all hot prove paths with `tracing` spans rendered
by tracing-span-tree (/root/reference/examples/pippenger.rs:75-89,
src/cleanup/protocols/pippenger.rs:138-159).  This is the host-side
equivalent: nested context-manager spans accumulating wall times, rendered
as an indented tree.  Device work is asynchronous under JAX, so spans that
must account device time should call `block()` on their outputs (the
pipeline phases do a final decode/transfer anyway, which synchronizes).
"""
from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import List, Optional

# GKR_MSM_TRACE=1: stream span enter/exit lines to stderr as they happen
# (the span tree only renders at the end — useless when a phase hangs on a
# multi-minute remote compile; this is the live view).
_LIVE = os.environ.get("GKR_MSM_TRACE", "0") == "1"


class Span:
    def __init__(self, name: str, parent: Optional["Span"] = None):
        self.name = name
        self.parent = parent
        self.children: List[Span] = []
        self.start = 0.0
        self.elapsed = 0.0
        self.count = 0


class Tracer:
    """Global-ish span tree; cheap enough to leave on."""

    def __init__(self):
        self.root = Span("total")
        self.current = self.root
        self.enabled = True

    @contextlib.contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        parent = self.current
        node = next((c for c in parent.children if c.name == name), None)
        if node is None:
            node = Span(name, parent)
            parent.children.append(node)
        node.start = time.perf_counter()
        node.count += 1
        self.current = node
        if _LIVE:
            print(f"[span+] {time.strftime('%H:%M:%S')} {name}", file=sys.stderr, flush=True)
        try:
            yield
        finally:
            node.elapsed += time.perf_counter() - node.start
            self.current = parent
            if _LIVE:
                print(
                    f"[span-] {time.strftime('%H:%M:%S')} {name} "
                    f"({time.perf_counter() - node.start:.1f}s)",
                    file=sys.stderr,
                    flush=True,
                )

    def render(self) -> str:
        lines: List[str] = []

        def walk(node: Span, depth: int):
            if depth > 0:
                cnt = f" x{node.count}" if node.count > 1 else ""
                lines.append(f"{'  ' * (depth - 1)}{node.elapsed:8.3f}s  {node.name}{cnt}")
            for c in node.children:
                walk(c, depth + 1)

        walk(self.root, 0)
        return "\n".join(lines)

    def reset(self):
        self.root = Span("total")
        self.current = self.root


TRACER = Tracer()
span = TRACER.span
