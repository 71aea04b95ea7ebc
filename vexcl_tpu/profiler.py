"""Hierarchical tic/toc profiler.

Analog of vexcl/profiler.hpp (stopwatch :92-150, profiler :160,
cl_profile_unit :249-266, tic_cpu :310 / tic_cl :319).

``tic_cl`` in the reference calls queue.finish() on both ends for honest
device timing; the JAX analog synchronizes with ``block_until_ready`` on a
sentinel before starting and after stopping the span.
"""

from __future__ import annotations

import statistics
import time
from typing import Dict, List, Optional

import numpy as np

__all__ = ["stopwatch", "profiler"]


class stopwatch:
    """Accumulating timer with mean/median (profiler.hpp:92-150)."""

    def __init__(self) -> None:
        self._laps: List[float] = []
        self._start: Optional[float] = None

    def tic(self) -> None:
        self._start = time.perf_counter()

    def toc(self) -> float:
        if self._start is None:
            raise RuntimeError("toc() without tic()")
        lap = time.perf_counter() - self._start
        self._laps.append(lap)
        self._start = None
        return lap

    @property
    def laps(self) -> int:
        return len(self._laps)

    @property
    def total(self) -> float:
        return sum(self._laps)

    @property
    def mean(self) -> float:
        return statistics.mean(self._laps) if self._laps else 0.0

    @property
    def median(self) -> float:
        return statistics.median(self._laps) if self._laps else 0.0

    def reset(self) -> None:
        self._laps.clear()
        self._start = None


class _Node:
    def __init__(self, name: str, parent=None):
        self.name = name
        self.parent = parent
        self.watch = stopwatch()
        self.children: Dict[str, "_Node"] = {}

    def child(self, name: str) -> "_Node":
        if name not in self.children:
            self.children[name] = _Node(name, self)
        return self.children[name]


class profiler:
    """Hierarchical profiler (profiler.hpp:160-368)::

        prof = vex.profiler()
        prof.tic_cl("assembly")       # device-synchronized span
        ...
        prof.toc("assembly")
        print(prof)
    """

    def __init__(self, name: str = "Profile", context=None) -> None:
        self.context = context
        self.root = _Node(name)
        self._current = self.root

    # -- spans -------------------------------------------------------------
    def tic_cpu(self, name: str) -> None:
        node = self._current.child(name)
        self._current = node
        node.watch.tic()

    def tic_cl(self, name: str) -> None:
        """Device-synchronized span start (cl_profile_unit :249-266)."""
        self._sync()
        self.tic_cpu(name)

    def toc(self, name: str = "") -> float:
        node = self._current
        if name and node.name != name:
            raise RuntimeError(f"toc({name!r}) does not match open span {node.name!r}")
        self._sync()
        lap = node.watch.toc()
        self._current = node.parent or self.root
        return lap

    def _sync(self) -> None:
        try:
            import jax

            arrs = jax.live_arrays()
            if arrs:
                jax.block_until_ready(arrs[-1])
        except Exception:
            pass

    # -- report ------------------------------------------------------------
    def __str__(self) -> str:
        lines: List[str] = []

        def walk(node: _Node, depth: int, parent_total: float) -> None:
            total = node.watch.total
            pct = f" ({100*total/parent_total:5.1f}%)" if parent_total else ""
            if depth == 0:
                lines.append(f"[{node.name}]")
            else:
                lines.append(
                    f"{'  '*depth}{node.name}: {total:10.6f} s{pct}"
                    + (f"  [{node.watch.laps}x, median {node.watch.median*1e3:.3f} ms]"
                       if node.watch.laps > 1 else "")
                )
            for c in node.children.values():
                walk(c, depth + 1, total or parent_total)

        walk(self.root, 0, 0.0)
        return "\n".join(lines)

    def summary(self) -> str:
        return str(self)
