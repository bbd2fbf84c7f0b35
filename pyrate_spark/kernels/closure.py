"""Phase-closure loop machinery per key.

Exact semantics of the reference's phase_closure package:
- simple-cycle enumeration by DFS with dedupe on sorted node-set
  (/root/reference/pyrate/core/phase_closure/collect_loops.py:21-121);
- per-edge direction signs (+1 when traversal opposes the pair
  direction) and day-weights, loop sort by (weight, primary dates,
  secondary dates) (/root/reference/pyrate/core/phase_closure/
  mst_closure.py:119-179);
- signed closure sum per loop, optional median re-centring, breach =
  |closure| > thr * pi (sum_closure.py:158-189);
- greedy redundancy discard (closure_check.py:147-166).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np


def _dfs(graph, marked, n, vert, start, count, loop, all_loops):
    """collect_loops.py:21-56, verbatim control flow."""
    V = graph.shape[0]
    marked[vert] = True
    if n == 0:
        marked[vert] = False
        if graph[vert][start] == 1:
            count += 1
            all_loops.append(loop)
        return count
    for i in range(V):
        if (not marked[i]) and (graph[vert][i] == 1):
            count = _dfs(graph, marked, n - 1, i, start, count,
                         loop + [i], all_loops)
    marked[vert] = False
    return count


def find_loops(graph: np.ndarray, loop_length: int):
    """collect_loops.py:59-73."""
    V = graph.shape[0]
    all_loops: List[List[int]] = []
    marked = [False] * V
    count = 0
    for i in range(V - (loop_length - 1)):
        count = _dfs(graph, marked, loop_length - 1, i, i, count, [i],
                     all_loops)
        marked[i] = True
    return count, all_loops


def dedupe_loops(loops: List[List[int]]) -> List[List[int]]:
    """collect_loops.py:76-121 — keep first loop per node-set."""
    seen = set()
    out = []
    for loop in loops:
        key = tuple(sorted(loop))
        if key not in seen:
            seen.add(key)
            out.append(loop)
    return out


@dataclass(frozen=True)
class SignedEdge:
    first: object   # epoch (comparable: date / int / float seconds)
    second: object
    sign: int       # +1 traversal opposes pair order, -1 along it


@dataclass(frozen=True)
class WeightedLoop:
    edges: Tuple[SignedEdge, ...]
    weight: float   # sum of per-edge spans

    @property
    def primary_dates(self):
        return tuple(e.first for e in self.edges)

    @property
    def secondary_dates(self):
        return tuple(e.second for e in self.edges)


def closed_loops(first: Sequence, second: Sequence,
                 max_loop_length: int = 4) -> List[WeightedLoop]:
    """Enumerate signed/weighted simple cycles of length 3..max over the
    epoch graph of one key (mst_closure.py:85-179). Weight is the loop's
    total span in the epoch unit (days in the reference; here whatever
    unit `first`/`second` subtract to)."""
    nodes = sorted(set(first) | set(second))
    nid = {n: i for i, n in enumerate(nodes)}
    V = len(nodes)
    graph = np.zeros((V, V), dtype=np.int8)
    for f, s in zip(first, second):
        graph[nid[f], nid[s]] = 1
        graph[nid[s], nid[f]] = 1

    loops: List[List[int]] = []
    for n in range(3, max_loop_length + 1):
        if V < n:
            break
        _, found = find_loops(graph, n)
        loops.extend(dedupe_loops(found))

    available = {(f, s) for f, s in zip(first, second)}
    weighted: List[WeightedLoop] = []
    for lp in loops:
        seq = [nodes[i] for i in lp]
        seq.append(seq[0])
        edges = []
        ok = True
        for a, b in zip(seq[:-1], seq[1:]):
            if b > a:
                if (a, b) not in available:
                    ok = False
                    break
                edges.append(SignedEdge(a, b, 1))
            else:
                if (b, a) not in available:
                    ok = False
                    break
                edges.append(SignedEdge(b, a, -1))
        if not ok:
            continue
        edges.sort(key=lambda e: (e.first, e.second, e.sign))
        w = float(sum(_span(e.first, e.second) for e in edges))
        weighted.append(WeightedLoop(tuple(edges), w))

    weighted.sort(key=lambda x: (x.weight, x.primary_dates, x.secondary_dates))
    return weighted


def _span(a, b):
    d = b - a
    return d.days if hasattr(d, "days") else d


def discard_loops_containing_max_ifg_count(loops: List[WeightedLoop],
                                           max_loop_redundancy: int):
    """closure_check.py:147-166 greedy pass: drop a loop if every one of
    its edges has already been seen more than max_loop_redundancy times."""
    selected = []
    counts: dict = {}
    for loop in loops:
        keys = [(e.first, e.second) for e in loop.edges]
        if all(counts.get(k, 0) > max_loop_redundancy for k in keys):
            continue
        selected.append(loop)
        for k in keys:
            counts[k] = counts.get(k, 0) + 1
    return selected


def sum_closure(loop: WeightedLoop, values: dict, subtract_median: bool,
                thr: float):
    """Signed closure for one loop and one key's observation values
    (sum_closure.py:158-189): closure = sum(sign * value); optionally
    re-centred by its median (trivially itself for a scalar per key —
    retained for the tier variant where values are vectors); breach when
    |closure| > thr * pi."""
    vals = np.array([e.sign * np.asarray(values[(e.first, e.second)],
                                         dtype=np.float64)
                     for e in loop.edges])
    closure = vals.sum(axis=0)
    if subtract_median:
        closure = closure - np.nanmedian(closure)
    breach = np.abs(closure) > (thr * np.pi)
    return closure, breach
