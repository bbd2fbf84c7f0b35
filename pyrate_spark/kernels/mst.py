"""Minimum-spanning-tree selection over a key's epoch network.

Per-key analog of the reference's networkx-based MST
(/root/reference/pyrate/core/mst.py:45-70,146-257): nodes = epochs,
edges = observations (epoch pairs), weight = nan_fraction; Kruskal with
networkx-compatible determinism (stable sort on weight, edges considered
in insertion order — matching nx.minimum_spanning_edges' use of
``sorted(..., key=weight)`` over G.edges, which iterates in insertion
order). No networkx on executors; pure numpy/python union-find.
"""

from __future__ import annotations

import numpy as np


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent
        root = p.setdefault(x, x)
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.parent[rb] = ra
        return True


def _dedupe_edges(first, second, weight):
    """networkx Graph semantics: re-adding an existing (undirected) edge
    overwrites its weight but keeps its original position."""
    order, wmap = [], {}
    for f, s, w in zip(first, second, weight):
        key = (f, s) if f <= s else (s, f)
        if key not in wmap:
            order.append(key)
        wmap[key] = w
    return order, wmap


def kruskal_mst_edges(first, second, weight):
    """Edge list of the minimum spanning forest as a set of (lo, hi)
    node pairs. Stable sort on weight == networkx tie-breaking."""
    order, wmap = _dedupe_edges(first, second, weight)
    idx = sorted(range(len(order)), key=lambda i: wmap[order[i]])
    uf = _UnionFind()
    out = set()
    for i in idx:
        u, v = order[i]
        if uf.union(u, v):
            out.add((u, v))
    return out, uf


def mst_select(first, second, weight):
    """Boolean selection vector over the observations: obs i selected iff
    its epoch pair is an MST edge (mst.py:156-170 'boolean array').
    A pair appearing twice selects every observation with that pair,
    mirroring ifg_date_index_lookup returning the first match but the
    boolean conversion marking membership by index set (mst.py:163-167:
    only the first index of a duplicate pair is marked — we replicate
    that exactly: first occurrence only)."""
    edges, _ = kruskal_mst_edges(first, second, weight)
    n = len(first)
    sel = np.zeros(n, dtype=bool)
    seen = set()
    for i in range(n):
        key = (first[i], second[i]) if first[i] <= second[i] else (second[i], first[i])
        if key in edges and key not in seen:
            sel[i] = True
            seen.add(key)
    return sel


def mst_stats(first, second, weight):
    """(n_edges, is_tree, n_components) of the MST — mst.py:45-70.
    is_tree means the forest is a single tree spanning all nodes."""
    edges, uf = kruskal_mst_edges(first, second, weight)
    nodes = set()
    for f, s in zip(first, second):
        nodes.add(f)
        nodes.add(s)
    roots = {uf.find(n) for n in nodes}
    ncomp = len(roots)
    return len(edges), ncomp == 1, ncomp


def mst_select_pixel(values, first, second, weight, global_sel=None):
    """Per-pixel MST with the reference's fast paths
    (mst.py:230-257): no NaNs -> global MST; all NaN -> none; else
    recompute the MST on the NaN-free edge subset."""
    values = np.asarray(values, dtype=np.float64)
    nan_mask = np.isnan(values)
    if not nan_mask.any():
        return global_sel if global_sel is not None \
            else mst_select(first, second, weight)
    if nan_mask.all():
        return np.zeros(len(values), dtype=bool)
    keep = np.nonzero(~nan_mask)[0]
    f = [first[i] for i in keep]
    s = [second[i] for i in keep]
    w = [weight[i] for i in keep]
    sub = mst_select(f, s, w)
    sel = np.zeros(len(values), dtype=bool)
    sel[keep[sub]] = True
    return sel
