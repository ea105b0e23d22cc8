"""Enumeration of all connected k-vertex subsets of a graph.

Functional equivalent of the reference's ConSubg (Karakashian 2013,
functions.pyx:177-281): given ``G`` as {vertex: set of neighbors},
return the set of all vertex subsets of size k inducing a connected
subgraph.  Implemented as the standard anchored-extension enumeration
with forbidden sets, which emits each subset exactly once.

(The recursion is intrinsically host-bound — combinatorial backtracking
has no XLA shape — so like the reference's Cython it stays native-side:
the hot path is the C++ ESU enumerator in native/src/consubg.cpp, with
this module's Python enumeration as the no-compiler fallback.)
"""

from __future__ import annotations

__all__ = ["connected_subsets"]


def connected_subsets(G, k):
    """All connected k-subsets of ``G`` ({v: set(neighbors)})."""
    from ..native import connected_subsets_native
    native = connected_subsets_native(G, k)
    if native is not None:
        return native
    out = set()
    if k <= 0:
        return out
    for anchor in G:
        _extend(G, k, {anchor},
                {v for v in G[anchor] if v != anchor}, {anchor}, out)
    return out


def _extend(G, k, sub, ext, forbidden, out):
    if len(sub) == k:
        out.add(frozenset(sub))
        return
    ext = list(ext)
    while ext:
        v = ext.pop()
        forbidden = forbidden | {v}
        new_ext = set(ext)
        for w in G[v]:
            if w not in sub and w not in forbidden:
                new_ext.add(w)
        _extend(G, k, sub | {v}, new_ext, forbidden, out)
