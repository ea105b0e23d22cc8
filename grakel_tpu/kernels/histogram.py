"""Vertex- and edge-label histogram kernels.

Reference semantics: grakel/kernels/vertex_histogram.py and
edge_histogram.py — per-graph label-frequency vectors, Gram = Phi @ Phi^T,
with a fit-time label enumeration that is *extended* (never re-fit) at
transform time so unseen labels land in fresh columns that the fit side
has zero counts in (vertex_histogram.py:110-126, 179-187).

TPU design: labels never become a dense [n_graphs, n_labels] host matrix;
instead the flat (graph_id, label_id) COO stream goes through the chunked
densify+GEMM accumulate in ops/gram.coo_counts_gram.
"""

from __future__ import annotations

import numpy as np

from .base import Kernel, normalize_input
from ..batch import bucket_size, enumerate_labels
from ..ops.gram import (coo_counts_gram, coo_counts_gram_rect, counts_diag,
                        cpu_gemm, fetch_gram)

__all__ = ["VertexHistogram", "EdgeHistogram"]


class _HistogramKernel(Kernel):
    """Shared machinery; subclass picks vertex vs edge labels."""

    _label_type = "vertex"

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 sparse="auto"):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        # `sparse` is accepted for API compatibility with the reference
        # (vertex_histogram.py:128-133), where it gates a dense-ndarray
        # vs scipy-sparse feature matrix with a MemoryError fallback.
        # Here a dense [n_graphs, n_labels] matrix is never materialized
        # in the first place — features stream as (graph, label) COO
        # through chunked densify+GEMM — so every mode is already
        # "sparse-safe" and the value only gets validated.
        self.sparse = sparse

    def initialize(self):
        if self.sparse not in ("auto", True, False):
            raise TypeError("sparse could be False, True or auto")

    def _collect_labels(self, g):
        if self._label_type == "edge" and g.nb_edges() == 0:
            return []  # edgeless graph -> zero feature row
        labs = g.get_labels(label_type=self._label_type, return_none=True)
        if labs is None:
            raise ValueError(
                "%s requires %s labels" % (type(self).__name__,
                                           self._label_type))
        if self._label_type == "vertex":
            return [labs[v] for v in range(g.n)]
        return [labs[(int(s), int(r))]
                for s, r in zip(g.senders, g.receivers)]

    def _numeric_label_arrays(self, graphs):
        """Per-graph int64 label arrays when every graph has a full,
        integer-valued label dict; None otherwise (mixed/typed labels
        fall back to the per-item path)."""
        if self._label_type != "vertex":
            return None
        arrs = []
        for g in graphs:
            if not g.node_labels or len(g.node_labels) != g.n:
                return None
            a = g.numeric_node_label_array()
            if a is None:
                return None
            arrs.append(a)
        return arrs

    def _enum_ids(self, values):
        """Vectorized label enumeration: only the distinct values touch
        the ``_enum`` dict (extended in ascending order for new labels —
        column ids are Gram-permutation-invariant, and transform reuses
        the same dict, so this matches the reference's first-occurrence
        enumeration in effect)."""
        uniq, inv = np.unique(values, return_inverse=True)
        lut = np.empty(max(len(uniq), 1), dtype=np.int32)
        for i, u in enumerate(uniq.tolist()):
            idx = self._enum.get(u)
            if idx is None:
                idx = len(self._enum)
                self._enum[u] = idx
            lut[i] = idx
        return lut[inv.reshape(-1)]

    def parse_input(self, X):
        graphs = normalize_input(X)
        if self._method_calling in (1, 2):
            self._enum = {}
        elif not hasattr(self, "_enum"):
            raise ValueError("fit before transform")
        arrs = self._numeric_label_arrays(graphs)
        if arrs is not None:
            sizes = [len(a) for a in arrs]
            gids = np.repeat(np.arange(len(graphs), dtype=np.int64), sizes)
            labels = self._enum_ids(np.concatenate(arrs)
                                    if arrs else np.zeros(0, np.int64))
        else:
            gids, raw = [], []
            for gi, g in enumerate(graphs):
                ls = self._collect_labels(g)
                raw.extend(ls)
                gids.extend([gi] * len(ls))
            labels = enumerate_labels(raw, self._enum, extend=True)
        n_items = len(labels)
        pad = bucket_size(max(n_items, 1))
        gids_a = np.zeros(pad, dtype=np.int32)
        labs_a = np.zeros(pad, dtype=np.int32)
        valid = np.zeros(pad, dtype=bool)
        gids_a[:n_items] = gids
        labs_a[:n_items] = labels
        valid[:n_items] = True
        return {"n": len(graphs), "gids": gids_a, "labels": labs_a,
                "valid": valid, "n_labels": len(self._enum)}

    # label-universe size up to which the Gram is a host XLA-CPU GEMM
    # (same trade as WeisfeilerLehman._HOST_ASSEMBLY_MAX_L0: below this,
    # n^2*L host flops beat device dispatch + n^2 transfer bytes)
    _HOST_ASSEMBLY_MAX_L = 1024

    @staticmethod
    def _host_counts(p, L):
        v = p["valid"]
        flat = p["gids"][v].astype(np.int64) * L + p["labels"][v]
        return np.bincount(flat, minlength=p["n"] * L).reshape(
            p["n"], L).astype(np.float32)

    def _gram(self, px, py=None):
        L = max(px["n_labels"], py["n_labels"] if py else 0, 1)
        if L <= self._HOST_ASSEMBLY_MAX_L:
            if py is None:
                return cpu_gemm(self._host_counts(px, L))
            return cpu_gemm(self._host_counts(py, L),
                            self._host_counts(px, L))
        ones = np.ones(len(px["gids"]), dtype=np.float32)
        if py is None:
            return fetch_gram(coo_counts_gram(
                px["gids"], px["labels"], ones, px["valid"], px["n"], L))
        ones_y = np.ones(len(py["gids"]), dtype=np.float32)
        # rows = transform graphs (py), cols = fit graphs (px)
        return fetch_gram(coo_counts_gram_rect(
            py["gids"], py["labels"], ones_y, py["valid"],
            px["gids"], px["labels"], ones, px["valid"],
            py["n"], px["n"], L))

    def _diag(self, parsed):
        L = max(parsed["n_labels"], 1)
        if L <= self._HOST_ASSEMBLY_MAX_L:
            C = self._host_counts(parsed, L)
            return np.einsum("ij,ij->i", C, C)
        ones = np.ones(len(parsed["gids"]), dtype=np.float32)
        return np.asarray(counts_diag(
            parsed["gids"], parsed["labels"], ones, parsed["valid"],
            parsed["n"], L))


class VertexHistogram(_HistogramKernel):
    """Node-label frequency kernel (aliases in the reference: VH,
    subtree_wl — graph_kernels.py:40-68)."""
    _label_type = "vertex"


class EdgeHistogram(_HistogramKernel):
    """Edge-label frequency kernel (reference edge_histogram.py)."""
    _label_type = "edge"
