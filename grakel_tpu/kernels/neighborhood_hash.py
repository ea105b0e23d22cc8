"""Neighborhood hashing kernel (Hido & Kashima 2009).

Reference semantics (grakel/kernels/neighborhood_hash.py):

* fit collects the global node-label set and maps each distinct label to a
  random distinct ``bits``-wide integer drawn with ``random_state``
  (:166-192); transform maps unseen labels to ``None`` (poisoning any node
  whose own or neighbor label is unknown, :395-421).
* R hashing rounds applied iteratively (round 0 already hashes once):
  - simple:          NH(u) = ROT1(l(u)) XOR (XOR over neighbor labels)
  - count_sensitive: NH(u) = ROT1(l(u)) XOR (XOR over distinct neighbor
    labels l with count o of ROT(l XOR o, o))   (:423-507)
* pairwise k(x, y) = mean over rounds of c / (nx + ny - c) where c is the
  sorted-merge multiset intersection of the two label arrays (:534-573);
  output is inherently normalized, diagonal = 1 (:346-368).

TPU design: all R rounds run on device over the flat batch —
XOR-aggregation over neighbors = per-bit-plane ``segment_sum`` parity;
the count-sensitive fold = one edge sort by (receiver, label) + run-length
detection, no per-node Python.  The multiset intersection c for ALL graph
pairs at once is a histogram min-intersection Gram over the 2^bits label
space (ops/intersect.py), so the O(N^2) pair loop disappears.
"""

from __future__ import annotations

import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from sklearn.utils import check_random_state

from .base import Kernel, normalize_input
from ..batch import bucket_size

__all__ = ["NeighborhoodHash"]

_U = jnp.uint32


def _rot(x, d, bits, mask):
    """ROT of ``x`` by ``d`` (vectorized; reference :371-392)."""
    m = d % bits
    rot = ((x << m) & mask) | ((x & mask) >> (bits - m))
    return jnp.where(m > 0, rot, x)


def _xor_segment(values, segment_ids, num_segments, bits):
    """XOR-aggregate uint32 values per segment via bit-plane parity
    (XOR per bit == sum parity per bit; one segment_sum per plane —
    packing several planes into one integer word is unsafe because a
    carry out of one counter field corrupts the next plane's parity)."""
    out = jnp.zeros(num_segments, _U)
    for b in range(bits):
        plane = (values >> _U(b)) & _U(1)
        s = jax.ops.segment_sum(plane.astype(jnp.int32), segment_ids,
                                num_segments=num_segments)
        out = out | ((s.astype(_U) & _U(1)) << _U(b))
    return out


class NeighborhoodHash(Kernel):
    """Neighborhood hash kernel (simple / count_sensitive)."""

    _inherently_normalized = True

    def __init__(self, n_jobs=None, normalize=False, verbose=False,
                 random_state=None, R=3, nh_type="simple", bits=8):
        super().__init__(n_jobs=n_jobs, normalize=normalize, verbose=verbose)
        self.random_state = random_state
        self.R = R
        self.nh_type = nh_type
        self.bits = bits

    def initialize(self):
        if not isinstance(self.R, int) or self.R <= 0:
            raise TypeError("R must be an integer bigger than zero")
        if self.nh_type not in ("simple", "count_sensitive"):
            raise TypeError("unrecognised neighborhood hashing type")
        if not isinstance(self.bits, int) or self.bits <= 0:
            raise TypeError("illegal number of bits for hashing")
        self._max_number = 1 << self.bits
        self._mask = self._max_number - 1
        self.random_state_ = check_random_state(self.random_state)

    # ------------------------------------------------------------------ #
    def parse_input(self, X):
        graphs = normalize_input(X)
        if self._method_calling in (1, 2):
            # draw the random label hash (reference :166-192): a python
            # set built in graph order, then distinct random ints
            labels_hash_set = set()
            for g in graphs:
                labs = g.get_labels(label_type="vertex", return_none=True)
                if labs is None:
                    raise ValueError("NeighborhoodHash requires node labels")
                labels_hash_set |= set(labs.values())
            if len(labels_hash_set) > self._max_number:
                warnings.warn("Number of labels is smaller than the biggest "
                              "possible.. Collisions will appear on the "
                              "new labels.")
                nl, nrl = [], len(labels_hash_set)
                while nrl > self._max_number:
                    nl += self.random_state_.choice(
                        self._max_number, self._max_number,
                        replace=False).tolist()
                    nrl -= self._max_number
                if nrl > 0:
                    nl += self.random_state_.choice(
                        self._max_number, nrl, replace=False).tolist()
            else:
                nl = self.random_state_.choice(
                    self._max_number, len(labels_hash_set),
                    replace=False).tolist()
            self._labels_hash_dict = dict(zip(labels_hash_set, nl))
        elif not hasattr(self, "_labels_hash_dict"):
            raise ValueError("fit before transform")
        return self._device_levels(graphs)

    # ------------------------------------------------------------------ #
    def _device_levels(self, graphs):
        """Run R hashing rounds on device; return per-round label
        histograms [R, n_graphs, 2^bits] plus vertex counts."""
        n = len(graphs)
        n_nodes = np.array([g.n for g in graphs], np.int64)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(n_nodes, out=offs[1:])
        N = int(offs[-1])
        E = int(sum(len(g.senders) for g in graphs))
        N_pad = bucket_size(N + 1)
        E_pad = bucket_size(max(E, 1))

        lab = np.zeros(N_pad, np.uint32)
        lab_valid = np.zeros(N_pad, bool)
        node_msk = np.zeros(N_pad, bool)
        gids = np.full(N_pad, n, np.int32)
        send = np.full(E_pad, N_pad - 1, np.int32)
        recv = np.full(E_pad, N_pad - 1, np.int32)
        e_msk = np.zeros(E_pad, bool)

        # label hashing: vectorized when every graph has a full integer
        # label dict (only the DISTINCT values touch the hash dict)
        arrs = []
        for g in graphs:
            a = (g.numeric_node_label_array()
                 if g.node_labels and len(g.node_labels) == g.n else None)
            if a is None:
                arrs = None
                break
            arrs.append(a)
        if arrs is not None and N:
            uniq, inv = np.unique(np.concatenate(arrs),
                                  return_inverse=True)
            lut = np.fromiter(
                (self._labels_hash_dict.get(int(u), -1) for u in uniq),
                np.int64, len(uniq))
            mapped = lut[inv.reshape(-1)]
            lab[:N] = np.where(mapped >= 0, mapped, 0).astype(np.uint32)
            lab_valid[:N] = mapped >= 0
        else:
            for gi, g in enumerate(graphs):
                o = int(offs[gi])
                labs = g.get_labels(label_type="vertex", return_none=True)
                if labs is None:
                    raise ValueError(
                        "NeighborhoodHash requires node labels")
                for v in range(g.n):
                    h = self._labels_hash_dict.get(labs[v])
                    if h is None:
                        lab_valid[o + v] = False
                    else:
                        lab[o + v] = h
                        lab_valid[o + v] = True
        node_msk[:N] = True
        gids[:N] = np.repeat(np.arange(n, dtype=np.int32),
                             n_nodes.astype(np.int64))
        n_edges = np.fromiter((len(g.senders) for g in graphs), np.int64,
                              n)
        if E:
            e_off = np.repeat(offs[:-1], n_edges).astype(np.int32)
            send[:E] = np.concatenate(
                [g.senders for g in graphs]) + e_off
            recv[:E] = np.concatenate(
                [g.receivers for g in graphs]) + e_off
            e_msk[:E] = True

        hists = _nh_rounds(
            jnp.asarray(lab), jnp.asarray(lab_valid), jnp.asarray(node_msk),
            jnp.asarray(gids), jnp.asarray(send), jnp.asarray(recv),
            jnp.asarray(e_msk), n, self.R, self.bits,
            self.nh_type == "count_sensitive")
        return {"n": n, "hists": np.asarray(hists),
                "nv": n_nodes.astype(np.float64)}

    # ------------------------------------------------------------------ #
    def _gram(self, px, py=None):
        from ..ops.intersect import jaccard_gram_rounds
        symmetric = py is None
        if py is None:
            py = px
        # the per-round min-intersections, the Jaccard division, the
        # round mean and the symmetrization all fuse into one device
        # program: a single [n, m] f32 crosses the link instead of an
        # [R, n, m] count stack (which cost ~3x the transfer + host
        # broadcast arithmetic at NCI1 scale)
        K = jaccard_gram_rounds(py["hists"], px["hists"],
                                va=py["nv"], vb=px["nv"],
                                symmetrize=symmetric)
        return np.asarray(K, np.float64)[:py["n"], :px["n"]]

    def _diag(self, parsed):
        return np.ones(parsed["n"], np.float64)

    def diagonal(self):
        """Inherently normalized (reference :346-368)."""
        from sklearn.exceptions import NotFittedError
        if not hasattr(self, "X") or self.X is None:
            raise NotFittedError("call fit before diagonal")
        if getattr(self, "_is_transformed", False):
            return 1.0, 1.0
        return 1.0


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def _nh_rounds(lab, lab_valid, node_msk, gids, send, recv, e_msk,
               n_graphs, R, bits, count_sensitive):
    """R hashing rounds + per-round label histograms, one jit call."""
    N = lab.shape[0]
    L = 1 << bits
    mask = _U((1 << bits) - 1)
    bits_u = _U(bits)

    def one_round(lab, lab_valid):
        # a node is poisoned if its own label or any out-neighbor's is
        # invalid (edge u->v: v is a neighbor of u)
        inval = jnp.where(e_msk, (~lab_valid[recv]).astype(jnp.int32), 0)
        bad_nbrs = jax.ops.segment_sum(inval, send, num_segments=N) > 0
        new_valid = lab_valid & ~bad_nbrs & node_msk
        if not count_sensitive:
            vals = jnp.where(e_msk, lab[recv], _U(0))
            agg = _xor_segment(vals, send, N, bits)
        else:
            # sort edges by (node, neighbor label); fold each run
            # (distinct label l, count o) as ROT(l ^ o, o)
            key = send.astype(_U) * _U(L) + (lab[recv] & mask)
            key = jnp.where(e_msk, key, _U(0xFFFFFFFF))
            order = jnp.argsort(key)
            sk = key[order]
            # run boundaries
            first = jnp.concatenate([jnp.ones((1,), bool),
                                     sk[1:] != sk[:-1]])
            run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
            E = sk.shape[0]  # number of runs is at most E
            run_len = jax.ops.segment_sum(
                jnp.ones_like(run_id), run_id, num_segments=E)
            is_last = jnp.concatenate([sk[1:] != sk[:-1],
                                       jnp.ones((1,), bool)])
            l_val = sk & mask
            o = run_len[run_id].astype(_U)
            folded = _rot(l_val ^ o, o, bits_u, mask)
            contrib = jnp.where(is_last & (sk != _U(0xFFFFFFFF)),
                                folded, _U(0))
            node_sorted = (sk >> _U(bits)).astype(jnp.int32)
            node_sorted = jnp.where(sk != _U(0xFFFFFFFF), node_sorted, N - 1)
            agg = _xor_segment(contrib, node_sorted, N, bits)
        new_lab = (_rot(lab & mask, _U(1), bits_u, mask) ^ agg) & mask
        return new_lab, new_valid

    # scan over rounds: the round body compiles ONCE (an unrolled loop
    # tripled the XLA program and its compile time on the tunnel)
    def scan_round(carry, _):
        lab, lab_valid = one_round(*carry)
        seg = jnp.where(lab_valid & node_msk,
                        gids * L + lab.astype(jnp.int32), n_graphs * L)
        h = jax.ops.segment_sum(
            jnp.where(lab_valid & node_msk, 1.0, 0.0)
            .astype(jnp.float32),
            seg, num_segments=(n_graphs + 1) * L)
        return (lab, lab_valid), h.reshape(n_graphs + 1, L)[:n_graphs]

    _, hists = jax.lax.scan(scan_round, (lab, lab_valid), None, length=R)
    return hists
