"""Sharded Gram-matrix assembly: ring-tiled Phi @ Phi^T over a device mesh.

Each device owns a contiguous row block of graphs.  Feature blocks rotate
around the ring with ``lax.ppermute`` while each device multiplies its own
block against the visiting one, so every step overlaps one MXU GEMM with
one ICI hop and no device ever materializes the full feature matrix
(the ring-attention-shaped pattern of this project, SURVEY.md §5).

The histogram/WL feature pipeline feeds this via ``sharded_counts_gram``:
COO (graph, label, weight) item streams are split per device on host
(:func:`shard_batch`), densified locally with ``segment_sum``, then ring-
multiplied.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["ring_gram", "ring_rect_gram", "sharded_counts_gram",
           "sharded_counts_gram_rect", "shard_batch"]


def _ring_body(phi_local, n_devices, axis_name):
    """Inside-shard_map ring accumulation.  phi_local: [r, L] ->
    K row block [r, n_devices * r]."""
    p = jax.lax.axis_index(axis_name)
    r = phi_local.shape[0]
    perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]

    def step(t, carry):
        blk, K = carry
        src = jnp.mod(p + t, n_devices)
        tile = jnp.dot(phi_local, blk.T, preferred_element_type=jnp.float32)
        K = jax.lax.dynamic_update_slice(K, tile, (0, src * r))
        blk = jax.lax.ppermute(blk, axis_name, perm)
        return blk, K

    K0 = jnp.zeros((r, n_devices * r), jnp.float32)
    # mark the accumulator as device-varying so the carry types line up
    # under shard_map's varying-axis type system
    K0 = jax.lax.pvary(K0, (axis_name,))
    _, K = jax.lax.fori_loop(0, n_devices, step, (phi_local, K0))
    return K


def ring_gram(mesh, phi, axis_name="g"):
    """K = Phi @ Phi^T with Phi row-sharded over ``mesh``.

    ``phi``: [n_rows, L] with n_rows divisible by mesh size.  Returns the
    full [n_rows, n_rows] Gram, row-sharded.
    """
    P = mesh.shape[axis_name]
    spec = PartitionSpec(axis_name, None)
    fn = shard_map(
        functools.partial(_ring_body, n_devices=P, axis_name=axis_name),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(phi)


def _ring_rect_body(rows_local, cols_local, n_devices, axis_name):
    """Rectangular ring block: rows stay resident, column-feature blocks
    rotate.  rows_local: [ry, L], cols_local: [rc, L] ->
    K row block [ry, n_devices * rc]."""
    p = jax.lax.axis_index(axis_name)
    rc = cols_local.shape[0]
    perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]

    def step(t, carry):
        blk, K = carry
        src = jnp.mod(p + t, n_devices)
        tile = jnp.dot(rows_local, blk.T,
                       preferred_element_type=jnp.float32)
        K = jax.lax.dynamic_update_slice(K, tile, (0, src * rc))
        blk = jax.lax.ppermute(blk, axis_name, perm)
        return blk, K

    K0 = jnp.zeros((rows_local.shape[0], n_devices * rc), jnp.float32)
    K0 = jax.lax.pvary(K0, (axis_name,))
    _, K = jax.lax.fori_loop(0, n_devices, step, (cols_local, K0))
    return K


def ring_rect_gram(mesh, phi_rows, phi_cols, axis_name="g"):
    """K[i, j] = <phi_rows[i], phi_cols[j]> with BOTH operands
    row-sharded over ``mesh`` (the transform-block layout: rows =
    transform graphs, cols = fit graphs).  Row counts must divide by the
    mesh size; returns the full rectangular Gram, row-sharded."""
    P = mesh.shape[axis_name]
    spec = PartitionSpec(axis_name, None)
    fn = shard_map(
        functools.partial(_ring_rect_body, n_devices=P,
                          axis_name=axis_name),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec)
    return fn(phi_rows, phi_cols)


def shard_batch(gids, labels, weights, valid, n_graphs, n_devices):
    """Host-side split of a COO item stream into per-device slices.

    Graphs are assigned to devices in contiguous blocks of
    ``rows = ceil(n_graphs / n_devices)``; every device gets the same
    (padded) number of items.  Returns
    ``(local_gids [P, I], labels [P, I], weights [P, I], valid [P, I],
    rows_per_device)`` where ``local_gids`` are row indices within the
    device's block.
    """
    gids = np.asarray(gids)
    labels = np.asarray(labels)
    weights = np.asarray(weights)
    valid = np.asarray(valid)
    rows = -(-int(n_graphs) // n_devices)
    dev_of = np.where(valid, gids // rows, 0)
    counts = np.bincount(dev_of[valid], minlength=n_devices)
    I = max(int(counts.max()) if counts.size else 1, 1)
    # round up to a lane multiple to keep segment shapes friendly
    I = -(-I // 128) * 128
    lg = np.zeros((n_devices, I), np.int32)
    lb = np.zeros((n_devices, I), labels.dtype)
    lw = np.zeros((n_devices, I), np.float32)
    lv = np.zeros((n_devices, I), bool)
    idx = np.nonzero(valid)[0]
    if idx.size:
        # vectorized per-device packing: stable-sort by device, then the
        # slot of each item is its running index minus its device's start
        d = dev_of[idx]
        order = np.argsort(d, kind="stable")
        sel = idx[order]
        dsort = d[order]
        starts = np.zeros(n_devices, np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        slot = np.arange(sel.size) - starts[dsort]
        lg[dsort, slot] = (gids[sel] - dsort * rows).astype(np.int32)
        lb[dsort, slot] = labels[sel]
        lw[dsort, slot] = weights[sel]
        lv[dsort, slot] = True
    return lg, lb, lw, lv, rows


def _local_chunk_counts(lgids, labels, weights, valid, rows, chunk, lo):
    """Densified [rows, chunk] label-chunk counts of one device's COO
    slice (labels outside [lo, lo+chunk) park in the pad row)."""
    rel = labels - lo
    inc = valid & (rel >= 0) & (rel < chunk)
    g = jnp.where(inc, lgids, rows)
    seg = g * chunk + jnp.where(inc, rel, 0)
    counts = jax.ops.segment_sum(
        jnp.where(inc, weights, 0.0), seg,
        num_segments=(rows + 1) * chunk)
    return counts.reshape(rows + 1, chunk)[:rows].astype(jnp.float32)


def _counts_ring_body(lgids, labels, weights, valid, rows, n_chunks, chunk,
                      n_devices, axis_name):
    """Chunked, ring-accumulated counts Gram: per label chunk, densify
    the local [rows, chunk] block and rotate it around the ring, adding
    one MXU tile per hop (mirrors ops/gram.chunked_counts_gram_raw, so
    arbitrarily wide label universes never materialize [rows, L])."""
    lgids = lgids[0]
    labels = labels[0]
    weights = weights[0]
    valid = valid[0]
    p = jax.lax.axis_index(axis_name)
    perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]

    def chunk_body(c, K):
        phi = _local_chunk_counts(lgids, labels, weights, valid,
                                  rows, chunk, c * chunk)

        def step(t, carry):
            blk, K = carry
            src = jnp.mod(p + t, n_devices)
            tile = jnp.dot(phi, blk.T,
                           preferred_element_type=jnp.float32)
            prev = jax.lax.dynamic_slice(K, (0, src * rows), (rows, rows))
            K = jax.lax.dynamic_update_slice(K, prev + tile,
                                             (0, src * rows))
            blk = jax.lax.ppermute(blk, axis_name, perm)
            return blk, K

        _, K = jax.lax.fori_loop(0, n_devices, step, (phi, K))
        return K

    K0 = jax.lax.pvary(jnp.zeros((rows, n_devices * rows), jnp.float32),
                       (axis_name,))
    return jax.lax.fori_loop(0, n_chunks, chunk_body, K0)


def sharded_counts_gram(mesh, lgids, labels, weights, valid, rows, n_labels,
                        axis_name="g", chunk=4096):
    """Distributed histogram Gram from per-device COO slices
    (outputs of :func:`shard_batch`).

    Labels stream in static chunks (like ops/gram.coo_counts_gram), so
    the per-device working set is [rows, chunk] however wide the label
    universe.  Returns the [P*rows, P*rows] Gram, row-sharded (rows
    beyond ``n_graphs`` are zero).
    """
    from ..ops.gram import chunk_plan
    P = mesh.shape[axis_name]
    nc, chunk = chunk_plan(n_labels, chunk)
    item_spec = PartitionSpec(axis_name, None)
    fn = shard_map(
        functools.partial(_counts_ring_body, rows=rows, n_chunks=nc,
                          chunk=chunk, n_devices=P, axis_name=axis_name),
        mesh=mesh,
        in_specs=(item_spec, item_spec, item_spec, item_spec),
        out_specs=PartitionSpec(axis_name, None))
    return fn(jnp.asarray(lgids), jnp.asarray(labels),
              jnp.asarray(weights), jnp.asarray(valid))


def _counts_ring_rect_body(yg, yl, yw, yv, xg, xl, xw, xv,
                           rows_y, rows_x, n_chunks, chunk,
                           n_devices, axis_name):
    """Rect variant: Y rows stay resident, X chunk blocks rotate."""
    yg, yl, yw, yv = yg[0], yl[0], yw[0], yv[0]
    xg, xl, xw, xv = xg[0], xl[0], xw[0], xv[0]
    p = jax.lax.axis_index(axis_name)
    perm = [(i, (i - 1) % n_devices) for i in range(n_devices)]

    def chunk_body(c, K):
        lo = c * chunk
        phi_y = _local_chunk_counts(yg, yl, yw, yv, rows_y, chunk, lo)
        phi_x = _local_chunk_counts(xg, xl, xw, xv, rows_x, chunk, lo)

        def step(t, carry):
            blk, K = carry
            src = jnp.mod(p + t, n_devices)
            tile = jnp.dot(phi_y, blk.T,
                           preferred_element_type=jnp.float32)
            prev = jax.lax.dynamic_slice(K, (0, src * rows_x),
                                         (rows_y, rows_x))
            K = jax.lax.dynamic_update_slice(K, prev + tile,
                                             (0, src * rows_x))
            blk = jax.lax.ppermute(blk, axis_name, perm)
            return blk, K

        _, K = jax.lax.fori_loop(0, n_devices, step, (phi_x, K))
        return K

    K0 = jax.lax.pvary(
        jnp.zeros((rows_y, n_devices * rows_x), jnp.float32),
        (axis_name,))
    return jax.lax.fori_loop(0, n_chunks, chunk_body, K0)


def sharded_counts_gram_rect(mesh, y_items, x_items, rows_y, rows_x,
                             n_labels, axis_name="g", chunk=4096):
    """Distributed rectangular counts Gram (transform block): rows =
    Y graphs, cols = X (fit) graphs, both COO streams pre-sharded with
    :func:`shard_batch`.  ``y_items``/``x_items`` are the (lgids,
    labels, weights, valid) quadruples.  Returns [P*rows_y, P*rows_x],
    row-sharded."""
    from ..ops.gram import chunk_plan
    P = mesh.shape[axis_name]
    nc, chunk = chunk_plan(n_labels, chunk)
    item_spec = PartitionSpec(axis_name, None)
    fn = shard_map(
        functools.partial(_counts_ring_rect_body, rows_y=rows_y,
                          rows_x=rows_x, n_chunks=nc, chunk=chunk,
                          n_devices=P, axis_name=axis_name),
        mesh=mesh,
        in_specs=(item_spec,) * 8,
        out_specs=PartitionSpec(axis_name, None))
    return fn(*(jnp.asarray(a) for a in y_items),
              *(jnp.asarray(a) for a in x_items))
