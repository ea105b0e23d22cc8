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
           "shard_batch"]


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


def _counts_body(lgids, labels, weights, valid, rows, n_labels,
                 n_devices, axis_name):
    lgids = lgids[0]
    labels = labels[0]
    weights = weights[0]
    valid = valid[0]
    seg = jnp.where(valid, lgids * n_labels + labels, rows * n_labels)
    counts = jax.ops.segment_sum(
        jnp.where(valid, weights, 0.0), seg,
        num_segments=rows * n_labels + 1)[:-1]
    phi = counts.reshape(rows, n_labels).astype(jnp.float32)
    return _ring_body(phi, n_devices, axis_name)


def sharded_counts_gram(mesh, lgids, labels, weights, valid, rows, n_labels,
                        axis_name="g"):
    """Distributed histogram Gram from per-device COO slices
    (outputs of :func:`shard_batch`).

    Returns the [P*rows, P*rows] Gram (rows beyond ``n_graphs`` are zero).
    """
    P = mesh.shape[axis_name]
    item_spec = PartitionSpec(axis_name, None)
    fn = shard_map(
        functools.partial(_counts_body, rows=rows, n_labels=int(n_labels),
                          n_devices=P, axis_name=axis_name),
        mesh=mesh,
        in_specs=(item_spec, item_spec, item_spec, item_spec),
        out_specs=PartitionSpec(axis_name, None))
    return fn(jnp.asarray(lgids), jnp.asarray(labels),
              jnp.asarray(weights), jnp.asarray(valid))
