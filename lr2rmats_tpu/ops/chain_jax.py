"""Batched splice-aware chaining DP in JAX (TPU path).

Same recurrence as the host implementation (align.chain.chain_anchors) but
over a padded batch [B, A] of anchors, scanning anchor index with the
predecessor window vectorized — XLA maps the [B, W] inner work onto the VPU.
Agreement with the host version is tested in tests/test_chain_jax.py.

Layout:
  qpos, rpos : int32 [B, A]   anchors sorted by (rpos, qpos) per row
  n_anchor   : int32 [B]      valid count per row (rest is padding)

Returns f [B, A] float32 scores and parent [B, A] int32 (-1 = chain start).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..align.chain import ChainParams


@functools.partial(jax.jit, static_argnames=("window", "k"))
def _chain_scan(qpos, rpos, n_anchor, window: int, k: int,
                max_qgap, max_intron, gap_open, gap_scale, intron_scale,
                min_intron_gap):
    B, A = qpos.shape
    W = window
    q = qpos.astype(jnp.int32)
    r = rpos.astype(jnp.int32)
    neg = jnp.float32(-1e18)

    # ring buffers of the last W scores and their (q, r)
    init_f = jnp.full((B, A), jnp.float32(k))
    arange_w = jnp.arange(W, dtype=jnp.int32)

    def body(carry, i):
        f = carry
        # predecessor window indices: i-W .. i-1
        jidx = i - W + arange_w                      # [W]
        valid_j = (jidx >= 0) & (jidx < n_anchor[:, None])  # [B, W]
        jc = jnp.clip(jidx, 0, A - 1)
        fj = f[:, jc]                                # [B, W]
        qj = q[:, jc]
        rj = r[:, jc]
        qi = q[:, i][:, None]
        ri = r[:, i][:, None]
        dq = qi - qj
        dr = ri - rj
        ok = valid_j & (dq > 0) & (dr > 0) & (dq <= max_qgap) & (dr <= max_intron)
        gain = jnp.minimum(jnp.minimum(dq, dr), k).astype(jnp.float32)
        dd = dr - dq
        add = jnp.abs(dd).astype(jnp.float32)
        lin = gap_open + gap_scale * add
        logc = gap_open + intron_scale * jnp.log2(add + 1.0)
        cost = jnp.where(dd > min_intron_gap, jnp.minimum(logc, lin), lin)
        cost = jnp.where(dd == 0, 0.0, cost)
        sc = jnp.where(ok, fj + gain - cost, neg)    # [B, W]
        best_w = jnp.argmax(sc, axis=1)              # [B]
        best_sc = jnp.take_along_axis(sc, best_w[:, None], axis=1)[:, 0]
        anchor_valid = i < n_anchor
        take = anchor_valid & (best_sc > f[:, i])
        new_fi = jnp.where(take, best_sc, f[:, i])
        parent_i = jnp.where(take, i - W + best_w, -1)
        f = f.at[:, i].set(new_fi)
        return f, parent_i

    f, parents = jax.lax.scan(body, init_f, jnp.arange(A, dtype=jnp.int32))
    parent = parents.T                                # [B, A]
    # mask padding rows/cols
    col = jnp.arange(A)[None, :]
    pad = col >= n_anchor[:, None]
    f = jnp.where(pad, neg, f)
    parent = jnp.where(pad, -1, parent)
    return f, parent


def chain_anchors_batch_async(qpos: np.ndarray, rpos: np.ndarray,
                              n_anchor: np.ndarray, p: ChainParams,
                              shard: bool = True):
    """Dispatch the chain DP without blocking; returns device arrays."""
    q = jnp.asarray(qpos, jnp.int32)
    r = jnp.asarray(rpos, jnp.int32)
    n = jnp.asarray(n_anchor, jnp.int32)
    if shard:
        devs = jax.devices()
        B = qpos.shape[0]
        if len(devs) > 1 and B % len(devs) == 0 and B >= 2 * len(devs):
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            mesh = Mesh(np.array(devs), ("dp",))
            s2 = NamedSharding(mesh, P("dp", None))
            s1 = NamedSharding(mesh, P("dp"))
            q = jax.device_put(q, s2)
            r = jax.device_put(r, s2)
            n = jax.device_put(n, s1)
    return _chain_scan(
        q, r, n, p.window, p.k,
        jnp.int32(p.max_qgap), jnp.int32(p.max_intron),
        jnp.float32(p.gap_open), jnp.float32(p.gap_scale),
        jnp.float32(p.intron_scale), jnp.int32(p.min_intron_gap))


def chain_anchors_batch(qpos: np.ndarray, rpos: np.ndarray,
                        n_anchor: np.ndarray, p: ChainParams,
                        shard: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Batched chaining; returns (f [B,A] float32, parent [B,A] int32).

    With several local devices and a divisible batch, rows are placed with a
    dp NamedSharding so XLA runs the batch data-parallel across chips.
    """
    q = jnp.asarray(qpos, jnp.int32)
    r = jnp.asarray(rpos, jnp.int32)
    n = jnp.asarray(n_anchor, jnp.int32)
    if shard:
        devs = jax.devices()
        B = qpos.shape[0]
        if len(devs) > 1 and B % len(devs) == 0 and B >= 2 * len(devs):
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            mesh = Mesh(np.array(devs), ("dp",))
            s2 = NamedSharding(mesh, P("dp", None))
            s1 = NamedSharding(mesh, P("dp"))
            q = jax.device_put(q, s2)
            r = jax.device_put(r, s2)
            n = jax.device_put(n, s1)
    f, parent = _chain_scan(
        q, r, n, p.window, p.k,
        jnp.int32(p.max_qgap), jnp.int32(p.max_intron),
        jnp.float32(p.gap_open), jnp.float32(p.gap_scale),
        jnp.float32(p.intron_scale), jnp.int32(p.min_intron_gap))
    return np.asarray(f), np.asarray(parent)
