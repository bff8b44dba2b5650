"""Pallas TPU kernel for the splice-aware chaining DP.

Layout: TRANSPOSED relative to the scan kernel — the anchor axis lives on
sublanes and reads live on lanes ([W+A, R] blocks, R=128 lanes), because the
Mosaic toolchain only supports dynamic slicing on the sublane dimension.
Each grid program walks its 128 reads' anchors once; the W-predecessor
window is a [W, R] vector op on the VPU, and the running scores stay in a
VMEM scratch with W dead rows of -inf at the top so the window slice is
always in-bounds.

Agrees with ops.chain_jax / align.chain (tests/test_pallas.py runs it in
interpreter mode on CPU; it compiles and runs on the real chip at parity
with the lax.scan kernel, selectable via BatchAligner(backend="pallas")).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..align.chain import ChainParams

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANE_BLOCK = 128  # reads per grid program (lane dimension)

_LOG2E = 1.4426950408889634


def _kernel(qpos_ref, rpos_ref, n_ref, f_out_ref, parent_ref, f_ref, *, W, k,
            max_qgap, max_intron, gap_open, gap_scale, intron_scale,
            min_intron_gap):
    AW, R = qpos_ref.shape          # AW = W + A (top-padded)
    A = AW - W
    neg = jnp.float32(-1e18)

    n_anchor = n_ref[0, :]          # [R] int32
    f_ref[: W, :] = jnp.full((W, R), neg)
    f_ref[W:, :] = jnp.full((A, R), jnp.float32(k))

    def body(i, _):
        # predecessors j = i-W .. i-1 live at padded rows i .. i+W-1
        fw = f_ref[pl.ds(i, W), :]              # [W, R]
        qw = qpos_ref[pl.ds(i, W), :]
        rw = rpos_ref[pl.ds(i, W), :]
        qi = qpos_ref[pl.ds(i + W, 1), :]       # [1, R]
        ri = rpos_ref[pl.ds(i + W, 1), :]
        widx = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
        jreal = i - W + widx
        valid_j = (jreal >= 0) & (jreal < n_anchor[None, :])
        dq = qi - qw
        dr = ri - rw
        ok = valid_j & (dq > 0) & (dr > 0) & (dq <= max_qgap) & (dr <= max_intron)
        gain = jnp.minimum(jnp.minimum(dq, dr), k).astype(jnp.float32)
        dd = dr - dq
        add = jnp.abs(dd).astype(jnp.float32)
        lin = jnp.float32(gap_open) + jnp.float32(gap_scale) * add
        # log2 via ln(x)*log2(e): Mosaic-safe.  CAVEAT: this can differ
        # from the scan kernel's jnp.log2 by 1 ulp (e.g. exact powers of
        # two), which could flip an exact score tie — the twins' parity
        # is checked by tests/test_pallas.py and scripts/device_parity.py,
        # and this backend is non-default (backend="pallas").
        logc = jnp.float32(gap_open) + jnp.float32(intron_scale) * (
            jnp.log(add + 1.0) * jnp.float32(_LOG2E))
        cost = jnp.where(dd > min_intron_gap, jnp.minimum(logc, lin), lin)
        cost = jnp.where(dd == 0, jnp.float32(0.0), cost)
        sc = jnp.where(ok, fw + gain - cost, neg)   # [W, R]
        best_sc = jnp.max(sc, axis=0)               # [R]
        # first-occurrence argmax: compiled Mosaic argmax breaks exact
        # score ties by LAST index (DEVICE_PARITY 2026-08-18 showed 332
        # tie-only parent flips vs the scan kernel); take the smallest
        # window slot whose score equals the max, like XLA/host do.
        best_w = jnp.min(jnp.where(sc >= best_sc[None, :], widx, W),
                         axis=0)                    # [R]
        cur = f_ref[pl.ds(i + W, 1), :][0, :]
        anchor_valid = i < n_anchor
        take = anchor_valid & (best_sc > cur)
        new_f = jnp.where(take, best_sc, cur)
        new_parent = jnp.where(take, i - W + best_w, -1)
        f_ref[pl.ds(i + W, 1), :] = new_f[None, :]
        parent_ref[pl.ds(i, 1), :] = new_parent[None, :]
        return 0

    jax.lax.fori_loop(0, A, body, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (A, R), 0)
    f_out_ref[:] = jnp.where(row < n_anchor[None, :], f_ref[W:, :], neg)


@functools.partial(jax.jit, static_argnames=(
    "W", "k", "max_qgap", "max_intron", "gap_open", "gap_scale",
    "intron_scale", "min_intron_gap", "interpret", "lane_block"))
def _chain_pallas(qpos_pad, rpos_pad, n_anchor, W: int, k: int,
                  max_qgap: int, max_intron: int, gap_open: float,
                  gap_scale: float, intron_scale: float,
                  min_intron_gap: int, interpret: bool = False,
                  lane_block: int = LANE_BLOCK):
    AW, B = qpos_pad.shape
    A = AW - W
    grid = (B // lane_block,)
    kern = functools.partial(
        _kernel, W=W, k=k, max_qgap=max_qgap, max_intron=max_intron,
        gap_open=gap_open, gap_scale=gap_scale, intron_scale=intron_scale,
        min_intron_gap=min_intron_gap)
    f, parent = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((AW, lane_block), lambda i: (0, i)),
            pl.BlockSpec((AW, lane_block), lambda i: (0, i)),
            pl.BlockSpec((1, lane_block), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((A, lane_block), lambda i: (0, i)),
            pl.BlockSpec((A, lane_block), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((A, B), jnp.float32),
            jax.ShapeDtypeStruct((A, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((AW, lane_block), jnp.float32)],
        interpret=interpret,
    )(qpos_pad, rpos_pad, n_anchor.reshape(1, -1))
    return f, parent


def chain_anchors_batch_pallas(qpos: np.ndarray, rpos: np.ndarray,
                               n_anchor: np.ndarray, p: ChainParams,
                               interpret: bool = False,
                               lane_block: int = 0
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Pallas chaining; same contract as ops.chain_jax.chain_anchors_batch.

    lane_block = reads per grid program (0 = the LANE_BLOCK default).
    Wider blocks would amortize the sequential anchor loop's per-step
    overhead over more lanes, but this rig's Mosaic toolchain rejects the
    windowed dynamic-slice loads beyond one 128-lane group (vector.load
    [W, 256+] fails to compile; docs/PALLAS_CHAIN.md) — the knob exists
    for direct-attached silicon where the compile can be iterated."""
    B, A = qpos.shape
    W = p.window
    if lane_block == 0:
        lane_block = LANE_BLOCK
    Bp = -(-B // lane_block) * lane_block
    qp = np.full((W + A, Bp), -1, np.int32)
    rp = np.full((W + A, Bp), -1, np.int32)
    qp[W:, :B] = qpos.T
    rp[W:, :B] = rpos.T
    nn = np.zeros(Bp, np.int32)
    nn[:B] = n_anchor
    f, parent = _chain_pallas(
        jnp.asarray(qp), jnp.asarray(rp), jnp.asarray(nn), W, p.k,
        int(p.max_qgap), int(p.max_intron), float(p.gap_open),
        float(p.gap_scale), float(p.intron_scale), int(p.min_intron_gap),
        interpret=interpret, lane_block=lane_block)
    return np.asarray(f).T[:B], np.asarray(parent).T[:B]
