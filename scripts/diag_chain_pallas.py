"""Diagnose the chain_pallas vs scan-kernel mismatch on the real chip.

DEVICE_PARITY (2026-08-18) captured matches_scan_kernel=false for the
compiled Mosaic kernel while interpret-mode parity is green — this script
quantifies it: how many f entries differ (and by how much), how many
parents differ, and whether forcing the linear-only cost path (no log)
removes the mismatch, which pins the cause on transcendental lowering.

    timeout 420 python scripts/diag_chain_pallas.py
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main():
    import jax
    from lr2rmats_tpu.align.chain import ChainParams
    from lr2rmats_tpu.ops.chain_jax import chain_anchors_batch
    from lr2rmats_tpu.ops.chain_pallas import chain_anchors_batch_pallas
    from test_chain_jax import random_anchor_rows

    platform = jax.devices()[0].platform
    interpret = platform == "cpu"
    print("platform:", platform, "interpret:", interpret, flush=True)
    rng = np.random.default_rng(41)
    B, A = 256, 128
    qp, rp, n = random_anchor_rows(rng, B=B, A=A)
    p = ChainParams()

    fp, pp = chain_anchors_batch_pallas(
        qp.astype(np.int32), rp.astype(np.int32), n, p,
        interpret=interpret)
    fs, ps = chain_anchors_batch(qp, rp, n, p)
    fp, pp = fp[: len(n)], pp[: len(n)]
    fs, ps = np.asarray(fs), np.asarray(ps)

    valid = np.arange(A)[None, :] < n[:, None]
    df = np.where(valid, np.abs(fp - fs), 0.0)
    pd = valid & (pp != ps)
    nf = int((df > 1e-5 * np.maximum(1.0, np.abs(fs))).sum())
    print(f"f mismatches (rtol 1e-5): {nf} / {int(valid.sum())} "
          f"max |df| = {df.max():.6g}")
    print(f"parent mismatches: {int(pd.sum())}")
    if pd.any():
        bs, ais = np.nonzero(pd)
        for b, a in list(zip(bs, ais))[:8]:
            print(f"  row {b} anchor {a}: pallas parent={pp[b, a]} "
                  f"f={fp[b, a]:.6f} | scan parent={ps[b, a]} "
                  f"f={fs[b, a]:.6f}")
            j_p, j_s = pp[b, a], ps[b, a]
            for tag, j in (("pallas", j_p), ("scan", j_s)):
                if j >= 0:
                    dq = int(qp[b, a] - qp[b, j])
                    dr = int(rp[b, a] - rp[b, j])
                    print(f"    {tag} pred {j}: dq={dq} dr={dr} "
                          f"dd={dr - dq}")

    # linear-only arm: intron_scale irrelevant when min_intron_gap is huge
    p2 = ChainParams(min_intron_gap=1 << 30)
    fp2, pp2 = chain_anchors_batch_pallas(
        qp.astype(np.int32), rp.astype(np.int32), n, p2,
        interpret=interpret)
    fs2, ps2 = chain_anchors_batch(qp, rp, n, p2)
    fp2, pp2 = fp2[: len(n)], pp2[: len(n)]
    same = (np.allclose(np.where(valid, fp2, 0),
                        np.where(valid, np.asarray(fs2), 0), rtol=1e-5)
            and np.array_equal(np.where(valid, pp2, -1),
                               np.where(valid, np.asarray(ps2), -1)))
    print(f"linear-only cost path parity: {same}")


def log_probe():
    """Bitwise comparison of the three log paths on this backend:
    XLA jnp.log2(x), XLA jnp.log(x)*LOG2E, Mosaic jnp.log(x)*LOG2E."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    platform = jax.devices()[0].platform
    interpret = platform == "cpu"
    _LOG2E = 1.4426950408889634

    # every dd the DP can see: 1..200001 integer-valued f32 (sampled)
    vals = np.concatenate([
        np.arange(1, 32768, dtype=np.float32),
        np.arange(32768, 200002, 37, dtype=np.float32)])
    S = -(-len(vals) // 128)
    x = np.zeros((S, 128), np.float32)
    x.reshape(-1)[: len(vals)] = vals + 1.0

    def kern(x_ref, o_ref):
        o_ref[:] = jnp.log(x_ref[:]) * jnp.float32(_LOG2E)

    y_mosaic = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        interpret=interpret)(jnp.asarray(x))
    y_mosaic = np.asarray(y_mosaic).reshape(-1)[: len(vals)]
    y_log2 = np.asarray(jax.jit(jnp.log2)(jnp.asarray(x))
                        ).reshape(-1)[: len(vals)]
    y_logm = np.asarray(jax.jit(
        lambda v: jnp.log(v) * jnp.float32(_LOG2E))(jnp.asarray(x))
        ).reshape(-1)[: len(vals)]
    np_log2 = np.log2((vals + 1.0).astype(np.float32)).astype(np.float32)

    def cmp(tag, a, b):
        neq = a != b
        md = np.abs(a - b).max()
        print(f"  {tag}: {int(neq.sum())}/{len(a)} differ, max|d|={md:.3g}")

    print("log probe:")
    cmp("xla log2        vs xla log*L2E ", y_log2, y_logm)
    cmp("mosaic log*L2E  vs xla log*L2E ", y_mosaic, y_logm)
    cmp("mosaic log*L2E  vs xla log2    ", y_mosaic, y_log2)
    cmp("numpy  log2(f32)vs xla log2    ", np_log2, y_log2)


if __name__ == "__main__":
    main()
    log_probe()
