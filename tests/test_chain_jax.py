"""Batched JAX chaining must agree with the host DP."""

import numpy as np
import pytest

from lr2rmats_tpu.align.chain import ChainParams, backtrack, chain_anchors
from lr2rmats_tpu.ops.chain_jax import chain_anchors_batch


def random_anchor_rows(rng, B=8, A=128):
    qs, rs, ns = [], [], []
    for _ in range(B):
        n = int(rng.integers(5, A))
        # simulate 2-3 exon chains plus noise
        q = np.sort(rng.integers(0, 2000, n))
        r = q + 10_000
        intron_at = rng.integers(0, 2000, 2)
        for ia in intron_at:
            r = np.where(q > ia, r + int(rng.integers(50, 5000)), r)
        noise = rng.random(n) < 0.2
        r = np.where(noise, rng.integers(0, 60_000, n), r)
        order = np.lexsort((q, r))
        qs.append(q[order])
        rs.append(r[order])
        ns.append(n)
    qp = np.zeros((B, A), np.int64)
    rp = np.zeros((B, A), np.int64)
    for i, (q, r) in enumerate(zip(qs, rs)):
        qp[i, : len(q)] = q
        rp[i, : len(r)] = r
    return qp, rp, np.array(ns, np.int32)


def test_batch_matches_host():
    rng = np.random.default_rng(0)
    qp, rp, n = random_anchor_rows(rng)
    p = ChainParams()
    fb, pb = chain_anchors_batch(qp, rp, n, p)
    for i in range(len(n)):
        fh, ph = chain_anchors(qp[i, : n[i]], rp[i, : n[i]], p)
        np.testing.assert_allclose(fb[i, : n[i]], fh, rtol=1e-5)
        np.testing.assert_array_equal(pb[i, : n[i]], ph)


def test_batch_backtrack_consistency():
    rng = np.random.default_rng(1)
    qp, rp, n = random_anchor_rows(rng, B=4)
    p = ChainParams()
    fb, pb = chain_anchors_batch(qp, rp, n, p)
    for i in range(4):
        pri_b, ps_b, _, _ = backtrack(fb[i, : n[i]].astype(np.float64),
                                      pb[i, : n[i]].astype(np.int64), 0.0)
        fh, ph = chain_anchors(qp[i, : n[i]], rp[i, : n[i]], p)
        pri_h, ps_h, _, _ = backtrack(fh, ph, 0.0)
        assert ps_b == pytest.approx(ps_h, rel=1e-5)
        np.testing.assert_array_equal(pri_b, pri_h)


def test_fused_backtrack_matches_host():
    """chain_backtrack_batch_async (the production fused kernel) must
    reproduce align.chain.backtrack's primary/secondary selection exactly,
    including the 48-candidate disjointness cap semantics."""
    import jax
    from lr2rmats_tpu.align.chain import backtrack, chain_anchors
    from lr2rmats_tpu.ops.chain_jax import (chain_backtrack_batch_async,
                                            unpack_chain_result)
    p = ChainParams()
    rng = np.random.default_rng(19)
    bad = 0
    tot = 0
    for (B, A) in [(48, 64), (24, 256)]:
        q = np.zeros((B, A), np.int32)
        g = np.zeros((B, A), np.int32)
        n = np.zeros(B, np.int32)
        for b in range(B):
            na = int(rng.integers(4, A + 1))
            n[b] = na
            qq = np.sort(rng.integers(0, 2000, na))
            diag = rng.integers(0, 50000) + np.where(
                rng.random(na) < 0.3, rng.integers(0, 30000, na), 0)
            q[b, :na] = qq
            g[b, :na] = np.sort(qq + diag)
        flat = jax.device_get(chain_backtrack_batch_async(q, g, n, p, 20.0))
        mask, ps, ss = unpack_chain_result(flat, A, B)
        for b in range(B):
            na = n[b]
            tot += 1
            f, parent = chain_anchors(q[b, :na].astype(np.int64),
                                      g[b, :na].astype(np.int64), p)
            pri, hps, sec, hss = backtrack(f, parent, 20.0)
            dpri = np.nonzero(mask[b, :na] & 1)[0]
            dsec = np.nonzero(mask[b, :na] & 2)[0]
            ok = (np.array_equal(pri, dpri) and np.array_equal(sec, dsec)
                  and abs(hps - ps[b]) < 1e-3 and abs(hss - ss[b]) < 1e-3)
            if not ok:
                # f32-vs-f64 tie flips are legitimate; require score parity
                assert abs(hps - ps[b]) < 1e-3
                bad += 1
    # at most a couple of tie-level divergences over the whole set
    assert bad <= tot // 20


def test_fused_u16_qpos_boundary():
    """q positions ride the link as u16 pairs (pack_chain_buf); values up
    to 65535 must round-trip exactly through the fused kernel."""
    import jax
    from lr2rmats_tpu.align.chain import backtrack, chain_anchors
    from lr2rmats_tpu.ops.chain_jax import (chain_backtrack_batch_async,
                                            unpack_chain_result)
    p = ChainParams()
    rng = np.random.default_rng(7)
    B, A = 8, 64
    q = np.zeros((B, A), np.int32)
    g = np.zeros((B, A), np.int32)
    n = np.zeros(B, np.int32)
    for b in range(B):
        na = int(rng.integers(8, A + 1))
        n[b] = na
        qq = np.sort(rng.integers(60_000, 65_536, na)).astype(np.int32)
        q[b, :na] = qq
        g[b, :na] = np.sort(qq + int(rng.integers(0, 40_000)))
    flat = jax.device_get(chain_backtrack_batch_async(q, g, n, p, 10.0))
    mask, ps, ss = unpack_chain_result(flat, A, B)
    for b in range(B):
        na = n[b]
        f, parent = chain_anchors(q[b, :na].astype(np.int64),
                                  g[b, :na].astype(np.int64), p)
        pri, hps, _, _ = backtrack(f, parent, 10.0)
        np.testing.assert_array_equal(np.nonzero(mask[b, :na] & 1)[0], pri)
        assert abs(hps - ps[b]) < 1e-3


def test_big_qpos_rows_fall_back_to_host():
    """Rows whose query positions exceed u16 (>= 64 kb reads) must chain on
    the host and still produce records."""
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.fasta import Genome
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 300_000).astype(np.uint8)
    g = Genome(["c"], codes, np.array([0, len(codes)], np.int64))
    al = BatchAligner(g, backend="jax")
    read = codes[100_000: 180_000].copy()       # 80 kb contiguous read
    recs = al.align_batch(["big"], [read])
    prim = [r for r in recs if not (r.flag & 0x100)]
    assert prim and prim[0].pos <= 100_000 <= prim[0].pos + 1


def test_native_small_chain_matches_reference():
    """chain_small_batch_c (host path for <=8-anchor rows) must reproduce
    align.chain.chain_anchors + backtrack exactly."""
    from lr2rmats_tpu.native import get_lib
    lib = get_lib()
    if lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    p = ChainParams()
    rng = np.random.default_rng(12)
    m, cap = 300, 8
    qp = np.zeros((m, cap), np.int32)
    gp = np.zeros((m, cap), np.int32)
    nn = np.zeros(m, np.int32)
    for i in range(m):
        n = int(rng.integers(2, cap + 1))
        nn[i] = n
        q = np.sort(rng.integers(0, 3000, n))
        g = np.sort(q + rng.integers(0, 60000) +
                    np.where(rng.random(n) < 0.4,
                             rng.integers(0, 25000, n), 0))
        order = np.lexsort((q, g))
        qp[i, :n] = q[order]
        gp[i, :n] = g[order]
    mask = np.zeros((m, cap), np.uint8)
    ps = np.zeros(m, np.float32)
    ss = np.zeros(m, np.float32)
    lib.chain_small_batch_c(qp, gp, nn, m, cap, p.k, p.window,
                            p.max_intron, p.max_qgap, p.gap_open,
                            p.gap_scale, p.intron_scale, p.min_intron_gap,
                            20.0, mask.reshape(-1), ps, ss)
    for i in range(m):
        n = int(nn[i])
        f, parent = chain_anchors(qp[i, :n].astype(np.int64),
                                  gp[i, :n].astype(np.int64), p)
        pri, hps, sec, hss = backtrack(f, parent, 20.0)
        np.testing.assert_array_equal(np.nonzero(mask[i, :n] & 1)[0], pri)
        np.testing.assert_array_equal(np.nonzero(mask[i, :n] & 2)[0], sec)
        assert abs(float(ps[i]) - hps) < 1e-3
        assert abs(float(ss[i]) - hss) < 1e-3


def test_delta_packing_large_introns():
    """rT rides the link as u16 deltas; introns over 65 kb go through the
    exception slots (pack_chain_buf/_backtrack_core).  Rows mixing many
    small deltas with several >=2^16 deltas must still match the host DP
    bit-for-bit."""
    import jax
    from lr2rmats_tpu.ops.chain_jax import (EXC_ROWS,
                                            chain_backtrack_batch_async,
                                            count_delta_overflows,
                                            unpack_chain_result)
    rng = np.random.default_rng(17)
    B, A = 8, 64
    p = ChainParams()
    qp = np.zeros((B, A), np.int64)
    rp = np.zeros((B, A), np.int64)
    ns = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(10, A))
        q = np.sort(rng.integers(0, 3000, n))
        r = q.copy()
        # up to EXC_ROWS big introns (65 kb - 180 kb, < max_intron)
        for _ in range(int(rng.integers(1, EXC_ROWS + 1))):
            at = int(rng.integers(0, 3000))
            r = np.where(q > at, r + int(rng.integers(70_000, 180_000)), r)
        # plus small introns
        for _ in range(2):
            at = int(rng.integers(0, 3000))
            r = np.where(q > at, r + int(rng.integers(100, 5000)), r)
        order = np.lexsort((q, r))
        q, r = q[order], r[order]
        assert count_delta_overflows(r) <= EXC_ROWS
        qp[b, :n], rp[b, :n], ns[b] = q, r, n
    flat = jax.device_get(chain_backtrack_batch_async(
        qp.astype(np.int32), rp.astype(np.int32), ns, p, 20.0))
    mask, ps, ss = unpack_chain_result(flat, A, B)
    for b in range(B):
        n = int(ns[b])
        f, par = chain_anchors(qp[b, :n], rp[b, :n], p)
        pri, p_sc, sec, s_sc = backtrack(f, par, 20.0)
        got_pri = np.nonzero(mask[b, :n] & 1)[0]
        np.testing.assert_array_equal(got_pri, pri)
        if len(pri):
            np.testing.assert_allclose(ps[b], p_sc, rtol=1e-5)
        got_sec = np.nonzero(mask[b, :n] & 2)[0]
        np.testing.assert_array_equal(got_sec, sec)


def test_too_many_overflows_routes_to_host():
    """A cluster with more than EXC_ROWS oversized deltas must chain on
    the host (align.batch router) and still produce records."""
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.ops.chain_jax import EXC_ROWS, count_delta_overflows
    rng = np.random.default_rng(23)
    n = 4_000_000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    from lr2rmats_tpu.io.fasta import Genome
    genome = Genome(["c"], codes, np.array([0, n], np.int64))
    # one gene with EXC_ROWS+2 introns of ~80 kb each
    pos = 1000
    parts = []
    for e in range(EXC_ROWS + 3):
        parts.append((pos, pos + 300))
        pos += 300
        if e < EXC_ROWS + 2:
            codes[pos], codes[pos + 1] = 2, 3
            pos += 80_000
            codes[pos - 2], codes[pos - 1] = 0, 2
    read = np.concatenate([codes[a:b] for a, b in parts]).copy()
    al = BatchAligner(genome)
    recs = al.align_batch(["r0"], [read])
    prim = [r for r in recs if not (r.flag & 0x100)]
    assert len(prim) == 1
    # the exon chain must span all planted exons
    from lr2rmats_tpu.transcript.exon_chain import gen_exons
    es, ee, _ = gen_exons(prim[0], 3, 3, 50)
    assert len(es) == len(parts)
