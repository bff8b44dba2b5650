"""Multi-device mesh tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from lr2rmats_tpu.align.chain import ChainParams
from lr2rmats_tpu.parallel.mesh import (allgather_candidates, make_mesh,
                                        sharded_align_step)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


def _mini_index(seed=3, M=1024):
    rng = np.random.default_rng(seed)
    h = np.sort(rng.integers(0, 2 ** 31, M).astype(np.uint32))
    pos = rng.integers(0, 10 ** 6, M).astype(np.int32)
    return h, pos


def test_sharded_align_step_runs(devices):
    mesh = make_mesh(n_dp=4, n_tp=2)
    h, pos = _mini_index()
    step = sharded_align_step(mesh)
    B, Q = 8, 16
    rng = np.random.default_rng(0)
    # half the read hashes hit the table
    read_hash = rng.choice(h, (B, Q)).astype(np.uint32)
    read_qpos = np.sort(rng.integers(0, 1000, (B, Q)).astype(np.int32), axis=1)
    scores = np.asarray(step(h, pos, read_hash, read_qpos))
    assert scores.shape == (B,)
    assert np.all(scores >= 15.0)  # at least one anchor => at least k


def test_sharded_matches_single_device(devices):
    """Index sharding over tp must not change the result."""
    h, pos = _mini_index(seed=9)
    B, Q = 4, 8
    rng = np.random.default_rng(1)
    read_hash = rng.choice(h, (B, Q)).astype(np.uint32)
    read_qpos = np.sort(rng.integers(0, 500, (B, Q)).astype(np.int32), axis=1)
    s1 = np.asarray(sharded_align_step(make_mesh(n_dp=1, n_tp=1,
                                                 devices=jax.devices()[:1]))(
        h, pos, read_hash, read_qpos))
    s2 = np.asarray(sharded_align_step(make_mesh(n_dp=2, n_tp=4))(
        h, pos, read_hash, read_qpos))
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_allgather_candidates(devices):
    mesh = make_mesh(n_dp=8, n_tp=1)
    gather = allgather_candidates(mesh)
    n, E = 16, 4
    es = np.arange(n * E, dtype=np.int32).reshape(n, E)
    ee = es + 10
    en = np.full(n, E, np.int32)
    tid = np.zeros(n, np.int32)
    ges, gee, gen_, gtid = gather(es, ee, en, tid)
    np.testing.assert_array_equal(np.asarray(ges), es)
    np.testing.assert_array_equal(np.asarray(gen_), en)


def test_chain_dp_sharded_matches(devices):
    """chain_anchors_batch with dp sharding over 8 devices == unsharded."""
    from lr2rmats_tpu.align.chain import ChainParams
    from lr2rmats_tpu.ops.chain_jax import chain_anchors_batch
    from tests.test_chain_jax import random_anchor_rows
    rng = np.random.default_rng(17)
    qp, rp, n = random_anchor_rows(rng, B=16, A=64)
    p = ChainParams()
    f1, p1 = chain_anchors_batch(qp, rp, n, p, shard=False)
    f2, p2 = chain_anchors_batch(qp, rp, n, p, shard=True)
    np.testing.assert_allclose(f1, f2, rtol=1e-6)
    np.testing.assert_array_equal(p1, p2)
