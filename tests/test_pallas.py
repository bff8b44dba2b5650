"""Pallas chain kernel (interpreter mode on CPU) must agree with the host DP."""

import numpy as np
import pytest

from lr2rmats_tpu.align.chain import ChainParams, chain_anchors
from lr2rmats_tpu.ops.chain_pallas import HAVE_PALLAS, chain_anchors_batch_pallas
from tests.test_chain_jax import random_anchor_rows

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")


def test_pallas_matches_host():
    rng = np.random.default_rng(2)
    qp, rp, n = random_anchor_rows(rng, B=8, A=128)
    p = ChainParams()
    fb, pb = chain_anchors_batch_pallas(qp.astype(np.int32),
                                        rp.astype(np.int32), n, p,
                                        interpret=True)
    for i in range(len(n)):
        fh, ph = chain_anchors(qp[i, : n[i]], rp[i, : n[i]], p)
        np.testing.assert_allclose(fb[i, : n[i]], fh, rtol=1e-4)
        np.testing.assert_array_equal(pb[i, : n[i]], ph)


def test_pallas_row_padding():
    rng = np.random.default_rng(4)
    qp, rp, n = random_anchor_rows(rng, B=5, A=64)  # not a multiple of 8
    p = ChainParams()
    fb, pb = chain_anchors_batch_pallas(qp.astype(np.int32),
                                        rp.astype(np.int32), n, p,
                                        interpret=True)
    assert fb.shape == (5, 64)
    for i in range(5):
        fh, ph = chain_anchors(qp[i, : n[i]], rp[i, : n[i]], p)
        np.testing.assert_allclose(fb[i, : n[i]], fh, rtol=1e-4)
