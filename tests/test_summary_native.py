"""Native detail formatter (csrc format_detail_c) must be byte-identical
to the python write_bam_detail path."""

import io

import numpy as np
import pytest

from lr2rmats_tpu.io.gtf import ChrNames
from lr2rmats_tpu.native import get_lib
from lr2rmats_tpu.report.summary import (_write_bam_detail_native,
                                         write_bam_detail)
from lr2rmats_tpu.transcript.model import Transcripts


def random_T(n=200, seed=5):
    rng = np.random.default_rng(seed)
    T = Transcripts()
    for i in range(n):
        en = int(rng.integers(1, 7))
        starts = np.sort(rng.integers(1, 10 ** 6, en)).astype(np.int64)
        ends = starts + rng.integers(50, 500, en)
        T.append(int(rng.integers(0, 3)), bool(rng.integers(0, 2)),
                 starts, ends,
                 gene_id=f"G{i}", gene_name=f"GN{i}",
                 trans_id=f"T{i}", trans_name=f"read/{i}/x",
                 init_novel=bool(rng.integers(0, 2)))
        T.flags["known"][T.n - 1] = bool(rng.integers(0, 2))
        T.flags["has_known_site"][T.n - 1] = bool(rng.integers(0, 2))
        T.novel_exon_flag[T.n - 1, :en] = rng.integers(0, 2, en)
        if en > 1:
            T.novel_site_flag[T.n - 1, : 2 * (en - 1)] = \
                rng.integers(0, 2, 2 * (en - 1))
            T.novel_junction_flag[T.n - 1, : en - 1] = \
                rng.integers(0, 2, en - 1)
            T.unreliable_junction_flag[T.n - 1, : en - 1] = \
                rng.integers(0, 2, en - 1)
    return T


def test_native_detail_byte_identical():
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    T = random_T()
    cname = ChrNames(["chr1", "chr2", "chrX"])
    py = io.StringIO()
    write_bam_detail(T, cname, py)        # n <= 2000 -> python path
    nat = io.StringIO()
    nat.write(py.getvalue().split("\n", 1)[0] + "\n")  # same header
    assert _write_bam_detail_native(T, cname, nat)
    assert nat.getvalue() == py.getvalue()


def test_native_detail_nonascii_falls_back():
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    T = random_T(5)
    T.gene_name[0] = "gène"
    cname = ChrNames(["chr1", "chr2", "chrX"])
    assert not _write_bam_detail_native(T, cname, io.StringIO())
