"""Differential test oracle: the reference C classifier, compiled verbatim.

Builds two shared libraries from the read-only reference checkout
(/root/reference/src — compiled in place, never copied into this repo):

  liboracle.so        reference-exact semantics
  liboracle_fixed.so  identical except the two documented-deviation fixes
                      (acceptor-site matching at update_gtf.c:746 and the
                      uninitialized split-fragment header in split_trans)
                      — i.e. the corrected semantics this repo ships by
                      default (see ARCHITECTURE.md §5).

Both are linked against the stub htslib header + shim accessors in
tests/oracle_stub/, so the Python side never mirrors C struct layouts.

If the reference checkout or a C compiler is unavailable, ``get_oracle``
returns None and the oracle tests skip.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

REF_SRC = Path(os.environ.get("LR2RMATS_REF_SRC", "/root/reference/src"))
STUB_DIR = Path(__file__).resolve().parent / "oracle_stub"
BUILD_DIR = Path(__file__).resolve().parents[1] / "build" / "oracle"

# The "fixed" oracle variant applies exactly the two documented-deviation
# patches (ARCHITECTURE.md §5); everything else is byte-identical
# reference source.
#
# (1) The reference's acceptor-site matching loop (update_gtf.c:744-750)
# compares annotation acceptors against bam exon[j].start for
# j in 0..exon_n-2 — the transcript start plus the acceptors of all but
# the LAST junction.
_BUG_LINE = "if (abs(anno_t.exon[i+1].start - bam_t->exon[j].start) <= dis) {"
_FIX_LINE = "if (abs(anno_t.exon[i+1].start - bam_t->exon[j+1].start) <= dis) {"
# (2) split_trans (update_gtf.c:837-913) never fills the fragment's
# transcript-level header — tid/start/end/is_rev stay calloc-zero — so the
# reference prints fragment transcript lines as "chr<of tid0> 0 0 +" and,
# worse, every fragment in updated_T becomes a permanent merge barrier
# (merge_trans's backward scan sees end=0 and early-exits).  The fix adds
# the same set_trans_name(t, NULL x4) call the normal ingest paths use.
_SPLIT_LINE = 'sprintf(t->trans_id, "%s.split.%d", bam_t->trans_id, trans_i);'
_SPLIT_FIX = ('set_trans_name(t, NULL, NULL, NULL, NULL); '
              'sprintf(t->trans_id, "%s.split.%d", bam_t->trans_id, trans_i);')

_SOURCES = ["update_gtf.c", "gtf.c", "utils.c", "parse_bam.c", "bam2gtf.c",
            "bam_fusion.c", "unique_gtf.c", "bam_filter.c", "kstring.c"]
_HEADERS = ["gtf.h", "update_gtf.h", "utils.h", "parse_bam.h", "bam2gtf.h",
            "bam_fusion.h", "unique_gtf.h", "bam_filter.h", "kseq.h", "kstring.h"]

STATE_FIELDS = ["full", "lfull", "lnoth", "rfull", "rnoth", "known",
                "has_known_site", "has_unreliable_junction", "partial_read"]


def _build_key() -> str:
    h = hashlib.sha256()
    for src in _SOURCES + _HEADERS:
        h.update((REF_SRC / src).read_bytes())
    h.update((STUB_DIR / "shim.c").read_bytes())
    h.update((STUB_DIR / "htslib" / "sam.h").read_bytes())
    return h.hexdigest()[:16]


def _compile(out: Path, update_gtf_src: Path) -> None:
    cmd = [
        "gcc", "-shared", "-fPIC", "-O1", "-g", "-w",
        "-I", str(STUB_DIR), "-I", str(STUB_DIR / "htslib"),
        "-I", str(REF_SRC),
        str(update_gtf_src),
        *[str(REF_SRC / s) for s in _SOURCES[1:]],
        str(STUB_DIR / "shim.c"),
        "-o", str(out), "-lz", "-lm", "-Wl,--no-undefined",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _build() -> Tuple[Path, Path]:
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    key = _build_key()
    exact = BUILD_DIR / f"liboracle-{key}.so"
    fixed = BUILD_DIR / f"liboracle_fixed-{key}.so"
    if not exact.exists():
        _compile(exact, REF_SRC / "update_gtf.c")
    if not fixed.exists():
        text = (REF_SRC / "update_gtf.c").read_text()
        assert text.count(_BUG_LINE.strip()) == 1, \
            "update_gtf.c acceptor loop changed; re-audit the patch"
        assert text.count(_SPLIT_LINE) == 2, \
            "update_gtf.c split_trans changed; re-audit the patch"
        patched = BUILD_DIR / f"update_gtf_fixed-{key}.c"
        patched.write_text(text
                           .replace(_BUG_LINE.strip(), _FIX_LINE.strip())
                           .replace(_SPLIT_LINE, _SPLIT_FIX))
        _compile(fixed, patched)
    return exact, fixed


class Trans:
    """Handle to an oracle-side trans_t."""

    def __init__(self, oracle: "Oracle", ptr, anno: bool):
        self._o = oracle
        self.ptr = ptr
        self._anno = anno

    def free(self) -> None:
        if self.ptr:
            (self._o.lib.o_free_anno_trans if self._anno
             else self._o.lib.o_free_trans)(self.ptr)
            self.ptr = None

    # --- introspection ---
    @property
    def exon_n(self) -> int:
        return self._o.lib.o_exon_n(self.ptr)

    def exons(self) -> Tuple[np.ndarray, np.ndarray]:
        n = self.exon_n
        s = np.zeros(n, np.int32)
        e = np.zeros(n, np.int32)
        self._o.lib.o_get_exons(self.ptr, _p(s), _p(e))
        return s, e

    def state(self) -> dict:
        out = np.zeros(9, np.int32)
        self._o.lib.o_get_state(self.ptr, _p(out))
        return dict(zip(STATE_FIELDS, out.tolist()))

    def novel(self) -> dict:
        n = self.exon_n
        ex = np.zeros(max(n, 1), np.uint8)
        site = np.zeros(max((n - 1) * 2, 1), np.uint8)
        junc = np.zeros(max(n - 1, 1), np.uint8)
        unrel = np.zeros(max(n - 1, 1), np.uint8)
        self._o.lib.o_get_novel(self.ptr, _p(ex), _p(site), _p(junc), _p(unrel))
        return dict(exon=ex[:n], site=site[: (n - 1) * 2],
                    junction=junc[: n - 1], unreliable=unrel[: n - 1])

    def set_novel(self, exon=None, site=None, junction=None, unreliable=None):
        def c(a):
            return _p(np.ascontiguousarray(a, np.uint8)) if a is not None else None
        self._o.lib.o_set_novel(self.ptr, c(exon), c(site), c(junction),
                                c(unreliable))

    @property
    def tid(self) -> int:
        return self._o.lib.o_tid(self.ptr)

    @property
    def start(self) -> int:
        return self._o.lib.o_start(self.ptr)

    @property
    def end(self) -> int:
        return self._o.lib.o_end(self.ptr)

    @property
    def is_rev(self) -> int:
        return self._o.lib.o_is_rev(self.ptr)

    @property
    def cov(self) -> int:
        return self._o.lib.o_cov(self.ptr)

    @property
    def gene_id(self) -> str:
        return self._o.lib.o_gene_id(self.ptr).decode()

    @property
    def gene_name(self) -> str:
        return self._o.lib.o_gene_name(self.ptr).decode()

    @property
    def trans_id(self) -> str:
        return self._o.lib.o_trans_id(self.ptr).decode()


class TransSet:
    """Handle to an oracle-side read_trans_t."""

    def __init__(self, oracle: "Oracle", anno: bool = False):
        self._o = oracle
        self._anno = anno
        self.ptr = oracle.lib.o_rt_new()

    def add(self, t: Trans) -> None:
        (self._o.lib.o_rt_add_anno if self._anno
         else self._o.lib.o_rt_add)(self.ptr, t.ptr)

    @property
    def n(self) -> int:
        return self._o.lib.o_rt_n(self.ptr)

    def __getitem__(self, i: int) -> Trans:
        # borrowed reference: do not free
        t = Trans(self._o, self._o.lib.o_rt_get(self.ptr, i), anno=self._anno)
        t.free = lambda: None  # type: ignore[method-assign]
        return t

    def free(self) -> None:
        if self.ptr:
            (self._o.lib.o_rt_free_anno if self._anno
             else self._o.lib.o_rt_free)(self.ptr)
            self.ptr = None


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class Oracle:
    """ctypes facade over one oracle shared library."""

    def __init__(self, path: Path):
        lib = ctypes.CDLL(str(path), mode=ctypes.RTLD_LOCAL | os.RTLD_LAZY)
        v, i, d = ctypes.c_void_p, ctypes.c_int32, ctypes.c_double
        sig = {
            "o_mk_read_trans": ([i, i, v, v, i, ctypes.c_char_p], v),
            "o_mk_anno_trans": ([i, i, v, v, i, ctypes.c_char_p,
                                 ctypes.c_char_p], v),
            "o_free_trans": ([v], None),
            "o_free_anno_trans": ([v], None),
            "o_rt_new": ([], v),
            "o_rt_add": ([v, v], None),
            "o_rt_add_anno": ([v, v], None),
            "o_rt_n": ([v], i),
            "o_rt_get": ([v, i], v),
            "o_rt_free": ([v], None),
            "o_rt_free_anno": ([v], None),
            "o_exon_n": ([v], i),
            "o_tid": ([v], i),
            "o_start": ([v], i),
            "o_end": ([v], i),
            "o_is_rev": ([v], i),
            "o_cov": ([v], i),
            "o_gene_id": ([v], ctypes.c_char_p),
            "o_gene_name": ([v], ctypes.c_char_p),
            "o_trans_id": ([v], ctypes.c_char_p),
            "o_get_exons": ([v, v, v], None),
            "o_get_state": ([v, v], None),
            "o_get_novel": ([v, v, v, v, v], None),
            "o_set_novel": ([v, v, v, v, v], None),
            "o_mk_sj": ([i, v, v, v, v, v], v),
            "o_free_sj": ([v], None),
            "o_mk_ugp": ([i, i, i, i, i, i, i, d], v),
            "o_free_ugp": ([v], None),
            "o_check_iden": ([v, v, i, i], i),
            "o_check_splice_site": ([v, v, i], i),
            "o_check_full": ([v, v, i], None),
            "o_set_full": ([v, i], None),
            "o_check_with_anno_trans": ([v, v, v, v], None),
            "o_check_with_short_sj": ([v, v, i, v, v], i),
            "o_merge_trans": ([v, v, i, i, i, d], i),
            "o_split_trans": ([v], v),
            "o_check_trans": ([v, v, v, i, v, v, v, v, v], None),
            "o_mk_bam": ([i, i, i, v, i, ctypes.c_char_p, i, i, i, i], v),
            "o_gtf_filter": ([v, v, d, d, v, v], i),
            "o_free_bam": ([v], None),
            "o_gen_trans": ([v, i, i, i], v),
            "o_intr_deri_str": ([v, i, i, i, i, v], i),
            "o_gen_sj": ([i, i, i, v, i, v, i, v, v, v, v, v, v], i),
            "o_sj_update_group": ([v, v, v, v, v, v, v, i,
                                   v, v, v, v, v, v, v], i),
            "o_check_fusion": ([v, v, v, v, v, v, v, v, i, i, d, d, d, i], i),
            "o_check_with_exist1": ([i, i, i, i, i, i, i, i, i, i, d, i], i),
            "o_read_sj_file": ([ctypes.c_char_p, v, i, v, v, i, v], v),
            "o_sj_cols": ([v, i, v, v, v, v, v, v, v, v, v, v], None),
            "o_uniq_trans": ([v, v, v, i, i, i, d], i),
        }
        for name, (argtypes, restype) in sig.items():
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = restype
        self.lib = lib

    # --- constructors ---
    def read_trans(self, tid: int, starts: Sequence[int], ends: Sequence[int],
                   is_rev: int = 0, name: str = "read") -> Trans:
        s = np.ascontiguousarray(starts, np.int32)
        e = np.ascontiguousarray(ends, np.int32)
        ptr = self.lib.o_mk_read_trans(tid, is_rev, _p(s), _p(e), len(s),
                                       name.encode())
        return Trans(self, ptr, anno=False)

    def anno_trans(self, tid: int, starts: Sequence[int], ends: Sequence[int],
                   is_rev: int = 0, gene_id: str = "G", gene_name: str = "G") -> Trans:
        s = np.ascontiguousarray(starts, np.int32)
        e = np.ascontiguousarray(ends, np.int32)
        ptr = self.lib.o_mk_anno_trans(tid, is_rev, _p(s), _p(e), len(s),
                                       gene_id.encode(), gene_name.encode())
        return Trans(self, ptr, anno=True)

    def trans_set(self, anno: bool = False) -> TransSet:
        return TransSet(self, anno=anno)

    def sj_table(self, tid, don, acc, uniq_c, multi_c):
        arrs = [np.ascontiguousarray(a, np.int32)
                for a in (tid, don, acc, uniq_c, multi_c)]
        n = len(arrs[0])
        ptr = self.lib.o_mk_sj(n, *[_p(a) for a in arrs])
        return ptr, n

    def read_sj_file(self, path: str, chr_names: Sequence[str]):
        """The reference's own STAR SJ.out.tab consumption (gtf.c:431-449):
        returns (sj_ptr, dict-of-column-arrays, final chromosome list).
        Caller frees sj_ptr with lib.o_free_sj."""
        arr = (ctypes.c_char_p * max(len(chr_names), 1))(
            *[c.encode() for c in chr_names])
        out_n = np.zeros(1, np.int32)
        cap = len(chr_names) + 64
        names_buf = ctypes.create_string_buffer(cap * 100)
        out_chr_n = np.zeros(1, np.int32)
        ptr = self.lib.o_read_sj_file(path.encode(), arr, len(chr_names),
                                      _p(out_n), names_buf, cap, _p(out_chr_n))
        n = int(out_n[0])
        cols = {k: np.zeros(max(n, 1), np.int32) for k in
                ("tid", "don", "acc", "strand", "is_rev", "motif", "is_anno",
                 "uniq_c", "multi_c", "max_over")}
        self.lib.o_sj_cols(ptr, n, *[_p(cols[k]) for k in cols])
        names = [names_buf.raw[i * 100:(i + 1) * 100].split(b"\x00")[0].decode()
                 for i in range(int(out_chr_n[0]))]
        return ptr, {k: a[:n] for k, a in cols.items()}, names

    def ugp(self, min_sj_cnt=1, ss_dis=0, end_dis=0x7FFFFFFF, full_level=5,
            split_trans=0, use_multi=0, force_strand=0,
            single_exon_ovlp_frac=0.80):
        return self.lib.o_mk_ugp(min_sj_cnt, ss_dis, end_dis, full_level,
                                 split_trans, use_multi, force_strand,
                                 single_exon_ovlp_frac)

    # --- bam2gtf / bam2sj / fusion oracle entry points ---
    @staticmethod
    def pack_cigar(ops) -> np.ndarray:
        """ops: iterable of (op_char, length); op chars as in SAM."""
        code = {c: i for i, c in enumerate("MIDNSHP=XB")}
        return np.asarray([(ln << 4) | code[op] for op, ln in ops], np.uint32)

    def mk_bam(self, tid: int, pos0: int, flag: int, ops, qname: str = "q",
               xs: str = "", nh: int = -1, nm: int = -1, l_qseq: int = 0):
        cig = self.pack_cigar(ops)
        return self.lib.o_mk_bam(tid, pos0, flag, _p(cig), len(cig),
                                 qname.encode(), ord(xs) if xs else 0, nh,
                                 nm, l_qseq)

    def gtf_filter(self, bam_ptr, rm_set, cov_rate: float, map_qual: float):
        """(keep, score, intron_n) via the compiled reference gate."""
        score = np.zeros(1, np.int32)
        intron = np.zeros(1, np.int32)
        ret = self.lib.o_gtf_filter(bam_ptr, rm_set.ptr, cov_rate, map_qual,
                                    _p(score), _p(intron))
        return ret == 0, int(score[0]), int(intron[0])

    def gen_trans(self, bam_ptr, exon_min=3, intron_len=3, deletion_max=50):
        ptr = self.lib.o_gen_trans(bam_ptr, exon_min, intron_len,
                                   deletion_max)
        return Trans(self, ptr, anno=True)  # exon-only: free exons

    @staticmethod
    def _genome_arr(seqs):
        arr = (ctypes.c_char_p * len(seqs))(*[s.encode() for s in seqs])
        return arr

    def intr_deri_str(self, seqs, tid, start, end):
        motif = np.zeros(1, np.uint8)
        strand = self.lib.o_intr_deri_str(self._genome_arr(seqs), len(seqs),
                                          tid, start, end, _p(motif))
        return strand, int(motif[0])

    def gen_sj(self, is_uniq, tid, start1, ops, seqs):
        cig = self.pack_cigar(ops)
        cap = max(len(cig), 1)
        don = np.zeros(cap, np.int32)
        acc = np.zeros(cap, np.int32)
        strand = np.zeros(cap, np.uint8)
        motif = np.zeros(cap, np.uint8)
        uniq = np.zeros(cap, np.int32)
        multi = np.zeros(cap, np.int32)
        n = self.lib.o_gen_sj(is_uniq, tid, start1, _p(cig), len(cig),
                              self._genome_arr(seqs), len(seqs),
                              _p(don), _p(acc), _p(strand), _p(motif),
                              _p(uniq), _p(multi))
        return [dict(don=int(don[i]), acc=int(acc[i]), strand=int(strand[i]),
                     motif=int(motif[i]), uniq_c=int(uniq[i]),
                     multi_c=int(multi[i])) for i in range(n)]

    def sj_update_group(self, rows):
        """rows: (tid, don, acc, strand, motif, uniq_c, multi_c) per record."""
        a = np.asarray(rows, np.int64).reshape(-1, 7)
        n = len(a)
        tid, don, acc = (np.ascontiguousarray(a[:, k], np.int32)
                         for k in (0, 1, 2))
        strand, motif = (np.ascontiguousarray(a[:, k], np.uint8)
                         for k in (3, 4))
        uniq, multi = (np.ascontiguousarray(a[:, k], np.int32)
                       for k in (5, 6))
        cap = max(n, 1)
        ot, od, oa = (np.zeros(cap, np.int32) for _ in range(3))
        os_, om = (np.zeros(cap, np.uint8) for _ in range(2))
        ou, omu = (np.zeros(cap, np.int32) for _ in range(2))
        m = self.lib.o_sj_update_group(
            _p(tid), _p(don), _p(acc), _p(strand), _p(motif), _p(uniq),
            _p(multi), n, _p(ot), _p(od), _p(oa), _p(os_), _p(om), _p(ou),
            _p(omu))
        return [dict(tid=int(ot[i]), don=int(od[i]), acc=int(oa[i]),
                     strand=int(os_[i]), motif=int(om[i]),
                     uniq_c=int(ou[i]), multi_c=int(omu[i]))
                for i in range(m)]

    def check_fusion(self, segs, rlen, ovlp_frac=0.1, each_cov=0.1,
                     all_cov=0.99, dis=100000):
        """segs: dicts with tid,is_rev,score,ed,read_start,read_end,
        ref_start,ref_end.  Returns (ret, selected segments post-sort)."""
        n = len(segs)
        cols = {}
        for k in ("tid", "is_rev", "score", "ed", "read_start", "read_end",
                  "ref_start", "ref_end"):
            cols[k] = np.asarray([s[k] for s in segs], np.int32)
        ret = self.lib.o_check_fusion(
            *[_p(cols[k]) for k in ("tid", "is_rev", "score", "ed",
                                    "read_start", "read_end", "ref_start",
                                    "ref_end")],
            n, rlen, ovlp_frac, each_cov, all_cov, dis)
        out = [dict((k, int(cols[k][i])) for k in cols) for i in range(n)]
        return ret, out


_cache: dict = {}


def get_oracle(variant: str = "exact") -> Optional[Oracle]:
    """variant: 'exact' (reference bit-for-bit) or 'fixed' (the two
    documented-deviation patches).  Returns None only when the reference
    checkout or a compiler is genuinely absent; a COMPILE failure
    propagates (the fuzz suite must fail loudly, not skip)."""
    assert variant in ("exact", "fixed")
    if variant not in _cache:
        import shutil
        if not REF_SRC.is_dir() or shutil.which("gcc") is None:
            _cache["exact"] = _cache["fixed"] = None
        else:
            exact, fixed = _build()
            _cache["exact"] = Oracle(exact)
            _cache["fixed"] = Oracle(fixed)
    return _cache[variant]
