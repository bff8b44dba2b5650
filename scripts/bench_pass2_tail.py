"""Measure the pass-2 classify tail at 100k novel reads/sample
(VERDICT r3 item 8): check_trans with -s and a dense SJ table where a
large fraction of reads carry unsupported novel junctions (the split
path), at 100k scale."""
import time
import numpy as np
from lr2rmats_tpu.io.sj import SJTable
from lr2rmats_tpu.transcript.classify import check_trans
from lr2rmats_tpu.transcript.model import Transcripts, UpdateGtfParams

rng = np.random.default_rng(5)
N_ANNO = 2000
N_READS = 100_000

# annotation: N_ANNO multi-exon transcripts tiled along one chromosome
anno = Transcripts()
base = 1000
anno_chains = []
for i in range(N_ANNO):
    n = int(rng.integers(3, 9))
    pos = base
    s, e = [], []
    for _ in range(n):
        el = int(rng.integers(80, 300))
        s.append(pos); e.append(pos + el)
        pos += el + int(rng.integers(100, 2000))
    anno_chains.append((s, e))
    anno.append(0, False, s, e, gene_id=f"G{i}", gene_name=f"G{i}",
                trans_id=f"T{i}", trans_name=f"T{i}", init_novel=False)
    base = pos + 3000

# reads: derived from annos with a NOVEL junction inserted (exon split)
# half of which lack SJ support -> unreliable -> split_trans path
reads = Transcripts()
sj_rows = set()
order = np.sort(rng.integers(0, N_ANNO, N_READS))
for ri, ai in enumerate(order.tolist()):
    s, e = anno_chains[ai]
    s2, e2 = list(s), list(e)
    k = int(rng.integers(0, len(s2) - 1))
    supported = bool(rng.random() < 0.5)
    # shift one donor to create a novel junction
    e2[k] = e2[k] - int(rng.integers(5, 30))
    if supported:
        sj_rows.add((0, e2[k] + 1, s2[k + 1] - 1, 5, 0))
    reads.append(0, False, s2, e2, trans_id=f"r{ri}", trans_name=f"r{ri}")
# annotated junction support
for s, e in anno_chains:
    for j in range(len(s) - 1):
        sj_rows.add((0, e[j] + 1, s[j + 1] - 1, 9, 1))
rows = np.asarray(sorted(sj_rows), np.int64)
sj = SJTable(tid=rows[:, 0].astype(np.int32), don=rows[:, 1].astype(np.int32),
             acc=rows[:, 2].astype(np.int32),
             strand=np.zeros(len(rows), np.int8),
             motif=np.zeros(len(rows), np.int8),
             is_anno=np.zeros(len(rows), np.int8),
             uniq_c=rows[:, 3].astype(np.int32),
             multi_c=rows[:, 4].astype(np.int32))

ugp = UpdateGtfParams(split_trans=True, full_level=3)
upd, kn, nv, un = (Transcripts() for _ in range(4))
t0 = time.perf_counter()
check_trans(reads, anno, sj, ugp, upd, kn, nv, un)
wall = time.perf_counter() - t0
print(f"reads={N_READS} anno={N_ANNO} sj={sj.n} wall={wall:.2f}s "
      f"known={kn.n} novel={nv.n} unrecog={un.n} updated={upd.n} "
      f"({N_READS/wall:.0f} reads/s)")
