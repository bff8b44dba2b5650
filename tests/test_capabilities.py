"""Capability-checklist tests (SURVEY §7): multi-sample merge, single-end
short reads, gzip input, GTF input mode, CLI subcommands."""

import gzip
import io
import os
import subprocess
import sys

import numpy as np
import pytest

from lr2rmats_tpu.io.fasta import Genome, decode_seq, revcomp
from tests.test_aligner import plant_motifs, random_genome, splice_read

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Synthetic two-sample world: genome + annotation + long/short reads."""
    d = tmp_path_factory.mktemp("world")
    g = random_genome(150_000, seed=31)
    anno_exons = [(20_000, 20_400), (24_000, 24_250), (31_000, 31_350)]
    # novel donor at 20300 (annotated donor is 20400) + known acceptor
    novel_exons = [(20_000, 20_300), (31_000, 31_350)]
    plant_motifs(g, anno_exons)
    plant_motifs(g, novel_exons)
    # genome.fa
    genome_fa = d / "genome.fa"
    with open(genome_fa, "w") as f:
        f.write(">chrS\n")
        seq = decode_seq(g.codes)
        for i in range(0, len(seq), 60):
            f.write(seq[i: i + 60] + "\n")
    # annotation gtf (1-based inclusive)
    gtf = d / "anno.gtf"
    with open(gtf, "w") as f:
        attrs = 'gene_id "GS1"; transcript_id "TS1"; gene_name "GENES1"; transcript_name "TRS1";'
        f.write(f"chrS\ttest\ttranscript\t{anno_exons[0][0]+1}\t{anno_exons[-1][1]}\t.\t+\t.\t{attrs}\n")
        for s, e in anno_exons:
            f.write(f"chrS\ttest\texon\t{s+1}\t{e}\t.\t+\t.\t{attrs}\n")
    # long reads per sample: novel exon-skip transcript; gzip for samp2
    long1 = d / "samp1_long.fa"
    with open(long1, "w") as f:
        for i in range(3):
            r = splice_read(g, novel_exons, "+", err=0.01, seed=40 + i)
            f.write(f">long1_{i}\n{decode_seq(r)}\n")
    long2 = d / "samp2_long.fa.gz"
    with gzip.open(long2, "wt") as f:
        for i in range(3):
            r = splice_read(g, anno_exons, "+", err=0.01, seed=50 + i)
            f.write(f">long2_{i}\n{decode_seq(r)}\n")
    # short reads: 60 spanning the novel junction + exon bodies
    rng = np.random.default_rng(9)
    short1 = d / "samp1_short_1.fa"
    novel_tx = np.concatenate([g.codes[a:b] for a, b in novel_exons])
    with open(short1, "w") as f:
        for i in range(60):
            off = int(rng.integers(0, len(novel_tx) - 101))
            f.write(f">s{i}\n{decode_seq(novel_tx[off: off + 101])}\n")
    return dict(dir=d, genome=genome_fa, gtf=gtf, long1=long1, long2=long2,
                short1=short1, anno_exons=anno_exons, novel_exons=novel_exons)


def test_multisample_single_end_gzip(world, tmp_path):
    """Two samples (one gzip'd), single-end short reads, full pipeline."""
    from lr2rmats_tpu.pipeline.config import PipelineConfig, SampleReads
    from lr2rmats_tpu.pipeline.stages import run_pipeline
    cfg = PipelineConfig(
        genome_fasta=str(world["genome"]), gtf=str(world["gtf"]),
        out_dir=str(tmp_path), full_level=3, split_trans=True)
    cfg.samples["samp1"] = SampleReads(str(world["long1"]),
                                       str(world["short1"]), None)
    cfg.samples["samp2"] = SampleReads(str(world["long2"]), None, None)
    out = run_pipeline(cfg)
    assert os.path.exists(out)
    for s in ("samp1", "samp2"):
        assert (tmp_path / "output" / f"{s}.summary.txt").exists()
    upd = open(out).read()
    lines = [l.split("\t") for l in upd.splitlines()]
    exon_bounds = {(l[3], l[4]) for l in lines if l[2] == "exon"}
    assert ("20001", "20400") in exon_bounds       # annotated exon 1
    # the novel-donor transcript (exon ending 20300) must have been added
    assert any(b[1] == "20300" for b in exon_bounds), exon_bounds
    novel_n = open(tmp_path / "output" / "samp1.novel.gtf").read()
    assert "transcript" in novel_n


def test_yaml_config_roundtrip(world, tmp_path):
    import yaml
    from lr2rmats_tpu.pipeline.config import PipelineConfig
    cfgd = {
        "genome": {"fasta": str(world["genome"]), "gtf": str(world["gtf"])},
        "sample": {
            "long_read": {"samp1": str(world["long1"])},
            "short_read": {"samp1": {"first": str(world["short1"]),
                                     "second": []}},
        },
        "output": {"updated_gtf": "output/updated.gtf"},
        "lr2rmats": {"rm_gtf": "", "aln_cov": 0.67, "iden_frac": 0.75,
                     "sec_rat": 0.98, "sup_cnt": 1, "split_trans": "-s",
                     "full_level": 3},
    }
    p = tmp_path / "config.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfgd, f)
    cfg = PipelineConfig.from_yaml(str(p))
    assert cfg.samples["samp1"].short_second is None  # [] => single-end
    assert cfg.full_level == 3
    assert cfg.split_trans


def test_read_list_format(world, tmp_path):
    from lr2rmats_tpu.pipeline.config import PipelineConfig
    ll = tmp_path / "long.list"
    ll.write_text(f"2\n1\n{world['long1']}\n1\n{world['long2']}\n")
    sl = tmp_path / "short.list"
    sl.write_text(f"2\n1\n{world['short1']}\n1\n{world['short1']} {world['short1']}\n")
    cfg = PipelineConfig.from_read_lists(
        str(world["genome"]), str(world["gtf"]), str(ll), str(sl))
    assert len(cfg.samples) == 2
    assert cfg.samples["samp1"].short_second is None
    assert cfg.samples["samp2"].short_second is not None


def test_cli_subcommands_on_sam(world, tmp_path):
    """filter / bam2gtf / bam2sj / update-gtf / unique-gtf via CLI on a
    generated SAM."""
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.fasta import Genome, read_fasta
    from lr2rmats_tpu.io.sam import SamWriter
    from lr2rmats_tpu.pipeline.cli import main

    g = Genome.load(str(world["genome"]))
    al = BatchAligner(g)
    reads = read_fasta(str(world["long1"]))
    sam = tmp_path / "x.sam"
    with open(sam, "w") as f:
        w = SamWriter(f, al.refs)
        for rec in al.align_seqset(reads):
            w.write(rec)

    filt = tmp_path / "filt.bam"
    assert main(["filter", str(sam), "-o", str(filt)]) == 0
    assert filt.exists()

    out_gtf = tmp_path / "b2g.gtf"
    assert main(["bam2gtf", str(filt), "-o", str(out_gtf)]) == 0
    assert "exon" in out_gtf.read_text()

    sj = tmp_path / "x.sj"
    assert main(["bam2sj", str(filt), "-g", str(world["genome"]),
                 "-o", str(sj)]) == 0
    assert sj.read_text().startswith("###STRAND")

    upd = tmp_path / "upd.gtf"
    assert main(["update-gtf", str(filt), str(world["gtf"]),
                 "-o", str(upd), "-l", "3"]) == 0
    assert "transcript" in upd.read_text()

    unq = tmp_path / "unq.gtf"
    assert main(["unique-gtf", "-m", "g", "-b", str(sam), str(upd),
                 "-o", str(unq)]) == 0
    assert "transcript" in unq.read_text()


def test_index_cache_roundtrip(world, tmp_path):
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    from lr2rmats_tpu.io.fasta import Genome
    import numpy as np
    g = Genome.load(str(world["genome"]))
    cache = str(tmp_path / "idx.npz")
    i1 = MinimizerIndex.build_or_load(g, cache)
    assert os.path.exists(cache)
    i2 = MinimizerIndex.build_or_load(g, cache)
    np.testing.assert_array_equal(i1.hashes, i2.hashes)
    np.testing.assert_array_equal(i1.pos, i2.pos)
    assert i2.names == g.names


def test_fusion_cli(world, tmp_path):
    """fusion subcommand end-to-end on a synthetic chimeric read."""
    from lr2rmats_tpu.io.fasta import Genome, decode_seq
    from lr2rmats_tpu.io.sam import SamWriter, AlnRec, parse_cigar
    from lr2rmats_tpu.pipeline.cli import main
    g = Genome.load(str(world["genome"]))
    refs = [(g.names[0], int(g.lengths()[0]))]
    sam = tmp_path / "fus.sam"
    # TWO chimeric reads, each two segments mapping 100kb apart.  The
    # reference's end-of-stream flush never calls fusion_write
    # (bam_fusion.c:196-203), so only the NON-final group's site line is
    # written — a faithful quirk this test pins.
    with open(sam, "w") as f:
        w = SamWriter(f, refs)
        for qn, p1, p2 in (("chimeraA", 10_000, 130_000),
                           ("chimeraB", 20_000, 160_000)):
            w.write(AlnRec(qn, 0, 0, p1, 60, parse_cigar("500M500S"),
                           seq="A" * 1000, tags={"AS": 500, "NM": 0}))
            w.write(AlnRec(qn, 2048, 0, p2, 60, parse_cigar("500S500M"),
                           seq="A" * 1000, tags={"AS": 480, "NM": 1}))
    fs = tmp_path / "fusion_sites.txt"
    out = tmp_path / "fusion.bam"
    assert main(["fusion", str(sam), "--output", str(out),
                 "-f", str(fs)]) == 0
    sites = fs.read_text().splitlines()
    assert sites[0].startswith("#fusion_id")
    assert len(sites) == 2          # chimeraB (final group) omitted
    f = sites[1].split("\t")
    assert f[0] == "chimeraA"


def test_update_gtf_gtf_input_mode(world, tmp_path):
    """update-gtf -m g: GTF input with a BAM/SAM for header info
    (reference update_gtf.c:1071-1075)."""
    from lr2rmats_tpu.io.sam import SamWriter, AlnRec, parse_cigar
    from lr2rmats_tpu.pipeline.cli import main
    hdr_sam = tmp_path / "hdr.sam"
    with open(hdr_sam, "w") as f:
        SamWriter(f, [("chrS", 150_000)])
    # input GTF: one known transcript + one novel-donor transcript
    in_gtf = tmp_path / "in.gtf"
    ae = world["anno_exons"]
    ne = world["novel_exons"]
    with open(in_gtf, "w") as f:
        for nm, exons in (("known1", ae), ("novel1", ne)):
            at = f'gene_id "{nm}"; transcript_id "{nm}";'
            f.write(f"chrS\tx\ttranscript\t{exons[0][0]+1}\t{exons[-1][1]}\t.\t+\t.\t{at}\n")
            for s, e in exons:
                f.write(f"chrS\tx\texon\t{s+1}\t{e}\t.\t+\t.\t{at}\n")
    out = tmp_path / "out.gtf"
    known = tmp_path / "known.gtf"
    novel = tmp_path / "novel.gtf"
    assert main(["update-gtf", "-m", "g", "-b", str(hdr_sam), str(in_gtf),
                 str(world["gtf"]), "-o", str(out), "-k", str(known),
                 "-v", str(novel), "-l", "5"]) == 0
    assert "known1" in known.read_text()
    assert "novel1" in novel.read_text()
    assert "novel1" in out.read_text()


def test_unique_gtf_intersect(world, tmp_path):
    from lr2rmats_tpu.io.sam import SamWriter
    from lr2rmats_tpu.pipeline.cli import main
    hdr_sam = tmp_path / "hdr.sam"
    with open(hdr_sam, "w") as f:
        SamWriter(f, [("chrS", 150_000)])
    in_gtf = tmp_path / "dups.gtf"
    ae = world["anno_exons"]
    with open(in_gtf, "w") as f:
        for nm in ("a", "b"):  # identical duplicates
            at = f'gene_id "{nm}"; transcript_id "{nm}";'
            f.write(f"chrS\tx\ttranscript\t{ae[0][0]+1}\t{ae[-1][1]}\t.\t+\t.\t{at}\n")
            for s, e in ae:
                f.write(f"chrS\tx\texon\t{s+1}\t{e}\t.\t+\t.\t{at}\n")
    shared = tmp_path / "shared.gtf"
    assert main(["unique-gtf", "-m", "g", "-b", str(hdr_sam), str(in_gtf),
                 "-I", "-o", str(shared)]) == 0
    # the duplicate lands in the intersect output
    assert 'transcript_id "b"' in shared.read_text()


def test_simulate_script(tmp_path):
    """scripts/simulate.py stays runnable (scale-config generator)."""
    import subprocess, sys
    out = tmp_path / "sim"
    r = subprocess.run(
        [sys.executable, "scripts/simulate.py", "--out", str(out),
         "--genome-mb", "0.5", "--genes", "5", "--long-reads", "20",
         "--short-pairs", "50"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""})
    assert r.returncode == 0, r.stderr
    assert (out / "genome.fa").exists()
    assert (out / "anno.gtf").exists()


def test_multichrom_pipeline(tmp_path):
    """Full pipeline over a two-chromosome genome."""
    import numpy as np
    from lr2rmats_tpu.io.fasta import Genome, decode_seq
    from lr2rmats_tpu.pipeline.config import PipelineConfig, SampleReads
    from lr2rmats_tpu.pipeline.stages import run_pipeline
    from tests.test_aligner import plant_motifs, splice_read

    rng = np.random.default_rng(91)
    c1 = rng.integers(0, 4, 80_000).astype(np.uint8)
    c2 = rng.integers(0, 4, 80_000).astype(np.uint8)
    g = Genome(["chr1", "chr2"], np.concatenate([c1, c2]),
               np.array([0, 80_000, 160_000], np.int64))
    ex1 = [(10_000, 10_300), (14_000, 14_250), (20_000, 20_300)]   # chr1
    ex2 = [(95_000, 95_300), (99_000, 99_400)]                     # chr2 global
    plant_motifs(g, ex1)
    plant_motifs(g, ex2)
    d = tmp_path
    with open(d / "genome.fa", "w") as f:
        for name, lo, hi in (("chr1", 0, 80_000), ("chr2", 80_000, 160_000)):
            f.write(f">{name}\n")
            seq = decode_seq(g.codes[lo:hi])
            for i in range(0, len(seq), 60):
                f.write(seq[i: i + 60] + "\n")
    with open(d / "anno.gtf", "w") as f:
        for gid, chrom, off, exons in (("g1", "chr1", 0, ex1),
                                       ("g2", "chr2", 80_000, ex2)):
            at = f'gene_id "{gid}"; transcript_id "{gid}.t";'
            f.write(f"{chrom}\tt\ttranscript\t{exons[0][0]-off+1}\t{exons[-1][1]-off}\t.\t+\t.\t{at}\n")
            for a, b in exons:
                f.write(f"{chrom}\tt\texon\t{a-off+1}\t{b-off}\t.\t+\t.\t{at}\n")
    with open(d / "long.fa", "w") as f:
        for i in range(2):
            f.write(f">r1_{i}\n{decode_seq(splice_read(g, ex1, '+', seed=i))}\n")
            f.write(f">r2_{i}\n{decode_seq(splice_read(g, ex2, '+', seed=i))}\n")
    cfg = PipelineConfig(genome_fasta=str(d / "genome.fa"),
                         gtf=str(d / "anno.gtf"), out_dir=str(d / "out"),
                         full_level=5)
    cfg.samples["s1"] = SampleReads(str(d / "long.fa"), None, None)
    out = run_pipeline(cfg)
    upd = open(out).read()
    assert "chr1\t" in upd and "chr2\t" in upd
    # reads classified per chromosome correctly
    detail = (d / "out" / "output" / "s1.detail.txt").read_text().splitlines()
    rows = {r.split("\t")[0]: r.split("\t") for r in detail[1:]}
    assert rows["r1_0"][1] == "chr1" and rows["r1_0"][3] == "0"
    assert rows["r2_0"][1] == "chr2" and rows["r2_0"][3] == "0"


def test_native_and_fallback_outputs_identical(world, tmp_path):
    """The full update-gtf output set must be byte-identical with and
    without the native library (end-to-end determinism guarantee)."""
    import subprocess, sys
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.fasta import Genome, read_fasta
    from lr2rmats_tpu.io.sam import SamWriter

    g = Genome.load(str(world["genome"]))
    al = BatchAligner(g)
    reads = read_fasta(str(world["long1"]))
    sam = tmp_path / "in.sam"
    with open(sam, "w") as f:
        w = SamWriter(f, al.refs)
        for rec in al.align_seqset(reads):
            w.write(rec)

    outs = {}
    for tag, env_extra in (("native", {}), ("fallback",
                                           {"LR2RMATS_NO_NATIVE": "1"})):
        d = tmp_path / tag
        d.mkdir()
        r = subprocess.run(
            [sys.executable, "-m", "lr2rmats_tpu", "update-gtf", str(sam),
             str(world["gtf"]), "-l", "3", "-s",
             "-o", str(d / "upd.gtf"), "-k", str(d / "known.gtf"),
             "-v", str(d / "novel.gtf"), "-u", str(d / "unrecog.gtf"),
             "-a", str(d / "bam.gtf"), "-A", str(d / "detail.txt"),
             "-y", str(d / "summary.txt"), "-E", str(d / "exon.bed")],
            capture_output=True, text=True, timeout=180, cwd=str(REPO_ROOT),
            env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
                 **env_extra})
        assert r.returncode == 0, r.stderr[-800:]
        outs[tag] = {p.name: p.read_bytes() for p in d.iterdir()}
    assert set(outs["native"]) == set(outs["fallback"])
    for name in outs["native"]:
        assert outs["native"][name] == outs["fallback"][name], name


def test_sort_gtf_cli(tmp_path, ref_data):
    """sort-gtf subcommand (sort_gtf.sh role, reference sort_gtf.sh:11-29)."""
    out = tmp_path / "sorted.gtf"
    r = subprocess.run(
        [sys.executable, "-m", "lr2rmats_tpu", "sort-gtf",
         str(ref_data / "gtf" / "original.gtf"), "-o", str(out)],
        capture_output=True, text=True, cwd=REPO_ROOT,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""})
    assert r.returncode == 0, r.stderr
    lines = out.read_text().splitlines()
    assert lines and all("\t" in l for l in lines)
    # transcript lines must be start-sorted within a chromosome
    tr = [l.split("\t") for l in lines if l.split("\t")[2] == "transcript"]
    starts = [int(f[3]) for f in tr]
    assert starts == sorted(starts)


def test_gtf2bed_cli(tmp_path, ref_data):
    """gtf2bed subcommand (UCSC gtfToGenePred|genePredToBed role)."""
    out = tmp_path / "t.bed"
    r = subprocess.run(
        [sys.executable, "-m", "lr2rmats_tpu", "gtf2bed",
         str(ref_data / "gtf" / "original.gtf"), "-o", str(out)],
        capture_output=True, text=True, cwd=REPO_ROOT,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""})
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows and all(len(f) == 12 for f in rows)
    for f in rows:
        sizes = [int(x) for x in f[10].rstrip(",").split(",")]
        starts = [int(x) for x in f[11].rstrip(",").split(",")]
        assert len(sizes) == int(f[9]) == len(starts)
        assert starts[0] == 0
        assert int(f[1]) + starts[-1] + sizes[-1] == int(f[2])


def test_run_config_knobs_survive_cli_defaults(tmp_path, monkeypatch):
    """`run --config` must honor the yaml's lr2rmats knobs unless the
    flag is given explicitly (review finding: argparse defaults silently
    clobbered sup_cnt/aln_cov/...)."""
    import lr2rmats_tpu.pipeline.stages as stages
    from lr2rmats_tpu.pipeline.cli import main
    y = tmp_path / "config.yaml"
    y.write_text(
        "genome:\n  fasta: g.fa\ngtf: anno.gtf\n"
        "sample:\n  samp1:\n    long_read:\n      1: lr.fa\n"
        "lr2rmats:\n  sup_cnt: 5\n  aln_cov: 0.8\n  split_trans: \"\"\n")
    got = {}

    def fake_run(cfg, *a, **kw):
        got.update(sup_cnt=cfg.sup_cnt, aln_cov=cfg.aln_cov,
                   split_trans=cfg.split_trans, sec_rat=cfg.sec_rat)
        return "x"

    monkeypatch.setattr(stages, "run_pipeline", fake_run)
    assert main(["run", "--config", str(y)]) == 0
    assert got == dict(sup_cnt=5, aln_cov=0.8, split_trans=False,
                       sec_rat=0.98)          # yaml wins; default stands
    got.clear()
    assert main(["run", "--config", str(y), "--sup-cnt", "2",
                 "--split-trans"]) == 0
    assert got["sup_cnt"] == 2 and got["split_trans"] is True  # flags win
    got.clear()
    y2 = tmp_path / "c2.yaml"
    y2.write_text(y.read_text().replace('split_trans: ""',
                                        'split_trans: "-s"'))
    assert main(["run", "--config", str(y2), "--no-split-trans"]) == 0
    assert got["split_trans"] is False


def test_query_len_counts_hard_clips():
    """AlnRec.query_len replicates the reference's 0x3C5A7 quirk (H
    consumes query, parse_bam.c:258) — the fusion coordinate flips
    depend on it; cigar_qlen stays SAM-spec (H excluded)."""
    from lr2rmats_tpu.io.sam import AlnRec, cigar_qlen, parse_cigar
    c = parse_cigar("100H50M10S")
    r = AlnRec("q", 0, 0, 0, 60, c, seq="*", qual="*", tags={})
    assert cigar_qlen(c) == 60
    assert r.query_len() == 160
