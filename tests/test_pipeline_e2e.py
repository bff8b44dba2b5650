"""End-to-end pipeline test on the reference toy dataset
(the reference's only test: README.md:55-63 snakemake run on test_data)."""

import os
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def e2e_out(ref_data, tmp_path_factory):
    out = tmp_path_factory.mktemp("e2e")
    from lr2rmats_tpu.pipeline.cli import main
    rc = main([
        "run",
        "--genome", str(ref_data / "genome" / "genome.fa"),
        "--gtf", str(ref_data / "gtf" / "original.gtf"),
        "--rm-gtf", str(ref_data / "gtf" / "rRNA.gtf"),
        "--long-read", str(ref_data / "read" / "samp1_long.fa"),
        "--short-read-1", str(ref_data / "read" / "samp1_short_1.fa"),
        "--short-read-2", str(ref_data / "read" / "samp1_short_2.fa"),
        "--out-dir", str(out),
    ])
    assert rc == 0
    return out


def test_all_outputs_exist(e2e_out):
    for f in ("updated.gtf", "samp1.known.gtf", "samp1.novel.gtf",
              "samp1.unrecog.gtf", "samp1.bam.gtf", "samp1.detail.txt",
              "samp1.summary.txt", "samp1.novel_exon.bed"):
        assert (e2e_out / "output" / f).exists(), f
    for f in ("samp1.minimap.sam", "samp1.minimap.bed", "samp1.filtered.sam",
              "samp1.STARSJ.out.tab"):
        assert (e2e_out / "alignment" / f).exists(), f


def test_read_classified_known(e2e_out):
    """The toy CCS read's splice sites are all annotated -> known
    (site-based rule, reference update_gtf.c:770-772)."""
    detail = (e2e_out / "output" / "samp1.detail.txt").read_text().splitlines()
    assert len(detail) == 2  # header + 1 read
    f = detail[1].split("\t")
    assert f[3] == "0"            # Novel=0 (known)
    assert f[4] == "ENSG00000186891"
    assert f[2] == "-"
    known = (e2e_out / "output" / "samp1.known.gtf").read_text()
    assert "transcript_cov" in known


def test_updated_gtf_contains_annotation(e2e_out, ref_data):
    """updated.gtf = sort_gtf(original + novel); all original
    transcript/exon lines must survive with coordinates intact."""
    upd = (e2e_out / "output" / "updated.gtf").read_text().splitlines()
    orig = (ref_data / "gtf" / "original.gtf").read_text().splitlines()
    orig_te = [l for l in orig
               if not l.startswith("#") and l.split("\t")[2] in ("transcript", "exon")]
    assert len(upd) >= len(orig_te)
    upd_coords = {(l.split("\t")[2], l.split("\t")[3], l.split("\t")[4])
                  for l in upd}
    for l in orig_te:
        f = l.split("\t")
        assert (f[2], f[3], f[4]) in upd_coords


def test_sj_tab_format(e2e_out):
    lines = (e2e_out / "alignment" / "samp1.STARSJ.out.tab").read_text().splitlines()
    assert len(lines) >= 6
    for l in lines:
        f = l.split("\t")
        assert len(f) == 9
        assert f[0] == "chr1"
        int(f[1]); int(f[2])


def test_resume_skips_stages(e2e_out, ref_data, capsys):
    """Re-running must reuse artifacts (Snakemake-style resume)."""
    import time
    sam = e2e_out / "alignment" / "samp1.minimap.sam"
    mtime = sam.stat().st_mtime
    from lr2rmats_tpu.pipeline.cli import main
    main([
        "run",
        "--genome", str(ref_data / "genome" / "genome.fa"),
        "--gtf", str(ref_data / "gtf" / "original.gtf"),
        "--rm-gtf", str(ref_data / "gtf" / "rRNA.gtf"),
        "--long-read", str(ref_data / "read" / "samp1_long.fa"),
        "--short-read-1", str(ref_data / "read" / "samp1_short_1.fa"),
        "--short-read-2", str(ref_data / "read" / "samp1_short_2.fa"),
        "--out-dir", str(e2e_out),
    ])
    assert sam.stat().st_mtime == mtime  # alignment stage skipped


def test_resume_reruns_truncated_stage(e2e_out, ref_data):
    """A crash-truncated in-place output (no sidecar) must be REBUILT on
    resume, not accepted as fresh via output-newer-than-input mtimes."""
    filtered = e2e_out / "alignment" / "samp1.filtered.sam"
    good = filtered.read_bytes()
    filtered.write_bytes(good[: len(good) // 2])     # simulate the crash
    side = filtered.with_name(filtered.name + ".inputs.json")
    if side.exists():
        side.unlink()                                # sidecar never written
    from lr2rmats_tpu.pipeline.cli import main
    rc = main([
        "run",
        "--genome", str(ref_data / "genome" / "genome.fa"),
        "--gtf", str(ref_data / "gtf" / "original.gtf"),
        "--rm-gtf", str(ref_data / "gtf" / "rRNA.gtf"),
        "--long-read", str(ref_data / "read" / "samp1_long.fa"),
        "--short-read-1", str(ref_data / "read" / "samp1_short_1.fa"),
        "--short-read-2", str(ref_data / "read" / "samp1_short_2.fa"),
        "--out-dir", str(e2e_out),
    ])
    assert rc == 0
    assert filtered.read_bytes() == good             # stage reran
    assert side.exists()


def test_empty_samples_fails_early(tmp_path):
    from lr2rmats_tpu.pipeline.config import PipelineConfig
    from lr2rmats_tpu.pipeline.stages import run_pipeline
    cfg = PipelineConfig(genome_fasta="g.fa", gtf="a.gtf",
                         out_dir=str(tmp_path), samples={})
    with pytest.raises(ValueError, match="no samples"):
        run_pipeline(cfg)


def test_filter_sam_stdout_convention(e2e_out, capsys):
    """`filter --sam` without -o must stream to stdout on BOTH the native
    raw-span path and the python fallback."""
    sam = str(e2e_out / "alignment" / "samp1.minimap.sam")
    from lr2rmats_tpu.pipeline.cli import main
    outs = {}
    for tag, env in (("native", None), ("fallback", "1")):
        old = os.environ.pop("LR2RMATS_NO_NATIVE", None)
        if env:
            os.environ["LR2RMATS_NO_NATIVE"] = env
        try:
            rc = main(["filter", sam, "--sam"])
            assert rc == 0
            outs[tag] = capsys.readouterr().out
        finally:
            os.environ.pop("LR2RMATS_NO_NATIVE", None)
            if old is not None:
                os.environ["LR2RMATS_NO_NATIVE"] = old
    assert outs["native"].count("\n") == outs["fallback"].count("\n")
    assert outs["native"].splitlines()[-1].split("\t")[0] == \
        outs["fallback"].splitlines()[-1].split("\t")[0]
    assert not os.path.exists("out.sam")
