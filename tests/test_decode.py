"""Branch-coverage tests for the pileup VCF decoder and the merge step.

Expected strings are hand-derived from the reference rules
(PileupModel/predict.py:66-192, scripts/merge.py:43-143).
"""
import io
import math

import numpy as np

from nanosnp_tpu.decode.pileup_vcf import (
    calculate_score,
    decode_pileup_calls,
    write_vcf_header,
)
from nanosnp_tpu.decode.merge import merge_calls


def _probs(n_classes, argmax, p=0.9):
    v = np.full(n_classes, (1 - p) / (n_classes - 1))
    v[argmax] = p
    return v


def _center(depth_fwd=10, depth_rev=10, alt_fwd=0, alt_rev=0, ref="A", alt="C"):
    """Build an 18-channel center column with ref negation applied."""
    c = np.zeros(18, dtype=np.int64)
    ch = {"A": 0, "C": 1, "G": 2, "T": 3}
    c[ch[alt]] = alt_fwd
    c[ch[alt] + 9] = alt_rev
    # negation: ref channel = -(sum fwd ACGT), computed as if ref reads present
    c[ch[ref]] = -(depth_fwd)
    c[ch[ref] + 9] = -(depth_rev)
    return c


def test_calculate_score():
    assert calculate_score(0.5) == 10.0
    assert calculate_score(1.0) > 100
    assert calculate_score(0.0) == 0.0
    # spot value: p=0.9 -> -10*log10((0.1)/(0.9)) + 10 = 19.54
    assert abs(calculate_score(0.9) - 19.54) < 0.01


def _decode_one(gt_argmax, zy_argmax, center, sref="A", gt_p=0.9, zy_p=0.8,
                n=1, bug_compat=True):
    out = io.StringIO()
    gt = np.stack([_probs(21, gt_argmax, gt_p)] * n)
    zy = np.stack([_probs(3, zy_argmax, zy_p)] * n)
    decode_pileup_calls(
        "chr1", np.arange(100, 100 + n, dtype=np.int64), [sref] * n,
        gt, zy, np.stack([center] * n), out, bug_compat=bug_compat)
    return out.getvalue()


def test_refcall_row():
    # gt=AA, sref=A, zy=0/0 -> RefCall
    center = _center(10, 10, 0, 0, ref="A")
    got = _decode_one(0, 0, center)
    qual = min(calculate_score(0.9), calculate_score(0.8))
    assert got == (f"chr1\t100\t.\tA\tA\t{qual}\tRefCall\t.\t"
                   f"GT:GQ:DP:AF\t0/0:{int(qual)}:20:0.000000\n")


def test_simple_het_snv():
    # gt=AC (idx 1), sref=A, zy=0/1 (idx 2)
    center = _center(14, 14, 3, 3, ref="A", alt="C")
    got = _decode_one(1, 2, center)
    qual = min(calculate_score(0.9), calculate_score(0.8))
    af = 6 / 28
    assert got == (f"chr1\t100\t.\tA\tC\t{qual}\tPASS\t.\t"
                   f"GT:GQ:DP:AF\t0/1:{int(qual)}:28:{af:f}\n")


def test_homo_alt_gt_with_zy_homo():
    # gt=CC (idx 4), sref=A, zy=1/1 (idx 1): alt='CC'->'C', support counted twice
    center = _center(10, 10, 8, 8, ref="A", alt="C")
    got = _decode_one(4, 1, center)
    qual = min(calculate_score(0.9), calculate_score(0.8))
    af = min(32 / 20, 1.0)
    assert got == (f"chr1\t100\t.\tA\tC\t{qual}\tPASS\t.\t"
                   f"GT:GQ:DP:AF\t1/1:{int(qual)}:20:{af:f}\n")


def test_two_alt_becomes_1_2():
    # gt=CG (idx 5), sref=A, zy=1/1 (argmax 1, != 2) -> alt="C,G", zy forced 1/2
    center = _center(10, 10, 5, 5, ref="A", alt="C")
    got = _decode_one(5, 1, center)
    fields = got.strip().split("\t")
    assert fields[4] == "C,G"
    assert fields[9].startswith("1/2:")


def test_two_alt_keeps_0_1_when_zy_het():
    # quirk: zy argmax==2 keeps '0/1' even with two alts (predict.py:140)
    center = _center(10, 10, 5, 5, ref="A", alt="C")
    got = _decode_one(5, 2, center)
    fields = got.strip().split("\t")
    assert fields[4] == "C,G"
    assert fields[9].startswith("0/1:")


def test_variant_gt_but_zy_refcall_uses_gt_qual():
    # gt=AC, zy=0/0 -> PASS row with gt_qual (predict.py:177-185)
    center = _center(10, 10, 4, 4, ref="A", alt="C")
    got = _decode_one(1, 0, center, gt_p=0.95, zy_p=0.9)
    gt_qual = calculate_score(0.95)
    fields = got.strip().split("\t")
    assert fields[5] == str(gt_qual)
    assert fields[9].startswith("0/0:")


def test_gt_ref_zy_variant_fallback_bug_compat():
    """gt=AA + zy=1/1: alt forced from homo set using the batch-argmax quirk.

    Single-row batch: gt_output has length 1, probing ti=4 raises IndexError
    in the reference -> row dropped. Our bug_compat must drop it too."""
    center = _center(10, 10, 3, 3, ref="A", alt="C")
    got = _decode_one(0, 1, center, n=1, bug_compat=True)
    assert got == ""

    # sane mode emits the highest-probability non-ref homozygous alt
    got = _decode_one(0, 1, center, n=1, bug_compat=False)
    fields = got.strip().split("\t")
    assert fields[4] in "CGT"
    assert fields[9].startswith("1/1:")


def test_gt_ref_zy_variant_fallback_large_batch():
    """With >=10 rows the quirk reads argmax classes of rows 0,4,7,9."""
    n = 12
    out = io.StringIO()
    gt = np.stack([_probs(21, 0)] * n)   # all rows argmax gt=0 (AA)
    gt[3] = _probs(21, 9)                # row 3 argmax TT=9 (not probed)
    gt[4] = _probs(21, 7)                # row 4 argmax GG=7 (probed at ti=4)
    zy = np.stack([_probs(3, 1)] * n)    # zy=1/1 everywhere
    center = _center(10, 10, 3, 3, ref="A", alt="C")
    decode_pileup_calls("chr1", np.arange(100, 100 + n, dtype=np.int64),
                        ["A"] * n, gt, zy, np.stack([center] * n), out,
                        bug_compat=True)
    rows = out.getvalue().strip().split("\n")
    assert len(rows) == n
    # probe values: gt_out[ti] for ti in {4,7,9} (ti=0 is AA==sref, skipped)
    # = {row4:7, row7:0, row9:0} -> max at ti=4 -> label CC -> alt 'C'
    # (rows 3/4 themselves have non-AA argmax: direct alts T and G)
    for i, r in enumerate(rows):
        want = {3: "T", 4: "G"}.get(i, "C")
        assert r.split("\t")[4] == want


def test_indel_classes_skipped():
    center = _center(10, 10, 3, 3)
    got = _decode_one(15, 2, center)  # gt=II
    assert got == ""


def test_zero_depth_dropped():
    center = np.zeros(18, dtype=np.int64)
    got = _decode_one(1, 2, center)
    assert got == ""


def test_write_header(tmp_path):
    fai = tmp_path / "r.fa.fai"
    fai.write_text("chr1\t1000\t6\t70\t71\nchr2\t500\t1030\t70\t71\n")
    out = io.StringIO()
    write_vcf_header(str(fai), out)
    s = out.getvalue()
    assert "##contig=<ID=chr1,length=1000>" in s
    assert "##contig=<ID=chr2,length=500>" in s
    assert s.endswith("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSample\n")


# ---------------------------------------------------------------------------
# merge
# ---------------------------------------------------------------------------

HEADER = "##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSample\n"


def _vcf_row(ctg="chr1", pos=100, ref="A", alt="C", qual=20.0, filt="PASS",
             zy="0/1", depth=30, af=0.45):
    return (f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t{qual}\t{filt}\t.\t"
            f"GT:GQ:DP:AF\t{zy}:{int(qual)}:{depth}:{af:f}\n")


def _merge(pileup_rows, hap_rows):
    out = io.StringIO()
    merge_calls(HEADER.splitlines(True) + pileup_rows, hap_rows, out)
    return out.getvalue()


def test_merge_high_quality_passthrough():
    row = _vcf_row(qual=25.0)
    got = _merge([row], [])
    body = [l for l in got.split("\n") if l and not l.startswith("#")]
    assert len(body) == 1
    assert body[0].split("\t")[7] == "P"


def test_merge_high_quality_refcall_dropped():
    got = _merge([_vcf_row(qual=25.0, filt="RefCall", alt="A", zy="0/0")], [])
    assert not [l for l in got.split("\n") if l and not l.startswith("#")]


def test_merge_absent_low_qual_fallback():
    # QUAL 15 <= 19, site absent from haplotype calls, >= 13 -> passthrough P
    got = _merge([_vcf_row(qual=15.0)], [])
    body = [l for l in got.split("\n") if l and not l.startswith("#")]
    assert len(body) == 1 and body[0].split("\t")[7] == "P"
    # QUAL 10 < 13 -> dropped
    got = _merge([_vcf_row(qual=10.0)], [])
    assert not [l for l in got.split("\n") if l and not l.startswith("#")]


def test_merge_haplotype_het_rescue():
    # hap GT 'AC' with ref A -> 0/1, alt C, qual from haplotype
    got = _merge([_vcf_row(qual=15.0)], ["chr1\t100\tAC\t22.5\n"])
    body = [l for l in got.split("\n") if l and not l.startswith("#")]
    assert len(body) == 1
    f = body[0].split("\t")
    assert (f[3], f[4], f[5], f[7]) == ("A", "C", "22.5", "H")
    assert f[9].startswith("0/1:22:")


def test_merge_haplotype_homref_dropped():
    got = _merge([_vcf_row(qual=15.0)], ["chr1\t100\tAA\t30.0\n"])
    assert not [l for l in got.split("\n") if l and not l.startswith("#")]


def test_merge_haplotype_homalt_and_1_2():
    got = _merge([_vcf_row(qual=15.0)], ["chr1\t100\tCC\t30.0\n"])
    body = [l for l in got.split("\n") if l and not l.startswith("#")]
    f = body[0].split("\t")
    assert (f[4], f[9].split(":")[0]) == ("C", "1/1")

    got = _merge([_vcf_row(qual=15.0)], ["chr1\t100\tGC\t30.0\n"])
    f = [l for l in got.split("\n") if l and not l.startswith("#")][0].split("\t")
    assert (f[4], f[9].split(":")[0]) == ("C,G", "1/2")


def test_merge_low_hap_qual_fallback():
    got = _merge([_vcf_row(qual=15.0)], ["chr1\t100\tAC\t5.0\n"])
    body = [l for l in got.split("\n") if l and not l.startswith("#")]
    assert len(body) == 1 and body[0].split("\t")[7] == "P"


def test_fast_decoder_matches_scalar():
    """Vectorized decoder vs the scalar reference-exact port on fuzzed
    batches, both bug-compat modes."""
    from nanosnp_tpu.decode.pileup_vcf import decode_pileup_calls_fast

    rng = np.random.default_rng(31337)
    for trial in range(6):
        n = int(rng.integers(1, 700))
        gt = rng.random((n, 21)).astype(np.float32)
        # bias some rows to indel classes and some to ref-matching classes
        boost = rng.integers(0, 21, n)
        gt[np.arange(n), boost] += rng.random(n) * 3
        gt /= gt.sum(1, keepdims=True)
        zy = rng.random((n, 3)).astype(np.float32)
        zy[np.arange(n), rng.integers(0, 3, n)] += rng.random(n) * 2
        zy /= zy.sum(1, keepdims=True)
        center = rng.integers(-30, 30, (n, 18)).astype(np.int64)
        if n > 3:
            center[rng.integers(0, n, 2)] = 0      # depth-0 rows
        pos = np.sort(rng.choice(np.arange(1, 10 * n + 2), n, replace=False))
        refs = [str(b) for b in rng.choice(list("ACGT"), n)]
        for bug_compat in (True, False):
            a, b = io.StringIO(), io.StringIO()
            na = decode_pileup_calls("c", pos, refs, gt, zy, center, a,
                                     batch_size=100, bug_compat=bug_compat)
            nb = decode_pileup_calls_fast("c", pos, refs, gt, zy, center, b,
                                          batch_size=100,
                                          bug_compat=bug_compat)
            assert na == nb, (trial, bug_compat, na, nb)
            assert a.getvalue() == b.getvalue(), (trial, bug_compat)
