"""Label construction vs the reference get_truth.py oracle."""
import sys

import numpy as np

from nanosnp_tpu.train import labels as L

REF_HAPLO = "/root/reference/HaplotypeModel"


def _oracle():
    if REF_HAPLO not in sys.path:
        sys.path.insert(0, REF_HAPLO)
    import get_truth
    return get_truth


def test_gt21_and_zygosity_match_reference_oracle(rng):
    gt = _oracle()
    bases = "ACGT"
    cases = []
    # SNVs het/hom, multi-allelic, ins, del
    for ref in bases:
        for alt in bases:
            if alt == ref:
                continue
            cases.append((ref, alt, 0, 1))
            cases.append((ref, alt, 1, 1))
    cases += [
        ("A", "C,G", 1, 2), ("T", "A,C", 1, 2),
        ("A", "ACGT", 0, 1), ("A", "ACGT", 1, 1),       # insertions
        ("ACGT", "A", 0, 1), ("ACGT", "A", 1, 1),       # deletions
        ("A", "AC,ACC", 1, 2),                           # ins/ins multi
        ("AC", "A,ACT", 1, 2),                           # del+ins multi
        ("ACG", "A,AC", 1, 2),                           # del/del multi
    ]
    for ref, alt, g1, g2 in cases:
        arr = alt.split(",")
        if len(arr) == 1:
            arr = [ref, alt] if (g1 == 0 or g2 == 0) else [alt, alt]
        want_gt21 = gt.gt21_enum_from(ref, alt, g1, g2, arr)
        got_gt21 = L.gt21_enum_from(ref, alt, g1, g2)
        assert got_gt21 == want_gt21, (ref, alt, g1, g2)
        want_zy = gt.genotype_enum_for_task(gt.genotype_enum_from(g1, g2))
        got_zy = L.genotype_enum_for_task(L.genotype_enum_from(g1, g2))
        assert got_zy == want_zy


def test_y_label_layout():
    y = L.y_label_from_truth("A", "C", 0, 1)
    assert y.shape == (90,) and y.sum() == 4
    assert y[1] == 1                 # AC
    assert y[21 + 2] == 1            # het
    assert y[24 + 16] == 1 and y[24 + 33 + 16] == 1  # lengths 0,0

    y = L.y_label_from_truth("A", "ACG", 1, 1)       # homo insertion +2
    assert y[L.GT21_MAP["InsIns"]] == 1
    assert y[21 + 1] == 1
    assert y[24 + 16 + 2] == 1

    y = L.y_label_from_reference("G")
    assert y[L.GT21_MAP["GG"]] == 1 and y[21 + 0] == 1


def test_truth_arrays():
    gt = _oracle()
    seq = np.frombuffer(b"ACGTNACGTA", dtype=np.uint8).copy()
    arrays = L.truth_arrays(
        {"c": 10}, {"c": seq},
        L.parse_bed(["c\t1\t9\n"]),
        ["c\t3\t.\tG\tT\t30\tPASS\t.\tGT\t0/1\n"],
    )
    a = arrays["c"]
    # bed quirk: flags cover [0, 8)
    assert a[:8, 0].sum() == 8 and a[8:, 0].sum() == 0
    # default gt21 from ref base; N keeps ASCII
    assert a[0, 1] == 0 and a[1, 1] == 4 and a[4, 1] == ord("N")
    # truth site applied
    assert a[2, 1] == gt.gt21_enum_from("G", "T", 0, 1, ["G", "T"])
    assert a[2, 2] == 2
    assert (a[[0, 1, 3], 2] == -1).all()
