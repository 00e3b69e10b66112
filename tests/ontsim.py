"""ONT-like read simulator: homopolymer indels, context-dependent
substitutions, correlated base qualities, per-read error-rate variation.

The r1/r2 synthetic worlds used uniform substitution-only errors with
all-M alignments; a haplotype model trained there never saw ONT's dominant
error mode — homopolymer length miscalls — which is why the r2 OOD world
sat at merge F1 0.867 (VERDICT r2 weak #5 / next #5). This simulator keeps
the same diploid-truth interface as tests/diploid.py (SNV truth from
make_diploid; errors are alignment noise, never truth variants) but draws
errors from an ErrorProfile:

  - substitutions: per-position rate = sub_base x dinucleotide multiplier
    (a 16-entry context table) x per-read lognormal multiplier; the
    replacement base is transition-biased (A<->G, C<->T).
  - homopolymer indels: every run of length k >= 3 in the read's source
    haplotype draws a length miscall with p = min(hp_slope*(k-2)^hp_exp,
    hp_max) (x read multiplier), biased toward contraction; the read gains
    a real I/D CIGAR op at the run.
  - random non-HP indels at low rates (ins_rate / del_rate).
  - base qualities: correct bases ~ N(q_correct), erroneous (substituted /
    inserted) bases ~ N(q_error) — qualities carry signal like real
    basecallers.
  - mapping quality anti-correlates with the read's error multiplier.

Profiles are meant to be drawn per training world and HELD OUT for
evaluation: a model that generalizes across profiles has learned pileup
evidence, not one noise signature.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from bamgen import Read

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_CODE = np.full(256, -1, np.int8)
for _i, _b in enumerate(b"ACGT"):
    _CODE[_b] = _i
    _CODE[_b + 32] = _i  # lowercase


@dataclass
class ErrorProfile:
    name: str = "default"
    sub_base: float = 0.02
    # 16 dinucleotide multipliers (prev_base*4 + base), ~[0.5, 2.5]
    sub_context: np.ndarray = field(
        default_factory=lambda: np.ones(16, np.float64))
    transition_bias: float = 2.0      # weight of A<->G / C<->T vs others
    hp_slope: float = 0.02
    hp_exp: float = 1.6
    hp_max: float = 0.35
    hp_del_frac: float = 0.65         # contractions vs expansions
    ins_rate: float = 0.004
    del_rate: float = 0.008
    read_sigma: float = 0.35          # lognormal sigma of per-read rate
    q_correct: Tuple[float, float] = (24.0, 6.0)
    q_error: Tuple[float, float] = (11.0, 5.0)
    mapq_hi: int = 58
    mapq_lo: int = 20


def random_profile(rng: np.random.Generator, name: str) -> ErrorProfile:
    """Draw a plausible ONT-ish profile; distinct draws = distinct error
    signatures (for train-profile diversity and held-out OOD eval)."""
    return ErrorProfile(
        name=name,
        sub_base=float(rng.uniform(0.01, 0.035)),
        sub_context=rng.uniform(0.5, 2.5, 16),
        transition_bias=float(rng.uniform(1.2, 3.5)),
        hp_slope=float(rng.uniform(0.01, 0.04)),
        hp_exp=float(rng.uniform(1.2, 2.0)),
        hp_max=float(rng.uniform(0.25, 0.45)),
        hp_del_frac=float(rng.uniform(0.5, 0.8)),
        ins_rate=float(rng.uniform(0.002, 0.008)),
        del_rate=float(rng.uniform(0.004, 0.012)),
        read_sigma=float(rng.uniform(0.2, 0.5)),
        q_correct=(float(rng.uniform(20, 28)), float(rng.uniform(4, 8))),
        q_error=(float(rng.uniform(8, 14)), float(rng.uniform(3, 6))),
    )


# substitution matrices [from, to] built per profile (rows sum to 1 over
# the 3 non-identical bases); transitions A<->G (0,2) and C<->T (1,3)
def _sub_matrix(bias: float) -> np.ndarray:
    m = np.ones((4, 4))
    np.fill_diagonal(m, 0.0)
    m[0, 2] = m[2, 0] = bias
    m[1, 3] = m[3, 1] = bias
    return m / m.sum(axis=1, keepdims=True)


def _rle(codes: np.ndarray):
    """Run-length encode: returns (starts, lengths)."""
    if len(codes) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate([[0], change])
    lengths = np.diff(np.concatenate([starts, [len(codes)]]))
    return starts, lengths


def _make_read(rng, src_codes: np.ndarray, start: int, prof: ErrorProfile,
               sub_m: np.ndarray, read_mult: float):
    """One read: returns (query_codes, quals, cigar) with real I/D ops."""
    frag = src_codes[start:]
    n = len(frag)
    # emit[i]: 0 = deleted, 1 = one base, 2 = base + insertion after
    emit = np.ones(n, np.int8)
    ins_base = np.full(n, -1, np.int8)

    # homopolymer length miscalls on runs >= 3
    starts, lengths = _rle(frag)
    run_mask = lengths >= 3
    if run_mask.any():
        rs, rl = starts[run_mask], lengths[run_mask]
        p = np.minimum(prof.hp_slope * (rl - 2) ** prof.hp_exp,
                       prof.hp_max) * read_mult
        hit = rng.random(len(rs)) < p
        for s, ln in zip(rs[hit], rl[hit]):
            if rng.random() < prof.hp_del_frac:
                emit[s] = 0                       # contract by one
            else:
                emit[s] = 2                       # expand by one
                ins_base[s] = frag[s]

    # random non-HP indels
    r = rng.random(n)
    del_m = (r < prof.del_rate * read_mult) & (emit == 1)
    emit[del_m] = 0
    r2 = rng.random(n)
    ins_m = (r2 < prof.ins_rate * read_mult) & (emit == 1)
    emit[ins_m] = 2
    ins_base[ins_m] = rng.integers(0, 4, int(ins_m.sum()))

    # context-dependent substitutions on emitted source bases
    prev = np.concatenate([[frag[0]], frag[:-1]])
    ctx = prof.sub_context[(prev * 4 + frag).clip(0, 15)]
    p_sub = np.minimum(prof.sub_base * ctx * read_mult, 0.5)
    sub_m_mask = (rng.random(n) < p_sub) & (emit >= 1)
    out_base = frag.copy()
    if sub_m_mask.any():
        idx = np.flatnonzero(sub_m_mask)
        cum = sub_m.cumsum(axis=1)
        u = rng.random(len(idx))[:, None]
        out_base[idx] = (u > cum[frag[idx]]).sum(axis=1)

    # assemble query + cigar tokens
    is_err_src = sub_m_mask
    # vectorized interleave: token stream has, per position, the M/D token
    # and optionally an I token
    n_tok = (emit != 0).astype(np.int64) + (emit == 2) + (emit == 0)
    # ops: for emit==0 -> D; emit==1 -> M; emit==2 -> M then I
    total = int(n_tok.sum())
    ops = np.empty(total, np.uint8)        # 0=M 1=I 2=D
    qbase = np.full(total, -1, np.int8)
    qerr = np.zeros(total, bool)
    pos_first = np.cumsum(n_tok) - n_tok
    m_mask = emit >= 1
    ops[pos_first[m_mask]] = 0
    qbase[pos_first[m_mask]] = out_base[m_mask]
    qerr[pos_first[m_mask]] = is_err_src[m_mask]
    d_mask = emit == 0
    ops[pos_first[d_mask]] = 2
    i_mask = emit == 2
    ops[pos_first[i_mask] + 1] = 1
    qbase[pos_first[i_mask] + 1] = ins_base[i_mask]
    qerr[pos_first[i_mask] + 1] = True

    q_sel = ops != 2
    query = qbase[q_sel]
    query_err = qerr[q_sel]
    # cigar RLE over ops
    op_starts, op_lens = _rle(ops)
    cigar = [("MID"[ops[s]], int(ln)) for s, ln in zip(op_starts, op_lens)]

    # qualities
    qc_mu, qc_sd = prof.q_correct
    qe_mu, qe_sd = prof.q_error
    quals = rng.normal(qc_mu, qc_sd, len(query))
    quals[query_err] = rng.normal(qe_mu, qe_sd, int(query_err.sum()))
    quals = np.clip(quals, 2, 50).astype(np.int64)
    return query, quals, cigar


def ont_reads(rng, h1: str, h2: str, ref_id: int, n_reads: int,
              read_len: int, prof: ErrorProfile,
              tag_rate: float = 0.0,
              len_jitter: float = 0.25) -> List[Read]:
    """Diploid ONT-like reads (same contract as diploid.diploid_reads but
    with the ErrorProfile machinery and real I/D CIGARs)."""
    haps = [np.frombuffer(h1.upper().encode(), np.uint8),
            np.frombuffer(h2.upper().encode(), np.uint8)]
    codes = [np.clip(_CODE[h], 0, 3).astype(np.int8) for h in haps]
    L = len(h1)
    sub_m = _sub_matrix(prof.transition_bias)
    reads = []
    for i in range(n_reads):
        hap = int(rng.integers(1, 3))
        rl = max(int(read_len * (1 + rng.normal(0, len_jitter))), 50)
        start = int(rng.integers(0, max(L - rl, 1)))
        read_mult = float(np.exp(rng.normal(0, prof.read_sigma)))
        query, quals, cigar = _make_read(
            rng, codes[hap - 1][: start + rl], start, prof, sub_m,
            read_mult)
        # trim to the source window (the fragment slice already bounds it)
        span = sum(ln for op, ln in cigar if op in "MD")
        if span > L - start:   # pragma: no cover - slice bounds prevent it
            continue
        if len(query) == 0:
            continue
        # leading/trailing deletions are not valid alignments: shift the
        # start past a leading D, drop a trailing D
        if cigar and cigar[0][0] == "D":
            start += cigar[0][1]
            cigar = cigar[1:]
        if cigar and cigar[-1][0] == "D":
            cigar = cigar[:-1]
        if not cigar:
            continue
        mapq = int(np.clip(
            prof.mapq_hi - (read_mult - 1.0) * 25 + rng.normal(0, 4),
            prof.mapq_lo, 60))
        reads.append(Read(
            name=f"o{i}",
            ref_id=ref_id,
            start0=start,
            cigar=cigar,
            seq="".join("ACGT"[c] for c in query),
            quals=[int(q) for q in quals],
            mapq=mapq,
            reverse=bool(rng.random() < 0.5),
            hp=hap if rng.random() < tag_rate else None,
        ))
    reads.sort(key=lambda r: r.start0)
    return reads
