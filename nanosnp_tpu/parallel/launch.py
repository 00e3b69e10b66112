"""Multi-host launch + work partitioning.

Replaces the reference's GNU-parallel process fan-out (scripts/s3:35-69) and
pthread chromosome queues (make_candidate_snp_tensor/main.cpp:314-357) with:

  - jax.distributed.initialize() per host (DCN: each host runs its own input
    pipeline over its contig shard; ICI: chips inside a host share the flat
    data axis; XLA collectives handle any cross-chip reduction);
  - a deterministic contig -> host assignment balanced by contig length
    (longest-processing-time greedy), so every host computes the same plan
    independently without communication;
  - the final VCF is a host-gather: each host writes per-contig outputs,
    host 0 concatenates in contig order (decode/sort ordering), mirroring
    the reference's file-concatenation merge at process level.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from ..constants import contig_sort_key


@dataclass
class HostPlan:
    host_id: int
    n_hosts: int
    contigs: List[str]


def plan_contig_shards(
    contig_lengths: Dict[str, int],
    n_hosts: int,
) -> List[List[str]]:
    """LPT-greedy assignment of contigs to hosts, deterministic across
    hosts (ties broken by contig order)."""
    items = sorted(contig_lengths.items(),
                   key=lambda kv: (-kv[1], contig_sort_key(kv[0])))
    loads = [0] * n_hosts
    shards: List[List[str]] = [[] for _ in range(n_hosts)]
    for name, length in items:
        h = min(range(n_hosts), key=lambda i: (loads[i], i))
        loads[h] += length
        shards[h].append(name)
    for s in shards:
        s.sort(key=contig_sort_key)
    return shards


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostPlan:
    """Initialize JAX multi-host (no-op single host when unconfigured).

    Env-driven like production launchers: NSP_COORDINATOR, NSP_NUM_PROCS,
    NSP_PROC_ID (or the standard JAX env)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("NSP_COORDINATOR")
    num_processes = num_processes or int(os.environ.get("NSP_NUM_PROCS", "0")) or None
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("NSP_PROC_ID", "-1")))

    if coordinator_address and num_processes and process_id >= 0:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return HostPlan(
        host_id=jax.process_index(),
        n_hosts=jax.process_count(),
        contigs=[],
    )


def host_contigs(plan: HostPlan, contig_lengths: Dict[str, int]) -> List[str]:
    shards = plan_contig_shards(contig_lengths, plan.n_hosts)
    return shards[plan.host_id]


def barrier(name: str = "nsp_barrier") -> None:
    """Cross-host synchronization point (no-op single host).

    Uses the JAX coordination service (the same channel
    jax.distributed.initialize set up), so it works on CPU/TPU alike —
    this replaces the reference's implicit barrier of `wait`-ing for GNU
    parallel jobs (scripts/s3_phasing_long_reads.sh:35-69)."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def merge_host_vcfs(host_paths: Sequence[str], output_path: str) -> int:
    """Merge per-host VCFs (disjoint contig sets) into one contig-ordered
    VCF. Host files may arrive in any order; rows are re-sorted by
    (contig order, position) — the reference's sortvcf.py semantics.
    Returns body row count."""
    from ..decode.sort import sort_vcf_lines

    lines: list = []
    for path in host_paths:
        with open(path) as f:
            lines.extend(f)
    out_lines = sort_vcf_lines(lines)
    with open(output_path, "w") as out:
        out.writelines(out_lines)
    return sum(1 for l in out_lines if not l.startswith("#"))


def merge_host_csvs(host_paths: Sequence[str], output_path: str) -> int:
    """Merge per-host haplotype CSVs (`ctg\\tpos\\t...` rows, no header)
    into contig order."""
    rows = []
    for path in host_paths:
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                cols = line.split("\t", 2)
                rows.append(((contig_sort_key(cols[0]), int(cols[1])), line))
    rows.sort(key=lambda kv: kv[0])
    with open(output_path, "w") as out:
        for _, line in rows:
            out.write(line)
    return len(rows)


def gather_vcf_shards(
    shard_paths: Sequence[str],
    output_path: str,
    header_from: Optional[str] = None,
) -> int:
    """Concatenate per-contig VCF shards in contig order, keeping one
    header. Returns total body rows."""
    rows = 0
    wrote_header = False
    with open(output_path, "w") as out:
        for path in shard_paths:
            with open(path) as f:
                for line in f:
                    if line.startswith("#"):
                        if not wrote_header:
                            out.write(line)
                        continue
                    out.write(line)
                    rows += 1
            wrote_header = True
    return rows
