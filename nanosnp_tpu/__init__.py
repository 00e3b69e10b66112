"""NanoSNP-TPU: a TPU-native haplotype-aware SNP caller for low-coverage ONT data.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
huangnengCSU/NanoSNP (reference mounted at /root/reference): the six-stage
progressive pipeline — pileup feature extraction, pileup BiLSTM calling,
read phasing, haplotype feature extraction, haplotype BiLSTM calling, merge —
re-architected as:

  - C++ host kernels for string-heavy IO (mpileup parsing, FASTA),
  - vectorized NumPy/JAX feature assembly (no per-site Python loops),
  - batched BiLSTM inference under jit with fused-gate matmuls (MXU),
  - Pallas kernels for the masked-statistics haplotype featurizer,
  - pjit/shard_map data-parallel scaling over a device mesh.
"""

__version__ = "0.1.0"
