"""bwamem_tpu — a TPU-native BWA-MEM short-read aligner.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
peterpengwei/bwa-mem-sw hardware/software system (an FPGA banded
Smith-Waterman seed-extension accelerator for bwa-0.7.8): the full
BWA-MEM pipeline — FM-index SMEM seeding, seed chaining, banded
affine-gap seed extension, CIGAR generation, MAPQ and SAM emission —
re-designed TPU-first.

Layer map (the TPU analogue of SURVEY.md §1):

  io/        FASTA/FASTQ parsing, 2-bit reference encoding, SAM model
  index/     BWT / FM-index construction and device (HBM) layout
  ops/       compute kernels, each in three twins:
               *_ref.py    scalar numpy golden reference
               *_jax.py    batched, vectorized pure-JAX (runs anywhere)
               *_pallas.py Pallas TPU kernel (the fast path)
  pipeline/  task packing (the TBB/RBB wire-format analogue), batching,
             the full read->alignment pipeline, CIGAR, MAPQ
  parallel/  jax.sharding Mesh / shard_map multi-chip data parallelism
  utils/     timers, GCUPS accounting

The reference's 80 FPGA processing elements + batch_manager stream
machinery (see /root/reference/sw_pe_array.v, batch_manager.v) map to a
single Pallas banded-DP kernel batched over thousands of seeds per chip,
fed by vectorized task packing.
"""

__version__ = "0.1.0"

from bwamem_tpu.config import MemOptions  # noqa: F401
