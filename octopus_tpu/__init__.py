"""octopus_tpu — a TPU-native haplotype-aware variant-calling engine.

A from-scratch reimplementation of the capabilities of luntergroup/octopus
(reference: /root/reference) designed TPU-first:

- Host layer (Python/numpy + C++ where hot): FASTA/BAM/VCF I/O, read pipeline,
  candidate generation, haplotype-tree bookkeeping, VCF record construction,
  region scheduling.
- Device layer (JAX/XLA/Pallas): the banded pair-HMM that scores every
  read x haplotype pair runs as a batched wavefront kernel; genotype and
  caller-model posteriors (individual/population/trio/cancer/polyclone/cell)
  are vectorised log-space reductions and variational-Bayes loops; multi-chip
  scaling via `jax.sharding` meshes.

Layer map mirrors the reference's (SURVEY.md section 1) but the implementation
is an independent TPU-idiomatic design.
"""

__version__ = "0.1.0"
