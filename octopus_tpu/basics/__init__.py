from .genomic_region import ContigRegion, GenomicRegion
from .sequence import (
    encode_sequence,
    decode_sequence,
    reverse_complement,
    A, C, G, T, N,
)
from .cigar import (
    CigarOp,
    parse_cigar,
    cigar_to_string,
    reference_span,
    query_span,
)
from .phred import phred_to_ln_prob, ln_prob_to_phred, probability_to_phred
