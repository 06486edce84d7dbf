from .generator import propose_active_regions, enumerate_haplotypes
