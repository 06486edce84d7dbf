from .variants import Allele, Variant
from .haplotypes import Haplotype
from .genotypes import (
    generate_all_genotypes,
    num_genotypes,
    genotype_zygosity,
)
