from .fasta import ReferenceGenome, IndexedFasta, InMemoryReference
