"""Random and remote candidate proposal components.

Capability-equivalent to the reference's Randomiser
(src/core/tools/vargen/randomiser.{hpp,cpp}): periodic random
reverse-complement substitutions of the reference, used to stress-test the
calling stack with known-false candidates.  Also provides the Downloader
slot (src/core/tools/vargen/downloader.{hpp,cpp}) whose HTTP body is
disabled in the reference as well; in this zero-egress environment it is a
documented gate returning no candidates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ...basics.reads import ReadBatch
from ...basics.sequence import reverse_complement
from ..types.variants import Variant


@dataclass
class RandomiserOptions:
    seed: int = 0          # reference uses wall-clock seeding; we stay reproducible


class Randomiser:
    """Propose one random substitution roughly every max-read-size bases.

    Mirrors Randomiser::do_generate (randomiser.cpp:37-57): sample a uniform
    start offset in [0, min(region_size, max_read_size)], then step by the
    largest read length seen, emitting ref->reverse_complement(ref) SNVs.
    """

    def __init__(self, reference, contig: str,
                 options: RandomiserOptions | None = None):
        self.reference = reference
        self.contig = contig
        self.options = options or RandomiserOptions()
        self._max_read_size = 0

    def add_reads(self, sample: int, batch: ReadBatch) -> None:
        if len(batch):
            sizes = np.asarray(batch.ends) - np.asarray(batch.begins)
            self._max_read_size = max(self._max_read_size, int(sizes.max()))

    def generate(self, begin: int, end: int) -> list[Variant]:
        num_positions = end - begin
        if num_positions <= 0 or self._max_read_size <= 0:
            return []
        rng = np.random.default_rng(self.options.seed ^ (begin * 2654435761 & 0xFFFFFFFF))
        step = self._max_read_size
        first = int(rng.integers(0, min(num_positions, step) + 1))
        out: list[Variant] = []
        for p in range(first, num_positions, step):
            pos = begin + p
            ref = self.reference.fetch_codes(self.contig, pos, pos + 1)
            alt = reverse_complement(ref)
            if not np.array_equal(ref, alt):
                out.append(Variant.make(pos, ref, alt))
        return out

    name = "Random"


class Downloader:
    """Ensembl REST candidate source (reference stub, downloader.cpp:23-57).

    The reference ships this with its HTTP client commented out and returns
    an empty set; this build additionally runs with zero network egress, so
    the component is a documented no-op that preserves the composite
    VariantGenerator slot.
    """

    def __init__(self, reference, contig: str):
        self.reference = reference
        self.contig = contig

    def add_reads(self, sample: int, batch: ReadBatch) -> None:
        pass

    def generate(self, begin: int, end: int) -> list[Variant]:
        return []

    name = "Download"


__all__ = ["Randomiser", "RandomiserOptions", "Downloader"]
