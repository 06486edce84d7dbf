"""Per-contig ploidy mapping.

Capability-equivalent to the reference's PloidyMap (src/basics/ploidy_map.hpp)
and --contig-ploidies/--contig-ploidies-file options: organism default with
per-contig overrides (chrY=1 etc.); human sex-chromosome defaults follow the
reference's builtin table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

HUMAN_DEFAULTS = {"Y": 1, "chrY": 1, "MT": 1, "chrM": 1, "chrMT": 1}


@dataclass
class PloidyMap:
    organism: int = 2
    contig_ploidies: dict[str, int] = field(default_factory=dict)

    def of(self, contig: str) -> int:
        if contig in self.contig_ploidies:
            return self.contig_ploidies[contig]
        if contig in HUMAN_DEFAULTS:
            return HUMAN_DEFAULTS[contig]
        return self.organism

    @staticmethod
    def parse(organism: int, specs: list[str] | None,
              path: str | None = None) -> "PloidyMap":
        """specs like ['chrX=1', 'chrY=1']; file: one 'contig ploidy' per line."""
        overrides: dict[str, int] = {}
        for spec in specs or []:
            contig, _, p = spec.partition("=")
            if p:
                overrides[contig] = int(p)
        if path:
            with open(path) as fh:
                for line in fh:
                    parts = line.split()
                    if len(parts) >= 2 and not line.startswith("#"):
                        overrides[parts[0]] = int(parts[1])
        return PloidyMap(organism, overrides)


__all__ = ["PloidyMap", "HUMAN_DEFAULTS"]
