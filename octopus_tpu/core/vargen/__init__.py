from .cigar_scanner import CigarScanner, ScannerOptions
