"""Tandem repeat finding parity vs the REFERENCE's own vendored library.

tests/golden/golden_tandem.cpp compiles /root/reference/lib/tandem in place
(tandem.cpp + libdivsufsort) and prints the ground-truth repeat set for
stdin sequences; both the native kernel (tandem_exact) and the python
fallback's naive path must match it.
"""

import os
import subprocess

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_tandem")
REF_LIB = "/root/reference/lib/tandem"


def _build_golden():
    if os.path.exists(GOLDEN):
        return True
    if not os.path.isdir(REF_LIB):
        return False
    src = GOLDEN + ".cpp"
    div = os.path.join(REF_LIB, "libdivsufsort")
    cmd = ["g++", "-O2", "-std=c++14", "-I", REF_LIB, "-I", div,
           "-o", GOLDEN, src,
           os.path.join(REF_LIB, "tandem.cpp"),
           os.path.join(div, "divsufsort.c"),
           os.path.join(div, "sssort.c"),
           os.path.join(div, "trsort.c"),
           os.path.join(div, "utils.c")]
    return subprocess.run(cmd, capture_output=True).returncode == 0


def _golden_repeats(cases):
    lines = [f"{mn} {mx} {seq}" for mn, mx, seq in cases]
    out = subprocess.run([GOLDEN], input="\n".join(lines),
                         capture_output=True, text=True, check=True)
    result = []
    for line in out.stdout.splitlines():
        if line.strip() == "-":
            result.append([])
        else:
            result.append(sorted(tuple(map(int, t.split(",")))
                                 for t in line.split()))
    return result


@pytest.fixture(scope="module")
def golden():
    if not _build_golden():
        pytest.skip("reference tandem library unavailable")
    return _golden_repeats


def _random_cases(seed, n_cases, with_n=True):
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n_cases):
        n = int(rng.integers(2, 300))
        alpha = int(rng.integers(2, 6 if with_n else 5))
        codes = rng.integers(0, alpha, n).astype(np.uint8)
        seq = "".join("ACGTN"[c] for c in codes)
        for mn, mx in ((1, 3), (1, 5), (2, 4), (1, 8), (3, 3)):
            cases.append((codes, mn, mx, seq))
    return cases


def test_native_matches_reference_library(golden):
    from octopus_tpu import _native

    cases = _random_cases(7, 250)
    want = golden([(mn, mx, seq) for _, mn, mx, seq in cases])
    for (codes, mn, mx, seq), ref in zip(cases, want):
        raw = _native.tandem_repeats(codes.tobytes(), mn, mx)
        ours = sorted(map(tuple,
                          np.frombuffer(raw, np.int32).reshape(-1, 3).tolist()))
        assert ours == ref, (mn, mx, seq)


def test_python_naive_matches_reference_library(golden):
    import octopus_tpu.utils.tandem as T

    cases = [(c, mn, mx, s) for c, mn, mx, s in _random_cases(8, 150)
             if mx <= 3]
    want = golden([(mn, mx, seq) for _, mn, mx, seq in cases])
    saved = T._native
    T._native = None
    try:
        for (codes, mn, mx, seq), ref in zip(cases, want):
            ours = sorted((r.pos, r.length, r.period)
                          for r in T.extract_exact_tandem_repeats(codes, mn, mx))
            assert ours == ref, (mn, mx, seq)
    finally:
        T._native = saved


def test_error_model_usages_match_reference_library(golden):
    """The exact calls the error models make: (1,3) SNV and (1,5) indel
    (repeat_based_snv_error_model.cpp:45, repeat_based_indel_error_model
    .cpp:17)."""
    from octopus_tpu.utils.tandem import extract_exact_tandem_repeats

    rng = np.random.default_rng(9)
    cases = []
    for _ in range(120):
        n = int(rng.integers(10, 600))
        codes = rng.integers(0, int(rng.integers(2, 5)), n).astype(np.uint8)
        seq = "".join("ACGT"[c] for c in codes)
        cases.append((codes, 1, 3, seq))
        cases.append((codes, 1, 5, seq))
    want = golden([(mn, mx, seq) for _, mn, mx, seq in cases])
    for (codes, mn, mx, seq), ref in zip(cases, want):
        ours = sorted((r.pos, r.length, r.period)
                      for r in extract_exact_tandem_repeats(codes, mn, mx))
        assert ours == ref, (mn, mx, seq)
