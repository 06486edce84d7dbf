import numpy as np
import pytest

from octopus_tpu.core.csr.threshold import (
    ThresholdFilter, parse_filter_expression, DEFAULT_GERMLINE_EXPRESSION)
from octopus_tpu.core.csr.measures import compute_measures
from octopus_tpu.core.callers.base import SiteCall
from octopus_tpu.core.types.variants import Variant
from octopus_tpu.basics.reads import make_read_batch, FLAG_REVERSE
from octopus_tpu.basics.sequence import encode_sequence


class TestExpressionParser:
    def test_default_parses(self):
        clauses = parse_filter_expression(DEFAULT_GERMLINE_EXPRESSION)
        assert len(clauses) == 10
        assert clauses[0].measure == "QUAL" and clauses[0].op == "<" and clauses[0].value == 10

    def test_classify(self):
        f = ThresholdFilter("QUAL < 10 | SB > 0.98")
        assert f.classify({"QUAL": 50, "SB": 0.2}) == []
        assert f.classify({"QUAL": 5, "SB": 0.2}) == ["QUAL10"]
        assert set(f.classify({"QUAL": 5, "SB": 0.99})) == {"QUAL10", "SB0.98"}

    def test_bad_expression_raises(self):
        with pytest.raises(ValueError):
            parse_filter_expression("QUAL <")


class TestMeasures:
    def _call(self, begin=50):
        v = Variant.make(begin, encode_sequence("A"), encode_sequence("T"))
        return SiteCall(begin=begin, end=begin + 1, alts=[v], quality=200.0,
                        genotypes=[[0, 1]], genotype_qualities=[80.0],
                        phase_set=0, alt_qualities=[200.0])

    def test_depth_and_af(self):
        seq = "ACGT" * 30
        reads = []
        for i in range(10):
            s = list(seq[30:90])
            if i < 5:
                s[20] = "T"     # alt at ref pos 50
            reads.append((30, "60M", "".join(s), [35] * 60, 60,
                          FLAG_REVERSE if i % 2 else 0))
        batch = make_read_batch("chr1", reads)
        m = compute_measures(self._call(), batch)
        assert m["DP"] == 10
        assert m["AD"] == 5
        assert m["AF"] == pytest.approx(0.5)
        assert m["MQ"] == pytest.approx(60.0)
        assert m["BQ"] == 35
        assert m["AFB"] == pytest.approx(0.0)

    def test_strand_bias_detected(self):
        seq = "ACGT" * 30
        reads = []
        for i in range(30):
            s = list(seq[30:90])
            if i < 15:
                s[20] = "T"
            # all alt reads forward, all ref reads reverse
            reads.append((30, "60M", "".join(s), [35] * 60, 60,
                          0 if i < 15 else FLAG_REVERSE))
        batch = make_read_batch("chr1", reads)
        m = compute_measures(self._call(), batch)
        assert m["SB"] > 0.98
