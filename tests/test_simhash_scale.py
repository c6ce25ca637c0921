"""SimHash 64-bit contract stability + the 128-bit scale variant."""

from __future__ import annotations

import pytest

from bento_spark.operators.dedupe_fuzzy import simhash_near_pairs, simhash_table


def _docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far away "
            "into the deep dark forest where nobody ever goes anymore at night")
    rows = [
        (1, base),
        (2, base.replace("quick", "rapid")),          # near-dup of 1
        (3, base + " extra trailing tokens here"),    # near-dup of 1
        (4, "completely different text about spark structured streaming engines "
            "windows watermarks joins and exactly once delivery semantics today"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_simhash128_word0_matches_64bit_contract(spark):
    df = _docs(spark)
    s64 = {r.id: r.simhash for r in simhash_table(df).collect()}
    s128 = {r.id: (r.simhash_0, r.simhash_1) for r in simhash_table(df, bits=128).collect()}
    for i in s64:
        assert s128[i][0] == s64[i]  # word 0 bit-identical: fixtures stay valid


def test_simhash128_finds_near_dups(spark):
    """Hamming distance scales ~linearly with signature width: the 64-bit
    h<=k criterion corresponds to h<=2k at 128 bits. Thresholds must be
    chosen per width."""
    df = _docs(spark)
    tight = {(r.id_a, r.id_b) for r in simhash_near_pairs(df, max_hamming=7, bits=128, n_bands=8).collect()}
    loose = {(r.id_a, r.id_b) for r in simhash_near_pairs(df, max_hamming=15, bits=128, n_bands=16).collect()}
    assert (1, 2) in tight                      # 1-token swap: tight near-dup
    assert (1, 3) in loose and tight <= loose   # 4 extra tokens: looser band
    assert not any(4 in p for p in loose)       # unrelated text never pairs


def test_simhash_config_errors(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="multiple of 64"):
        simhash_near_pairs(df, bits=96)
    with pytest.raises(ValueError, match="not divisible"):
        simhash_near_pairs(df, bits=128, n_bands=5)
