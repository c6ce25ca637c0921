"""Driver-contract smoke: entry() runs and yields rows with a stable schema;
queries()/oracle_sql() keys line up."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["window_start_s", "codec", "n", "avg_rms", "total_samples"]


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    # rows-only queries are the documented non-SQL-expressible set
    assert qs - os_ == {
        "minhash_lsh",
        "simhash",
        "ann_lsh",
        "ann_ivf",
        "compress_roundtrip",
        "audio_features_window",
        "clip_transcript_join",
    }
