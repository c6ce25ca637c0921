"""Driver-contract smoke: entry() runs and yields rows with a stable schema;
queries()/oracle_sql() keys line up."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # the flagship query must yield windowed rows
    assert df.columns == ["window_start_s", "codec", "n", "avg_rms", "total_samples"]


def test_oracle_keys_cover_all_queries():
    """Every queries() entry has an oracle: the formerly rows-only family
    is gated through fixture-pinned oracles (fixtures/ via
    tools/make_fixtures.py) — see oracle_sql() for the pinning contract."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    assert qs - os_ == set()
