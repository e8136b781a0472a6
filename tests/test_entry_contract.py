"""Driver-contract smoke: queries()/oracle_sql() key parity, callables,
and the flagship entry() producing rows with a stable schema."""

import sys

sys.path.insert(0, "/root/repo")


def test_registry_key_parity():
    import __ray_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert set(q) == set(o)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    res = m.entry()
    import pandas as pd

    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    assert len(res) >= 0
    assert list(res.columns)  # stable, non-empty schema
