"""Driver-gate window contract (__spark_entry__ ordering machinery).

The driver's CORRECTNESS gate evaluates the FIRST 50 entries of
``queries()`` in dict order; ``_GATE_PRIORITY`` / ``_GATE_DEFER``
control that order.  These tests pin the invariants the rotation
policy depends on, so a refactor that silently breaks the ordering
(or registers a window query without an oracle) fails fast instead of
burning a round's driver window.
"""

from __future__ import annotations

import __spark_entry__ as e

WINDOW = 50


def test_window_queries_all_have_oracles():
    names = list(e.queries())
    oracles = e.oracle_sql()
    missing = [n for n in names[:WINDOW] if n not in oracles]
    assert not missing, f"window slots without a value-hash oracle: {missing}"


def test_gate_lists_are_clean():
    names = set(e.queries())
    for lst in (e._GATE_PRIORITY, e._GATE_DEFER):
        assert len(lst) == len(set(lst)), "duplicate names in a gate list"
        unknown = [n for n in lst if n not in names]
        assert not unknown, f"gate list names not in the registry: {unknown}"
    overlap = set(e._GATE_PRIORITY) & set(e._GATE_DEFER)
    assert not overlap, f"names in both priority and defer: {overlap}"


def test_priority_block_leads_the_emitted_order():
    names = list(e.queries())
    prio = [n for n in e._GATE_PRIORITY if n in set(names)]
    assert names[: len(prio)] == prio


def test_rows_only_queries_sit_at_the_tail():
    names = list(e.queries())
    oracles = e.oracle_sql()
    rows_only = [n for n in names if n not in oracles]
    assert names[-len(rows_only):] == rows_only


def test_every_query_is_callable_and_every_oracle_has_a_query():
    qs = e.queries()
    assert all(callable(fn) for fn in qs.values())
    dangling = [n for n in e.oracle_sql() if n not in qs]
    assert not dangling
