"""Registry-contract regression tests.

The driver derives ``queries()`` / ``oracle_sql()`` from the registry,
so the registry IS the correctness surface: these tests pin its size and
its fail-loud import behavior so a broken plan module can never silently
shrink the contract (a swallowed ImportError would present as "fewer
features", not an error — the exact failure mode VERDICT r01 flagged).
"""

from __future__ import annotations

import inspect

from hadoop_lab_spark.plans import registry
from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

load_all_query_modules()

#: Update this constant in the SAME commit that registers a new query.
#: An exact count (not >=) also catches accidental de-registration.
EXPECTED_QUERIES = 160


def test_registry_exact_size():
    assert len(REGISTRY) == EXPECTED_QUERIES, sorted(REGISTRY)


def test_every_query_has_doc_and_tags():
    for name, spec in REGISTRY.items():
        assert spec.doc.strip(), f"{name} has no doc"
        assert spec.tags, f"{name} has no tags"


def test_loader_has_no_import_swallowing():
    """The loader must not contain try/except around plan imports —
    a broken module has to crash the contract, not shrink it."""
    src = inspect.getsource(registry.load_all_query_modules)
    assert "except" not in src, src


def test_rotation_puts_unverified_queries_first():
    """The driver caps CORRECTNESS at the first 50 ``queries()`` entries,
    so emission order must put never-driver-green queries first and
    least-recently-green next — otherwise registered queries silently
    starve of driver verification (VERDICT r02 finding #2)."""
    import __spark_entry__ as e

    order = list(e.queries())
    assert set(order) == set(REGISTRY)
    seen = e._last_green_round()
    ranks = [seen.get(n, 0) for n in order]
    assert ranks == sorted(ranks), "queries() not ordered by last green round"


def test_oracle_alias_parity():
    """Every oracle is non-empty SQL mentioning at least one FROM —
    cheap sanity that a refactor didn't blank a string."""
    for name, spec in REGISTRY.items():
        if spec.oracle is not None:
            assert "FROM" in spec.oracle.upper(), name
