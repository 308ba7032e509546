"""bench.py contract: every headline name resolves in the registry and
the set stays free of rows-only entries (a bench query must be one the
correctness gate also covers)."""

from __future__ import annotations


def test_headline_names_resolve_and_are_oracled():
    from bench import HEADLINE
    from hive_release_spark.queries import REGISTRY

    missing = [n for n in HEADLINE if n not in REGISTRY]
    assert not missing, missing
    unoracled = [n for n in HEADLINE if REGISTRY[n].oracle is None]
    assert not unoracled, unoracled
    assert len(set(HEADLINE)) == len(HEADLINE)
