"""Declarative schema config — the dbt ``schema.yml`` surface.

The reference declares sources and per-column tests in YAML
(``models/schema.yml:1-27``: a source table, `not_null`/`unique` built-ins,
and the two custom generic tests by name). This module maps that exact
document shape onto a :class:`ModelRegistry`, so a dbt user's schema file
carries over with the same vocabulary:

    version: 2
    sources:
      - name: Texi_data
        tables: [{name: Texi_data}]
    models:
      - name: core_texi
        columns:
          - name: unique_id
            tests: [not_null, unique]
          - name: trip_duration_minutes
            tests: [not_null, custom_positive_test]
          - name: avg_speed_mph
            tests: [custom_speed_limit]

Custom generic tests are plain Python callables registered by name — the
engine's macro system (SURVEY.md §2.11 U1/U2).
"""

from __future__ import annotations

from collections.abc import Callable

from data_etl_with_dbt_spark.plans import dq
from data_etl_with_dbt_spark.plans.dag import ModelRegistry

#: Built-in + reference-custom generic tests, addressable by schema.yml name.
TEST_REGISTRY: dict[str, Callable] = {
    "not_null": dq.not_null,
    "unique": dq.unique,
    "accepted_values": dq.accepted_values,
    "relationships": dq.relationships,
    "custom_positive_test": dq.positive,
    "custom_speed_limit": dq.speed_limit,
}


def register_test(name: str, fn: Callable) -> None:
    """Register a custom generic test (the dbt `{% test %}` macro analog)."""
    TEST_REGISTRY[name] = fn


def apply_schema_config(registry: ModelRegistry, config: dict) -> int:
    """Wire a schema.yml-shaped dict into the registry: sources become
    catalog lookups, per-column test declarations become dq tests. Models
    themselves stay Python functions (registered separately) — dbt's SQL
    bodies map to DataFrame builders, not templated strings.

    Returns the number of tests attached. Accepts both the string form
    (``tests: [not_null]``) and the parameterized dict form
    (``tests: [{accepted_values: {values: [A, B]}}]``).
    """
    n = 0
    for source in config.get("sources", []):
        for table in source.get("tables", []):
            # Don't clobber a source already registered programmatically
            # (e.g. a loader function) — the YAML then only documents it.
            if table["name"] not in registry._sources:
                registry.add_source(table["name"], table.get("identifier", table["name"]))
    for model in config.get("models", []):
        for column in model.get("columns", []):
            for decl in column.get("tests", []):
                if isinstance(decl, str):
                    test_name, params = decl, {}
                else:
                    test_name, params = next(iter(decl.items()))
                if test_name not in TEST_REGISTRY:
                    raise KeyError(
                        f"unknown test {test_name!r}; register it with register_test()"
                    )
                params = dict(params or {})
                # dbt nests severity/store_failures under config:; flatten
                # so they reach run_test alongside the test's own params
                # (an empty `config:` key parses to None in YAML)
                params.update(params.pop("config", None) or {})
                registry.add_test(
                    model["name"], TEST_REGISTRY[test_name], column["name"], **params
                )
                n += 1
    return n


def load_schema_yaml(registry: ModelRegistry, path: str) -> int:
    """Load an actual schema.yml file (needs PyYAML; the dict-based
    :func:`apply_schema_config` is dependency-free)."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise ImportError("PyYAML not installed; use apply_schema_config(dict)") from e
    with open(path) as f:
        return apply_schema_config(registry, yaml.safe_load(f))
