"""SQL-text models: the dbt authoring surface (reference
``models/raw_texi.sql``, ``models/core_texi.sql``) on the Spark engine.

A model is a SQL string with the dbt macros that matter:

* ``{{ config(materialized='incremental', unique_key='id', ...) }}`` —
  materialization spec, parsed at registration;
* ``{{ ref('model') }}`` / ``{{ source('name') }}`` — upstream resolution
  (also how the DAG edges are discovered, exactly like dbt's parser);
* ``{{ this }}`` — the model's own existing table (incremental predicates);
* ``{% if is_incremental() %} ... {% endif %}`` — included only on
  incremental runs against an existing table.

Rendering is deliberately regex-based and total: anything jinja-like that
isn't one of the macros above is a registration-time error, not a silent
pass-through. The rendered SQL runs through ``spark.sql`` — Catalyst sees
exactly what a DataFrame-authored model would produce, so pushdown/AQE
behave identically.
"""

from __future__ import annotations

import ast
import re

from pyspark.sql import DataFrame

_CONFIG_RE = re.compile(r"\{\{\s*config\s*\((?P<args>.*?)\)\s*\}\}", re.DOTALL)
_REF_RE = re.compile(r"\{\{\s*ref\s*\(\s*['\"](?P<name>\w+)['\"]\s*\)\s*\}\}")
_SOURCE_RE = re.compile(r"\{\{\s*source\s*\(\s*['\"](?P<name>\w+)['\"]\s*\)\s*\}\}")
_THIS_RE = re.compile(r"\{\{\s*this\s*\}\}")
_INCR_RE = re.compile(
    r"\{%\s*if\s+is_incremental\s*\(\s*\)\s*%\}(?P<body>.*?)\{%\s*endif\s*%\}",
    re.DOTALL,
)
_ANY_JINJA_RE = re.compile(r"\{\{.*?\}\}|\{%.*?%\}", re.DOTALL)


def parse_config(sql: str) -> tuple[dict, str]:
    """Extract ``{{ config(...) }}`` kwargs (python-literal values) and
    return (config, sql-without-the-block)."""
    m = _CONFIG_RE.search(sql)
    if not m:
        return {}, sql
    call = ast.parse(f"f({m.group('args')})", mode="eval").body
    cfg = {kw.arg: ast.literal_eval(kw.value) for kw in call.keywords}
    return cfg, sql[: m.start()] + sql[m.end() :]


def parse_deps(sql: str) -> tuple[list[str], list[str]]:
    """(refs, sources) mentioned in the SQL — the DAG edges."""
    return (
        sorted({m.group("name") for m in _REF_RE.finditer(sql)}),
        sorted({m.group("name") for m in _SOURCE_RE.finditer(sql)}),
    )


def render(sql: str, ctx, model_name: str, incremental_run: bool) -> str:
    """Substitute macros against live relations: each ref/source is
    registered as a temp view and the macro text becomes the view name."""
    sql = _INCR_RE.sub(lambda m: m.group("body") if incremental_run else "", sql)

    def bind(df: DataFrame, view: str) -> str:
        df.createOrReplaceTempView(view)
        return view

    sql = _REF_RE.sub(lambda m: bind(ctx.ref(m.group("name")), f"__ref_{m.group('name')}"), sql)
    sql = _SOURCE_RE.sub(
        lambda m: bind(ctx.source(m.group("name")), f"__src_{m.group('name')}"), sql
    )
    # {{ this }} names the MATERIALIZED table: qualify it so a session
    # temp view with the model's name can't shadow it (the same failure
    # ModelRegistry.materialized_df qualifies against — a bare name here
    # would read the incremental high-water mark from the wrong relation)
    cat = ctx.spark.catalog.currentCatalog()
    db = ctx.spark.catalog.currentDatabase()
    this_ident = f"`{cat}`.`{db}`.`{model_name}`"
    sql = _THIS_RE.sub(lambda m: this_ident, sql)

    leftover = _ANY_JINJA_RE.search(sql)
    if leftover:
        raise ValueError(
            f"sql model {model_name}: unsupported template construct "
            f"{leftover.group(0)!r}"
        )
    return sql
