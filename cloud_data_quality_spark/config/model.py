"""Config data model: rules, rule bindings, row filters, entities.

Mirrors the semantics of the reference's dataclasses (behavior studied at
clouddq/classes/dq_rule.py:23-65, dq_rule_binding.py:41-138,
dq_row_filter.py:23-56, dq_entity.py:95-267, dq_entity_column.py:26-69,
dq_reference_columns.py:37-66, rule_type.py:28-197) but is written from
scratch for a Spark compiler target:

* rule types: NOT_NULL, NOT_BLANK, REGEX, CUSTOM_SQL_EXPR,
  CUSTOM_SQL_STATEMENT — plus CUSTOM_PANDAS_BATCH, a new vectorized-Arrow
  rule type the reference has no equivalent of (used by the web-text rules).
* ``$column`` substitution via string.Template, with the reference's quirk:
  the bound column is prefixed ``data.`` iff the column is literally named
  ``data`` (only for EXPR-style rules, never for STATEMENT rules).
* ``custom_sql_arguments`` named-parameter substitution; a missing argument
  is a hard error.
* forbidden-SQL guard rejecting ``; # -- /* */``.
* closed rule-dimension vocabulary (configs/rule_dimensions.yml:15-21).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum, unique
from string import Template
from typing import Any

RE_FORBIDDEN_SQL = re.compile(r"([;#]|\-\-|\*\/|\/\*)")

DEFAULT_RULE_DIMENSIONS = [
    "CONSISTENCY",
    "CORRECTNESS",
    "DUPLICATION",
    "COMPLETENESS",
    "CONFORMANCE",
    "INTEGRITY",
    "TIMELINESS",
    "ACCURACY",
    "VALIDITY",
    "UNIQUENESS",
]

# Spark-type whitelist for entity columns (reference maps BQ types at
# dq_entity_column.py:146-220; we canonicalize straight to Spark SQL types).
COLUMN_TYPE_ALIASES: dict[str, str] = {
    "STRING": "string", "CHAR": "string", "NCHAR": "string", "VARCHAR": "string",
    "NVARCHAR": "string", "TEXT": "string",
    "INT64": "bigint", "INT": "bigint", "INTEGER": "bigint", "INT32": "bigint",
    "SMALLINT": "bigint", "BIGINT": "bigint",
    "FLOAT64": "double", "FLOAT": "double", "FLOAT32": "double", "REAL": "double",
    "DOUBLE": "double",
    "NUMERIC": "decimal(38,9)", "DECIMAL": "decimal(38,9)",
    "BOOL": "boolean", "BOOLEAN": "boolean", "TINYINT": "boolean", "BIT": "boolean",
    "DATETIME": "timestamp_ntz",
    "TIMESTAMP": "timestamp",
    "DATE": "date",
    "TIME": "string",
    "ARRAY": "array", "STRUCT": "struct", "RECORD": "struct",
    "BYTES": "binary", "BINARY": "binary",
}


class ConfigError(ValueError):
    """Raised for any invalid YAML config (bad type, missing field, ...)."""


def check_for_invalid_sql(context: str, sql_string: str) -> None:
    """Reject statement separators / comment tokens inside rule SQL
    (reference behavior: rule_type.py:28,70-76)."""
    if RE_FORBIDDEN_SQL.search(sql_string):
        raise ConfigError(
            f"{context}: SQL contains forbidden characters (one of `; # -- /* */`): "
            f"{sql_string!r}"
        )


def assert_not_empty(value: Any, msg: str) -> Any:
    if value is None or (isinstance(value, (str, list, dict)) and not value):
        raise ConfigError(msg)
    return value


@unique
class RuleType(str, Enum):
    NOT_NULL = "NOT_NULL"
    NOT_BLANK = "NOT_BLANK"
    REGEX = "REGEX"
    CUSTOM_SQL_EXPR = "CUSTOM_SQL_EXPR"
    CUSTOM_SQL_STATEMENT = "CUSTOM_SQL_STATEMENT"
    # New in this engine: a vectorized pandas/Arrow batch rule. params must
    # name a registered batch function (see functions/batch_registry.py).
    CUSTOM_PANDAS_BATCH = "CUSTOM_PANDAS_BATCH"

    @property
    def is_row_level(self) -> bool:
        return self not in (RuleType.CUSTOM_SQL_STATEMENT,)


@dataclass(frozen=True)
class Rule:
    rule_id: str
    rule_type: RuleType
    dimension: str | None = None
    params: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, rule_id: str, kwargs: dict, dimensions: list[str] | None = None) -> "Rule":
        kwargs = {str(k).upper(): v for k, v in kwargs.items()}
        rule_type_raw = assert_not_empty(
            kwargs.get("RULE_TYPE"), f"Rule {rule_id}: missing rule_type"
        )
        try:
            rule_type = RuleType(str(rule_type_raw).upper())
        except ValueError:
            raise ConfigError(f"Rule {rule_id}: unknown rule_type {rule_type_raw!r}")
        dimension = kwargs.get("DIMENSION")
        if dimension is not None:
            dimension = str(dimension).upper()
            vocab = [d.upper() for d in (dimensions or DEFAULT_RULE_DIMENSIONS)]
            if dimension not in vocab:
                raise ConfigError(
                    f"Rule {rule_id}: dimension {dimension!r} not in allowed set {vocab}"
                )
        params = kwargs.get("PARAMS") or {}
        if not isinstance(params, dict):
            raise ConfigError(f"Rule {rule_id}: params must be a mapping")
        params = {str(k).lower(): v for k, v in params.items()}
        rule = cls(rule_id=rule_id.upper(), rule_type=rule_type,
                   dimension=dimension, params=params)
        rule.validate()
        return rule

    def validate(self) -> None:
        t, p = self.rule_type, self.params
        if t == RuleType.REGEX:
            pattern = assert_not_empty(
                p.get("pattern"), f"Rule {self.rule_id}: REGEX requires params.pattern"
            )
            try:
                re.compile(pattern)
            except re.error as e:
                raise ConfigError(f"Rule {self.rule_id}: invalid regex {pattern!r}: {e}")
            check_for_invalid_sql(f"Rule {self.rule_id}", pattern)
        elif t == RuleType.CUSTOM_SQL_EXPR:
            assert_not_empty(
                p.get("custom_sql_expr"),
                f"Rule {self.rule_id}: CUSTOM_SQL_EXPR requires params.custom_sql_expr",
            )
            self._check_declared_arguments(p["custom_sql_expr"])
        elif t == RuleType.CUSTOM_SQL_STATEMENT:
            stmt = assert_not_empty(
                p.get("custom_sql_statement"),
                f"Rule {self.rule_id}: CUSTOM_SQL_STATEMENT requires "
                f"params.custom_sql_statement",
            )
            if "from data" not in stmt.lower():
                raise ConfigError(
                    f"Rule {self.rule_id}: custom_sql_statement must select from the "
                    f"filtered-scan CTE `data` (include `from data`)"
                )
            self._check_declared_arguments(stmt)
        elif t == RuleType.CUSTOM_PANDAS_BATCH:
            assert_not_empty(
                p.get("function"),
                f"Rule {self.rule_id}: CUSTOM_PANDAS_BATCH requires params.function "
                f"(a name registered in the batch-function registry)",
            )

    def _check_declared_arguments(self, sql: str) -> None:
        for argument in self.params.get("custom_sql_arguments", []) or []:
            if f"${argument}" not in sql:
                raise ConfigError(
                    f"Rule {self.rule_id}: declared custom_sql_argument "
                    f"'${argument}' does not appear in the SQL template"
                )

    def resolved_sql_template(self, binding_arguments: dict[str, Any] | None) -> str:
        """Substitute custom_sql_arguments (NOT $column — that happens at
        binding compile time). Missing declared argument → error."""
        t, p = self.rule_type, self.params
        if t == RuleType.NOT_NULL:
            return "$column IS NOT NULL"
        if t == RuleType.NOT_BLANK:
            return "TRIM($column) != ''"
        if t == RuleType.REGEX:
            # escape $ in the regex so string.Template leaves it alone
            pattern = p["pattern"].replace("$", "$$").replace("'", "\\'")
            return f"CAST($column AS STRING) RLIKE '{pattern}'"
        sql = p.get("custom_sql_expr") or p.get("custom_sql_statement") or ""
        declared = p.get("custom_sql_arguments", []) or []
        binding_arguments = binding_arguments or {}
        for argument in declared:
            if binding_arguments.get(argument) is None:
                raise ConfigError(
                    f"Rule {self.rule_id}: custom_sql_argument '{argument}' "
                    f"not supplied by the rule binding"
                )
        if binding_arguments:
            sql = Template(sql).safe_substitute(
                {k: v for k, v in binding_arguments.items() if k != "column"}
            )
        check_for_invalid_sql(f"Rule {self.rule_id}", sql)
        return sql

    @property
    def skip_null_count(self) -> bool:
        """NOT_NULL rules report null_count as NULL (macros.sql:38-39 behavior)."""
        return self.rule_type == RuleType.NOT_NULL


@dataclass(frozen=True)
class RowFilter:
    row_filter_id: str
    filter_sql_expr: str

    @classmethod
    def from_dict(cls, row_filter_id: str, kwargs: dict) -> "RowFilter":
        kwargs = {str(k).upper(): v for k, v in kwargs.items()}
        expr = assert_not_empty(
            kwargs.get("FILTER_SQL_EXPR"),
            f"RowFilter {row_filter_id}: missing filter_sql_expr",
        )
        return cls(row_filter_id=row_filter_id.upper(), filter_sql_expr=str(expr))


@dataclass(frozen=True)
class EntityColumn:
    name: str
    data_type: str  # Spark SQL type string (canonicalized)
    description: str | None = None

    @classmethod
    def from_dict(cls, name: str, kwargs: dict) -> "EntityColumn":
        kwargs = {str(k).upper(): v for k, v in kwargs.items()}
        raw = assert_not_empty(
            kwargs.get("DATA_TYPE"), f"EntityColumn {name}: missing data_type"
        )
        canon = COLUMN_TYPE_ALIASES.get(str(raw).upper())
        if canon is None:
            raise ConfigError(
                f"EntityColumn {name}: unsupported data_type {raw!r} "
                f"(allowed: {sorted(COLUMN_TYPE_ALIASES)})"
            )
        return cls(name=name.upper(), data_type=canon,
                   description=kwargs.get("DESCRIPTION"))


# reference field aliases (dq_entity.py get_custom_entity_configs maps
# BIGQUERY project_name → instance_name, dataset_name → database_name)
_INSTANCE_KEYS = ("INSTANCE_NAME", "PROJECT_NAME")
_DATABASE_KEYS = ("DATABASE_NAME", "DATASET_NAME")
_OVERRIDE_KEYS = {"table_name", "source_format", "instance_name",
                  "project_name", "database_name", "dataset_name"}


@dataclass(frozen=True)
class Entity:
    entity_id: str
    table_name: str          # resolvable table: catalog name OR parquet path
    columns: dict[str, EntityColumn]
    source_format: str = "parquet"   # parquet|table|csv|json|orc
    partition_fields: tuple[str, ...] = ()
    # catalog qualification, reference-compatible: BIGQUERY's project/dataset
    # map to instance/database (dq_entity.py:46-94); a qualified entity reads
    # as instance.database.table through the session catalog
    instance_name: str | None = None
    database_name: str | None = None
    # env name (upper) → override mapping — the reference's per-environment
    # remapping (dq_entity.py:211-257 validates instance/database/table
    # overrides; source_format is the Spark-side addition)
    environment_override: dict[str, dict[str, str]] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, entity_id: str, kwargs: dict) -> "Entity":
        kwargs = {str(k).upper(): v for k, v in kwargs.items()}
        table_name = assert_not_empty(
            kwargs.get("TABLE_NAME"), f"Entity {entity_id}: missing table_name"
        )
        columns_raw = kwargs.get("COLUMNS") or {}
        columns = {
            str(cname).upper(): EntityColumn.from_dict(str(cname), cdef or {})
            for cname, cdef in columns_raw.items()
        }
        instance = next((str(kwargs[k]) for k in _INSTANCE_KEYS
                         if kwargs.get(k)), None)
        database = next((str(kwargs[k]) for k in _DATABASE_KEYS
                         if kwargs.get(k)), None)
        # reference BIGQUERY entities are catalog tables, not file paths
        default_fmt = ("table" if database
                       or str(kwargs.get("SOURCE_DATABASE", "")).upper()
                       == "BIGQUERY" else "parquet")
        fmt = str(kwargs.get("SOURCE_FORMAT", default_fmt)).lower()
        if fmt not in ("parquet", "table", "csv", "json", "orc"):
            raise ConfigError(f"Entity {entity_id}: unsupported source_format {fmt!r}")
        parts = tuple(str(x) for x in (kwargs.get("PARTITION_FIELDS") or []))
        env_override = cls._parse_environment_override(
            entity_id, kwargs.get("ENVIRONMENT_OVERRIDE"))
        return cls(entity_id=entity_id.upper(), table_name=str(table_name),
                   columns=columns, source_format=fmt, partition_fields=parts,
                   instance_name=instance, database_name=database,
                   environment_override=env_override)

    @property
    def qualified_table_name(self) -> str:
        """instance.database.table for catalog entities; bare table_name
        (path or view) otherwise."""
        return ".".join(p for p in (self.instance_name, self.database_name,
                                    self.table_name) if p)

    @staticmethod
    def _parse_environment_override(entity_id: str,
                                    raw: Any) -> dict[str, dict[str, str]]:
        """Reference contract (dq_entity.py:211-257): each key names an
        environment; the value must echo it under `environment` (guard
        against copy-paste mismatches) and carry an `override` mapping;
        anything not overridden falls back to the base entity."""
        if not raw:
            return {}
        if not isinstance(raw, dict):
            raise ConfigError(
                f"Entity {entity_id}: environment_override must be a mapping")
        out: dict[str, dict[str, str]] = {}
        for env, value in raw.items():
            if not isinstance(value, dict):
                raise ConfigError(
                    f"Entity {entity_id}: environment_override[{env!r}] must "
                    f"be a mapping")
            v = {str(k).lower(): val for k, val in value.items()}
            declared = v.get("environment")
            if declared is None or str(declared).lower() != str(env).lower():
                raise ConfigError(
                    f"Entity {entity_id}: environment target key {env!r} must "
                    f"match value.environment ({declared!r})")
            override = v.get("override")
            if not isinstance(override, dict) or not override:
                raise ConfigError(
                    f"Entity {entity_id}: environment_override[{env!r}] needs "
                    f"a non-empty `override` mapping")
            ov = {str(k).lower(): str(val) for k, val in override.items()}
            unknown = set(ov) - _OVERRIDE_KEYS
            if unknown:
                raise ConfigError(
                    f"Entity {entity_id}: unsupported override keys {sorted(unknown)} "
                    f"(allowed: {sorted(_OVERRIDE_KEYS)})")
            out[str(env).upper()] = ov
        return out

    def for_environment(self, environment_target: str | None) -> "Entity":
        """Resolve per-environment remapping; unknown/None target → self."""
        if not environment_target:
            return self
        ov = self.environment_override.get(environment_target.upper())
        if not ov:
            return self
        import dataclasses
        return dataclasses.replace(
            self,
            table_name=ov.get("table_name", self.table_name),
            source_format=ov.get("source_format", self.source_format),
            instance_name=ov.get("instance_name", ov.get("project_name",
                                                         self.instance_name)),
            database_name=ov.get("database_name", ov.get("dataset_name",
                                                         self.database_name)))

    def resolve_column(self, column_id: str) -> EntityColumn:
        col = self.columns.get(column_id.upper())
        if col is None:
            raise ConfigError(
                f"Entity {self.entity_id}: unknown column {column_id!r} "
                f"(declared: {sorted(self.columns)})"
            )
        return col


@dataclass(frozen=True)
class EntityUri:
    """Late-binding entity reference — the Spark analogue of the reference's
    entity URIs (dq_entity_uri.py:35-158): the schema is fetched from the
    live table at run time instead of being declared in YAML.

    Schemes:
    * catalog://db.table — resolved via spark.table;
    * parquet://, csv://, json://, orc:// — a path in that format;
    * bigquery://projects/P/datasets/D/tables/T — the reference's path-pair
      format, byte-compatible; maps to the catalog name P.D.T (extra pairs
      like locations/lakes/zones are accepted and ignored, as the reference
      does when they come from metadata_registry_defaults);
    * dataplex://.../entities/E — accepted; E resolves as a catalog table
      (the reference resolves it to the underlying BigQuery/GCS resource via
      the Dataplex metadata API, which has no sandbox analogue — the entity
      NAME is the stable part and is resolved through the session catalog).
    """

    scheme: str
    path: str
    # metadata_registry_defaults fields for this scheme, merged UNDER the
    # URI's own path pairs (URI wins) — reference semantics
    # (dq_entity_uri.py:48-55: all_configs = defaults, then update(uri))
    defaults: tuple[tuple[str, str], ...] = ()

    SCHEMES = ("catalog", "parquet", "csv", "json", "orc",
               "bigquery", "dataplex")
    # reference parity (dq_entity_uri.py:30): characters never valid inside
    # a path-pair URI; only enforced for the path-pair schemes, since file
    # paths legitimately contain ':' on some stores
    _UNSUPPORTED = re.compile("[@#?:]")

    @property
    def path_pairs(self) -> dict[str, str]:
        """The reference's path-pair decoding (dq_entity_uri.py:49-55):
        a/1/b/2 → {a: 1, b: 2}, over the scheme's registry defaults."""
        parts = self.path.split("/")
        out = dict(self.defaults)
        out.update(zip(parts[::2], parts[1::2]))
        return out

    @classmethod
    def parse(cls, uri: str,
              registry_defaults: dict[str, dict] | None = None) -> "EntityUri":
        """registry_defaults: the loaded `metadata_registry_defaults` block
        ({scheme: {field: value}}) — lets short URIs like
        `dataplex://zones/z/entities/e` inherit projects/locations/lakes
        from config (metadata_registry_defaults.py:28-35). The identity
        segment (entities/tables) must still come from the URI itself."""
        if "://" not in uri:
            raise ConfigError(
                f"Invalid entity_uri {uri!r} — expected "
                f"<scheme>://<table-or-path> with scheme in {cls.SCHEMES}")
        scheme, path = uri.split("://", 1)
        scheme = scheme.lower()
        if scheme not in cls.SCHEMES:
            raise ConfigError(
                f"Invalid entity_uri scheme {scheme!r} (allowed: {cls.SCHEMES})")
        if not path:
            raise ConfigError(f"Invalid entity_uri {uri!r}: empty table/path")
        if "*" in path:
            raise ConfigError(  # reference parity: dq_entity_uri.validate
                f"Invalid entity_uri {uri!r}: wildcards not allowed")
        defaults: tuple[tuple[str, str], ...] = ()
        if scheme in ("bigquery", "dataplex"):
            bad = cls._UNSUPPORTED.search(path)
            if bad:
                raise ConfigError(
                    f"Invalid entity_uri {uri!r}: unsupported character "
                    f"{bad.group(0)!r}")
            if registry_defaults and scheme in registry_defaults:
                defaults = tuple(sorted(
                    (str(k), str(v))
                    for k, v in registry_defaults[scheme].items()))
        out = cls(scheme=scheme, path=path, defaults=defaults)
        if scheme == "bigquery" and not out.path_pairs.get("tables"):
            raise ConfigError(
                f"Invalid entity_uri {uri!r}: bigquery scheme requires a "
                f"tables/<table-id> segment")
        if scheme == "dataplex" and not out.path_pairs.get("entities"):
            raise ConfigError(
                f"Invalid entity_uri {uri!r}: dataplex scheme requires an "
                f"entities/<entity-id> segment")
        return out

    def to_entity(self) -> Entity:
        # columns empty → schema is late-bound: validated against the live
        # table when the scan is created, not at config-load time
        if self.scheme == "bigquery":
            pairs = self.path_pairs
            table = pairs["tables"]
            return Entity(entity_id=re.sub(r"\W+", "_", table).upper(),
                          table_name=table, columns={}, source_format="table",
                          instance_name=pairs.get("projects"),
                          database_name=pairs.get("datasets"))
        if self.scheme == "dataplex":
            table = self.path_pairs["entities"]
            return Entity(entity_id=re.sub(r"\W+", "_", table).upper(),
                          table_name=table, columns={}, source_format="table")
        eid = re.sub(r"\W+", "_", self.path).strip("_").upper()
        fmt = "table" if self.scheme == "catalog" else self.scheme
        return Entity(entity_id=eid, table_name=self.path, columns={},
                      source_format=fmt)


@dataclass(frozen=True)
class ReferenceColumns:
    reference_columns_id: str
    include_reference_columns: tuple[str, ...]  # ("*",) means all entity columns

    @classmethod
    def from_dict(cls, rcid: str, kwargs: dict) -> "ReferenceColumns":
        kwargs = {str(k).upper(): v for k, v in kwargs.items()}
        cols = assert_not_empty(
            kwargs.get("INCLUDE_REFERENCE_COLUMNS"),
            f"ReferenceColumns {rcid}: missing include_reference_columns",
        )
        return cls(reference_columns_id=rcid.upper(),
                   include_reference_columns=tuple(str(c) for c in cols))

    def resolve(self, entity: Entity) -> list[str]:
        if self.include_reference_columns == ("*",):
            return [c.name for c in entity.columns.values()]
        if entity.columns:  # URI entities are late-bound: skip declared check
            for c in self.include_reference_columns:
                entity.resolve_column(c)
        return [c.upper() for c in self.include_reference_columns]


@dataclass(frozen=True)
class RuleBinding:
    """The unit of execution: rules × (entity, column, row filter)."""

    rule_binding_id: str
    entity_id: str
    column_id: str
    row_filter_id: str
    rule_ids: tuple[Any, ...]  # str or {rule_id: {arg: value}} single-key dict
    incremental_time_filter_column_id: str | None = None
    reference_columns_id: str | None = None
    metadata: dict[str, Any] = field(default_factory=dict)
    # late-binding alternative to entity_id (reference dq_rule_binding.py
    # accepts entity_uri XOR entity_id); parsed/validated at config load
    entity_uri: str | None = None

    @classmethod
    def from_dict(cls, rbid: str, kwargs: dict) -> "RuleBinding":
        kwargs = {str(k).upper(): v for k, v in kwargs.items()}
        entity_uri = kwargs.get("ENTITY_URI")
        if entity_uri is not None:
            if kwargs.get("ENTITY_ID") is not None:
                raise ConfigError(
                    f"RuleBinding {rbid}: specify entity_id OR entity_uri, "
                    f"not both")
            EntityUri.parse(str(entity_uri))  # fail at load, not at run
            entity_id = EntityUri.parse(str(entity_uri)).to_entity().entity_id
        else:
            entity_id = assert_not_empty(
                kwargs.get("ENTITY_ID"),
                f"RuleBinding {rbid}: missing entity_id (or entity_uri)")
        column_id = assert_not_empty(kwargs.get("COLUMN_ID"),
                                     f"RuleBinding {rbid}: missing column_id")
        row_filter_id = assert_not_empty(kwargs.get("ROW_FILTER_ID"),
                                         f"RuleBinding {rbid}: missing row_filter_id")
        rule_ids_raw = assert_not_empty(kwargs.get("RULE_IDS"),
                                        f"RuleBinding {rbid}: missing rule_ids")
        rule_ids: list[Any] = []
        for r in rule_ids_raw:
            if isinstance(r, str):
                rule_ids.append(r.upper())
            elif isinstance(r, dict) and len(r) == 1:
                ((rid, args),) = r.items()
                rule_ids.append({str(rid).upper(): dict(args or {})})
            else:
                raise ConfigError(
                    f"RuleBinding {rbid}: rule_ids entries must be a string or a "
                    f"single-key mapping {{rule_id: {{arg: value}}}}, got {r!r}"
                )
        metadata = kwargs.get("METADATA") or {}
        if not isinstance(metadata, dict):
            raise ConfigError(f"RuleBinding {rbid}: metadata must be a mapping")
        inc = kwargs.get("INCREMENTAL_TIME_FILTER_COLUMN_ID")
        refc = kwargs.get("REFERENCE_COLUMNS_ID")
        return cls(
            rule_binding_id=rbid.upper(),
            entity_id=str(entity_id).upper(),
            column_id=str(column_id).upper(),
            row_filter_id=str(row_filter_id).upper(),
            rule_ids=tuple(rule_ids),
            incremental_time_filter_column_id=str(inc).upper() if inc else None,
            reference_columns_id=str(refc).upper() if refc else None,
            metadata={str(k): v for k, v in metadata.items()},
            entity_uri=str(entity_uri) if entity_uri is not None else None,
        )

    def iter_rule_refs(self):
        """Yield (rule_id, binding_arguments) pairs."""
        for r in self.rule_ids:
            if isinstance(r, str):
                yield r, {}
            else:
                ((rid, args),) = r.items()
                yield rid, args


def substitute_column(sql_template: str, column_name: str) -> str:
    """$column substitution. Reference quirk (dq_rule_binding.py:322-334): the
    column reference is prefixed `data.` iff the column is literally named
    `data`, to disambiguate from the `data` CTE alias."""
    ref = f"data.{column_name}" if column_name.lower() == "data" else column_name
    return Template(sql_template).safe_substitute(column=ref)
