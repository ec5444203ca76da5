"""YAML config discovery + registry.

Reference behavior studied at clouddq/lib.py:41-63 (recursive ``**/*.y(a)ml``
glob), clouddq/utils.py:48-64 (top-level key upper-casing) and
clouddq/classes/dq_configs_cache.py:357-390 (duplicate config ids allowed only
when deep-equal). The reference persists parsed configs to sqlite and plans
with SQL; we keep an in-memory registry — the config set is tiny and the
sqlite layer was an implementation detail, not semantics.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

from cloud_data_quality_spark.config.model import (
    ConfigError,
    Entity,
    ReferenceColumns,
    RowFilter,
    Rule,
    RuleBinding,
)

TOP_LEVEL_KEYS = (
    "RULES",
    "RULE_BINDINGS",
    "ROW_FILTERS",
    "ENTITIES",
    "REFERENCE_COLUMNS",
    "RULE_DIMENSIONS",
    "METADATA_REGISTRY_DEFAULTS",
)


def discover_yaml_files(configs_path: str | Path) -> list[Path]:
    p = Path(configs_path)
    if p.is_file():
        return [p]
    files = sorted(set(p.glob("**/*.yml")) | set(p.glob("**/*.yaml")))
    if not files:
        raise ConfigError(f"No YAML config files found under {p}")
    return files


def _merge_section(acc: dict, section: str, content: dict, source: Path) -> None:
    """Duplicate ids across files are allowed only when deep-equal."""
    for key, value in (content or {}).items():
        key_u = str(key).upper()
        if key_u in acc and acc[key_u][0] != value:
            raise ConfigError(
                f"{section}.{key_u}: duplicate config id with conflicting content "
                f"(first defined in {acc[key_u][1]}, redefined in {source})"
            )
        acc[key_u] = (value, source)


@dataclass
class ConfigRegistry:
    rules: dict[str, Rule] = field(default_factory=dict)
    rule_bindings: dict[str, RuleBinding] = field(default_factory=dict)
    row_filters: dict[str, RowFilter] = field(default_factory=dict)
    entities: dict[str, Entity] = field(default_factory=dict)
    reference_columns: dict[str, ReferenceColumns] = field(default_factory=dict)
    rule_dimensions: list[str] = field(default_factory=list)
    # metadata_registry_defaults: {scheme: {field: value}} — default URI
    # path-pair fields per registry scheme (reference:
    # metadata_registry_defaults.py:40-80; dataplex only, like the reference)
    registry_defaults: dict[str, dict] = field(default_factory=dict)

    def get_rule(self, rule_id: str) -> Rule:
        r = self.rules.get(rule_id.upper())
        if r is None:
            raise ConfigError(f"Unknown rule_id {rule_id!r}")
        return r

    def get_row_filter(self, row_filter_id: str) -> RowFilter:
        f = self.row_filters.get(row_filter_id.upper())
        if f is None:
            raise ConfigError(f"Unknown row_filter_id {row_filter_id!r}")
        return f

    def get_entity(self, entity_id: str) -> Entity:
        e = self.entities.get(entity_id.upper())
        if e is None:
            raise ConfigError(f"Unknown entity_id {entity_id!r}")
        return e

    def get_reference_columns(self, rcid: str) -> ReferenceColumns:
        rc = self.reference_columns.get(rcid.upper())
        if rc is None:
            raise ConfigError(f"Unknown reference_columns_id {rcid!r}")
        return rc

    def get_rule_binding(self, rbid: str) -> RuleBinding:
        rb = self.rule_bindings.get(rbid.upper())
        if rb is None:
            raise ConfigError(f"Unknown rule_binding_id {rbid!r}")
        return rb

    def resolved_binding_dict(self, rbid: str) -> dict[str, Any]:
        """Fully-resolved binding config (for hashing / golden tests)."""
        rb = self.get_rule_binding(rbid)
        if rb.entity_uri is not None:
            from cloud_data_quality_spark.config.model import EntityUri
            entity = EntityUri.parse(
                rb.entity_uri, registry_defaults=self.registry_defaults
            ).to_entity()
        else:
            entity = self.get_entity(rb.entity_id)
        if entity.columns:
            entity.resolve_column(rb.column_id)
            if rb.incremental_time_filter_column_id:
                entity.resolve_column(rb.incremental_time_filter_column_id)
        row_filter = self.get_row_filter(rb.row_filter_id)
        rules = []
        for rule_id, args in rb.iter_rule_refs():
            rule = self.get_rule(rule_id)
            rules.append({
                "rule_id": rule.rule_id,
                "rule_type": rule.rule_type.value,
                "dimension": rule.dimension,
                "params": rule.params,
                "binding_arguments": args,
            })
        ref_cols = None
        if rb.reference_columns_id:
            ref_cols = self.get_reference_columns(rb.reference_columns_id).resolve(entity)
        return {
            "rule_binding_id": rb.rule_binding_id,
            "entity": {
                "entity_id": entity.entity_id,
                "table_name": entity.table_name,
                "columns": {n: c.data_type for n, c in sorted(entity.columns.items())},
            },
            "column_id": rb.column_id,
            "row_filter": row_filter.filter_sql_expr,
            "incremental_time_filter_column_id": rb.incremental_time_filter_column_id,
            "reference_columns": ref_cols,
            "rules": rules,
            "metadata": rb.metadata,
        }

    def configs_hashsum(self, rbid: str) -> str:
        """sha256 of the resolved binding JSON (reference: clouddq/lib.py:225-227)."""
        blob = json.dumps(self.resolved_binding_dict(rbid), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode("utf-8")).hexdigest()


def load_configs(configs_path: str | Path) -> ConfigRegistry:
    raw: dict[str, dict] = {k: {} for k in TOP_LEVEL_KEYS}
    dim_vocab: list[str] | None = None
    for f in discover_yaml_files(configs_path):
        with open(f) as fh:
            for doc in yaml.safe_load_all(fh):
                if not doc:
                    continue
                if not isinstance(doc, dict):
                    raise ConfigError(f"{f}: top-level YAML must be a mapping")
                for key, content in doc.items():
                    key_u = str(key).upper()
                    if key_u == "RULE_DIMENSIONS":
                        new = [str(d).upper() for d in (content or [])]
                        if dim_vocab is not None and sorted(dim_vocab) != sorted(new):
                            raise ConfigError(
                                f"{f}: conflicting rule_dimensions vocabularies"
                            )
                        dim_vocab = new
                    elif key_u in TOP_LEVEL_KEYS:
                        _merge_section(raw[key_u], key_u, content, f)
                    # unknown top-level keys are ignored (forward compat)

    reg = ConfigRegistry(rule_dimensions=dim_vocab or [])
    for scheme, (fields, src) in raw["METADATA_REGISTRY_DEFAULTS"].items():
        scheme_l = str(scheme).lower()
        # reference parity: only the dataplex registry is implemented
        # (metadata_registry_defaults.py:56-63 raises on anything else)
        if scheme_l != "dataplex":
            raise ConfigError(
                f"{src}: metadata_registry_defaults for registry "
                f"{scheme_l!r} is not supported (dataplex only)")
        if not isinstance(fields, dict):
            raise ConfigError(
                f"{src}: metadata_registry_defaults.{scheme_l} must be a "
                f"mapping of URI fields")
        reg.registry_defaults[scheme_l] = {
            str(k): str(v) for k, v in fields.items()}
    for eid, (edef, _) in raw["ENTITIES"].items():
        reg.entities[eid] = Entity.from_dict(eid, edef or {})
    for fid, (fdef, _) in raw["ROW_FILTERS"].items():
        reg.row_filters[fid] = RowFilter.from_dict(fid, fdef or {})
    for rid, (rdef, _) in raw["RULES"].items():
        reg.rules[rid] = Rule.from_dict(rid, rdef or {}, dimensions=dim_vocab)
    for rcid, (rcdef, _) in raw["REFERENCE_COLUMNS"].items():
        reg.reference_columns[rcid] = ReferenceColumns.from_dict(rcid, rcdef or {})
    for rbid, (rbdef, _) in raw["RULE_BINDINGS"].items():
        reg.rule_bindings[rbid] = RuleBinding.from_dict(rbid, rbdef or {})

    # cross-validate references eagerly (compile-time failure beats run-time)
    for rbid in reg.rule_bindings:
        reg.resolved_binding_dict(rbid)
    return reg
