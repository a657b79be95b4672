"""YAML configuration surface.

Mirrors the reference's config model (lotad/config.py:64-309) re-pointed at
Parquet-directory databases: two DB endpoints, output path, table filters,
per-table rules (``ignore_column``) and per-table custom queries with the
same validation rules (CTE ban, parseability, whitespace normalization,
trailing ``;`` — lotad/config.py:141-163). Credentials follow the
reference's secrets-out-of-YAML contract (lotad config.py:222-233,
278-287) via ``${ENV_VAR}`` references in ``*_jdbc`` specs, resolved only
at connect time; the ``.env``-file write is dropped — deployments inject
env vars directly.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from enum import Enum

import yaml

from lotad_spark.operators.custom_query import extract_tables


class TableRuleType(Enum):
    IGNORE_COLUMN = "ignore_column"


@dataclass
class TableRule:
    rule_type: TableRuleType
    rule_value: str

    def __post_init__(self):
        if isinstance(self.rule_type, str):
            self.rule_type = TableRuleType(self.rule_type)

    def dict(self) -> dict:
        return {"rule_type": self.rule_type.value, "rule_value": self.rule_value}


class TableConfig:
    """Per-table rules + optional custom diff query."""

    def __init__(
        self,
        table_name: str,
        rules: list | None = None,
        query: str | None = None,
    ):
        self.table_name = table_name
        self.rules: list[TableRule] = [
            r if isinstance(r, TableRule) else TableRule(**r) for r in (rules or [])
        ]
        self._query: str | None = None
        if query:
            self.query = query

    @property
    def ignore_columns(self) -> list[str]:
        return sorted(
            r.rule_value
            for r in self.rules
            if r.rule_type == TableRuleType.IGNORE_COLUMN
        )

    def add_rule(self, rule: TableRule) -> None:
        if not any(
            r.rule_type == rule.rule_type and r.rule_value == rule.rule_value
            for r in self.rules
        ):
            self.rules.append(rule)

    @property
    def query(self) -> str | None:
        return self._query

    @query.setter
    def query(self, query: str | None) -> None:
        """Validation per reference lotad/config.py:141-163: reject CTEs,
        require parseability, strip per-line whitespace, append ``;``."""
        if not query:
            return
        if query.lower().lstrip().startswith("with"):
            raise ValueError("CTEs are not currently supported")
        if not extract_tables(query):
            raise ValueError("Unable to parse query")
        lines = [ln.strip(" ") for ln in query.split("\n") if ln.strip(" ")]
        normalized = "\n".join(lines)
        if not normalized.endswith(";"):
            normalized += ";"
        self._query = normalized

    def dict(self) -> dict:
        out: dict = {"table_name": self.table_name}
        if self._query:
            out["query"] = self._query
        if self.rules:
            out["rules"] = sorted(
                (r.dict() for r in self.rules),
                key=lambda x: f"{x['rule_type']}:{x['rule_value']}",
            )
        return out


_ENV_REF = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def resolve_env_refs(value: str) -> str:
    """Expand ``${ENV_VAR}`` references from the process environment.

    The reference keeps database passwords out of the versioned YAML and
    resolves them from the environment at load time (lotad
    config.py:222-233, 278-287); this is the same contract minus the
    ``.env`` file write — the YAML stores only the reference, the secret
    lives wherever the deployment injects env vars. Unset variables are a
    loud error: a silently-empty password yields a confusing auth failure
    three layers down."""
    def _sub(m: "re.Match[str]") -> str:
        name = m.group(1)
        if name not in os.environ:
            raise KeyError(
                f"config references ${{{name}}} but it is not set in the "
                "environment"
            )
        return os.environ[name]

    return _ENV_REF.sub(_sub, value)


@dataclass
class Config:
    """Comparison run configuration (YAML-serializable).

    Either side may be a parquet directory (``db1_path``) or a live JDBC
    endpoint (``db1_jdbc`` — keys ``url``, ``properties`` such as
    driver/user/password, ``tables``, ``partition_columns``,
    ``num_partitions``). Secret-bearing values use ``${ENV_VAR}``
    references, interpolated only when the connection is built — never at
    serialization, so round-tripping the config through ``write`` can
    never leak a secret into the YAML."""

    db1_path: str | None = None
    db2_path: str | None = None
    output_path: str = "drift_analysis_out"
    db1_id: str | None = None
    db2_id: str | None = None
    target_tables: list[str] = field(default_factory=list)
    ignore_tables: list[str] = field(default_factory=list)
    table_configs: list[TableConfig] = field(default_factory=list)
    ignore_dates: bool = False
    db1_jdbc: dict | None = None
    db2_jdbc: dict | None = None

    def __post_init__(self):
        self.table_configs = [
            tc if isinstance(tc, TableConfig) else TableConfig(**tc)
            for tc in self.table_configs
        ]
        self._map = {tc.table_name: tc for tc in self.table_configs}
        for side in ("db1", "db2"):
            path, jdbc = getattr(self, f"{side}_path"), getattr(self, f"{side}_jdbc")
            if (path is None) == (jdbc is None):
                raise ValueError(
                    f"exactly one of {side}_path / {side}_jdbc must be set"
                )
            if jdbc is not None:
                pw = (jdbc.get("properties") or {}).get("password", "")
                if pw and not _ENV_REF.search(pw):
                    raise ValueError(
                        f"{side}_jdbc carries a literal password; use a "
                        "${ENV_VAR} reference so the secret never lands in "
                        "the YAML"
                    )

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls(**yaml.safe_load(f))

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.dump(self.dict(), f, indent=2)

    def dict(self) -> dict:
        out: dict = {}
        for side in ("db1", "db2"):
            if getattr(self, f"{side}_path") is not None:
                out[f"{side}_path"] = getattr(self, f"{side}_path")
            else:
                # Serialized AS WRITTEN: ${ENV_VAR} references stay
                # references — resolution happens only at connect time.
                out[f"{side}_jdbc"] = getattr(self, f"{side}_jdbc")
        if self.output_path:
            out["output_path"] = self.output_path
        for k in ("db1_id", "db2_id"):
            if getattr(self, k):
                out[k] = getattr(self, k)
        if self.target_tables:
            out["target_tables"] = sorted(self.target_tables)
        if self.ignore_tables:
            out["ignore_tables"] = sorted(self.ignore_tables)
        if self.table_configs:
            out["table_configs"] = sorted(
                (tc.dict() for tc in self.table_configs),
                key=lambda x: x["table_name"],
            )
        if self.ignore_dates:
            out["ignore_dates"] = True
        return out

    def get_table_config(self, table: str) -> TableConfig | None:
        return self._map.get(table)

    def update_table_config(
        self,
        table: str,
        table_rule: TableRule | None = None,
        query: str | None = None,
    ) -> None:
        if not table_rule and not query:
            raise ValueError("table_rule or query must be provided")
        if table not in self._map:
            tc = TableConfig(table)
            self._map[table] = tc
            self.table_configs.append(tc)
        if table_rule:
            self._map[table].add_rule(table_rule)
        if query:
            self._map[table].query = query


def database_from_config(spark, config: Config, side: str):
    """Build one side's database: for ``*_path``, a parquet table
    directory OR a live SQLite file (sniffed by the 16-byte
    ``SQLite format 3`` magic header, like the reference routes
    connection types per file — lotad/connection.py:299-327);
    JdbcDatabase for ``*_jdbc`` (with ``${ENV_VAR}`` secrets resolved
    HERE, at connect time — the Config object and its serialization keep
    only the references)."""
    from lotad_spark.sources.parquet import ParquetDatabase

    db_id = getattr(config, f"{side}_id") or side
    path = getattr(config, f"{side}_path")
    if path is not None:
        if os.path.isfile(path):
            with open(path, "rb") as fh:
                magic = fh.read(16)
            if magic == b"SQLite format 3\x00":
                from lotad_spark.sources.sqlite_native import (
                    SqliteNativeDatabase,
                )

                return SqliteNativeDatabase(spark, path, db_id)
        return ParquetDatabase(spark, path, db_id)

    from lotad_spark.sources.jdbc import JdbcDatabase

    spec = getattr(config, f"{side}_jdbc")
    props = {
        k: resolve_env_refs(str(v))
        for k, v in (spec.get("properties") or {}).items()
    }
    return JdbcDatabase(
        spark,
        resolve_env_refs(spec["url"]),
        db_id,
        properties=props,
        tables=spec.get("tables"),
        partition_columns=spec.get("partition_columns"),
        num_partitions=int(spec.get("num_partitions", 8)),
    )


def comparator_from_config(spark, config: Config):
    """Build a ready-to-run DatabaseComparator from a Config."""
    from lotad_spark.compare import DatabaseComparator

    db1 = database_from_config(spark, config, "db1")
    db2 = database_from_config(spark, config, "db2")
    return DatabaseComparator(
        spark,
        db1,
        db2,
        output_path=config.output_path,
        ignore_dates=config.ignore_dates,
        ignore_tables=config.ignore_tables,
        target_tables=config.target_tables,
        table_ignore_columns={
            tc.table_name: tc.ignore_columns
            for tc in config.table_configs
            if tc.ignore_columns
        },
        table_queries={
            tc.table_name: tc.query for tc in config.table_configs if tc.query
        },
    )
