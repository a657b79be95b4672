"""YAML configuration surface.

Mirrors the reference's config model (lotad/config.py:64-309) re-pointed at
Parquet-directory databases: two DB endpoints, output path, table filters,
per-table rules (``ignore_column``) and per-table custom queries with the
same validation rules (CTE ban, parseability, whitespace normalization,
trailing ``;`` — lotad/config.py:141-163). Password/.env handling is
dropped: parquet sources need none (SURVEY §7.1 M3).
"""

from __future__ import annotations

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


@dataclass
class Config:
    """Comparison run configuration (YAML-serializable)."""

    db1_path: str
    db2_path: str
    output_path: str = "drift_analysis_out"
    db1_id: str | None = None
    db2_id: str | None = None
    target_tables: list[str] = field(default_factory=list)
    ignore_tables: list[str] = field(default_factory=list)
    table_configs: list[TableConfig] = field(default_factory=list)
    ignore_dates: bool = False

    def __post_init__(self):
        self.table_configs = [
            tc if isinstance(tc, TableConfig) else TableConfig(**tc)
            for tc in self.table_configs
        ]
        self._map = {tc.table_name: tc for tc in self.table_configs}

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls(**yaml.safe_load(f))

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.dump(self.dict(), f, indent=2)

    def dict(self) -> dict:
        out: dict = {"db1_path": self.db1_path, "db2_path": self.db2_path}
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


def comparator_from_config(spark, config: Config):
    """Build a ready-to-run DatabaseComparator from a Config."""
    from lotad_spark.compare import DatabaseComparator
    from lotad_spark.sources.parquet import ParquetDatabase

    db1 = ParquetDatabase(spark, config.db1_path, config.db1_id or "db1")
    db2 = ParquetDatabase(spark, config.db2_path, config.db2_id or "db2")
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
