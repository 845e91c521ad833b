"""Config: the engine's logical-plan input.

Mirrors the reference's config surface (``internal/config/config.go``):
``connection`` + per-table ``configuration`` with ``truncate`` /
polymorphic ``retain`` (int = count-based, object = date-based,
``config.go:64-126``) / ``columns`` anonymisation rules. Dates accept the
same four formats (``config.go:156-172``). Load dispatches on file
extension with a try-both fallback (``config.go:182-214``); ``save``
round-trips (``config.go:276-299``).

Extension over the reference: connection ``type: parquet`` with ``path``
pointing at a directory of ``<table>.parquet`` files (the test corpus),
plus optional ``primary_key`` per table used to make count-based retain
deterministic (SURVEY.md section 7.3).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml is available in this env
    yaml = None

# Reference accepts exactly these formats (internal/config/config.go:158-163):
# YYYY-MM-DD, YYYY-MM-DDTHH:MM:SS, "YYYY-MM-DD HH:MM:SS", RFC3339.
_DATE_FORMATS = (
    "%Y-%m-%d",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S%z",  # RFC3339
)

# derby: embedded JDBC database (driver ships in Spark's jars) — the
# integration stand-in proving the MySQL/Postgres JDBC execution path
VALID_CONNECTION_TYPES = ("mysql", "postgres", "sqlite", "parquet", "derby", "files")


class ConfigError(ValueError):
    """Invalid configuration input."""


def parse_date(s: str) -> datetime:
    """Parse a date string in any reference-accepted format (config.go:156-172)."""
    for fmt in _DATE_FORMATS:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ConfigError(
        f"could not parse date {s!r}, supported formats: "
        "YYYY-MM-DD, YYYY-MM-DDTHH:MM:SS, 'YYYY-MM-DD HH:MM:SS', RFC3339"
    )


@dataclass
class Connection:
    """Database connection parameters (config.go:20-29)."""

    type: str = ""
    host: str = ""
    port: int = 0
    username: str = ""
    password: str = ""
    database_name: str = ""
    file: str = ""  # sqlite
    path: str = ""  # parquet corpus dir (engine extension)
    # sqlite only (engine extension): >0 routes table scans through the
    # native Spark DataSource (format "pysqlite") with this many
    # rowid-range partitions read in parallel by executors; 0 keeps the
    # reference-shaped driver-side Arrow ingest
    partitions: int = 0

    def validate(self) -> None:
        if self.type not in VALID_CONNECTION_TYPES:
            raise ConfigError(
                f"invalid connection type {self.type!r}, must be one of "
                f"{', '.join(VALID_CONNECTION_TYPES)}"
            )
        if self.type in ("sqlite", "derby"):
            if not self.file:
                raise ConfigError(f"{self.type} connection requires 'file'")
        elif self.type in ("parquet", "files"):
            if not self.path:
                raise ConfigError(f"{self.type} connection requires 'path'")
        else:
            missing = [
                k
                for k in ("host", "username", "database_name")
                if not getattr(self, k)
            ]
            if missing:
                raise ConfigError(
                    f"{self.type} connection requires {', '.join(missing)}"
                )

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"type": self.type}
        for k in ("host", "port", "username", "password", "database_name", "file", "path"):
            v = getattr(self, k)
            if v:
                d[k] = v
        return d


@dataclass
class RetainConfig:
    """Row retention: count-based OR date-based (config.go:33-44).

    ``retain: 100`` keeps the first 100 rows; ``retain: {column_name,
    after_date}`` keeps rows where column > after_date (strict greater-than,
    mysql.go:157-161).
    """

    count: int = 0
    column_name: str = ""
    after_date: datetime | None = None

    @property
    def is_date_based(self) -> bool:
        return bool(self.column_name) and self.after_date is not None

    @property
    def is_count_based(self) -> bool:
        return self.count > 0

    @property
    def is_empty(self) -> bool:
        return not self.is_date_based and not self.is_count_based

    @classmethod
    def parse(cls, raw: Any) -> "RetainConfig":
        """Polymorphic decode: int or {column_name, after_date} (config.go:64-126)."""
        if raw is None:
            return cls()
        if isinstance(raw, bool):
            raise ConfigError("retain must be an integer or an object")
        if isinstance(raw, int):
            return cls(count=raw)
        if isinstance(raw, dict):
            column = raw.get("column_name", "")
            after = raw.get("after_date", "")
            if not column:
                raise ConfigError("retain object requires column_name")
            if not after:
                raise ConfigError("retain object requires after_date")
            return cls(column_name=column, after_date=parse_date(str(after)))
        raise ConfigError(
            "retain must be an integer or an object with column_name and after_date"
        )

    def to_raw(self) -> Any:
        """Marshal back to the YAML/JSON shape (config.go:129-154)."""
        if self.is_date_based:
            assert self.after_date is not None
            return {
                "column_name": self.column_name,
                "after_date": self.after_date.strftime("%Y-%m-%d"),
            }
        if self.count > 0:
            return self.count
        return None


@dataclass
class TableConfig:
    """Per-table processing spec (config.go:174-179)."""

    truncate: bool = False
    retain: RetainConfig = field(default_factory=RetainConfig)
    columns: dict[str, Any] = field(default_factory=dict)  # col -> rule string|None
    primary_key: str = ""  # engine extension: deterministic retain ordering

    @classmethod
    def parse(cls, raw: dict[str, Any] | None) -> "TableConfig":
        raw = raw or {}
        if not isinstance(raw, dict):
            raise ConfigError(f"table config must be a mapping, got {type(raw).__name__}")
        return cls(
            truncate=bool(raw.get("truncate", False)),
            retain=RetainConfig.parse(raw.get("retain")),
            columns=dict(raw.get("columns") or {}),
            primary_key=str(raw.get("primary_key", "") or ""),
        )

    def to_raw(self) -> dict[str, Any]:
        d: dict[str, Any] = {}
        if self.truncate:
            d["truncate"] = True
        r = self.retain.to_raw()
        if r is not None:
            d["retain"] = r
        if self.columns:
            d["columns"] = dict(self.columns)
        if self.primary_key:
            d["primary_key"] = self.primary_key
        return d


@dataclass
class Config:
    """Full config-file structure (config.go:15-18)."""

    connection: Connection = field(default_factory=Connection)
    configuration: dict[str, TableConfig] = field(default_factory=dict)
    # engine knobs (extension over the reference config): currently only
    # key_mode ("hashed" | "oracle", settings.py) — applied by the
    # Engine at construction so every operator in the run shares it
    settings: dict[str, Any] = field(default_factory=dict)
    # optional DP release block (engine extension): {releases: [...]}
    # consumed by the `release` CLI verb; validated at load via
    # operators/privacy_ledger.parse_releases so a bad spec fails before
    # any Spark work, like every other config error
    privacy: dict[str, Any] = field(default_factory=dict)
    # optional data-contract block (engine extension): per-table
    # expectation lists run by the `audit` verb as PASS/FAIL rows;
    # validated at load via operators/expectations.parse_quality_block
    quality: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        if not isinstance(raw, dict):
            raise ConfigError("config root must be a mapping")
        conn_raw = raw.get("connection") or {}
        known = {f for f in Connection.__dataclass_fields__}
        conn = Connection(**{k: v for k, v in conn_raw.items() if k in known})
        tables = {
            name: TableConfig.parse(tc)
            for name, tc in (raw.get("configuration") or {}).items()
        }
        settings_raw = raw.get("settings") or {}
        if not isinstance(settings_raw, dict):
            raise ConfigError("settings must be a mapping")
        km = settings_raw.get("key_mode")
        if km is not None:
            from . import settings as settings_mod

            try:
                settings_mod._validate(km)
            except ValueError as exc:  # fail at load, not mid-export
                raise ConfigError(str(exc)) from exc
        privacy_raw = raw.get("privacy") or {}
        if privacy_raw:
            from .operators.privacy_ledger import (
                DPBudgetError,
                validate_privacy_block,
            )

            try:
                validate_privacy_block(privacy_raw)
            except DPBudgetError as exc:
                raise ConfigError(str(exc)) from exc
        quality_raw = raw.get("quality") or {}
        if quality_raw:
            from .operators.expectations import (
                QualityConfigError,
                parse_quality_block,
            )

            try:
                parse_quality_block(quality_raw, build=False)
            except QualityConfigError as exc:
                raise ConfigError(str(exc)) from exc
        cfg = cls(
            connection=conn,
            configuration=tables,
            settings=settings_raw,
            privacy=privacy_raw,
            quality=quality_raw,
        )
        cfg.connection.validate()
        return cfg

    def to_dict(self) -> dict[str, Any]:
        out = {
            "connection": self.connection.to_dict(),
            "configuration": {n: t.to_raw() for n, t in self.configuration.items()},
        }
        if self.settings:
            out["settings"] = dict(self.settings)
        if self.privacy:
            out["privacy"] = dict(self.privacy)
        if self.quality:
            out["quality"] = dict(self.quality)
        return out

    def has_table(self, name: str) -> bool:
        """config.go:316-323."""
        return name in self.configuration

    def add_table(self, name: str, truncate: bool = False) -> None:
        """Add an empty (or truncate:true) entry for a new table (config.go:301-314)."""
        if not self.has_table(name):
            self.configuration[name] = TableConfig(truncate=truncate)

    def save(self, path: str | Path) -> None:
        """Extension-dispatched YAML/JSON marshal (config.go:276-299)."""
        path = Path(path)
        data = self.to_dict()
        if path.suffix.lower() == ".json":
            path.write_text(json.dumps(data, indent=2) + "\n")
        else:
            if yaml is None:  # pragma: no cover
                raise ConfigError("pyyaml unavailable; save as .json")
            path.write_text(yaml.safe_dump(data, sort_keys=False))


def load(path: str | Path) -> Config:
    """Load + validate a YAML/JSON config; unknown extensions try both
    (config.go:182-214)."""
    path = Path(path)
    if not path.exists():
        raise ConfigError(f"config file not found: {path}")
    text = path.read_text()
    ext = path.suffix.lower()
    if ext == ".json":
        return Config.from_dict(json.loads(text))
    if ext in (".yaml", ".yml"):
        return Config.from_dict(yaml.safe_load(text))
    # unknown extension: try YAML then JSON (config.go:199-212)
    errors = []
    for parser in (lambda t: yaml.safe_load(t), json.loads):
        try:
            return Config.from_dict(parser(text))
        except ConfigError:
            raise
        except Exception as e:  # parse failure — try the next format
            errors.append(str(e))
    raise ConfigError(f"could not parse config as YAML or JSON: {errors}")


# The rule-template grammar (internal/anonymiser/anonymiser.go:10-13):
# exactly `{{faker.<word>}}`.
FAKER_TEMPLATE_RE = re.compile(r"^\{\{faker\.(\w+)\}\}$")
