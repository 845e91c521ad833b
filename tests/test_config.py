"""Config parse/validate round-trips — behavioral spec from the reference's
``internal/config/config_test.go`` (YAML, JSON, unknown-extension fallback,
invalid input, polymorphic retain, save->load round-trip)."""

import json
from datetime import datetime

import pytest

from database_anonymiser_minimiser_spark import config as C

YAML_CFG = """
connection:
  type: parquet
  path: /root/testdata/sf0.001
configuration:
  sessions:
    truncate: true
  audit_logs:
    retain: 1000
  orders:
    retain:
      column_name: o_orderdate
      after_date: "2024-01-01"
    columns:
      customer_email: "{{faker.email}}"
      notes: "Order notes redacted"
  payments:
    columns:
      card_number: null
"""


def test_yaml_parse(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(YAML_CFG)
    cfg = C.load(p)
    assert cfg.connection.type == "parquet"
    assert cfg.configuration["sessions"].truncate
    assert cfg.configuration["audit_logs"].retain.is_count_based
    assert cfg.configuration["audit_logs"].retain.count == 1000
    r = cfg.configuration["orders"].retain
    assert r.is_date_based and r.column_name == "o_orderdate"
    assert r.after_date == datetime(2024, 1, 1)
    assert cfg.configuration["payments"].columns["card_number"] is None


def test_json_parse(tmp_path):
    data = {
        "connection": {"type": "parquet", "path": "/root/testdata/sf0.001"},
        "configuration": {"t": {"retain": 5}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(data))
    cfg = C.load(p)
    assert cfg.configuration["t"].retain.count == 5


def test_unknown_extension_fallback(tmp_path):
    p = tmp_path / "c.conf"
    p.write_text(YAML_CFG)
    assert C.load(p).connection.type == "parquet"
    p2 = tmp_path / "c2.conf"
    p2.write_text(json.dumps({"connection": {"type": "sqlite", "file": "x.db"}}))
    assert C.load(p2).connection.type == "sqlite"


def test_missing_file():
    with pytest.raises(C.ConfigError):
        C.load("/nonexistent/config.yaml")


@pytest.mark.parametrize(
    "raw",
    [
        {"type": "mysql"},  # missing host/user/db
        {"type": "oracle"},  # unknown type
        {"type": "sqlite"},  # missing file
        {"type": "parquet"},  # missing path
    ],
)
def test_connection_validation(raw):
    with pytest.raises(C.ConfigError):
        C.Config.from_dict({"connection": raw})


def test_retain_polymorphic_errors():
    with pytest.raises(C.ConfigError):
        C.RetainConfig.parse({"after_date": "2024-01-01"})  # no column_name
    with pytest.raises(C.ConfigError):
        C.RetainConfig.parse({"column_name": "c"})  # no after_date
    with pytest.raises(C.ConfigError):
        C.RetainConfig.parse({"column_name": "c", "after_date": "not-a-date"})


@pytest.mark.parametrize(
    "s,expected",
    [
        ("2024-01-02", datetime(2024, 1, 2)),
        ("2024-01-02T03:04:05", datetime(2024, 1, 2, 3, 4, 5)),
        ("2024-01-02 03:04:05", datetime(2024, 1, 2, 3, 4, 5)),
    ],
)
def test_date_formats(s, expected):
    assert C.parse_date(s) == expected


def test_rfc3339():
    d = C.parse_date("2024-01-02T03:04:05+00:00")
    assert (d.year, d.hour) == (2024, 3)


def test_save_load_round_trip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(YAML_CFG)
    cfg = C.load(p)
    out = tmp_path / "saved.yaml"
    cfg.save(out)
    cfg2 = C.load(out)
    assert cfg2.to_dict() == cfg.to_dict()
    out_json = tmp_path / "saved.json"
    cfg.save(out_json)
    assert C.load(out_json).to_dict() == cfg.to_dict()


def test_add_table_and_has_table():
    cfg = C.Config.from_dict({"connection": {"type": "sqlite", "file": "x"}})
    assert not cfg.has_table("t")
    cfg.add_table("t")
    assert cfg.has_table("t") and not cfg.configuration["t"].truncate
    cfg.add_table("t", truncate=True)  # no overwrite of existing
    assert not cfg.configuration["t"].truncate
    cfg.add_table("u", truncate=True)
    assert cfg.configuration["u"].truncate


def test_settings_key_mode_parse_validate_roundtrip(tmp_path):
    """r10: optional engine-knob block. settings.key_mode parses,
    round-trips through save/load, and an invalid value fails AT LOAD
    (not mid-export)."""
    raw = {
        "connection": {"type": "parquet", "path": "/root/testdata/sf0.001"},
        "configuration": {"users": {"truncate": True}},
        "settings": {"key_mode": "oracle"},
    }
    cfg = C.Config.from_dict(raw)
    assert cfg.settings == {"key_mode": "oracle"}
    p = tmp_path / "cfg.json"
    cfg.save(p)
    assert C.load(p).settings == {"key_mode": "oracle"}
    # absent block stays empty and is not serialized
    cfg2 = C.Config.from_dict({k: v for k, v in raw.items() if k != "settings"})
    assert cfg2.settings == {} and "settings" not in cfg2.to_dict()
    with pytest.raises(C.ConfigError, match="key_mode"):
        C.Config.from_dict({**raw, "settings": {"key_mode": "turbo"}})


def test_settings_resolution_order(monkeypatch):
    """settings.py: explicit arg > session override > env > default."""
    from database_anonymiser_minimiser_spark import settings as S

    monkeypatch.delenv(S.KEY_MODE_ENV, raising=False)
    assert S.key_mode() == "hashed"
    assert S.minhash_hash_mode() == "xxhash"
    monkeypatch.setenv(S.KEY_MODE_ENV, "oracle")
    assert S.key_mode() == "oracle"
    assert S.minhash_hash_mode() == "md5"
    S.set_key_mode("hashed")
    try:
        assert S.key_mode() == "hashed"  # session override beats env
        assert S.key_mode("oracle") == "oracle"  # explicit arg beats all
    finally:
        S.set_key_mode(None)
    assert S.key_mode() == "oracle"  # override cleared -> env again
    with pytest.raises(ValueError):
        S.key_mode("turbo")


def test_engine_applies_config_key_mode(spark):
    """The Engine applies settings.key_mode at construction so every
    operator in the run shares it."""
    from database_anonymiser_minimiser_spark import settings as S
    from database_anonymiser_minimiser_spark.plans.plan import Engine

    cfg = C.Config.from_dict(
        {
            "connection": {"type": "parquet", "path": "/root/testdata/sf0.001"},
            "configuration": {},
            "settings": {"key_mode": "oracle"},
        }
    )
    try:
        Engine(spark, cfg)
        assert S.key_mode() == "oracle"
    finally:
        S.set_key_mode(None)
