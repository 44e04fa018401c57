"""Config-file surface (≙ app/config.py settings.ini + env layering)."""

import pytest

from illumio_ray.config import Settings, load_settings

INI = """
[General]
beatname = CustomBeat

[Processing]
num_shards = 8
enrich_mode = actor

[Syslog]
sma_host = 10.0.0.9
use_tcp = False
max_messages_per_second = 250
"""


def test_defaults_without_file():
    s = load_settings(None, env={})
    assert s == Settings()
    assert s.siem_proto == "tcp"


def test_ini_values_and_types(tmp_path):
    p = tmp_path / "settings.ini"
    p.write_text(INI)
    s = load_settings(p, env={})
    assert s.beatname == "CustomBeat"
    assert s.num_shards == 8 and isinstance(s.num_shards, int)
    assert s.enrich_mode == "actor"
    assert s.sma_host == "10.0.0.9"
    assert s.use_tcp is False and s.siem_proto == "udp"
    assert s.max_messages_per_second == 250.0
    # untouched keys keep defaults
    assert s.max_concurrent_shards == Settings().max_concurrent_shards


def test_env_overrides_ini(tmp_path):
    p = tmp_path / "settings.ini"
    p.write_text(INI)
    env = {"ILLUMIO_RAY_PROCESSING_NUM_SHARDS": "32",
           "ILLUMIO_RAY_SYSLOG_USE_TCP": "true"}
    s = load_settings(p, env=env)
    assert s.num_shards == 32      # env beats ini (8)
    assert s.use_tcp is True       # env beats ini (False)
    assert s.beatname == "CustomBeat"  # ini still applies elsewhere


def test_missing_named_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_settings(tmp_path / "nope.ini", env={})


def test_invalid_typed_value_raises_with_key_name(tmp_path):
    p = tmp_path / "settings.ini"
    p.write_text("[Processing]\nnum_shards = not-a-number\n")
    with pytest.raises(ValueError, match=r"\[Processing\] num_shards"):
        load_settings(p, env={})


def test_fractional_poll_interval_accepted(tmp_path):
    p = tmp_path / "settings.ini"
    p.write_text("[Ingest]\npoll_interval = 0.5\n")
    assert load_settings(p, env={}).poll_interval == 0.5
