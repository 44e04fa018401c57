"""Config-file surface: settings.ini + environment overrides feeding CLI
defaults (≙ app/config.py:19-129, which loads ``settings.ini`` via
configparser plus ``.env``/environment variables and exposes typed
attributes with fallbacks).

Precedence (highest wins): explicit CLI flag > environment variable
``ILLUMIO_RAY_<SECTION>_<KEY>`` > ``settings.ini`` value > built-in default.
The reference loads AWS credentials from the environment and everything
else from the ini with per-key fallbacks; this mirrors that shape for the
rebuilt surface (shard counts instead of worker threads, parquet dirs
instead of S3 buckets — the semantic mapping is documented per field).

A checked-in example lives at ``settings.example.ini``; nothing requires a
config file — every field has a default, and the CLI runs config-free.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, fields
from pathlib import Path


@dataclass
class Settings:
    # [General] ≙ reference BEATNAME / LOG_TYPES
    beatname: str = "IllumioS3"
    log_types: str = "auditable_events,summaries"
    # [Ingest] ≙ reference [S3]: look-back window, per-poll caps, poll cadence
    time_window_hours: float = 12.0
    max_files_per_folder: int = 1000
    poll_interval: float = 30.0  # float: sub-second polling is valid
    # [Processing] ≙ reference MIN/MAX_WORKERS + BATCH_SIZE, recast to the
    # Ray shard plan
    num_shards: int = 16
    max_concurrent_shards: int = 4
    fragments_per_shard: int = 16
    enrich_mode: str = "task"
    # [Syslog] ≙ reference SMA_HOST/SMA_PORT/USE_TCP/MAX_MESSAGES_PER_SECOND
    sma_host: str = ""
    sma_port: int = 514
    use_tcp: bool = True
    max_messages_per_second: float = 0.0  # 0 = unlimited
    # [Logging] ≙ reference LOG_FOLDER/LOG_LEVEL/MAX_LOG_SIZE/BACKUP_COUNT
    # (app/logger_config.py:40-43) — empty folder disables the file log
    log_folder: str = ""
    log_level: str = "INFO"
    max_log_size: int = 10_485_760
    backup_count: int = 5

    @property
    def siem_proto(self) -> str:
        return "tcp" if self.use_tcp else "udp"


_SECTION_OF = {
    "beatname": "General", "log_types": "General",
    "time_window_hours": "Ingest", "max_files_per_folder": "Ingest",
    "poll_interval": "Ingest",
    "num_shards": "Processing", "max_concurrent_shards": "Processing",
    "fragments_per_shard": "Processing", "enrich_mode": "Processing",
    "sma_host": "Syslog", "sma_port": "Syslog", "use_tcp": "Syslog",
    "max_messages_per_second": "Syslog",
    "log_folder": "Logging", "log_level": "Logging",
    "max_log_size": "Logging", "backup_count": "Logging",
}

_TRUE = {"1", "true", "yes", "on"}


def _coerce(raw: str, typ):
    if typ is bool:
        return raw.strip().lower() in _TRUE
    return typ(raw)


def load_settings(path: str | Path | None = None,
                  env: dict | None = None) -> Settings:
    """Load settings from an ini file (optional) with env-var overrides.

    env overrides use ``ILLUMIO_RAY_<SECTION>_<KEY>`` (upper-case), e.g.
    ``ILLUMIO_RAY_SYSLOG_SMA_HOST=10.0.0.5`` — the analogue of the
    reference's load_dotenv + os.getenv layer."""
    env = os.environ if env is None else env
    cp = configparser.ConfigParser()
    if path is not None:
        path = Path(path)
        if not cp.read(path) or not cp.sections():
            # ≙ reference: a named-but-missing/empty settings file is an
            # error, not a silent default run
            raise FileNotFoundError(
                f"Settings file not found or empty: {path}")
    s = Settings()
    for f in fields(Settings):
        section = _SECTION_OF[f.name]
        typ = type(getattr(s, f.name))
        env_key = f"ILLUMIO_RAY_{section.upper()}_{f.name.upper()}"
        raw, origin = None, None
        if env_key in env:
            raw, origin = env[env_key], env_key
        elif cp.has_option(section, f.name):
            raw, origin = cp.get(section, f.name), f"[{section}] {f.name}"
        if raw is not None:
            try:
                setattr(s, f.name, _coerce(raw, typ))
            except (TypeError, ValueError) as e:
                raise ValueError(
                    f"invalid value for {origin}: {raw!r} "
                    f"(expected {typ.__name__})") from e
    return s
