"""Rotating JSON run log (≙ reference app/logger_config.py:1-91, which
installs a RotatingFileHandler with a JSON formatter sized by
settings.ini [Logging] keys).

The library emits run events on the ``illumio_ray.run`` logger
unconditionally (a NullHandler swallows them when no sink is
configured — the stdlib pattern for library logging); the CLI calls
``setup_run_logging`` when a log folder is configured, attaching the
rotating JSON file handler. One JSON object per line: timestamp, level,
logger name, message, plus any ``extra={"event": ..., ...}`` fields —
machine-parseable tails for the operator, same contract as the
reference's app.json.
"""

from __future__ import annotations

import json
import logging
import time
from logging.handlers import RotatingFileHandler
from pathlib import Path

RUN_LOGGER_NAME = "illumio_ray.run"
LOG_FILE = "app.json"

# reserved LogRecord attribute names — anything else on the record came
# in through `extra` and belongs in the JSON line
_STD_ATTRS = frozenset(vars(logging.LogRecord(
    "", 0, "", 0, "", (), None)).keys()) | {"message", "asctime",
                                            "taskName"}


class JSONLineFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        line = {
            "ts": round(record.created, 6),
            "time": time.strftime("%Y-%m-%dT%H:%M:%S",
                                  time.gmtime(record.created)),
            "name": record.name,
            "level": record.levelname,
            "message": record.getMessage(),
        }
        for k, v in vars(record).items():
            if k not in _STD_ATTRS and not k.startswith("_"):
                line[k] = v
        if record.exc_info:
            line["exc_info"] = self.formatException(record.exc_info)
        return json.dumps(line, default=str)


def get_run_logger() -> logging.Logger:
    lg = logging.getLogger(RUN_LOGGER_NAME)
    if not any(isinstance(h, logging.NullHandler) for h in lg.handlers):
        lg.addHandler(logging.NullHandler())
    return lg


def setup_run_logging(log_dir: str | Path, level: str = "INFO",
                      max_bytes: int = 10_485_760,
                      backup_count: int = 5) -> logging.Logger:
    """Attach the rotating JSON file handler to the run logger
    (idempotent per (process, log file): a second call with the same
    target replaces nothing and adds nothing)."""
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    target = log_dir / LOG_FILE
    lg = get_run_logger()
    lg.setLevel(logging.getLevelName(level.upper()))
    for h in lg.handlers:
        if isinstance(h, RotatingFileHandler) \
                and Path(h.baseFilename) == target.resolve():
            return lg
    fh = RotatingFileHandler(target, maxBytes=max_bytes,
                             backupCount=backup_count)
    fh.setFormatter(JSONLineFormatter())
    lg.addHandler(fh)
    lg.propagate = False  # keep run events out of Ray's root handlers
    lg.info("run logging initialized",
            extra={"event": "log_init", "log_file": str(target),
                   "max_bytes": max_bytes, "backup_count": backup_count})
    return lg
