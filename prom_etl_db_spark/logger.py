"""Structured JSON logging (reference parity: internal/logger/logger.go:1-66).

The reference wraps Go's slog with a JSON handler plus field-binder
helpers (WithComponent/WithQueryID/WithDuration/WithError/WithCount).
Python's stdlib ``logging`` has no structured JSON formatter, so this
module supplies the same surface: ``new_logger(level)`` builds a
JSON-lines logger with source location, and ``with_fields`` (plus the
named duals of each reference helper) binds fields via LoggerAdapter —
bound fields merge into every record like slog's ``With``.

Log lines are single-line JSON on stdout:
  {"ts": "...", "level": "INFO", "msg": "...", "source": "serve.py:42",
   "component": "executor", "query_id": "q1", ...}
"""

from __future__ import annotations

import json
import logging
import sys
from datetime import datetime, timezone
from typing import Any

__all__ = [
    "new_logger",
    "with_fields",
    "with_component",
    "with_query_id",
    "with_duration",
    "with_error",
    "with_count",
]

# reference levels (logger.go:10-15); unknown level defaults to info like
# NewLogger's default branch
_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "error": logging.ERROR,
}


class JSONFormatter(logging.Formatter):
    """One JSON object per line; bound/extra fields ride at the top level
    (keys that collide with the envelope are dropped rather than
    corrupting it)."""

    _ENVELOPE = ("ts", "level", "msg", "source")

    def format(self, record: logging.LogRecord) -> str:
        out: dict[str, Any] = {
            "ts": datetime.fromtimestamp(record.created, tz=timezone.utc).isoformat(
                timespec="milliseconds"
            ),
            # slog parity: Go emits "WARN", Python's levelname is
            # "WARNING" — a filter written against the reference format
            # (level == "WARN") must match this engine's lines too
            "level": "WARN" if record.levelname == "WARNING" else record.levelname,
            "msg": record.getMessage(),
            # AddSource parity (logger.go:36)
            "source": f"{record.filename}:{record.lineno}",
        }
        fields = getattr(record, "fields", None)
        if fields:
            for k, v in fields.items():
                if k not in self._ENVELOPE:
                    out[k] = v
        if record.exc_info and record.exc_info[1] is not None:
            out.setdefault("error", repr(record.exc_info[1]))
        return json.dumps(out, default=str)


class FieldsAdapter(logging.LoggerAdapter):
    """slog.With parity: carries a dict of bound fields; per-call
    ``extra={...}`` fields merge over the bound ones."""

    def process(self, msg, kwargs):
        merged = dict(self.extra or {})
        call_extra = kwargs.get("extra") or {}
        # callers pass plain dicts; wrap them under one key the formatter
        # knows, so arbitrary field names can't shadow LogRecord internals
        merged.update(call_extra.get("fields", call_extra))
        kwargs["extra"] = {"fields": merged}
        return msg, kwargs

    def bind(self, **fields) -> "FieldsAdapter":
        merged = dict(self.extra or {})
        merged.update(fields)
        return FieldsAdapter(self.logger, merged)


def new_logger(
    level: str = "info", *, name: str = "prom_etl_db_spark", stream=None
) -> FieldsAdapter:
    """JSON logger at ``level`` (debug/info/warn/error; unknown → info).
    Re-invoking with the same name reconfigures the handler (idempotent —
    no duplicate handlers, so serve loops can call it per start)."""
    lg = logging.getLogger(name)
    lg.setLevel(_LEVELS.get(level.lower(), logging.INFO))
    handler = logging.StreamHandler(stream or sys.stdout)
    handler.setFormatter(JSONFormatter())
    lg.handlers = [handler]
    lg.propagate = False
    return FieldsAdapter(lg, {})


def with_fields(logger: FieldsAdapter, **fields) -> FieldsAdapter:
    """Generic field binder (slog ``With``)."""
    return logger.bind(**fields)


def with_component(logger: FieldsAdapter, component: str) -> FieldsAdapter:
    """logger.go:44 WithComponent."""
    return logger.bind(component=component)


def with_query_id(logger: FieldsAdapter, query_id: str) -> FieldsAdapter:
    """logger.go:49 WithQueryID."""
    return logger.bind(query_id=query_id)


def with_duration(logger: FieldsAdapter, duration_ms: int) -> FieldsAdapter:
    """logger.go:54 WithDuration (milliseconds, like the reference)."""
    return logger.bind(duration_ms=duration_ms)


def with_error(logger: FieldsAdapter, err: BaseException | str) -> FieldsAdapter:
    """logger.go:59 WithError."""
    return logger.bind(error=str(err))


def with_count(logger: FieldsAdapter, count: int) -> FieldsAdapter:
    """logger.go:64 WithCount."""
    return logger.bind(count=count)
