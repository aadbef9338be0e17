""".env / environment configuration for the CLI (SURVEY.md §2.A row A35).

The reference's loadEnvFile (`/root/reference/cmd/repair/main.go:591-630`):
skip blank/comment lines, split KEY=VALUE on the FIRST '=', trim both
sides, strip one matching pair of single or double quotes, and set the
variable ONLY if it isn't already in the environment — so precedence is
(lowest→highest) .env < real environment < explicit flags, matching the
reference exactly.
"""

from __future__ import annotations

import os
from collections.abc import MutableMapping
from pathlib import Path

__all__ = ["load_env_file", "resolve_setting"]

# CLI-flag → env-var mapping (the engine analog of the reference's
# MYSQL_* / PROMETHEUS_* backend settings)
ENV_KEYS = {
    "configs": "PROM_ETL_SPARK_CONFIGS",
    "store": "PROM_ETL_SPARK_STORE",
    "audit": "PROM_ETL_SPARK_AUDIT",
    "sf_dir": "PROM_ETL_SPARK_SF_DIR",
}


def load_env_file(
    path: str | Path = ".env", environ: MutableMapping[str, str] | None = None
) -> dict[str, str]:
    """Parse ``path`` into ``environ`` (default ``os.environ``) with the
    reference's exact semantics; a missing file is fine (main.go:593-596).
    Returns the variables the file SET (already-present keys excluded)."""
    environ = os.environ if environ is None else environ
    p = Path(path)
    if not p.is_file():
        return {}
    applied: dict[str, str] = {}
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=" not in line:
            continue
        key, value = line.split("=", 1)
        key = key.strip()
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        if not environ.get(key):
            environ[key] = value
            applied[key] = value
    return applied


def resolve_setting(
    flag_value: str | None,
    env_key: str,
    environ: MutableMapping[str, str] | None = None,
) -> str | None:
    """Explicit flag beats environment (which ``load_env_file`` already
    merged .env beneath)."""
    if flag_value is not None:
        return flag_value
    environ = os.environ if environ is None else environ
    return environ.get(env_key) or None
