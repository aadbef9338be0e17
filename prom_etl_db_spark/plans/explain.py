"""Plan inspection helpers (the "did Catalyst do what we wanted" gate).

The brief's scale checklist — filters pushed to the scan, columns pruned,
joins broadcast, whole-stage codegen spans — is asserted in tests via these
helpers rather than eyeballed (SURVEY.md §4.2).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    text = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists of every scan — column-pruning check."""
    text = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()] for s in schemas
    ]
