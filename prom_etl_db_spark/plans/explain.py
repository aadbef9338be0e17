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


def _split_top_level(s: str) -> list[str]:
    """Split a struct body on TOP-LEVEL commas only — a naive split
    breaks decimal(10,2) and nested struct/array/map types into phantom
    fields like '2)'."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in (p.strip() for p in parts) if p]


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists of every scan — column-pruning check.

    A schema longer than spark.sql.maxMetadataStringLength is truncated
    with '... N more fields'; that marker is dropped rather than parsed
    as a column (pruning assertions over such a scan see the visible
    prefix only)."""
    text = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<(.*)>", text)
    return [
        [
            c.split(":")[0].strip()
            for c in _split_top_level(s)
            if "more fields" not in c
        ]
        for s in schemas
    ]
