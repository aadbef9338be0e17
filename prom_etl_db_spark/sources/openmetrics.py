"""OpenMetrics / Prometheus text-exposition parser as a Spark source.

The reference consumes Prometheus through the query API, but the metrics
themselves are born in the text exposition format (`metric{l="v"} 1.5
1708300800`). Ingesting scrape dumps / federation snapshots directly is
the natural extension of the A-family sources: this module parses the
text format DISTRIBUTEDLY — `spark.read.text` → one JVM-regex projection
per line — into the same (metric_name, labels, value, timestamp) sample
shape every downstream operator consumes.

Scale posture: the line parse is pure Column expressions (regexp_extract
+ a from_json-free label-pair parse via regexp_extract_all), so the whole
parse rides whole-stage codegen — no Python in the scrape path; malformed
lines quarantine via the same try_cast discipline as A12 rather than
failing the batch.

Format subset: `# HELP` / `# TYPE` / `# EOF` comments are dropped; sample
lines support quoted label values with escaped quotes, an optional
timestamp (seconds or milliseconds — OpenMetrics uses seconds, classic
Prometheus exposition milliseconds; auto-detected by magnitude), and
+Inf/-Inf/NaN values. Exemplars (`# {...} value [ts]`) are stripped by
the SAMPLE parse and surfaced by ``parse_exposition_exemplars`` (later
r8) — the text-format leg of the exemplar surface, making the
metric→trace link table available from all three ingestion formats
(text exposition here, remote-write 2.0, OTLP).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_exposition_lines",
    "parse_exposition_exemplars",
    "read_exposition_text",
]

# metric{labels} value [timestamp] [# {exemplar...}] — labels optional;
# value may be +Inf/-Inf/NaN. The labels blob is matched as an explicit
# pair sequence (quoted values with escapes), NOT `.*`: a greedy dot-star
# would run to the LAST `}` on the line and swallow the value/exemplar,
# and a pre-strip of ` # {` could truncate a quoted label value that
# legitimately contains that text. The exemplar is an optional trailing
# group instead.
_LBL_SEQ = r'(?:[a-zA-Z_][a-zA-Z0-9_]*="(?:[^"\\]|\\.)*"\s*,?\s*)*'
_LINE_RE = (
    r'^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(' + _LBL_SEQ + r')\})?'
    r'\s+(\S+)(?:\s+([^#\s]+))?\s*(?:#\s*\{.*)?$'
)
# one label pair: name="value" with \" escapes inside the value
_PAIR_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"'
# private-use sentinel for the single-pass unescape: `\\` parks here so
# the later `\"`/`\n` passes can't see a phantom escape, then it becomes
# the literal backslash. U+E000 never appears in scrape text.
_BS_SENTINEL = ""


def _labels_map(labels_blob: Column) -> Column:
    """Label-pair blob → map<string,string> with the exposition
    unescape (backslash-backslash, backslash-quote, backslash-n) —
    single-pass equivalent: an escaped backslash parks in a
    private-use sentinel FIRST so a value like backslash-backslash-n
    decodes to backslash+n, not backslash+newline (sequential
    replacement in the other order created exactly that bug)."""
    pairs = F.regexp_extract_all(labels_blob, F.lit(_PAIR_RE), F.lit(0))
    return F.map_from_arrays(
        F.transform(pairs, lambda p: F.regexp_extract(p, _PAIR_RE, 1)),
        F.transform(
            pairs,
            lambda p: F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.regexp_extract(p, _PAIR_RE, 2),
                            r"\\\\",
                            _BS_SENTINEL,
                        ),
                        r'\\"',
                        '"',
                    ),
                    r"\\n",
                    "\n",
                ),
                _BS_SENTINEL,
                "\\\\",
            ),
        ),
    )


def parse_exposition_lines(lines: DataFrame, *, value_col: str = "value") -> DataFrame:
    """(value: string) lines → (metric_name, labels, value, timestamp).

    Comment/blank/malformed lines drop out (A12 quarantine posture: the
    scrape keeps flowing); a missing timestamp yields NULL — the caller
    stamps scrape time, exactly like Prometheus does.
    """
    line = F.col(value_col)  # exemplars handled by _LINE_RE itself
    name = F.regexp_extract(line, _LINE_RE, 1)
    labels_blob = F.regexp_extract(line, _LINE_RE, 2)
    raw_val = F.regexp_extract(line, _LINE_RE, 3)
    raw_ts = F.regexp_extract(line, _LINE_RE, 4)

    # +Inf/-Inf/NaN are valid exposition values try_cast already accepts
    # ("Infinity"/"NaN" spellings are not used on the wire)
    val = (
        F.when(raw_val == "+Inf", F.lit(float("inf")))
        .when(raw_val == "-Inf", F.lit(float("-inf")))
        .when(raw_val == "NaN", F.lit(float("nan")))
        .otherwise(raw_val.try_cast("double"))
    )
    # seconds vs milliseconds by magnitude: epoch-ms for any plausible
    # date is >= 1e12; epoch-s stays < 1e11 until year 5138
    ts_num = raw_ts.try_cast("double")
    ts = F.when(
        ts_num.isNotNull(),
        F.timestamp_seconds(
            F.when(F.abs(ts_num) >= 1e12, ts_num / 1000.0).otherwise(ts_num)
        ),
    )

    labels = _labels_map(labels_blob)

    parsed = lines.select(
        name.alias("metric_name"),
        labels.alias("labels"),
        val.alias("value"),
        ts.alias("timestamp"),
    )
    # quarantine: no metric name (comments, blanks, garbage) or no value
    return parsed.where(
        (F.col("metric_name") != "") & F.col("value").isNotNull()
    )


# exemplar tail: `# {labels} value [ts]` after the sample's own
# value/timestamp — the label set may be empty ({}); value/ts follow the
# same spellings as the sample's
_EX_RE = (
    r'^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(' + _LBL_SEQ + r')\})?'
    r'\s+\S+(?:\s+[^#\s]+)?\s*'
    r'#\s*\{(' + _LBL_SEQ + r')\}\s+(\S+)(?:\s+(\S+))?\s*$'
)


def parse_exposition_exemplars(
    lines: DataFrame, *, value_col: str = "value"
) -> DataFrame:
    """(value: string) lines → one row per EXEMPLAR:
    (metric_name, labels, exemplar_labels, value, timestamp) — the
    text-format leg of the exemplar surface (OpenMetrics §exemplars:
    `# {trace_id="..."} value [ts]` after a sample). Lines without an
    exemplar simply drop out (most samples carry none). Same
    whole-stage-codegen posture as the sample parse: two regex
    projections, no Python."""
    line = F.col(value_col)
    name = F.regexp_extract(line, _EX_RE, 1)
    raw_val = F.regexp_extract(line, _EX_RE, 4)
    raw_ts = F.regexp_extract(line, _EX_RE, 5)
    val = (
        F.when(raw_val == "+Inf", F.lit(float("inf")))
        .when(raw_val == "-Inf", F.lit(float("-inf")))
        .when(raw_val == "NaN", F.lit(float("nan")))
        .otherwise(raw_val.try_cast("double"))
    )
    ts_num = raw_ts.try_cast("double")
    ts = F.when(
        ts_num.isNotNull(),
        F.timestamp_seconds(
            F.when(F.abs(ts_num) >= 1e12, ts_num / 1000.0).otherwise(ts_num)
        ),
    )
    parsed = lines.select(
        name.alias("metric_name"),
        _labels_map(F.regexp_extract(line, _EX_RE, 2)).alias("labels"),
        _labels_map(F.regexp_extract(line, _EX_RE, 3)).alias(
            "exemplar_labels"),
        val.alias("value"),
        ts.alias("timestamp"),
    )
    return parsed.where(
        (F.col("metric_name") != "") & F.col("value").isNotNull()
    )


def read_exposition_text(spark, path: str) -> DataFrame:
    """Parse exposition-format files under ``path`` (one scrape per file
    or concatenated) — `spark.read.text` keeps the read distributed and
    the parse is the codegen'd projection above."""
    return parse_exposition_lines(spark.read.text(path))
