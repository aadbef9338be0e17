"""OpenMetrics / text-exposition parsing (sources/openmetrics.py)."""

import math
from datetime import datetime, timezone

from prom_etl_db_spark.sources.openmetrics import (
    parse_exposition_lines,
    read_exposition_text,
)

SCRAPE = """\
# HELP http_requests_total The total number of HTTP requests.
# TYPE http_requests_total counter
http_requests_total{method="post",code="200"} 1027 1395066363000
http_requests_total{method="post",code="400"}    3 1395066363000

# escaping and exotic values
msdos_file_access_time_seconds{path="C:\\\\DIR\\\\FILE.TXT",error="Cannot find file:\\n\\"FILE.TXT\\""} 1.458255915e9
metric_without_timestamp_and_labels 12.47
something_weird{problem="division by zero"} +Inf -3982045
malformed_line_no_value{x="y"}
not a metric at all
# EOF
"""


def _parse(spark, text=SCRAPE):
    df = spark.createDataFrame([(x,) for x in text.splitlines()], "value string")
    return {r["metric_name"]: r for r in parse_exposition_lines(df).collect()}


def test_counter_lines_with_ms_timestamps(spark):
    rows = _parse(spark)
    r = rows["http_requests_total"]  # dict keeps last; check via full scan
    df = spark.createDataFrame([(x,) for x in SCRAPE.splitlines()], "value string")
    out = parse_exposition_lines(df).collect()
    reqs = [x for x in out if x["metric_name"] == "http_requests_total"]
    assert len(reqs) == 2
    by_code = {x["labels"]["code"]: x for x in reqs}
    assert by_code["200"]["value"] == 1027.0 and by_code["400"]["value"] == 3.0
    # 1395066363000 is epoch-MILLIS -> 2014-03-17T14:26:03Z
    assert by_code["200"]["timestamp"] == datetime.fromtimestamp(
        1395066363, tz=timezone.utc
    ).replace(tzinfo=None)
    assert r["labels"]["method"] == "post"


def test_escaped_label_values(spark):
    r = _parse(spark)["msdos_file_access_time_seconds"]
    assert r["labels"]["path"] == "C:\\DIR\\FILE.TXT"
    assert r["labels"]["error"] == 'Cannot find file:\n"FILE.TXT"'
    assert r["value"] == 1.458255915e9


def test_no_labels_no_timestamp_and_inf(spark):
    rows = _parse(spark)
    bare = rows["metric_without_timestamp_and_labels"]
    assert bare["labels"] == {} and bare["value"] == 12.47
    assert bare["timestamp"] is None
    weird = rows["something_weird"]
    assert math.isinf(weird["value"]) and weird["value"] > 0
    # negative epoch-seconds timestamp parses (pre-1970 is legal)
    assert weird["timestamp"].year == 1969


def test_comments_blank_and_malformed_are_quarantined(spark):
    rows = _parse(spark)
    assert "malformed_line_no_value" not in rows
    assert all(not k.startswith("#") for k in rows)
    assert len(rows) == 4  # the four well-formed metric names


def test_read_exposition_text_roundtrip(spark, tmp_path):
    p = tmp_path / "scrape.txt"
    p.write_text(SCRAPE)
    out = read_exposition_text(spark, str(p))
    assert out.count() == 5  # 2 + 1 + 1 + 1 well-formed sample lines


def test_escaped_backslash_before_n_is_not_a_newline(spark):
    from prom_etl_db_spark.sources.openmetrics import parse_exposition_lines

    # wire bytes \\n inside the quoted value = escaped backslash, then 'n'
    lines = spark.createDataFrame(
        [(r'm{path="C:\\nightly"} 1',)], "value string"
    )
    out = parse_exposition_lines(lines).collect()
    assert out[0]["labels"]["path"] == "C:\\nightly"


def test_exemplar_stripped_only_outside_quoted_values(spark):
    from prom_etl_db_spark.sources.openmetrics import parse_exposition_lines

    lines = spark.createDataFrame(
        [
            # exemplar after value+ts must strip
            ('requests{code="200"} 5 1708300800 # {trace_id="abc"} 1 17',),
            # exemplar right after value (no ts)
            ('requests{code="201"} 7 # {trace_id="def"} 1',),
            # " # {" INSIDE a quoted label value is data, not an exemplar
            ('weird{q="a # {b}"} 3 1708300800',),
        ],
        "value string",
    )
    by_first = {
        tuple(sorted(r["labels"].items())): r
        for r in parse_exposition_lines(lines).collect()
    }
    assert by_first[(("code", "200"),)]["value"] == 5.0
    assert by_first[(("code", "200"),)]["timestamp"] is not None
    assert by_first[(("code", "201"),)]["value"] == 7.0
    assert by_first[(("code", "201"),)]["timestamp"] is None
    assert by_first[(("q", "a # {b}"),)]["value"] == 3.0


def test_exemplar_parse(spark):
    """later r8: the exemplar tail (`# {labels} value [ts]`) surfaces
    as its own row; samples without exemplars drop out; the sample
    parse is unaffected."""
    from prom_etl_db_spark.sources.openmetrics import (
        parse_exposition_exemplars,
        parse_exposition_lines,
    )

    text = "\n".join([
        '# TYPE http_requests_total counter',
        'http_requests_total{code="200"} 1027 1395066363000 '
        '# {trace_id="abc",span_id="s1"} 3.5 1395066363.2',
        'http_requests_total{code="400"} 3 1395066363000',
        'empty_set_total 9 # {} 1.0',
        'weird{v="has # {inside}"} 2 # {trace_id="t2"} +Inf',
    ])
    df = spark.createDataFrame([(x,) for x in text.splitlines()],
                               "value string")
    ex = {r["metric_name"]: r
          for r in parse_exposition_exemplars(df).collect()}
    assert len(ex) == 3
    e = ex["http_requests_total"]
    assert e["labels"] == {"code": "200"}
    assert e["exemplar_labels"] == {"trace_id": "abc", "span_id": "s1"}
    assert e["value"] == 3.5
    assert e["timestamp"] is not None
    assert ex["empty_set_total"]["exemplar_labels"] == {}
    assert ex["empty_set_total"]["value"] == 1.0
    assert ex["empty_set_total"]["timestamp"] is None
    w = ex["weird"]
    assert w["labels"] == {"v": "has # {inside}"}
    assert w["value"] == float("inf")
    # the sample parse still sees every sample, exemplar or not
    samples = parse_exposition_lines(df)
    assert samples.count() == 4
    got = {(r["metric_name"], r["labels"].get("code"), r["value"])
           for r in samples.collect()}
    assert ("weird", None, 2.0) in got
