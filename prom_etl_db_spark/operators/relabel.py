"""Prometheus relabel_configs: the ingestion-time label rewrite engine.

Reference scope: the reference's Prometheus targets are configured
through the standard scrape pipeline, whose universal transform is
``relabel_configs`` (prometheus.io/docs/prometheus/latest/configuration
— actions replace/keep/drop/hashmod/labelmap/labeldrop/labelkeep).
Every production Prometheus deployment shapes series with these rules
before storage; an engine claiming the ingestion surface must apply
the same semantics to its sample streams:

- the regex is FULLY ANCHORED (Prometheus wraps it ``^(?:re)$``);
- ``replace``: concat source label values with ``separator``, and only
  IF the regex matches set ``target_label`` to the replacement with
  ``$N`` group references expanded; an empty expansion DELETES the
  target label (Prometheus semantics);
- ``keep``/``drop``: row-level filters on the same match;
- ``hashmod``: target = ``BigEndian.Uint64(md5(concat)[8:16]) %
  modulus`` — the exact Go algebra, reproduced here JVM-side via
  ``md5``/``conv``/``decimal`` (and bit-for-bit in the DuckDB oracle
  via ``('0x' || substr(md5, 17, 16))::UBIGINT``);
- ``labelmap``: every label whose NAME matches gains a renamed copy
  (new name = replacement expansion over the name), overwriting
  collisions;
- ``labeldrop``/``labelkeep``: filter the label set by name.

Spark shape: pure Column end to end — map_filter/map_entries/
map_from_entries/transform HOFs over the MapType labels column plus
anchored rlike/regexp_replace; rows flow through whole-stage codegen,
filters push down, zero Python. Configs are plan-time constants (the
scrape-config model), so Catalyst folds each rule into the projection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RelabelConfig:
    action: str = "replace"
    source_labels: tuple[str, ...] = ()
    separator: str = ";"
    regex: str = "(.*)"
    target_label: str = ""
    replacement: str = "$1"
    modulus: int = 0


def _anchored(regex: str) -> str:
    return f"^(?:{regex})$"


def _concat_sources(labels: Column, cfg: RelabelConfig) -> Column:
    # a missing label concatenates as '' (Prometheus semantics)
    parts = [F.coalesce(labels[l], F.lit("")) for l in cfg.source_labels]
    return F.concat_ws(cfg.separator, *parts) if parts else F.lit("")


def _set_label(labels: Column, name: str, value: Column) -> Column:
    without = F.map_filter(labels, lambda k, _: k != name)
    return F.map_concat(without, F.map_from_arrays(F.array(F.lit(name)), F.array(value)))


def hashmod_column(value: Column, modulus: int) -> Column:
    """``BigEndian.Uint64(md5(value)[8:16]) % modulus`` as a string
    Column — hex chars 17..32 of the md5 are exactly those 8 bytes,
    and conv(hex, 16, 10) reads them unsigned."""
    u64 = F.conv(F.substring(F.md5(value), 17, 16), 16, 10).cast("decimal(38,0)")
    return (u64 % modulus).cast("long").cast("string")


def apply_relabel(
    df: DataFrame, configs: list[RelabelConfig], *, labels_col: str = "labels"
) -> DataFrame:
    """Apply the rule list in order (each rule sees the previous rule's
    output, exactly like the scrape pipeline)."""
    for cfg in configs:
        labels = F.col(labels_col)
        a = cfg.action
        anchored = _anchored(cfg.regex)
        if a in ("keep", "drop"):
            matched = _concat_sources(labels, cfg).rlike(anchored)
            df = df.where(matched if a == "keep" else ~matched)
            continue
        if a == "replace":
            src = _concat_sources(labels, cfg)
            expanded = F.regexp_replace(src, anchored, cfg.replacement)
            updated = F.when(
                src.rlike(anchored) & (expanded != ""),
                _set_label(labels, cfg.target_label, expanded),
            ).when(
                src.rlike(anchored),  # empty expansion deletes the target
                F.map_filter(labels, lambda k, _: k != cfg.target_label),
            ).otherwise(labels)
            df = df.withColumn(labels_col, updated)
            continue
        if a == "hashmod":
            src = _concat_sources(labels, cfg)
            df = df.withColumn(
                labels_col,
                _set_label(labels, cfg.target_label, hashmod_column(src, cfg.modulus)),
            )
            continue
        if a == "labelmap":
            entries = F.map_entries(labels)
            # Prometheus iterates labels in sorted order calling lb.Set
            # per rename, so when two sources map to one new name the
            # LAST (largest source key) wins. map_from_entries throws on
            # duplicate keys under the default mapKeyDedupPolicy, so
            # replay that sequential semantics: sort by source key,
            # rename, then keep only the last entry per new key
            # (ADVICE r6 fix).
            renamed = F.transform(
                F.array_sort(F.filter(entries, lambda e: e.key.rlike(anchored))),
                lambda e: F.struct(
                    F.regexp_replace(e.key, anchored, cfg.replacement).alias("key"),
                    e.value.alias("value"),
                ),
            )
            deduped = F.filter(
                renamed,
                lambda e, i: ~F.exists(
                    F.slice(renamed, i + F.lit(2), F.size(renamed)),
                    lambda r: r.key == e.key,
                ),
            )
            survivors = F.filter(
                entries,
                lambda e: ~F.exists(deduped, lambda r: r.key == e.key),
            )
            df = df.withColumn(
                labels_col, F.map_from_entries(F.concat(survivors, deduped))
            )
            continue
        if a in ("labeldrop", "labelkeep"):
            keepfn = (
                (lambda k, _: ~k.rlike(anchored))
                if a == "labeldrop"
                else (lambda k, _: k.rlike(anchored))
            )
            df = df.withColumn(labels_col, F.map_filter(labels, keepfn))
            continue
        raise ValueError(f"relabel: unknown action {a!r}")
    return df


def rendezvous_assign(
    key: Column, nodes: list[str], *, prefix: str = "hrw"
) -> Column:
    """Rendezvous (highest-random-weight) node assignment: node =
    argmax over candidates of md5(prefix-node-key) — the public
    Thaler-Ravishankar scheme behind consistent scrape-target and
    cache sharding. Unlike ``hashmod``, removing one node reassigns
    ONLY that node's keys (the minimal-disruption property the unit
    test pins). Pure Column: one greatest() over per-node
    (weight, node) structs; the weight is the md5's first 16 hex chars
    read as an unsigned 64-bit integer, so any SQL engine replays the
    argmax exactly."""
    if not nodes:
        raise ValueError("rendezvous_assign: empty node list")
    structs = [
        F.struct(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{prefix}-{n}-"), key)), 1, 16
                ),
                16,
                10,
            ).cast("decimal(38,0)").alias("w"),
            F.lit(n).alias("n"),
        )
        for n in nodes
    ]
    return F.greatest(*structs).getField("n") if len(structs) > 1 else structs[0].getField("n")
