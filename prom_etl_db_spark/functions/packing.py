"""Sequence packing: greedy first-fit of documents into fixed-length
training sequences.

Reference scope: samzong/prom-etl-db has no training surface; §2.E
LLM-pipeline extension (round 6). Every LLM pretraining run packs
variable-length documents into fixed-capacity token sequences (T5's
"packing", GPT-NeoX/Megatron dataloaders, HuggingFace
``group_texts``) — wasted tail tokens are wasted FLOPs, so the packer
is a first-class pipeline stage. Implemented here is the standard
deterministic greedy SEQUENTIAL first-fit (the streaming dataloader
discipline — documents arrive in corpus order and are never
reordered):

- eff = min(n_tokens, capacity); a document longer than the capacity
  is TRUNCATED to one full bin (flagged; splitting into continuation
  bins is a caller policy this operator deliberately does not hide);
- if the current bin has room for eff, append at offset = fill;
  otherwise open the next bin at offset 0.

The recurrence is inherently sequential WITHIN a packing domain, so
the Spark shape is applyInPandas per shard key: shards parallelize
(the production dataloader runs one packer per worker anyway) and the
per-shard pass is O(docs). The DuckDB oracle replays the recurrence
with a recursive CTE row-by-row — the Gorilla/LTTB sequential-replay
pattern — so every bin id, offset and truncation flag is hash-checked.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACKING_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("bin_idx", T.LongType()),
        T.StructField("offset_in_bin", T.IntegerType()),
        T.StructField("eff_tokens", T.IntegerType()),
        T.StructField("truncated", T.BooleanType()),
    ]
)


def pack_sequences(
    docs: DataFrame,
    *,
    capacity: int,
    shard_col: str = "shard",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy first-fit packing per shard (documents in ``order_col``
    order). Output: (shard, doc_id, n_tokens, bin_idx, offset_in_bin,
    eff_tokens, truncated)."""
    if capacity <= 0:
        raise ValueError(f"pack_sequences: capacity must be positive, got {capacity}")

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        bad = pdf[tokens_col].isna() | (pdf[tokens_col] < 0)
        if bad.any():
            # a negative count would DECREASE fill and silently corrupt
            # every later offset in the shard — refuse loudly (r7
            # adversarial pass); zero-token docs are fine (they pack at
            # the current offset with eff 0)
            doc = pdf.loc[bad, order_col].iloc[0]
            raise ValueError(
                f"pack_sequences: null/negative {tokens_col} at {order_col}={doc}"
            )
        bins, offsets, effs, truncs = [], [], [], []
        bin_idx, fill = 0, 0
        first = True
        for n in pdf[tokens_col]:
            n = int(n)
            eff = min(n, capacity)
            if first:
                bin_idx, off, fill, first = 0, 0, eff, False
            elif fill + eff <= capacity:
                off = fill
                fill += eff
            else:
                bin_idx += 1
                off = 0
                fill = eff
            bins.append(bin_idx)
            offsets.append(off)
            effs.append(eff)
            truncs.append(n > capacity)
        return pd.DataFrame(
            {
                "shard": pdf[shard_col].astype("int64"),
                "doc_id": pdf[order_col].astype("int64"),
                "n_tokens": pdf[tokens_col].astype("int32"),
                "bin_idx": pd.Series(bins, dtype="int64").values,
                "offset_in_bin": pd.Series(offsets, dtype="int32").values,
                "eff_tokens": pd.Series(effs, dtype="int32").values,
                "truncated": pd.Series(truncs, dtype="bool").values,
            }
        )

    return (
        docs.select(shard_col, order_col, tokens_col)
        .groupBy(shard_col)
        .applyInPandas(pack, PACKING_SCHEMA)
    )


def packing_efficiency(packed: DataFrame, *, capacity: int) -> DataFrame:
    """Per-shard packing stats: bins used, token utilization in exact
    integer parts-per-million (the waste metric a pipeline monitors)."""
    per_shard = packed.groupBy("shard").agg(
        (F.max("bin_idx") + 1).alias("n_bins"),
        F.sum("eff_tokens").alias("packed_tokens"),
        F.sum(F.col("truncated").cast("int")).alias("n_truncated"),
    )
    return per_shard.select(
        "shard",
        "n_bins",
        "packed_tokens",
        "n_truncated",
        F.expr(f"(packed_tokens * 1000000) DIV (n_bins * {capacity})").alias(
            "utilization_ppm"
        ),
    )
