"""Native-histogram FUNCTION family — histogram_count / histogram_sum /
histogram_avg / histogram_stddev / histogram_stdvar over decoded
native-histogram rows (Prometheus promql/functions.go; the reference
delegates these to its Prometheus backend — /root/reference/README.md
query section — so the engine implements the same semantics natively).

Input is the dense decoded shape shared by BOTH native-histogram wire
formats (remote-write prompb and OTLP exponential):
``remote_write.NATIVE_HIST_SCHEMA`` columns — count, sum, schema,
zero_count, pos_offset, pos_counts, neg_offset, neg_counts (and
custom_values for NHCB rows).

Semantics (Prometheus's estimators, promql/functions.go):

- count/sum/avg read the histogram's own count/sum fields;
  avg = sum / count, NaN for an empty histogram (the same
  empty-histogram rule as histogram_quantile's r8 seam fix).
- stddev/stdvar estimate each bucket's observations AT THE GEOMETRIC
  MEAN of its bounds: exponential bucket index k spans
  (base^(k-1), base^k], base = 2^(2^-schema), so
  mid_k = sqrt(lower*upper) = base^(k-0.5) (negated on the negative
  side); the zero bucket spans zero, so its mid is 0. Variance is the
  population form around mean = sum/count:
  var = (Σ c_i·(mid_i − mean)²) / count
      = (S2 − 2·mean·S1 + mean²·Σc_i) / count
  where Σ runs over zero + positive + negative buckets and the
  division uses the histogram's STORED count (Prometheus divides by
  h.Count even when it exceeds the bucket sum).
- Custom-bucket (schema −53) rows get NULL stddev/stdvar: their
  boundary geometry is data, and Prometheus's arithmetic-midpoint
  variant for NHCB is a different estimator — refusing a number beats
  emitting one computed with the wrong geometry (count/sum/avg are
  geometry-free and stay valid).

Plan shape: pure Column expressions (transform-with-index + aggregate
over the bounded per-row bucket arrays) — whole-stage codegen, zero
shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prom_etl_db_spark.functions.remote_write import CUSTOM_BUCKETS_SCHEMA

#: sum_by's pos/neg bucket pipelines fused into one explode + one
#: (group, side, idx) agg + one side-conditional per-group agg (r13) —
#: halves the side pipeline's exchanges. Measured winner in interleaved
#: best-of-4 A/Bs: 0.910 on a 4M-row synthetic frame, 0.942 on the real
#: wire headline — where r12's FULL single-pass rewrite (which also
#: folded the scalar branch in) measured 1.15–1.45× SLOWER; fusing only
#: the two symmetric sides halves their work instead of serializing
#: unlike work. The per-side form is kept one flag away for the record.
_FUSED_SIDES = True


def _moments(counts: Column, offset: Column, inv: Column,
             sign: float) -> tuple[Column, Column, Column]:
    """(Σc, Σc·mid, Σc·mid²) over one side's dense bucket array.
    ``inv`` is 2^-schema; dense index i is bucket index offset+i with
    geometric mid = 2^((offset+i-0.5)·inv), sign-flipped for the
    negative side."""
    mids = F.transform(
        counts,
        lambda c, i: F.struct(
            c.cast("double").alias("c"),
            (
                F.lit(sign)
                * F.pow(
                    F.lit(2.0),
                    (offset.cast("double") + i.cast("double") - F.lit(0.5))
                    * inv,
                )
            ).alias("m"),
        ),
    )
    zero = F.lit(0.0)
    s0 = F.aggregate(mids, zero, lambda acc, x: acc + x["c"])
    s1 = F.aggregate(mids, zero, lambda acc, x: acc + x["c"] * x["m"])
    s2 = F.aggregate(
        mids, zero, lambda acc, x: acc + x["c"] * x["m"] * x["m"]
    )
    return s0, s1, s2


def histogram_stats(nh: DataFrame) -> DataFrame:
    """Append hist_count / hist_sum / hist_avg / hist_stdvar /
    hist_stddev columns to a decoded native-histogram DataFrame.
    Empty histograms (count == 0) yield NaN avg/stdvar/stddev —
    Prometheus's convention; custom-bucket rows yield NULL
    stdvar/stddev (see module docstring)."""
    cnt = F.col("count").cast("double")
    mean = F.when(cnt == 0, F.lit(float("nan"))).otherwise(
        F.try_divide(F.col("sum"), cnt)
    )
    inv = F.pow(F.lit(2.0), -F.col("schema").cast("double"))
    p0, p1, p2 = _moments(F.col("pos_counts"), F.col("pos_offset"), inv, 1.0)
    n0, n1, n2 = _moments(F.col("neg_counts"), F.col("neg_offset"), inv, -1.0)
    zc = F.col("zero_count").cast("double")
    s0 = p0 + n0 + zc  # zero bucket: mid 0 → contributes to Σc only
    s1 = p1 + n1
    s2 = p2 + n2
    # r9 ADVICE fix: the expanded form S2-2·mean·S1+mean²·S0 can cancel
    # to a tiny negative double where the true variance is ~0, making
    # sqrt() NaN — clamp at 0 (Prometheus's centered Σc·(mid-mean)²
    # form is non-negative by construction). when(<0) rather than
    # greatest: NaN < 0 and NULL < 0 are both non-true, so the NaN
    # (empty histogram) and NULL (null arrays) conventions survive.
    raw_var = F.try_divide(
        s2 - F.lit(2.0) * mean * s1 + mean * mean * s0, cnt
    )
    stdvar = F.when(cnt == 0, F.lit(float("nan"))).otherwise(
        F.when(raw_var < 0, F.lit(0.0)).otherwise(raw_var)
    )
    stdvar = F.when(
        F.col("schema") == CUSTOM_BUCKETS_SCHEMA, F.lit(None).cast("double")
    ).otherwise(stdvar)
    return (
        nh.withColumn("hist_count", F.col("count"))
        .withColumn("hist_sum", F.col("sum"))
        .withColumn("hist_avg", mean)
        .withColumn("hist_stdvar", stdvar)
        .withColumn("hist_stddev", F.sqrt(F.col("hist_stdvar")))
    )


def nhcb_to_le_buckets(nh: DataFrame) -> DataFrame:
    """Custom-bucket (schema −53) rows → the classic
    (le, cumulative count) exploded shape ``histogram_quantile``
    consumes: dense bucket index i maps to le = custom_values[i], the
    index len(custom_values) to +Inf, and the +Inf cumulative count is
    forced to the histogram's total ``count`` (observations the sender
    kept out of finite buckets still exist). Returns one row per
    (histogram, bucket) with the input's id columns preserved.

    Pure-Column le/cum array construction + one posexplode — the same
    plan shape as the exponential le-mapping, so NHCB rides the
    existing quantile operator unchanged."""
    empty_s = F.expr("CAST(array() AS array<string>)")
    empty_d = F.expr("CAST(array() AS array<double>)")
    # sequence(0, -1) would infer step -1; guard the empty-bucket case
    les_body = F.when(
        F.size("pos_counts") > 0,
        F.transform(
            F.sequence(F.lit(0), F.size("pos_counts") - F.lit(1)),
            lambda i: F.when(
                F.col("pos_offset") + i < F.size("custom_values"),
                F.element_at(
                    F.col("custom_values"),
                    (F.col("pos_offset") + i + F.lit(1)).cast("int"),
                ).cast("string"),
            ).otherwise(F.lit("+Inf")),
        ),
    ).otherwise(empty_s)
    les = F.concat(
        les_body,
        # the sender may omit the +Inf bucket entirely; add it so the
        # quantile operator always sees the total
        F.when(
            F.col("pos_offset") + F.size("pos_counts")
            <= F.size("custom_values"),
            F.array(F.lit("+Inf")),
        ).otherwise(empty_s),
    )
    cums = F.slice(
        F.aggregate(
            F.col("pos_counts"),
            F.array(F.lit(0).cast("double")),
            lambda acc, x: F.concat(
                acc,
                F.array(F.element_at(acc, -1) + x.cast("double")),
            ),
        ),
        2,
        F.size("pos_counts").cast("int"),
    )
    cums = F.concat(
        cums,
        F.when(
            F.col("pos_offset") + F.size("pos_counts")
            <= F.size("custom_values"),
            F.array(F.col("count").cast("double")),
        ).otherwise(empty_d),
    )
    # a sender-encoded +Inf bucket may undercount vs the histogram's
    # own total; the total is authoritative
    cums = F.zip_with(
        les,
        cums,
        lambda le, c: F.when(
            le == "+Inf", F.col("count").cast("double")
        ).otherwise(c),
    )
    return nh.where(F.col("schema") == CUSTOM_BUCKETS_SCHEMA).select(
        "*",
        F.posexplode(F.arrays_zip(les.alias("le"), cums.alias("cum"))).alias(
            "bucket_i", "le_cum"
        ),
    )


def native_hist_quantile(nh: DataFrame, q: float) -> DataFrame:
    """histogram_quantile over native histograms computed DIRECTLY on
    the dense decoded shape — no le-explosion, no shuffle: one pure-
    Column pass per histogram row (the le-mapping compositions exist
    for operator-reuse proofs; this is the native evaluator).

    Interpolation is EXPONENTIAL within a bucket (Prometheus 3.x's
    rule for native buckets — observations are log-uniform within
    (base^(k-1), base^k], so the quantile is
    lower·(upper/lower)^frac = 2^((o+i-1+frac)·2^-schema)), which the
    le-mapping path (linear, the classic-bucket rule) deliberately
    does NOT apply — this operator closes that documented estimator
    divergence. r9: NEGATIVE-direction buckets are supported (the
    r8 form refused them): the cumulative walk runs in ascending
    VALUE order — negative buckets from the most negative upward
    (dense neg array REVERSED: neg index i ↦ bucket k = neg_offset+i
    covering [-base^k, -base^(k-1))), then the zero bucket, then the
    positive buckets — exactly Prometheus's AllBucketIterator order.
    Conventions, each pinned by test or fixture:

    - a NEGATIVE crossing bucket interpolates exponentially in
      |value| from its more-negative end:
      value = -2^((k - frac)·2^-schema) (frac 0 → -base^k,
      frac 1 → -base^(k-1) — the sign-mirrored log-uniform rule);
    - target in the ZERO bucket interpolates linearly within
      [lower, zero_threshold], lower = -zero_threshold when the
      histogram carries negative buckets and 0 otherwise —
      Prometheus's rule (the zero bucket spans 'around zero'; linear
      is the only defensible rule where log-uniform is undefined
      at 0);
    - target beyond the last bucket (count > bucket sum — legal)
      returns the last finite upper bound in walk order (positive
      last if present, else zero_threshold, else the negative side's
      upper); a histogram with NO buckets at all (all mass in the
      implicit +Inf region) yields NaN — no finite bound exists and
      fabricating one from default offsets was wrong (r9 review fix);
    - empty histograms (count == 0) yield NaN (the r8 seam rule);
    - q == 0 on a non-empty histogram returns the lower bound of the
      FIRST POPULATED bucket in walk order — Prometheus's rank-0
      landing spot (r9 review fix: a blanket 0.0 undersold
      positive-only histograms whose zero bucket is empty; previously
      NULL via try_divide(0, 0));
    - custom-bucket rows (schema −53) refuse — their quantile is the
      CLASSIC linear rule via nhcb_to_le_buckets, not this estimator.

    Appends ``quantile_value``."""
    cnt = F.col("count").cast("double")
    target = F.lit(float(q)) * cnt
    zc = F.col("zero_count").cast("double")
    inv = F.pow(F.lit(2.0), -F.col("schema").cast("double"))
    guarded = F.when(
        F.col("schema") == CUSTOM_BUCKETS_SCHEMA,
        F.raise_error(F.lit(
            "native_hist_quantile: custom-bucket histograms take the "
            "classic linear rule — use nhcb_to_le_buckets + "
            "histogram_quantile")),
    ).otherwise(F.lit(0))
    n_neg = F.size("neg_counts")
    has_neg = n_neg > 0
    # ascending-value walk: [reversed neg ..., zero, pos ...]
    walk = F.concat(
        F.transform(F.reverse(F.col("neg_counts")),
                    lambda x: x.cast("double")),
        F.array(zc),
        F.transform(F.col("pos_counts"), lambda x: x.cast("double")),
    )
    # inclusive prefix sums over the walk
    cums = F.slice(
        F.aggregate(
            walk,
            F.array(F.lit(0.0)),
            lambda acc, x: F.concat(
                acc, F.array(F.element_at(acc, -1) + x)),
        ),
        2,
        F.size(walk).cast("int"),
    )
    # 0-based walk position of the crossing bucket
    p = F.size(F.filter(cums, lambda c: c < target))
    prev_cum = F.when(p == 0, F.lit(0.0)).otherwise(
        F.coalesce(F.element_at(cums, p.cast("int")), F.lit(0.0)))
    in_bucket = F.coalesce(
        F.element_at(walk, (p + 1).cast("int")), F.lit(0.0))
    frac = F.try_divide(target - prev_cum, in_bucket)
    # negative region: walk pos p ↦ dense neg index n_neg-1-p ↦
    # bucket k = neg_offset + n_neg - 1 - p covering [-base^k, -base^(k-1))
    neg_k = (F.col("neg_offset").cast("double")
             + n_neg.cast("double") - F.lit(1.0) - p.cast("double"))
    neg_val = -F.pow(F.lit(2.0), (neg_k - frac) * inv)
    # zero bucket: linear within [lower, zt]
    zero_lower = F.when(has_neg, -F.col("zero_threshold")).otherwise(
        F.lit(0.0))
    zero_val = zero_lower + (F.col("zero_threshold") - zero_lower) * frac
    # positive region: walk pos p ↦ dense pos index p - n_neg - 1 ↦
    # bucket k = pos_offset + idx covering (base^(k-1), base^k]
    pos_i = (p - n_neg - F.lit(1)).cast("double")
    exp_val = F.pow(
        F.lit(2.0),
        (F.col("pos_offset").cast("double") + pos_i - F.lit(1.0) + frac)
        * inv,
    )
    # upper bound of the LAST bucket in walk order; a histogram with
    # count > 0 but NO buckets at all (all mass in the implicit +Inf
    # region) has no finite upper to return — NaN, not a fabricated
    # bound from the wrong side (r9 code-review fix)
    last_upper = (
        F.when(
            F.size("pos_counts") > 0,
            F.pow(
                F.lit(2.0),
                (F.col("pos_offset").cast("double")
                 + F.size("pos_counts").cast("double") - F.lit(1.0))
                * inv,
            ),
        )
        .when(zc > 0, F.col("zero_threshold"))
        .when(
            has_neg,
            -F.pow(F.lit(2.0),
                   (F.col("neg_offset").cast("double") - F.lit(1.0)) * inv),
        )
        .otherwise(F.lit(float("nan")))
    )
    # q == 0 convention: the lower bound of the FIRST POPULATED bucket
    # in walk order — Prometheus's rank-0 landing spot (r9 code-review
    # fix: a bare 0.0 is below anything a positive-only histogram with
    # an empty zero bucket could have observed)
    def _first_populated_idx(counts: Column) -> Column:
        # dense index of the first count > 0, NULL if none
        return F.array_min(
            F.filter(
                F.transform(
                    counts,
                    lambda c, i: F.when(c > 0, i),
                ),
                lambda x: x.isNotNull(),
            )
        )

    neg_last_pop = F.array_max(
        F.filter(
            F.transform(F.col("neg_counts"), lambda c, i: F.when(c > 0, i)),
            lambda x: x.isNotNull(),
        )
    )
    pos_first_pop = _first_populated_idx(F.col("pos_counts"))
    zero_lower_inf = F.when(
        has_neg, -F.col("zero_threshold")).otherwise(F.lit(0.0))
    infimum = (
        F.when(
            neg_last_pop.isNotNull(),
            # most negative populated bucket k: lower bound -base^k
            -F.pow(F.lit(2.0),
                   (F.col("neg_offset").cast("double")
                    + neg_last_pop.cast("double")) * inv),
        )
        .when(zc > 0, zero_lower_inf)
        .when(
            pos_first_pop.isNotNull(),
            F.pow(F.lit(2.0),
                  (F.col("pos_offset").cast("double")
                   + pos_first_pop.cast("double") - F.lit(1.0)) * inv),
        )
        .otherwise(F.lit(float("nan")))  # only the implicit +Inf mass
    )
    value = (
        F.when(cnt == 0, F.lit(float("nan")))
        .when(target == 0, infimum)
        .when(p >= F.size(walk), last_upper)  # beyond all buckets
        .when(p < n_neg, neg_val)
        .when(p == n_neg, zero_val)
        .otherwise(exp_val)
    )
    # the guard column evaluates first (raising on bad rows) and is 0
    # on every good row
    return nh.withColumn("quantile_value", F.when(guarded == 0, value))


def native_hist_fraction(
    nh: DataFrame, lower: float, upper: float
) -> DataFrame:
    """histogram_fraction(lower, upper, h) over native histograms
    (r9), computed directly on the dense decoded shape — the
    companion to ``native_hist_quantile`` with the same Prometheus-3
    estimator: observations are log-uniform within an exponential
    bucket, linear within the zero bucket.

    Evaluation needs NO bucket search: every bucket contributes
    ``count_i · clamp01(pos_i(b))`` to the CDF at bound b, where
    pos_i is the bound's interpolated position inside bucket i (0
    below it, 1 above it) —

    - negative bucket k ([-base^k, -base^(k-1))):
      pos = (k·2^-schema − log2(−b)) / 2^-schema, 1 for b ≥ 0;
    - zero bucket [zlo, zt] (zlo = −zt with negative buckets, else
      0): pos = (b − zlo)/(zt − zlo); a zero-width zero bucket is a
      point mass at 0 (pos = step at 0);
    - positive bucket k ((base^(k-1), base^k]):
      pos = (log2(b) − (k−1)·2^-schema) / 2^-schema, 0 for b ≤ 0.

    fraction = max(F(upper) − F(lower), 0) / count — one pure-Column
    pass, zero shuffle. Count in excess of the bucket sum (the
    implicit +Inf mass) is reachable by no finite bound, matching
    Prometheus. Empty histograms yield NaN; custom-bucket rows
    (schema −53) refuse (classic linear rule via the le-mapping).
    Appends ``fraction_value``."""
    if not lower <= upper:
        raise ValueError(
            f"native_hist_fraction: lower {lower} > upper {upper}")
    cnt = F.col("count").cast("double")
    zc = F.col("zero_count").cast("double")
    inv = F.pow(F.lit(2.0), -F.col("schema").cast("double"))
    guarded = F.when(
        F.col("schema") == CUSTOM_BUCKETS_SCHEMA,
        F.raise_error(F.lit(
            "native_hist_fraction: custom-bucket histograms take the "
            "classic linear rule — use nhcb_to_le_buckets + "
            "histogram_fraction")),
    ).otherwise(F.lit(0))
    zt = F.col("zero_threshold")
    has_neg = F.size("neg_counts") > 0
    zlo = F.when(has_neg, -zt).otherwise(F.lit(0.0))

    def clamp01(x: Column) -> Column:
        return F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))

    def cdf(b: float) -> Column:
        bb = F.lit(float(b))
        neg = F.aggregate(
            F.transform(
                F.col("neg_counts"),
                lambda c, i: c.cast("double") * clamp01(
                    F.when(bb >= 0, F.lit(1.0)).otherwise(
                        (F.col("neg_offset").cast("double")
                         + i.cast("double")) * inv
                        - F.log2(-bb)
                    ) / F.when(bb >= 0, F.lit(1.0)).otherwise(inv)
                ),
            ),
            F.lit(0.0), lambda a, x: a + x,
        )
        zero_pos = F.when(
            zt - zlo > 0, (bb - zlo) / (zt - zlo)
        ).otherwise(F.when(bb >= 0, F.lit(1.0)).otherwise(F.lit(0.0)))
        zero = zc * clamp01(zero_pos)
        pos = F.aggregate(
            F.transform(
                F.col("pos_counts"),
                lambda c, i: c.cast("double") * clamp01(
                    F.when(bb <= 0, F.lit(0.0)).otherwise(
                        (F.log2(bb)
                         - (F.col("pos_offset").cast("double")
                            + i.cast("double") - F.lit(1.0)) * inv)
                        / inv
                    )
                ),
            ),
            F.lit(0.0), lambda a, x: a + x,
        )
        return neg + zero + pos

    frac = F.try_divide(
        F.greatest(cdf(upper) - cdf(lower), F.lit(0.0)), cnt)
    value = F.when(cnt == 0, F.lit(float("nan"))).otherwise(frac)
    return nh.withColumn("fraction_value", F.when(guarded == 0, value))


def native_hist_sum_by(
    nh: DataFrame,
    by: "tuple[str, ...]" = ("metric_name",),
    *,
    max_index_span: int = 4096,
    group_stats: str = "window",
) -> DataFrame:
    """PromQL ``sum by (...)`` over NATIVE-histogram series (r9) —
    the aggregation idiom behind
    ``histogram_quantile(φ, sum by (le-free labels) (h))``: histograms
    across series merge bucket-wise into one histogram per group,
    Prometheus's native-histogram addition.

    Semantics:
    - mixed SCHEMAS within a group merge at the group's COARSEST
      scale — every row downscales (⌈i/2^d⌉ fold, ``_nh_downscale``)
      before bucket sums, Prometheus's rule;
    - bucket arrays add OFFSET-ALIGNED on absolute indices (absent
      buckets count 0); the merged span is the union span;
    - zero_count / count accumulate; a missing ``sum`` anywhere in
      the group nulls the merged sum (a partial sum is a wrong sum);
    - CUSTOM-BUCKET groups (NHCB, schema −53) sum index-wise when
      every member's custom_values agree — boundaries are data;
      differing boundaries refuse loudly, as does mixing −53 with
      exponential schemas (no cross-family merge exists);
    - differing zero_thresholds refuse (DIVERGENCES.md: Prometheus
      widens to the max threshold and re-buckets — a silent
      resolution change; refusing names it instead);
    - a group-wide index span beyond ``max_index_span`` refuses (the
      decoder's dense-expansion guard);
    - a side EMPTY across the whole group merges to an empty array
      with offset 0 (r10 seam: the offset of a bucket-less span is
      meaningless — Prometheus renders no span; 0 is the decoders'
      own empty-side convention).

    Plan (scalable by construction — NO per-group fold): one window
    for the group's min schema → per-row downscale (pure Column) →
    posexplode to (group, absolute index) → hash-agg sums →
    per-group dense reassembly → join with the scalar agg. Shuffles
    are all keyed on the group (+index), so the operator scales with
    executors like any groupBy; group size never materializes in one
    task.

    ``group_stats`` picks how the per-group refusal stats (family mix,
    custom_values / zero_threshold agreement, min schema) are
    computed: ``"window"`` (default) evaluates them with a plain
    group-partitioned window — fastest at bench group sizes (the r12
    window→join A/B read the join 1.26–1.35× slower at sf0.1);
    ``"join"`` computes one tiny aggregate per group and equi-joins it
    back (AQE broadcasts it), which is the 100 TB shape when ``by``
    has single-digit cardinality over billions of rows — a
    low-cardinality window puts a whole group in ONE task (guide
    §2.5; AQE skew handling does not apply to windows), while the
    aggregate is map-side partial and the join-back is broadcast.
    Both shapes are oracle-verified identical; see SCALE.md r13 for
    the skew-probe numbers."""
    from prom_etl_db_spark.operators.promql import _nh_downscale

    if group_stats not in ("window", "join"):
        raise ValueError(
            f"group_stats must be 'window' or 'join', got {group_stats!r}")
    has_cv = "custom_values" in nh.columns
    is_nhcb = F.col("schema") == CUSTOM_BUCKETS_SCHEMA
    cv_key = F.to_json(F.col("custom_values")) if has_cv else None
    if group_stats == "join":
        gs = nh.groupBy(*by).agg(
            F.min(is_nhcb.cast("int")).alias("__nhcb_min"),
            F.max(is_nhcb.cast("int")).alias("__nhcb_max"),
            *([F.min(cv_key).alias("__cv_min"),
               F.max(cv_key).alias("__cv_max")] if has_cv else []),
            F.min("zero_threshold").alias("__zt_min"),
            F.max("zero_threshold").alias("__zt_max"),
            F.min("schema").alias("__schema_min"),
        )
        nh = nh.join(gs, on=list(by))
        stat = {
            "nhcb_min": F.col("__nhcb_min"),
            "nhcb_max": F.col("__nhcb_max"),
            "cv_min": F.col("__cv_min") if has_cv else None,
            "cv_max": F.col("__cv_max") if has_cv else None,
            "zt_min": F.col("__zt_min"),
            "zt_max": F.col("__zt_max"),
            "schema_min": F.col("__schema_min"),
        }
    else:
        gw = Window.partitionBy(*by)
        stat = {
            "nhcb_min": F.min(is_nhcb.cast("int")).over(gw),
            "nhcb_max": F.max(is_nhcb.cast("int")).over(gw),
            "cv_min": F.min(cv_key).over(gw) if has_cv else None,
            "cv_max": F.max(cv_key).over(gw) if has_cv else None,
            "zt_min": F.min("zero_threshold").over(gw),
            "zt_max": F.max("zero_threshold").over(gw),
            "schema_min": F.min("schema").over(gw),
        }
    checked = F.when(
        stat["nhcb_min"] != stat["nhcb_max"],
        F.raise_error(F.lit(
            "native_hist_sum_by: group mixes custom-bucket (schema "
            "-53) and exponential histograms — no merge exists "
            "across bucket families")),
    )
    if has_cv:
        checked = checked.when(
            is_nhcb
            & (stat["cv_min"] != stat["cv_max"]),
            F.raise_error(F.lit(
                "native_hist_sum_by: custom_values differ within one "
                "group — index-wise addition across different "
                "boundaries mis-attributes counts")),
        )
    checked = checked.when(
        stat["zt_min"] != stat["zt_max"],
        F.raise_error(F.lit(
            "native_hist_sum_by: zero_threshold differs within one "
            "group — Prometheus re-buckets to the widest; refusing "
            "beats a silent resolution change")),
    ).otherwise(F.lit(0))
    target = stat["schema_min"]
    d = (F.col("schema") - target).cast("int")
    elem0 = nh.schema["pos_counts"].dataType.elementType.simpleString()
    po2, pc2 = _nh_downscale(
        F.col("pos_offset"), F.col("pos_counts"), d, elem=elem0)
    no2, nc2 = _nh_downscale(
        F.col("neg_offset"), F.col("neg_counts"), d, elem=elem0)
    base = (
        nh.withColumn("__ok", checked)
        .withColumn("__schema", target)
        .withColumn("__po", F.when(F.col("__ok") == 0, po2))
        .withColumn("__pc", pc2)
        .withColumn("__no", no2)
        .withColumn("__nc", nc2)
    )
    if group_stats == "join":
        base = base.drop(
            "__nhcb_min", "__nhcb_max", "__cv_min", "__cv_max",
            "__zt_min", "__zt_max", "__schema_min")
    # NOTE (r12 optimization round — this shape was re-measured and
    # deliberately KEPT): ``base`` feeds three aggregation branches
    # below (pos side, neg side, scalars) that re-join at the end, and
    # the initial plan shows the upstream subtree (for wire queries:
    # the Python protobuf encode + decode) three times. Two rewrites
    # were built and benchmarked against this one at sf0.1:
    # (a) persist(base) — interleaved noop-timed toggle read a WASH
    #     (median 6.8 s vs 7.2 s, best 6.0 vs 6.2): the expensive wire
    #     decode below the increase aggregation's Exchange is already
    #     executed once (runtime exchange reuse), and the branch
    #     re-execution above it overlaps on idle cores;
    # (b) a true single-pass form — each row exploding into [scalar
    #     entry] ++ pos buckets ++ neg buckets, two hash aggs, zero
    #     joins — measured 1.45×/1.15× SLOWER on the native headline in
    #     two interleaved A/Bs: it serializes work the branch shape
    #     runs concurrently, and the wider conditional aggregates cost
    #     more per row.
    # See OPTIMIZATION_r12.md for the numbers.

    def side(off_col: str, cnt_col: str, tag: str) -> DataFrame:
        ex = base.select(
            *by,
            F.col(off_col).alias("__o"),
            F.posexplode(cnt_col).alias("__i", "__c"),
        ).select(*by, (F.col("__o") + F.col("__i")).alias("__idx"), "__c")
        agg = ex.groupBy(*by, "__idx").agg(F.sum("__c").alias("__c"))
        span_bad = F.max("__idx") - F.min("__idx") >= F.lit(
            int(max_index_span))
        return agg.groupBy(*by).agg(
            F.when(
                span_bad,
                F.raise_error(F.lit(
                    "native_hist_sum_by: merged bucket index span "
                    f"exceeds {int(max_index_span)} — dense-expansion "
                    "bomb guard")),
            ).otherwise(F.min("__idx")).alias(f"{tag}_off"),
            F.map_from_entries(
                F.collect_list(F.struct("__idx", "__c"))
            ).alias(f"{tag}_map"),
            F.max("__idx").alias(f"{tag}_hi"),
        )

    def fused_sides() -> DataFrame:
        # both sides through ONE explode + ONE (group, side, idx) agg +
        # ONE per-group agg with side-conditional outputs — halves the
        # side pipeline's exchanges. A null/empty side contributes no
        # rows (coalesce before concat: concat propagates null), so a
        # group with an all-empty side gets NULL off/hi exactly like
        # the per-side form (collect_list skips the nulls the when()
        # produces, leaving an empty map the assembler never reads).
        elem = nh.schema["pos_counts"].dataType.elementType.simpleString()
        empty = F.expr(f"CAST(array() AS array<{elem}>)")

        def tagged(off_col: str, cnt_col: str, s: int):
            return F.transform(
                F.coalesce(F.col(cnt_col), empty),
                lambda c, i: F.struct(
                    F.lit(s).alias("s"),
                    (F.col(off_col) + i).alias("idx"),
                    c.alias("c"),
                ),
            )

        ex = base.select(
            *by,
            F.explode(
                F.concat(tagged("__po", "__pc", 0), tagged("__no", "__nc", 1))
            ).alias("__e"),
        ).select(*by, "__e.s", "__e.idx", "__e.c")
        agg = ex.groupBy(*by, "s", "idx").agg(F.sum("c").alias("c"))

        def one(s: int, tag: str):
            i = F.when(F.col("s") == s, F.col("idx"))
            span_bad = F.max(i) - F.min(i) >= F.lit(int(max_index_span))
            return [
                F.when(
                    span_bad,
                    F.raise_error(F.lit(
                        "native_hist_sum_by: merged bucket index span "
                        f"exceeds {int(max_index_span)} — dense-"
                        "expansion bomb guard")),
                ).otherwise(F.min(i)).alias(f"{tag}_off"),
                F.map_from_entries(
                    F.collect_list(
                        F.when(F.col("s") == s, F.struct("idx", "c")))
                ).alias(f"{tag}_map"),
                F.max(i).alias(f"{tag}_hi"),
            ]

        return agg.groupBy(*by).agg(*one(0, "p"), *one(1, "n"))

    if not _FUSED_SIDES:
        pos = side("__po", "__pc", "p")
        neg = side("__no", "__nc", "n")
    scalars = base.groupBy(*by).agg(
        # the refusal checks ride a SELECTED column so column pruning
        # can never elide them (r9 review fix: a separate unused
        # guard column would be pruned from the executed plan)
        F.when(
            F.max("__ok") == 0, F.first("__schema")
        ).alias("schema"),
        F.first("zero_threshold").alias("zero_threshold"),
        F.sum("zero_count").alias("zero_count"),
        F.sum("count").alias("count"),
        F.when(
            F.max(F.col("sum").isNull().cast("int")) == 1,
            F.lit(None).cast("double"),
        ).otherwise(F.sum("sum")).alias("sum"),
        *([F.first("custom_values").alias("custom_values")]
          if has_cv else []),
        F.count(F.lit(1)).alias("n_series"),
    )
    if _FUSED_SIDES:
        out = scalars.join(fused_sides(), on=list(by), how="left")
    else:
        out = scalars.join(pos, on=list(by), how="left").join(
            neg, on=list(by), how="left")

    # counts keep the INPUT's element type: integer histograms (the
    # scrape path) sum as longs, FLOAT histograms (the wire float
    # flavor; rate()'s per-second output — r10 parser reachability)
    # sum as doubles. The only type-pinned spots are the empty-array
    # fallback and the absent-bucket zero, so both derive from the
    # input schema instead of hard-coding bigint.
    elem = nh.schema["pos_counts"].dataType.elementType.simpleString()

    def assemble(tag: str, fallback: int = 0):
        off = F.col(f"{tag}_off")
        counts = F.when(
            off.isNull(), F.expr(f"CAST(array() AS array<{elem}>)")
        ).otherwise(
            F.transform(
                F.sequence(off, F.col(f"{tag}_hi")),
                lambda i: F.coalesce(
                    F.element_at(F.col(f"{tag}_map"), i),
                    F.lit(0).cast(elem),
                ),
            )
        )
        return (
            F.coalesce(off, F.lit(fallback)).cast("int"),
            counts,
        )

    p_off, p_counts = assemble("p")
    n_off, n_counts = assemble("n")
    return out.select(
        *by,
        "schema",
        "zero_threshold",
        "zero_count",
        "count",
        "sum",
        p_off.alias("pos_offset"),
        p_counts.alias("pos_counts"),
        n_off.alias("neg_offset"),
        n_counts.alias("neg_counts"),
        *(["custom_values"] if has_cv else []),
        "n_series",
    )


def native_hist_rate(hist: DataFrame) -> DataFrame:
    """PromQL ``rate()`` over native-histogram series (r9): the
    per-second FLOAT histogram — ``native_hist_increase``'s
    counter-corrected increase with every component divided by the
    window span. Prometheus's rate of a native histogram is a float
    histogram for exactly this reason (fractional per-second counts);
    the compositions that are SCALE-INVARIANT (histogram_quantile —
    the /dt cancels) ride increase directly, and this operator is the
    surface for the ones that are not (alerting thresholds on
    per-second bucket rates, dashboards).

    Output mirrors the increase shape with ``zero_rate`` (double) and
    ``pos_rates`` (array<double>) replacing the integer counts — plus
    ``neg_rates`` when the input carries a negative side (r10: the
    increase now align-diffs ``neg_offset``/``neg_counts`` instead of
    silently dropping them, and rate inherits that) — plus the carried
    schema/offset/reset/dt columns. A zero-length window
    (dt_seconds == 0 — both endpoints at one timestamp) yields NULL
    rates, Prometheus's undefined-rate convention. Pure Column over
    the one hash agg increase already performs — no extra shuffle."""
    from prom_etl_db_spark.operators.promql import native_hist_increase

    inc = native_hist_increase(hist)
    has_neg = "neg_counts" in inc.columns
    dt = F.col("dt_seconds").cast("double")
    safe = F.when(dt > 0, dt)
    return inc.select(
        "labels",
        "schema",
        "reset",
        F.col("pos_offset"),
        F.transform(
            F.col("pos_counts"),
            lambda c: c.cast("double") / safe,
        ).alias("pos_rates"),
        *([
            F.col("neg_offset"),
            F.transform(
                F.col("neg_counts"),
                lambda c: c.cast("double") / safe,
            ).alias("neg_rates"),
        ] if has_neg else []),
        (F.col("zero_count").cast("double") / safe).alias("zero_rate"),
        # r10 (parser reachability): the scalar components' per-second
        # rates ride along when the increase carried them
        *([
            (F.col("count").cast("double") / safe).alias("count_rate"),
        ] if "count" in inc.columns else []),
        *([
            (F.col("sum") / safe).alias("sum_rate"),
        ] if "sum" in inc.columns else []),
        *(["zero_threshold"] if "zero_threshold" in inc.columns else []),
        "dt_seconds",
        *(["custom_values"] if "custom_values" in inc.columns else []),
    )


def native_hist_avg_by(
    nh: DataFrame,
    by: "tuple[str, ...]" = ("metric_name",),
) -> DataFrame:
    """PromQL ``avg by (...)`` over native-histogram series (r9):
    the merged group histogram divided by the series count — a FLOAT
    histogram (fractional per-series bucket counts), Prometheus's
    avg-of-histograms. Rides ``native_hist_sum_by`` unchanged (same
    refusals, same scale merge, same group-keyed plan) with one
    pure-Column divide on top — no extra shuffle. Output mirrors the
    merged shape with double-typed ``zero_count``/``count``/
    ``pos_counts``/``neg_counts``; ``sum`` is already the mean of the
    per-series sums.

    INSTANT-SCOPE contract (r10 seam, the `info_enrich` convention):
    the input is an instant vector — ONE row per series. ``n_series``
    is the group's ROW count; feeding a multi-sample-per-series frame
    averages over samples, not series (the same is true of
    Prometheus's avg, which only ever sees instant vectors). Reduce
    time first (``native_hist_increase`` / latest-per-series) — the
    parser's string path does exactly that."""
    m = native_hist_sum_by(nh, by)
    n = F.col("n_series").cast("double")
    has_cv = "custom_values" in m.columns
    return m.select(
        *by,
        "schema",
        "zero_threshold",
        (F.col("zero_count").cast("double") / n).alias("zero_count"),
        (F.col("count").cast("double") / n).alias("count"),
        (F.col("sum") / n).alias("sum"),
        "pos_offset",
        F.transform(
            F.col("pos_counts"), lambda c: c.cast("double") / n
        ).alias("pos_counts"),
        "neg_offset",
        F.transform(
            F.col("neg_counts"), lambda c: c.cast("double") / n
        ).alias("neg_counts"),
        *(["custom_values"] if has_cv else []),
        "n_series",
    )


def _grid_explode(
    hist: DataFrame,
    *,
    frame: str,
    step: str,
    start: "datetime",
    end: "datetime",
) -> DataFrame:
    """Fan each sample onto the grid instants whose sliding
    ``[t − frame, t]`` window contains it (pure-Column sequence, no
    driver loop) and stamp ``bucket_start`` — the shared front half of
    every native grid operator. Row amplification is frame/step (the
    documented explode-strategy contract)."""
    from prom_etl_db_spark.timeparse import parse_duration

    frame_s = int(parse_duration(frame).total_seconds())
    step_s = int(parse_duration(step).total_seconds())
    if frame_s < 1 or step_s < 1:
        raise ValueError("frame and step must be >= 1s")
    start_s, end_s = int(start.timestamp()), int(end.timestamp())
    n = (end_s - start_s) // step_s
    ts_s = F.unix_timestamp(F.col("ts"))
    k_lo = F.greatest(
        F.ceil((ts_s - F.lit(start_s)).cast("double") / F.lit(step_s))
        .cast("long"),
        F.lit(0).cast("long"),
    )
    k_hi = F.least(
        F.floor(
            (ts_s + F.lit(frame_s) - F.lit(start_s)).cast("double")
            / F.lit(step_s)
        ).cast("long"),
        F.lit(int(n)).cast("long"),
    )
    return hist.where(k_lo <= k_hi).select(
        "*", F.explode(F.sequence(k_lo, k_hi)).alias("__k")
    ).withColumn(
        "bucket_start",
        F.timestamp_seconds(F.lit(start_s) + F.col("__k") * F.lit(step_s)),
    ).drop("__k")


def native_hist_increase_range(
    hist: DataFrame,
    *,
    frame: str,
    step: str,
    start: "datetime",
    end: "datetime",
    counter: bool = True,
    last_two: bool = False,
) -> DataFrame:
    """RANGE-QUERY form of native-histogram ``increase()`` (r10): the
    bucket-wise counter increase over a sliding ``[t − frame, t]``
    window evaluated at every grid instant t = start, start+step, …,
    ≤ end — the Grafana per-step pattern the instant form can't
    express, completing the native family's parity with the classic
    ``increase_range``.

    Semantics are the instant operator's, per grid instant: endpoint
    snapshot (earliest/latest in-window sample), schema downscale,
    offset-aligned subtraction on BOTH sides, the reset rule, the
    count/sum/zero_threshold carry — all literally `native_hist_
    increase` with the grid instant appended to the series key.
    Windows holding fewer than two samples DROP (Prometheus's
    two-points rule — a dashboard expects the step absent, not a
    zero histogram). Window bounds are inclusive on both ends, the
    instant native convention.

    Plan: the EXPLODE strategy — each sample fans onto the ≤
    frame/step grid instants whose window contains it (a pure-Column
    sequence, no driver loop), then ONE hash aggregation keyed on
    (series, instant). Row amplification is frame/step, the same
    cost shape `promql.increase_range(method='explode')` documents;
    the classic family's difference-array rewrite does not port —
    bucket arrays lack the scalar pair-contribution decomposition —
    so the amplification bound is the honest contract. Output: the
    increase shape plus ``bucket_start`` (timestamp).

    r11 options: ``counter=False`` is the gauge ``delta()`` grid form
    (no reset rule — `native_hist_delta` per instant); ``last_two``
    keeps only each window's NEWEST TWO samples before the endpoint
    snapshot (one extra window over the exploded (series, instant)
    partitioning, no added shuffle) — `irate()`/`idelta()` on the
    grid, closing the r11 seam-pass asymmetry where the SCALAR range
    path supported both but the native path refused."""
    from prom_etl_db_spark.operators.promql import (
        _ensure_series,
        native_hist_increase,
    )

    ex = _grid_explode(
        hist, frame=frame, step=step, start=start, end=end)
    if last_two:
        keyed = _ensure_series(ex)
        w = Window.partitionBy("__series", "bucket_start").orderBy(
            F.desc("ts"))
        ex = (
            keyed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= 2)
            .drop("__rn", "__series")
        )
    out = native_hist_increase(
        ex, extra_keys=("bucket_start",), counter=counter)
    return out.where(F.col("dt_seconds") > 0)


def native_hist_rate_range(
    hist: DataFrame,
    *,
    frame: str,
    step: str,
    start: "datetime",
    end: "datetime",
    last_two: bool = False,
) -> DataFrame:
    """RANGE-QUERY ``rate()`` over native histograms: the per-second
    FLOAT histogram at every grid instant — ``native_hist_increase_
    range``'s counter-corrected increase with every component divided
    by the observed window span (the instant ``native_hist_rate``
    convention, per grid instant; dt is last−first inside each window,
    exact-over-stored-data like the scalar rate family). Pure Column
    over the grid increase — no additional shuffle. ``last_two`` is
    the ``irate()`` grid form (r11)."""
    inc = native_hist_increase_range(
        hist, frame=frame, step=step, start=start, end=end,
        last_two=last_two)
    dt = F.col("dt_seconds").cast("double")
    safe = F.when(dt > 0, dt)
    has_neg = "neg_counts" in inc.columns
    return inc.select(
        "labels",
        "bucket_start",
        "schema",
        "reset",
        F.col("pos_offset"),
        F.transform(
            F.col("pos_counts"), lambda c: c.cast("double") / safe
        ).alias("pos_rates"),
        *([
            F.col("neg_offset"),
            F.transform(
                F.col("neg_counts"), lambda c: c.cast("double") / safe
            ).alias("neg_rates"),
        ] if has_neg else []),
        (F.col("zero_count").cast("double") / safe).alias("zero_rate"),
        "dt_seconds",
        *(["custom_values"] if "custom_values" in inc.columns else []),
    )


def native_hist_delta(hist: DataFrame) -> DataFrame:
    """PromQL ``delta()`` over native GAUGE histograms (r10): the
    aligned endpoint difference with NO reset rule — negative
    components are legal gauge movement (a residuals distribution
    shifting mass between buckets), exactly Prometheus's gauge-only
    delta. Everything else is ``native_hist_increase``'s machinery:
    schema downscale, both-side alignment, the count/sum/
    zero_threshold carry. ``reset`` is a constant False in the shared
    output shape."""
    from prom_etl_db_spark.operators.promql import native_hist_increase

    return native_hist_increase(hist, counter=False)


def _last_two_per_series(hist: DataFrame) -> DataFrame:
    """The newest TWO samples per series — one window, no collect; the
    endpoint machinery over this 2-row set IS the instant-rate pair."""
    from prom_etl_db_spark.operators.promql import _ensure_series

    keyed = _ensure_series(hist)
    w = Window.partitionBy("__series").orderBy(F.desc("ts"))
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 2)
        .drop("__rn", "__series")
    )


def native_hist_irate(hist: DataFrame) -> DataFrame:
    """PromQL ``irate()`` over native histograms (r10): the per-second
    float histogram between each series' LAST TWO samples — the spiky
    instantaneous form. Rides ``native_hist_rate`` over the
    newest-two filter (their endpoints ARE the pair), so the reset
    rule, both-side alignment, and the scalar carries all apply.
    Single-sample series yield dt_seconds == 0 (NULL rates), the
    instant-rate convention; parser callers drop them."""
    return native_hist_rate(_last_two_per_series(hist))


def native_hist_idelta(hist: DataFrame) -> DataFrame:
    """PromQL ``idelta()`` over native GAUGE histograms (r10): the
    signed difference between each series' last two samples — no
    reset rule (``native_hist_delta`` over the newest-two filter)."""
    return native_hist_delta(_last_two_per_series(hist))


def native_hist_changes_and_resets(
    hist: DataFrame, *, extra_keys: "tuple[str, ...]" = ()
) -> DataFrame:
    """PromQL ``resets()`` and ``changes()`` over NATIVE-histogram
    series (r11, VERDICT r10 stretch #8 — Prometheus 3 evaluates both
    on native histograms; promql/functions.go funcResets/funcChanges
    histogram branches): per series, walk CONSECUTIVE sample pairs.

    - ``n_resets`` uses the counter rule ``native_hist_increase``
      applies to its endpoints, per pair: downscale the finer sample
      to the coarser schema, align on absolute bucket indices, and a
      drop in ANY aligned bucket (positive or negative side), the
      zero bucket, or the count/sum scalars (when the frame carries
      them) is a reset;
    - ``n_changes`` counts pairs whose samples DIFFER — semantic
      equality over the canonical decode (schema, zero_count, the
      NONZERO (index, count) entries of both sides, count/sum when
      present), so zero-padding differences from span encodings don't
      read as changes; NULL sums compare null-safely (both-NULL is
      equal, the unknown-vs-known pair is a change).

    Custom-bucket rows (NHCB, schema −53): a mid-series
    ``custom_values`` change (or an NHCB/exponential mix) REFUSES
    loudly, the `native_hist_increase` rule — index-wise comparison
    across different boundaries mis-attributes counts, and there is
    no formula-defined merge. The checks only exist when the frame
    carries a custom_values column.

    Both counters come from ONE lag window + ONE hash aggregation —
    the scalar `promql.changes_and_resets` plan shape lifted to
    histogram rows; the per-pair downscale/align is pure Column over
    the bounded bucket arrays (no UDF, no extra shuffle: the
    aggregation reuses the window's series partitioning). Output:
    (labels, n_changes double, n_resets double), the scalar
    operator's contract. ``extra_keys`` (r11) appends partition
    columns to the series key — the grid form walks pairs per
    (series, grid instant) and passes the columns through."""
    from prom_etl_db_spark.operators.promql import (
        _ensure_series,
        _nh_downscale,
    )

    has_neg = (
        "neg_offset" in hist.columns and "neg_counts" in hist.columns)
    has_cnt = "count" in hist.columns
    has_sum = "sum" in hist.columns
    has_cv = "custom_values" in hist.columns
    elem = hist.schema["pos_counts"].dataType.elementType.simpleString()

    keyed = _ensure_series(hist)
    w = Window.partitionBy("__series", *extra_keys).orderBy("ts")

    def lagged(c):
        return F.lag(c).over(w)

    df = keyed.withColumn("__p_schema", lagged(F.col("schema")))
    pairs = {
        "zero_count": "__p_zero",
        "pos_offset": "__p_po", "pos_counts": "__p_pc",
    }
    if has_neg:
        pairs.update({"neg_offset": "__p_no", "neg_counts": "__p_nc"})
    if has_cnt:
        pairs["count"] = "__p_count"
    if has_sum:
        pairs["sum"] = "__p_sum"
    if has_cv:
        pairs["custom_values"] = "__p_cv"
    for src, dst in pairs.items():
        df = df.withColumn(dst, lagged(F.col(src)))

    prev_exists = F.col("__p_schema").isNotNull()
    target = F.least(F.col("schema"), F.col("__p_schema"))
    if has_cv:
        nhcb_c = F.col("schema") == F.lit(-53)
        nhcb_p = F.col("__p_schema") == F.lit(-53)
        target = (
            F.when(
                prev_exists & (nhcb_c != nhcb_p),
                F.raise_error(F.lit(
                    "native_hist_changes_and_resets: series mixes "
                    "custom-bucket (schema -53) and exponential "
                    "samples — no comparison exists across bucket "
                    "families")),
            )
            .when(
                prev_exists & nhcb_c & nhcb_p
                & (F.col("custom_values") != F.col("__p_cv")),
                F.raise_error(F.lit(
                    "native_hist_changes_and_resets: custom_values "
                    "changed mid-series — index-wise comparison "
                    "across different boundaries would mis-attribute "
                    "counts")),
            )
            .otherwise(target)
        )

    def at(off, arr, i):
        idx = i - off + F.lit(1)
        return F.when(
            idx >= 1, F.coalesce(F.try_element_at(arr, idx), F.lit(0))
        ).otherwise(F.lit(0))

    def side_drop(off_c, cnt_c, off_p, cnt_p):
        co, cc = _nh_downscale(
            off_c, cnt_c, (F.col("schema") - target).cast("int"),
            elem=elem)
        po, pc = _nh_downscale(
            off_p, cnt_p, (F.col("__p_schema") - target).cast("int"),
            elem=elem)
        lo = F.least(co, po)
        hi = F.greatest(co + F.size(cc), po + F.size(pc))
        # A pair whose union index span exceeds 4096 refuses (r12,
        # VERDICT r11 What's-wrong #1 — `native_hist_increase`'s
        # dense-expansion bomb guard applied to the PAIR walk): each
        # decoded sample's own span is bounded, but two consecutive
        # samples' offsets can sit arbitrarily far apart, and the
        # sequence below would materialize a dense array spanning the
        # gap for every pair row. The guard rides the drop column so
        # column pruning can never elide it.
        return F.when(
            hi - lo > F.lit(4096),
            F.raise_error(F.lit(
                "native_hist_changes_and_resets: aligned bucket index "
                "span exceeds 4096 — dense-expansion bomb guard")),
        ).when(
            hi > lo,
            F.exists(
                F.sequence(lo, hi - 1),
                lambda i: at(co, cc, i) < at(po, pc, i),
            ),
        ).otherwise(F.lit(False))

    drop = side_drop(
        F.col("pos_offset"), F.col("pos_counts"),
        F.col("__p_po"), F.col("__p_pc"),
    ) | (F.col("zero_count") < F.col("__p_zero"))
    if has_neg:
        empty = F.expr(f"CAST(array() AS array<{elem}>)")
        drop = drop | side_drop(
            F.coalesce(F.col("neg_offset"), F.col("__p_no"), F.lit(0)),
            F.coalesce(F.col("neg_counts"), empty),
            F.coalesce(F.col("__p_no"), F.col("neg_offset"), F.lit(0)),
            F.coalesce(F.col("__p_nc"), empty),
        )
    if has_cnt:
        drop = drop | (F.col("count") < F.col("__p_count"))
    if has_sum:
        drop = drop | F.coalesce(
            F.col("sum") < F.col("__p_sum"), F.lit(False))
    reset = F.when(prev_exists & drop, 1).otherwise(0)

    def nz(off, counts):
        # nonzero (absolute index, count) entries in index order —
        # canonical for equality regardless of zero padding
        return F.filter(
            F.transform(
                counts,
                lambda c, i: F.struct(
                    (off + i).alias("i"), c.cast("double").alias("c")),
            ),
            lambda s: s["c"] != 0,
        )

    cur_sig = [
        F.col("schema"), F.col("zero_count").cast("double"),
        nz(F.col("pos_offset"), F.col("pos_counts")),
    ]
    prev_sig = [
        F.col("__p_schema"), F.col("__p_zero").cast("double"),
        nz(F.col("__p_po"), F.col("__p_pc")),
    ]
    if has_neg:
        empty = F.expr(f"CAST(array() AS array<{elem}>)")
        cur_sig.append(nz(
            F.coalesce(F.col("neg_offset"), F.lit(0)),
            F.coalesce(F.col("neg_counts"), empty)))
        prev_sig.append(nz(
            F.coalesce(F.col("__p_no"), F.lit(0)),
            F.coalesce(F.col("__p_nc"), empty)))
    if has_cnt:
        cur_sig.append(F.col("count").cast("double"))
        prev_sig.append(F.col("__p_count").cast("double"))
    if has_sum:
        cur_sig.append(F.col("sum"))
        prev_sig.append(F.col("__p_sum"))
    changed = F.when(
        prev_exists
        & ~F.struct(*cur_sig).eqNullSafe(F.struct(*prev_sig)),
        1,
    ).otherwise(0)

    return (
        df.withColumn("__chg", changed)
        .withColumn("__rst", reset)
        .groupBy("__series", *extra_keys)
        .agg(
            F.sum("__chg").cast("double").alias("n_changes"),
            F.sum("__rst").cast("double").alias("n_resets"),
        )
        .select(
            F.map_from_entries("__series").alias("labels"),
            *extra_keys,
            "n_changes",
            "n_resets",
        )
    )
