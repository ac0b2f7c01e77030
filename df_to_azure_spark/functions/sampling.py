"""Deterministic hash-based sampling and dataset splits.

Training pipelines need splits that are (a) stable across runs and
clusters, (b) derivable per-row with no coordination, (c) portable across
engines.  Random seeds satisfy none of these at 100 TB; hashing the row
id does: ``bucket = first16bits(md5(id)) % n`` is the same everywhere —
including the DuckDB oracle — so a document's split assignment is a pure
function of its id, forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of the id string."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int") % buckets


def _bucket(c: Column) -> Column:
    return hash_bucket(c, 100)


def with_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Append a train/val/test label: bucket < train → 'train',
    < train+val → 'val', else 'test'."""
    b = _bucket(F.col(id_col))
    label = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, label)


def sample_by_hash(df: DataFrame, id_col: str, percent: int) -> DataFrame:
    """Deterministic ~percent% sample (same rows every run, any cluster)."""
    return df.where(_bucket(F.col(id_col)) < percent)


def with_pack_id(
    df: DataFrame,
    id_col: str,
    size_col: str,
    target: int,
    buckets: int = 32,
    bucket_col: str = "pack_bucket",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Sequence packing: assign each row to a pack of roughly ``target``
    total ``size_col`` units (documents → fixed-token-budget training
    sequences).  A row joins the pack its RUNNING TOTAL starts in, so a
    pack overflows by at most one row — the standard greedy packing.

    True greedy packing is inherently sequential; the scale-safe form
    packs WITHIN deterministic hash buckets: a window cumulative sum per
    bucket (one shuffle on the bucket key, ~1/buckets of the data per
    partition), with pack identity = (bucket, pack seq).  Integer
    arithmetic end to end, so pack assignment is engine-exact and stable
    across runs and cluster layouts.
    """
    b = hash_bucket(F.col(id_col), buckets)
    out = df.withColumn(bucket_col, b)
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(bucket_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(size_col).cast("long")).over(w)
    return (
        out.withColumn("__pack_start", cum - F.col(size_col).cast("long"))
        # `div` is exact integer division (a double `/` + floor would lose
        # exactness past 2^53)
        .withColumn(pack_col, F.expr(f"__pack_start div {int(target)}"))
        .drop("__pack_start")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language-rebalancing
    primitive of corpus preparation (downsample the dominant language,
    keep the rest).  ``rates`` maps stratum value → integer percent kept.

    The keep/drop decision is ``hash_bucket(id) < rate(stratum)``: a pure
    per-row expression (flat CASE, stays in whole-stage codegen), so the
    sample needs no shuffle, no coordination, and is identical on any
    engine, cluster, or run — and a row's fate is stable under reruns,
    which is what makes downstream incremental pipelines reproducible.
    """
    rate = None
    for value, pct in rates.items():
        cond = F.col(strata_col) == value
        rate = F.when(cond, int(pct)) if rate is None else rate.when(cond, int(pct))
    rate = F.lit(default_pct) if rate is None else rate.otherwise(default_pct)
    return df.where(_bucket(F.col(id_col)) < rate)


def sample_k_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
) -> DataFrame:
    """Deterministic k-row sample per group: rank rows inside each group
    by their md5 hash (a stable pseudo-random order — same winners every
    run, any cluster) and keep the first ``k``.  The distributed
    replacement for per-group reservoir sampling: one shuffle on the
    group key, no RNG state, and a row's fate never depends on
    partitioning or arrival order.  Tie-break on the id keeps even
    hash-colliding rows deterministic."""
    from pyspark.sql import Window as W

    c = F.col(id_col)
    w = W.partitionBy(group_col).orderBy(
        F.md5(c.cast("string")), c
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: Column | str | None = None,
) -> DataFrame:
    """Per-group downsampling to a TOKEN budget — the data-mix operation
    that turns "use 30B tokens of web, 5B of code" into a deterministic
    document selection: within each group, documents are ordered by the
    md5 hash of their id (an unbiased, engine-portable shuffle order)
    and kept while the running token total has not yet reached
    ``budget_tokens`` — the document that crosses the budget is the last
    one kept, so every group reaches its budget (slightly over, never
    under, matching how sampling-to-budget is done in practice).

    Returns the kept rows with ``n_tokens`` and the running
    ``cum_tokens`` appended.

    Scale shape: ONE shuffle on the group for the running-sum window;
    everything else is a scan.  The hash order decouples selection from
    storage order, so re-partitioned or re-ingested data selects the
    SAME documents — the property random sampling can't give."""
    from pyspark.sql import Window as W

    from df_to_azure_spark.functions.text import token_count

    if tokens_col is None:
        n_tok = token_count("text").cast("bigint")
    else:
        n_tok = (
            F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
        ).cast("bigint")
    ordered = df.select(
        "*",
        n_tok.alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    )
    w = (
        W.partitionBy(group_col)
        .orderBy("__h", id_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = ordered.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.where(
        F.col("cum_tokens") - F.col("n_tokens") < budget_tokens
    ).drop("__h")


def weighted_sample_topk(
    df: DataFrame,
    weight_col: Column | str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via
    exponential keys (Efraimidis & Spirakis, IPL 2006): each row draws
    ``u ∈ (0,1)`` from the md5 hash of its id (engine-portable, no RNG
    state) and scores ``key = ln(u) / w``; the ``k`` LARGEST keys win —
    equivalent to ``u^(1/w)`` ranking but numerically tame.  Rows with
    weight proportional to ``w`` are picked exactly as often as true
    weighted reservoir sampling, and the whole draw is reproducible on
    any cluster AND in a SQL oracle.

    Exactness: ``u`` is an exact 32-bit integer from the hash over an
    exact power-of-two divisor; one ROUND(12) after the LN (the one
    transcendental), ROUND(10) after the division by the double weight.
    Plan: a scan projection + one top-k (TakeOrderedAndProject) — no
    shuffle beyond the limit's partial ordering; weights ≤ 0 are
    excluded (zero-weight rows must never be sampled).

    Returns the winning rows with ``samp_key`` appended, ranked 1..k.
    """
    from pyspark.sql import Window as W

    c = F.col(id_col)
    w_c = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("double") + F.lit(1.0)
    ) / F.lit(float(2 ** 32))
    key = F.expr(
        "ROUND(ROUND(LN(__u), 12) / CAST(__w AS DOUBLE), 10)"
    )
    scored = (
        df.withColumn("__u", u)
        .withColumn("__w", w_c.cast("double"))
        .where(F.col("__w") > 0)
        .withColumn("samp_key", key)
        .drop("__u", "__w")
    )
    # top-k via sort+limit -> TakeOrderedAndProject (per-partition heaps,
    # driver merges k rows) — NOT a global window; the rank window below
    # runs over the already-limited k-row frame, bounded by the parameter
    topk = scored.orderBy(F.desc("samp_key"), c).limit(int(k))
    win = W.orderBy(F.desc("samp_key"), c)
    return topk.withColumn(
        "samp_rank", F.row_number().over(win).cast("bigint")
    )


def weighted_sample_topk_grouped(
    df: DataFrame,
    group_col: str,
    weight_col: Column | str,
    k_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group deterministic weighted sampling WITHOUT replacement:
    the Efraimidis-Spirakis exponential key of ``weighted_sample_topk``
    (``ln(u)/w`` on an md5-derived exact uniform), ranked WITHIN each
    group — the stratified form a data-mix pipeline uses to draw a
    weighted quota from every source/language/shard at once.

    Same exactness ladder as the global sampler (exact 32-bit uniform,
    ROUND(12) after the one LN, ROUND(10) after the weight division).

    Plan: ONE hash shuffle on ``group_col`` and a group-partitioned
    rank window — no global ordering anywhere, so this scales with the
    number of groups × k, not with data size (contrast the global
    sampler's TakeOrderedAndProject, which funnels k rows to the
    driver).  Weights ≤ 0 are excluded as in the global form."""
    from pyspark.sql import Window as W

    c = F.col(id_col)
    w_c = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("double") + F.lit(1.0)
    ) / F.lit(float(2 ** 32))
    key = F.expr("ROUND(ROUND(LN(__u), 12) / CAST(__w AS DOUBLE), 10)")
    scored = (
        df.withColumn("__u", u)
        .withColumn("__w", w_c.cast("double"))
        .where(F.col("__w") > 0)
        .withColumn("samp_key", key)
        .drop("__u", "__w")
    )
    win = W.partitionBy(group_col).orderBy(F.desc("samp_key"), c)
    return (
        scored.withColumn(
            "samp_rank", F.row_number().over(win).cast("bigint")
        )
        .where(F.col("samp_rank") <= int(k_per_group))
    )
