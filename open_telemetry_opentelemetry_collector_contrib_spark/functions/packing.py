"""Training-batch assembly operators: sequence packing + data mixing.

Standard large-scale pretraining pipeline stages with no reference-collector
analog (they sit downstream of curation):

- ``pack_sequences``: greedy sequential bin packing of documents into
  fixed-token-budget training sequences (sample packing). Deterministic:
  documents are sharded by hash, ordered by id within a shard, and filled
  greedily — each doc goes into the current bin unless it would overflow the
  budget, else opens a new bin (an over-budget single doc still occupies one
  bin of its own).
- ``stratified_sample``: per-stratum deterministic sampling for data-mixture
  weighting (e.g. 100% wiki, 30% web) via the engine-portable md5-48 hash,
  so the exact selection is reproducible in any engine (and DuckDB can
  oracle it).

Scale design: packing is embarrassingly parallel across shards — ONE
shuffle (groupBy shard), O(n) per shard inside an Arrow-batched
applyInPandas, bins globally addressed as (shard, bin). Shard count is the
parallelism knob: 100 TB / shards must fit a task; at 64k shards each task
packs ~1.5 GB. Mixing is a pure Column filter — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedupe import md5_48
from .text import token_count

PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("bin", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    budget: int,
    shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequential packing: (doc_id, shard, bin, n_tokens).

    Bins are local to a shard; (shard, bin) is the training-sequence id.
    The greedy fill is inherently sequential per shard, so it runs as an
    Arrow-batched applyInPandas per shard group — the only shuffle is the
    groupBy on the shard key.
    """

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        bins = []
        cur_bin, fill = -1, 0
        for t in pdf["n_tokens"]:
            if cur_bin >= 0 and fill + t <= budget:
                fill += t
            else:
                cur_bin += 1
                fill = t
            bins.append(cur_bin)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "shard": pdf["shard"],
                "bin": pd.Series(bins, index=pdf.index, dtype="int64"),
                "n_tokens": pdf["n_tokens"],
            }
        )

    prepared = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    return prepared.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def pack_oracle_sql(budget: int, shards: int = 16, table: str = "documents") -> str:
    """DuckDB twin: the same greedy fill as a recursive closure per shard.

    (WITH RECURSIVE must lead the WITH clause in DuckDB.)
    """
    return rf"""
WITH RECURSIVE docs AS (
  SELECT doc_id, CAST(doc_id % {shards} AS INT) AS shard,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {shards} ORDER BY doc_id) AS rn
  FROM {table}
),
pack AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin, n_tokens AS fill
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN p.fill + d.n_tokens <= {budget} THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + d.n_tokens <= {budget} THEN p.fill + d.n_tokens ELSE d.n_tokens END
  FROM docs d JOIN pack p ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT doc_id, shard, bin, n_tokens FROM pack
"""


def dataset_split(
    df: DataFrame,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    seed: str = "split7",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by hash thresholds:
    split = test if md5_48(seed || id) % 1e6 < test*1e6, else val if
    < (test+val)*1e6, else train.

    The standard corpus-prep split primitive: no RNG state, stable under
    re-runs/resumes/repartitioning (assignment is a pure function of the
    id), leak-free by construction (an id can never change splits between
    runs), and a pure Column projection — no shuffle, evaluated inside the
    scan stage. Different ``seed`` values give independent splits.
    Engine-portable (md5-48 arithmetic reproduces bit-exactly in DuckDB).
    """
    bucket = F.pmod(
        md5_48(F.concat(F.lit(seed), F.col(id_col).cast("string"))), F.lit(1_000_000)
    )
    t_th = int(test_frac * 1_000_000)
    v_th = t_th + int(val_frac * 1_000_000)
    return df.withColumn(
        "split",
        F.when(bucket < t_th, F.lit("test"))
        .when(bucket < v_th, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    base_rate: float = 0.5,
    seed: str = "temp42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted (alpha = 1/2) mixture sampling: the standard
    LLM-corpus recipe where a source's share flattens from proportional
    (alpha=1) toward uniform (alpha=0) — source s keeps rate
    p_s = min(1, base_rate * sqrt(n_max / n_s)), so the LARGEST source
    keeps base_rate and smaller sources keep relatively more.

    EXACT integer arithmetic, no doubles: with h = md5_48(seed||id) % M
    (M = 10^4, 0.01% rate granularity) the keep test
    h < p_s * M  <=>  h^2 * n_s < (base_rate*M)^2 * n_max
    — squaring is strictly monotone on non-negatives, so the comparison
    is bit-portable where a sqrt threshold could flip a floored hash at
    the boundary. The p_s <= 1 cap is automatic (h < M makes the RHS
    dominate whenever B^2*n_max >= M^2*n_s). Overflow-safe to
    n_s <= 9*10^10 docs per source (h^2 <= 10^8, bigint max 9.2*10^18).

    Shuffle shape: one map-side-combined groupBy(source) for the counts
    (few rows), broadcast back; the corpus side is a pure filter.
    """
    from pyspark.sql import Window

    m = 10_000
    b = int(base_rate * m)
    # n_max as an unpartitioned window over the S-row stats frame, NOT a
    # separate stats.agg() branch — the agg branch re-derives stats from
    # the corpus (no subtree dedup once pruning specializes the scans),
    # costing a full extra corpus scan at 100 TB. Window form: 2 scans
    # total (stats + the filter apply).
    stats = df.groupBy(source_col).agg(
        F.count("*").cast("long").alias("_n")
    ).withColumn("_n_max", F.max("_n").over(Window.partitionBy()))
    h = F.pmod(
        md5_48(F.concat(F.lit(seed), F.col(id_col).cast("string"))), F.lit(m)
    )
    return (
        df.join(F.broadcast(stats), source_col)
        .filter(h * h * F.col("_n") < F.lit(b * b) * F.col("_n_max"))
        .drop("_n", "_n_max")
    )


def unimax_mix(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    epochs_cap: int = 2,
    budget_num: int = 3,
    budget_den: int = 2,
    seed: str = "umax7",
) -> DataFrame:
    """UniMax language-balanced sampling (arXiv:2304.09151): spread a total
    token budget as UNIFORMLY as possible across languages, capping every
    language at ``epochs_cap`` epochs of its own data — the paper's
    alternative to temperature sampling that never over-repeats
    low-resource languages. Budget = ``total_tokens * budget_num DIV
    budget_den`` — default 1.5 epochs of the corpus, the regime UniMax is
    built for (budget above one epoch): low-resource languages saturate
    at exactly ``epochs_cap`` epochs and the high-resource tail absorbs
    the remainder below its cap. Self-contained and deterministic at any
    scale.

    The paper's iterative allocator has a closed form — waterfilling: sort
    languages by cap ``c_l = epochs_cap * n_l`` ascending; a language
    SATURATES (gets its full cap) iff ``c_l * (L - rank + 1) <= budget -
    cum_before`` (its cap is below the fair share of the budget left for
    it and every larger language); the predicate is monotone along the
    sorted order, and the non-saturating languages split the remainder
    evenly, ``(budget - sat_caps) DIV (L - k)``. Expressed as window
    functions over the L-row language table — no driver-side loop, no
    collect. The global (unpartitioned) window is on L rows, not the
    corpus.

    Doc grain: ``repeat_cnt = alloc DIV n_l`` full epochs for every doc,
    plus one extra epoch for the hash-selected fraction: doc joins the
    fractional epoch iff ``h * n_l < frac_tokens * M`` with ``h =
    md5_48(seed||id) % M`` — exact integer cross-multiplication, no float
    rate, engine-portable, resume-stable, and token-unbiased in
    expectation (the hash is independent of doc length). All arithmetic
    bigint; DuckDB ``//`` parity for every DIV.

    Shuffle shape: one map-side-combined groupBy(lang) (L rows out), the
    L-row waterfilling, then the allocation broadcast back onto the
    corpus — the corpus itself never shuffles.

    Output: (doc_id, lang, doc_tokens, alloc_tokens, repeat_cnt).
    """
    from pyspark.sql import Window

    m = 10_000
    toks = token_count(F.col(text_col))
    docs = df.select(F.col(id_col), F.col(lang_col), toks.alias("doc_tokens"))
    langs = docs.groupBy(lang_col).agg(F.sum("doc_tokens").alias("n_tok"))
    # every scalar (total, L, k, satcaps) is an unpartitioned window over
    # the SAME L-row frame rather than a separate .agg() branch — separate
    # branches each re-derive `langs` from the corpus (Catalyst does not
    # dedupe the subtrees once column pruning specializes the scans), which
    # costs one extra full corpus scan per branch at 100 TB. This way the
    # corpus is scanned exactly twice: stats and the final apply join.
    wall = Window.partitionBy()
    w = Window.orderBy(F.col("cap").asc(), F.col(lang_col).asc())
    lt = (
        langs.withColumn("cap", F.lit(int(epochs_cap)) * F.col("n_tok"))
        .withColumn("tot", F.sum("n_tok").over(wall))
        .withColumn("nl", F.count(F.lit(1)).over(wall))
        .withColumn(
            "budget", F.expr(f"tot * {int(budget_num)} DIV {int(budget_den)}")
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cum", F.sum("cap").over(w))
        .withColumn(
            "sat",
            F.col("cap") * (F.col("nl") - F.col("rn") + 1)
            <= F.col("budget") - (F.col("cum") - F.col("cap")),
        )
        .withColumn(
            "k", F.sum(F.when(F.col("sat"), 1).otherwise(0)).over(wall)
        )
        .withColumn(
            "satcaps",
            F.sum(F.when(F.col("sat"), F.col("cap")).otherwise(0)).over(wall),
        )
    )
    alloc = lt.select(
        lang_col,
        "n_tok",
        F.when(F.col("sat"), F.col("cap"))
        .otherwise(F.expr("(budget - satcaps) DIV (nl - k)"))
        .alias("alloc_tokens"),
    )
    h = F.pmod(
        md5_48(F.concat(F.lit(seed), F.col(id_col).cast("string"))), F.lit(m)
    )
    return (
        docs.join(F.broadcast(alloc), lang_col)
        # guard the division: a language whose docs are ALL zero-token
        # (empty/whitespace text) has n_tok = 0, and under Spark 4's
        # default ANSI mode an unguarded DIV would abort the whole job
        # (DIVIDE_BY_ZERO). Zero-token docs contribute nothing to the
        # budget, so their full_epochs is 0; unchanged on any corpus with
        # nonempty text (the DuckDB twin errors on such input either way).
        .withColumn(
            "full_epochs",
            F.when(
                F.col("n_tok") > 0, F.expr("alloc_tokens DIV n_tok")
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .withColumn(
            "extra",
            (
                h * F.col("n_tok")
                < (F.col("alloc_tokens") - F.col("full_epochs") * F.col("n_tok"))
                * F.lit(m)
            ).cast("long"),
        )
        .select(
            id_col,
            lang_col,
            F.col("doc_tokens").cast("bigint").alias("doc_tokens"),
            F.col("alloc_tokens").cast("bigint").alias("alloc_tokens"),
            (F.col("full_epochs") + F.col("extra"))
            .cast("bigint")
            .alias("repeat_cnt"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "mix42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling for data-mixture weighting.

    Keep row iff md5_48(seed || id) % 10^6 < rate * 10^6 for its stratum —
    engine-portable (md5 arithmetic reproduces bit-exactly in DuckDB), no
    RNG state, stable under re-runs and resumes. A pure Column filter: no
    shuffle, pushes into the scan stage.
    """
    bucket = F.pmod(
        md5_48(F.concat(F.lit(seed), F.col(id_col).cast("string"))), F.lit(1_000_000)
    )
    rate = F.lit(int(default_rate * 1_000_000))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(int(v * 1_000_000))).otherwise(rate)
    return df.filter(bucket < rate)


def sample_fixed_per_stratum(
    df: DataFrame,
    k: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "fix13",
) -> DataFrame:
    """Deterministic exactly-K-per-stratum sampling ("give me 10k eval
    docs from every source"): rank rows within each stratum by the
    engine-portable hash md5_48(seed || id) (ties broken by id) and keep
    the K smallest — a reservoir-sample analog that is a pure function of
    the ids, so it is resume/rerun/repartition stable and different seeds
    give independent draws.

    Scale: the rank<=K filter over the window compiles to Spark's
    WindowGroupLimit pushdown — every map task keeps at most K rows per
    stratum BEFORE the exchange (verified in the plan), so the shuffle
    carries O(tasks * strata * K) rows, not the corpus, and the
    low-cardinality stratum sort never sees full partitions."""
    from pyspark.sql import Window

    from .dedupe import md5_48

    h = md5_48(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def shard_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    shards: int = 16,
    salt: str = "shuf:",
) -> DataFrame:
    """Deterministic global shuffle for training-data export: assign every
    document a shard and a position within that shard by hash order — the
    "global shuffle before training" stage every pretraining pipeline runs
    so that adjacent corpus documents (same crawl, same site) don't land in
    the same training batch.

    The permutation is the md5-48 hash of the salted id: resume-stable
    (same input -> same shard files, byte for byte), leak-free across
    re-runs, and engine-portable (DuckDB oracles the exact positions).
    Ties (48-bit hash collisions) break on the id itself, so the order is
    total and deterministic.

    Scale design: ONE hash-partition exchange on ``shard`` + a
    within-partition sort — ``row_number`` over ``partitionBy(shard)``
    compiles to exactly the repartition+sortWithinPartitions a manual
    writer would do, never a global sort. ``shards`` is the parallelism
    knob: production exports use O(10^4-10^5) shards so each task sorts
    one shard file's worth (~1-2 GB at 100 TB); 16 here keeps the test
    tables honest. Output rows are (id, shard, pos) — a pure manifest of
    the permutation, joinable back to content at write time so the wide
    text column never enters the sort.
    """
    from pyspark.sql import Window

    h = md5_48(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    base = df.select(F.col(id_col), h.alias("__h")).select(
        id_col,
        F.pmod(F.col("__h"), F.lit(shards)).cast("int").alias("shard"),
        F.col("__h"),
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return base.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )


def dataset_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 16,
    salt: str = "shuf:",
) -> DataFrame:
    """Per-shard export manifest: row count + order-insensitive content
    checksum for each shard of the ``shard_shuffle`` permutation — the
    artifact a downstream trainer checks before trusting a dataset drop
    (and the analog of the reference fileexporter's per-sink accounting,
    `exporter/fileexporter`, lifted to dataset granularity).

    The checksum is the SUM of per-row md5-48 content hashes
    (``md5_48(id || ':' || text)``): commutative, so it is independent of
    write order and shard-internal parallelism, and any single-row
    corruption or drop changes it. 48-bit row hashes summed over <=2^63/2^48
    rows cannot overflow bigint.

    Scale design: pure map-side-combinable groupBy on the ``shards``-value
    key — S output rows, no sort, no wide shuffle; the manifest of a 100 TB
    export is a few KB.
    """
    h = md5_48(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    row_sum = md5_48(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(text_col))
    )
    return (
        df.select(
            F.pmod(h, F.lit(shards)).cast("int").alias("shard"),
            row_sum.alias("__rh"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__rh").alias("content_sum"),
        )
    )
