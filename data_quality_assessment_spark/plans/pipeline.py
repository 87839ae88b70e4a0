"""The flagship quality DAG: annotate → dedup → rules → verdict.

Reimagines the reference's linear report pipeline
(``/root/reference/scripts/DQReportGenerator.py:13-162``, SURVEY.md §3 EP1)
as one lazy DataFrame plan:

    scan pages → ArrowEvalPython [fused kernel: extract + langid + ppl +
                 repetition + text stats + PII/toxicity scrub]
               → deterministic dedup (url, warc_ts) — the one shuffle,
                 carrying computed columns + an md5 tiebreak, never the
                 raw page content (pruned by Catalyst)
               → rules_fired lineage array + keep verdict + quality_score
                 (whole-stage codegen over the kernel's stats columns)

Physical plan (pinned by tests/test_plan_shape.py): ONE Python boundary,
ONE exchange, WindowGroupLimit partial pre-pruning the dedup groups
map-side, everything else codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions import textstats as ts
from ..functions.udfs import annotate_udf, scrub_udf

# ---------------------------------------------------------------------------
# deterministic dedup (reference D2, SURVEY.md §2.3 — keep-first with a
# content-hash tiebreak so the winner is stable under repartitioning)
# ---------------------------------------------------------------------------


def content_tiebreak() -> Column:
    """The D2 content-hash tiebreak: md5 over BOTH content columns
    (text + hex(html)), so the winner is deterministic on the WARC
    ingest path too, where content lives in ``html`` and ``text`` is
    null — hashing only text would give every such page the constant
    md5('') and a repartitioning-dependent winner. A NUL delimiter
    separates the two fields so (text='AB', html=NULL) cannot collide
    with (text='A', html=0x??) — without it the concatenation is
    ambiguous and two different-content rows in one dedup group could
    share a tiebreak. Spark ``hex`` on binary yields uppercase, matched
    by the pandas oracle (tests/oracle.py) via ``bytes.hex().upper()``."""
    return F.md5(
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\u0000"),
            F.coalesce(F.hex(F.col("html")), F.lit("")),
        )
    )


def dedup_pages(df: DataFrame, keys: tuple[str, ...] = ("url", "warc_ts")) -> DataFrame:
    from ..operators.dedup import dedup_exact

    return dedup_exact(
        df,
        list(keys),
        [
            content_tiebreak().asc(),
            F.coalesce(F.col("lang"), F.lit("")).asc(),
        ],
    )


# ---------------------------------------------------------------------------
# rule set — (rule_id, condition Column, drops?) in frozen order.
# The oracle (tests/oracle.py) evaluates the same list in the same order.
# ---------------------------------------------------------------------------


def drop_rules(cfg: PipelineConfig) -> list[tuple[str, Column]]:
    th = cfg.thresholds
    return [
        # blank <=> zero tokens (null / empty / whitespace-only text all
        # tokenize to []), so the rule reads the kernel's nw instead of
        # re-scanning the text in the JVM
        ("text_blank", F.col("nw") == 0),
        ("ts_null", F.col("warc_ts").isNull()),
        ("too_short", F.col("nw") < th.min_words),
        ("too_long", F.col("nw") > th.max_words),
        ("mean_wl_low", F.col("mean_wl") < th.min_mean_word_len),
        ("mean_wl_high", F.col("mean_wl") > th.max_mean_word_len),
        ("symbol_ratio", F.col("symbol_ratio") > th.max_symbol_word_ratio),
        (
            "stopword_frac",
            (F.col("lang_pred") == "en") & (F.col("stopword_frac") < th.min_stopword_frac),
        ),
        ("dup_line", F.col("dup_line_frac") > th.max_dup_line_frac),
        ("top_bigram", F.col("top_bigram_share") > th.max_top_bigram_share),
        ("lang", ~F.col("lang_pred").isin(*th.allowed_langs)),
        ("ppl_high", F.col("ppl") > th.max_perplexity),
        ("slur", F.col("toxicity_slur") > 0),
    ]


def flag_rules(cfg: PipelineConfig) -> list[tuple[str, Column]]:
    return [
        (
            "lang_mismatch",
            F.col("lang").isNotNull() & (F.col("lang") != F.col("lang_pred")),
        ),
        ("pii_email", F.col("pii_email") > 0),
        ("pii_ip", F.col("pii_ip") > 0),
        ("pii_phone", F.col("pii_phone") > 0),
    ]


# static ids (building Columns needs an active session, so not derived)
DROP_RULE_IDS = [
    "text_blank", "ts_null", "too_short", "too_long", "mean_wl_low",
    "mean_wl_high", "symbol_ratio", "stopword_frac", "dup_line",
    "top_bigram", "lang", "ppl_high", "slur",
]
FLAG_RULE_IDS = ["lang_mismatch", "pii_email", "pii_ip", "pii_phone"]


def _fired_array(rules: list[tuple[str, Column]]) -> Column:
    tagged = F.array(*[
        F.when(cond, F.lit(rid)).otherwise(F.lit(None)) for rid, cond in rules
    ])
    return F.filter(tagged, lambda x: x.isNotNull())


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


def annotate(df: DataFrame, *, with_host: bool = True) -> DataFrame:
    """The single fused UDF pass. Adds: lang_pred, lang_conf, ppl,
    top_bigram_share, scrubbed_text, PII/slur counts, nw, mean_wl,
    symbol_ratio, stopword_frac, dup_line_frac (all from the ONE
    ArrowEvalPython node — see udfs.enrich_udf / functions/kernel.py),
    plus host (native substring_index on the url). The JVM side of this
    stage is just scan + Arrow transport + the host projection, so task
    threads spend their time feeding Python workers instead of competing
    with them for cores.

    The text column is nulled out when html is present (extraction
    precedence means the kernel would ignore it anyway), so page content
    crosses the JVM->Python boundary once, not twice.

    ``with_host=False`` skips the host projection so a caller that
    shuffles the annotated frame (run_pipeline's dedup exchange) can
    re-derive host from the url AFTER the exchange instead of shipping
    a second copy of the hostname through it (guide §2.3: shuffle keys
    and metadata, not derivable payload)."""
    from ..functions.udfs import enrich_udf

    ann = enrich_udf(
        F.col("html"),
        F.when(F.col("html").isNull(), F.col("text")),
    )
    df = df.withColumn("_ann", ann).select("*", "_ann.*").drop("_ann")
    if with_host:
        df = df.withColumn("host", ts.host_of(F.col("url")))
    return df


def scrub(df: DataFrame) -> DataFrame:
    """No-op since the scrub fused into the enrich UDF (kept so callers
    and the resumable plan read as annotate -> scrub -> verdict); the
    standalone ``scrub_udf`` remains for scrubbing arbitrary columns."""
    return df


def extracted_text_col() -> Column:
    """Native (whole-stage-codegen) twin of ``textcore.extract_text``:
    decode html then strip tags, else the text column. Identical bytes
    for valid UTF-8 input (the fixture/Common-Crawl-WET contract);
    malformed byte sequences may differ in U+FFFD count between the JVM
    and Python decoders — callers needing that edge exact use
    ``extract_text_udf``."""
    return F.when(
        F.col("html").isNotNull(),
        F.regexp_replace(F.decode(F.col("html"), "UTF-8"), "<[^>]*>", ""),
    ).otherwise(F.coalesce(F.col("text"), F.lit("")))


def materialize_scrubbed(df: DataFrame) -> DataFrame:
    """Fill the NULL-means-unchanged ``scrubbed_text`` convention back to
    full text (see kernel.enrich_batch): NULL rows get the extracted
    text via the native twin — JVM-side codegen, no second Python pass.
    Call this only at sinks that must ship the bytes; inside the DAG the
    NULL form keeps the Arrow/shuffle/parquet footprint near zero on
    clean web text. Requires the html/text source columns still present
    (i.e. before ``pages_out``'s projection)."""
    return df.withColumn(
        "scrubbed_text",
        F.coalesce(F.col("scrubbed_text"), extracted_text_col()),
    )


def verdict(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """keep verdict + rules_fired lineage + quality_score in [0,1]."""
    drops = drop_rules(cfg)
    flags = flag_rules(cfg)
    dropped = _fired_array(drops)
    df = (
        df.withColumn("rules_fired", F.concat(dropped, _fired_array(flags)))
        .withColumn("n_drop_fired", F.size(dropped))
        .withColumn("keep", F.size(dropped) == 0)
        .withColumn(
            "quality_score",
            F.lit(1.0) - F.col("n_drop_fired") / F.lit(float(len(drops))),
        )
        .drop("n_drop_fired")
    )
    return df


def run_pipeline(
    df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG, *, dedup: bool = True
) -> DataFrame:
    """Full per-document DAG over a pages DataFrame
    (url, warc_ts, html, text, lang [, props_json]).

    Stage order is ANNOTATE-FIRST, then dedup: the fused UDF runs inside
    the scan stage, and because nothing downstream reads html/text
    anymore, Catalyst prunes both from the dedup exchange — only the
    computed columns plus a 32-char md5 tiebreak shuffle (~half the
    bytes of shuffling raw page content). Results are identical to
    dedup-first: the winner per (url, warc_ts) is picked by the same
    content-md5 order and annotations are deterministic per row. The
    trade is annotating exact-duplicate rows before dropping them —
    right when exact (url, warc_ts) dups are the rare case; for inputs
    with heavy exact duplication, dedup separately first
    (``dedup_pages``) and call with ``dedup=False``.
    """
    if dedup:
        # content tiebreak materialized BEFORE annotate so the window
        # sort key shuffles as 16 bytes instead of dragging `text`
        # through the exchange (D2 determinism, SURVEY.md §2.3); hashes
        # text AND html so WARC-ingested pages get a real content order.
        # unhex(md5) halves the hex form's shuffle bytes with IDENTICAL
        # ordering: hex digits 0-9A-F are monotone in ASCII, so the hex
        # string's lexicographic order equals the raw bytes' unsigned
        # order — same winner per group (pinned by test_dedup_ops).
        # host is re-derived from url AFTER the exchange (guide §2.3) —
        # same rows, ~20 fewer bytes shuffled per row.
        from ..operators.dedup import dedup_exact

        df = annotate(
            df.withColumn("_tb", F.unhex(content_tiebreak())),
            with_host=False,
        )
        df = dedup_exact(
            df,
            list(cfg.dedup_keys),
            [F.col("_tb").asc(), F.coalesce(F.col("lang"), F.lit("")).asc()],
        ).drop("_tb")
        df = df.withColumn("host", ts.host_of(F.col("url")))
    else:
        df = annotate(df)
    return verdict(scrub(df), cfg)


def host_cadence(
    pages: DataFrame, hot_threshold: int | None = None
) -> DataFrame:
    """Per-host crawl-cadence stats over warc_ts (north_star: the
    reference's IAT regularity/outlier math per url-host group).

    Returns one row per host: n_pages, reg_score, out_score. Hosts whose
    modal IAT is 0 (same-second bursts) are excluded by regularity (no
    defined relative error) but still scored for outliers; hosts with no
    scoreable IAT at all (single page) get NULL for both.

    FUSED single-pass plan: the IAT lag window hash-partitions by host
    once, and every later per-host statistic is a WINDOW aggregate whose
    partition keys start with host — HashPartitioning(host) satisfies
    each ClusteredDistribution, so Catalyst inserts only sorts, never a
    second exchange (the mode count windows on (host, iat), still
    host-determined). Mode (min(-count, value) — ties -> smallest, Q3),
    mode-centered MAD, the regularity sums and the outlier count all
    read the one shuffled dataset; the final groupBy(host) also reuses
    the partitioning. ONE exchange total, pinned by
    tests/test_plan_shape.py — vs four shuffles of the same rows when
    regularity_score / outlier_score each recompute their own mode.

    The ONE-exchange window plan has a skew ceiling: window aggregates
    have no map-side collapse, so a mega-host (one host holding half
    the crawl) lands on a single task. ``hot_threshold`` routes hosts
    with more than that many pages through
    :func:`host_cadence_salted` — the aggregation-shaped twin whose
    every big-table operator partial-aggregates or bucket-partitions —
    and unions the results; None (default, the oracle-checked path)
    keeps the single-plan shape.
    """
    from pyspark.sql import Window

    from ..functions import textstats as ts
    from ..operators import cadence

    d = pages.select(
        ts.host_of(F.col("url")).alias("host"), F.col("warc_ts")
    ).filter(F.col("warc_ts").isNotNull())
    if hot_threshold is not None:
        from ..operators.skew import hot_keys

        hot = hot_keys(d, "host", hot_threshold).select("host")
        cold = d.join(hot, "host", "left_anti")
        hotrows = d.join(hot, "host", "left_semi")
        return _host_cadence_fused(cold).unionByName(
            _host_cadence_agg(hotrows)
        )
    return _host_cadence_fused(d)


def _host_cadence_fused(d: DataFrame) -> DataFrame:
    """The one-exchange window plan over pre-projected (host, warc_ts)."""
    from pyspark.sql import Window

    from ..operators import cadence

    iat = cadence.with_iat(d, "host", "warc_ts")

    w_hi = Window.partitionBy("host", "iat")
    w_h = Window.partitionBy("host")
    # per-(host, iat) frequency; a second projection holds the mode pick
    # (window exprs cannot nest in one select)
    x = iat.withColumn(
        "_cnt",
        F.when(F.col("iat").isNotNull(), F.count(F.lit(1)).over(w_hi)),
    )
    x = x.withColumn(
        "_mode",
        F.min(
            F.when(
                F.col("iat").isNotNull(),
                F.struct((-F.col("_cnt")).alias("nc"), F.col("iat").alias("v")),
            )
        ).over(w_h)["v"],
    )
    x = x.withColumn(
        "_mad",
        F.percentile(F.abs(F.col("iat") - F.col("_mode")), F.lit(0.5)).over(w_h),
    )
    # try_divide: SQL AND does not short-circuit, so the mode != 0 guard
    # in the aggregation conditions cannot protect a plain division —
    # hosts whose modal IAT is 0 (same-second bursts) must yield NULL
    # rae (NULL <= 0.5 is false), not an ANSI DIVIDE_BY_ZERO
    rae = F.try_divide(F.abs(F.col("iat") - F.col("_mode")), F.col("_mode"))
    clean = F.col("iat").isNotNull()
    modz = F.try_divide(
        0.6745 * (F.col("iat") - F.col("_mode")), F.col("_mad")
    )
    is_out = F.when(
        clean & (F.col("_mad") > 0) & (modz > 3.5), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    agg = x.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.first("_mode").alias("_m"),
        F.sum(F.when(clean & (F.col("_mode") != 0) & (rae <= 0.5),
                     1 - 2 * rae).otherwise(F.lit(0.0))).alias("_good"),
        F.sum(F.when(clean & (F.col("_mode") != 0) & (rae <= 0.5),
                     F.lit(1.0)).otherwise(F.lit(0.0))).alias("_cntr"),
        F.sum(F.when(clean & (F.col("_mode") != 0) & (rae > 0.5),
                     2 * rae).otherwise(F.lit(0.0))).alias("_bad"),
        F.sum(is_out).alias("_nout"),
        F.sum(clean.cast("long")).alias("_nclean"),
    )
    return agg.select(
        "host",
        "n_pages",
        F.when(
            F.col("_m").isNotNull() & (F.col("_m") != 0),
            F.round(F.col("_good") / (F.col("_cntr") + F.col("_bad")), 6),
        ).alias("reg_score"),
        F.when(
            F.col("_nclean") > 0,
            F.round(1 - F.col("_nout") / F.col("_nclean"), 6),
        ).alias("out_score"),
    )


def host_cadence_salted(
    pages: DataFrame, ts_bucket_sec: int = 86400
) -> DataFrame:
    """Skew-safe twin of :func:`host_cadence` (identical rows, pinned by
    tests): survives one mega-host owning half the corpus."""
    from ..functions import textstats as ts

    d = pages.select(
        ts.host_of(F.col("url")).alias("host"), F.col("warc_ts")
    ).filter(F.col("warc_ts").isNotNull())
    return _host_cadence_agg(d, ts_bucket_sec)


def _host_cadence_agg(d: DataFrame, ts_bucket_sec: int = 86400) -> DataFrame:
    """host_cadence over pre-projected (host, warc_ts) with NO
    host-wide single-task stage (the two-stage-salted-aggregate shape
    the skew module documents, specialized to cadence):

      * the IAT lag windows on (host, time-bucket) — a mega-host's rows
        spread over its crawl-duration/bucket buckets; bucket-boundary
        rows diff against the previous bucket's max via a per-bucket
        bounds table (rows per host = #buckets, tiny);
      * mode: groupBy(host, iat) counts (map-side partial) then a
        per-distinct-iat reduction;
      * MAD: exact weighted median over the (host, |iat-mode|)
        frequency table — cumulative-count interpolation identical to
        ``F.percentile(.., 0.5)`` — windows only over collapsed
        frequency rows;
      * regularity / outlier sums: join mode+mad back (AQE skew-split
        or auto-broadcast; the stats table is one row per host) and
        partial-aggregate.

    Every big-table stage either partial-aggregates map-side or
    partitions on (host, bucket); only per-host-small tables see
    host-wide windows."""
    from pyspark.sql import Window

    width = F.lit(int(ts_bucket_sec) * 1_000_000)
    micros = F.unix_micros(F.col("warc_ts").cast("timestamp"))
    b = d.select(
        "host",
        micros.alias("_us"),
        F.floor(micros / width).cast("long").alias("_bkt"),
    )
    w_hb = Window.partitionBy("host", "_bkt").orderBy("_us")
    x = b.withColumn("_prev", F.lag("_us").over(w_hb))
    bounds = b.groupBy("host", "_bkt").agg(F.max("_us").alias("_last"))
    w_seq = Window.partitionBy("host").orderBy("_bkt")
    bounds = bounds.select(
        "host", "_bkt", F.lag("_last").over(w_seq).alias("_prev_last")
    )
    x = x.join(bounds, ["host", "_bkt"])
    prev = F.coalesce(F.col("_prev"), F.col("_prev_last"))
    iat_raw = (F.col("_us") - prev) / F.lit(1_000_000.0)
    rows = x.select(
        "host", F.when(iat_raw >= 0, iat_raw).alias("iat")
    )

    npages = d.groupBy("host").agg(F.count(F.lit(1)).alias("n_pages"))
    clean = rows.filter(F.col("iat").isNotNull())
    freq = clean.groupBy("host", "iat").agg(F.count(F.lit(1)).alias("_cnt"))
    mode = freq.groupBy("host").agg(
        F.min(
            F.struct((-F.col("_cnt")).alias("nc"), F.col("iat").alias("v"))
        )["v"].alias("_mode")
    )
    # exact weighted median of |iat - mode| (the F.percentile(0.5)
    # interpolation over the frequency-collapsed rows)
    fr = freq.join(mode, "host").withColumn(
        "_dev", F.abs(F.col("iat") - F.col("_mode"))
    )
    w_dev = (
        Window.partitionBy("host").orderBy("_dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fr = fr.withColumn("_cum", F.sum("_cnt").over(w_dev)).withColumn(
        "_tot", F.sum("_cnt").over(Window.partitionBy("host"))
    )
    pos = (F.col("_tot") - 1) / 2  # 0-based middle position (double)
    mad = fr.groupBy("host").agg(
        F.min(
            F.when(F.col("_cum") >= F.floor(pos) + 1, F.col("_dev"))
        ).alias("_lo"),
        F.min(
            F.when(F.col("_cum") >= F.ceil(pos) + 1, F.col("_dev"))
        ).alias("_hi"),
        (F.first(pos) - F.floor(F.first(pos))).alias("_frac"),
    ).select(
        "host",
        (F.col("_lo")
         + (F.col("_hi") - F.col("_lo")) * F.col("_frac")).alias("_mad"),
    )
    stats = mode.join(mad, "host")

    j = clean.join(stats, "host")
    rae = F.try_divide(F.abs(F.col("iat") - F.col("_mode")), F.col("_mode"))
    modz = F.try_divide(
        0.6745 * (F.col("iat") - F.col("_mode")), F.col("_mad")
    )
    is_out = F.when((F.col("_mad") > 0) & (modz > 3.5), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    agg = j.groupBy("host").agg(
        F.first("_mode").alias("_m"),
        F.sum(F.when((F.col("_mode") != 0) & (rae <= 0.5),
                     1 - 2 * rae).otherwise(F.lit(0.0))).alias("_good"),
        F.sum(F.when((F.col("_mode") != 0) & (rae <= 0.5),
                     F.lit(1.0)).otherwise(F.lit(0.0))).alias("_cntr"),
        F.sum(F.when((F.col("_mode") != 0) & (rae > 0.5),
                     2 * rae).otherwise(F.lit(0.0))).alias("_bad"),
        F.sum(is_out).alias("_nout"),
        F.count(F.lit(1)).alias("_nclean"),
    )
    return npages.join(agg, "host", "left").select(
        "host",
        "n_pages",
        F.when(
            F.col("_m").isNotNull() & (F.col("_m") != 0),
            F.round(F.col("_good") / (F.col("_cntr") + F.col("_bad")), 6),
        ).alias("reg_score"),
        F.when(
            F.col("_nclean") > 0,
            F.round(1 - F.col("_nout") / F.col("_nclean"), 6),
        ).alias("out_score"),
    )


# scrubbed_text carries the NULL-means-unchanged convention (kernel.py):
# NULL <=> no scrub rule fired <=> scrubbed == extracted text. Apply
# materialize_scrubbed BEFORE this projection to ship full bytes.
OUTPUT_COLUMNS = [
    "url", "warc_ts", "host", "lang", "lang_pred", "lang_conf", "ppl",
    "nw", "mean_wl", "symbol_ratio", "stopword_frac", "dup_line_frac",
    "top_bigram_share", "pii_email", "pii_ip", "pii_phone", "toxicity_slur",
    "keep", "quality_score", "rules_fired", "scrubbed_text",
]


def pages_out(df: DataFrame) -> DataFrame:
    return df.select(*OUTPUT_COLUMNS)
