"""Politeness scheduler: per-registrable-domain take-k with salted
two-phase top-k (SURVEY.md §4.2-1/2, M5).

Replaces the reference's bounded task pool + random sleeps
(BaseSpider.cs:96-102,139) with deterministic budget arithmetic:
``k(host) = min(max_k, max(1, budget_ms // crawl_delay_ms))`` per
superstep (oracle.host_budget — the shared contract).

Skew handling: a mega-host with 10^8 pending URLs must not serialize one
window partition. Selection is therefore ALWAYS two-phase exact top-k:

  phase 1  rank within (host, salt) — ``n_salts`` parallel partitions per
           host, each keeps its local top-k,
  phase 2  rank the ≤ n_salts·k survivors per host globally.

Per-salt top-k is a superset of the global top-k, so the result is exact;
phase 2's input is bounded by n_salts·k rows per host regardless of
pending-count skew. Priority order is ``(path, url)`` — the lexicographic
discovery path that encodes (seed staleness order, page index, row
position, variant position), matching the reference's crawl order
(ShiweijiaProduct.cs:50 seed order; SURVEY.md §7.3-2). An optional
``priority`` score table (PageRank/HITS over the link graph) prepends
``score DESC`` to that order — authority-first frontier scheduling with
discovery order as the deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_budget(
    frontier: DataFrame,
    robots: DataFrame,
    budget_ms: int,
    max_k: int,
    default_delay_ms: int = 3000,
) -> DataFrame:
    """Join per-host crawl budget k onto the frontier (broadcast robots)."""
    r = robots.select("host", "crawl_delay_ms")
    f = frontier.join(F.broadcast(r), "host", "left").withColumn(
        "_delay", F.coalesce(F.col("crawl_delay_ms"), F.lit(default_delay_ms))
    )
    return f.withColumn(
        "k",
        F.when(F.col("_delay") <= 0, F.lit(max_k)).otherwise(
            F.least(
                F.lit(max_k),
                F.greatest(
                    F.lit(1), (F.lit(budget_ms) / F.col("_delay")).cast("long")
                ),
            )
        ),
    ).drop("crawl_delay_ms", "_delay")


def politeness_take(
    frontier: DataFrame,
    robots: DataFrame,
    budget_ms: int,
    max_k: int,
    n_salts: int = 8,
    default_delay_ms: int = 3000,
    priority: DataFrame | None = None,
) -> DataFrame:
    """Select this superstep's batch: per host the top-k pending URLs in
    (path, url) order, k from the robots crawl-delay budget. Output keeps
    all frontier columns and adds ``host_rank`` (1-based, per host).

    ``priority``: optional (url, score double) authority signal —
    typically :func:`crawler_spark.operators.graph.pagerank` or
    ``hits`` over the discovered link graph (Cho, Garcia-Molina & Page,
    WWW7 1998: URL ordering by link authority). When given, per-host
    selection orders by (score DESC, path, url); absent urls score 0,
    so the default discovery order is the tie-break and ``None``
    reproduces it exactly. The join is a plain equi-join on url (the
    score table is node-sized, far under the frontier; Spark/AQE
    broadcasts it when small) and both top-k phases see the same key,
    so the salted-skew bound is unchanged."""
    f = with_budget(frontier, robots, budget_ms, max_k, default_delay_ms)
    if priority is not None:
        # defensive per-url max: a duplicate url in the score table (a
        # unioned pagerank+hits export, say) would otherwise multiply
        # frontier rows through the left join — duplicate fetches and a
        # broken per-host k budget. One agg over the node-sized table.
        p = priority.groupBy("url").agg(
            F.max(F.col("score").cast("double")).alias("_prio")
        )
        f = f.join(p, "url", "left").withColumn(
            "_prio", F.coalesce(F.col("_prio"), F.lit(0.0))
        )
    else:
        f = f.withColumn("_prio", F.lit(0.0))
    order = [F.col("_prio").desc(), F.col("path"), F.col("url")]
    f = f.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(n_salts)).cast("int")
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    cand = f.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= F.col("k")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        cand.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= F.col("k"))
        .drop("_salt", "_r1", "k", "_prio")
    )


def compile_rules_map(rules_map: dict[str, list[str]]):
    """{host: disallow_prefixes} → a map-literal Column (or None when no
    host has rules — the gate is then a no-op). Build this ONCE per
    crawl and reuse the Column across supersteps (round-5 review
    finding: rebuilding it per call is thousands of py4j literal
    constructions per superstep at the 10k-host cap — more driver work
    than the broadcast-exchange job it replaces)."""
    hosts_with_rules = {h: ps for h, ps in rules_map.items() if ps}
    if not hosts_with_rules:
        return None
    entries: list[F.Column] = []
    for h, prefixes in hosts_with_rules.items():
        entries.append(F.lit(h))
        entries.append(F.array(*[F.lit(p) for p in prefixes]))
    return F.create_map(*entries)


_UNSET = object()


def robots_allowed(
    df: DataFrame,
    robots: DataFrame,
    rules_map: dict[str, list[str]] | None = None,
    rules_col=_UNSET,
) -> DataFrame:
    """Filter rows whose URL path hits a disallow rule for its host
    (robots gate; reference analog: none — single-API crawler — this is
    the north-rule robots enforcement). Expects ``url`` + ``host``.
    Round 5: rules may use the RFC 9309 §2.2.3 ``*`` / trailing-``$``
    wildcards (shared matcher with robots.robots_allowed_precedence);
    wildcard-free rules keep the literal startswith fast path, so the
    golden fixtures' behavior is byte-identical.

    ``rules_map``: optional pre-collected {host: disallow_prefixes}.
    When given, the gate compiles to a map-literal lookup inside the
    caller's codegen span instead of a broadcast hash join — no
    broadcast-exchange job, no extra plan stage. This is the
    small-robots fast path (the engine collects it once per crawl below
    a size threshold); the join form remains the 10^6-host scale path,
    exactly like the bloom probe's broadcast/partitioned switch.
    ``rules_col``: the same fast path with a PRE-COMPILED
    :func:`compile_rules_map` Column (None = no rules → no-op) —
    loop callers pass this so the literal is built once per crawl."""
    # no cycle: robots imports nothing local
    from .robots import _match_target, _rule_matches

    path = _match_target(F.col("url"))
    if rules_col is _UNSET and rules_map is not None:
        rules_col = compile_rules_map(rules_map)
    if rules_col is not _UNSET:
        if rules_col is None:
            return df
        rules = F.element_at(rules_col, F.col("host"))
        return df.withColumn("_path", path).filter(
            rules.isNull()
            | ~F.exists(
                rules, lambda p: _rule_matches(F.col("_path"), p)
            )
        ).drop("_path")
    r = robots.select("host", "disallow_prefixes")
    return (
        df.join(F.broadcast(r), "host", "left")
        .withColumn("_path", path)
        .filter(
            F.col("disallow_prefixes").isNull()
            | ~F.exists(
                F.col("disallow_prefixes"),
                lambda p: _rule_matches(F.col("_path"), p),
            )
        )
        .drop("disallow_prefixes", "_path")
    )
