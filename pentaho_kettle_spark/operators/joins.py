"""Joins & lookups (SURVEY §2.3).

Reference kernels: mergejoin/MergeJoin.java (sort-merge, pre-sorted inputs),
multimerge/MultiMergeJoin.java, streamlookup/StreamLookup.java (in-memory
hash probe), joinrows/JoinRows.java (cartesian + Condition = nested-loop
theta join, spills to temp files), fuzzymatch/FuzzyMatch.java,
databaselookup/DatabaseLookup.java, closure/ClosureGenerator.java.

Spark-first: no pre-sorting, no manual hash tables — Catalyst picks
SMJ/BHJ/SHJ; `stream_lookup` pins the broadcast-hash plan explicitly since
the lookup side is small by contract (that's the Kettle step's own memory
model). Semi/anti joins (absent in Kettle, composed by users via
lookup+filter) are exposed directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | list[tuple[str, str]],
    how: str = "inner",  # inner | left | right | full
) -> DataFrame:
    """Equi-join, INNER/LEFT/RIGHT/FULL OUTER. keys: shared names or
    (left_key, right_key) pairs. No pre-sort required (MergeJoin.java made
    the user sort both inputs; Catalyst sorts/broadcasts as the stats say)."""
    how = {"full": "full_outer"}.get(how, how)
    if keys and isinstance(keys[0], tuple):
        cond = None
        for lk, rk in keys:
            c = left[lk] == right[rk]
            cond = c if cond is None else (cond & c)
        return left.join(right, cond, how)
    return left.join(right, on=list(keys), how=how)


def multi_merge_join(dfs: list[DataFrame], keys: list[str], how: str = "inner") -> DataFrame:
    """n-way equi-join; Catalyst/CBO reorders the chain."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.join(d, on=keys, how={"full": "full_outer"}.get(how, how))
    return out


def stream_lookup(
    stream: DataFrame,
    lookup: DataFrame,
    keys: list[str] | list[tuple[str, str]],
    retrieve: dict[str, object] | list[str],
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Broadcast-hash lookup with per-field defaults on miss.

    retrieve: fields to pull from the lookup side (list, or {field: default}).
    The broadcast hint IS the step's semantics — StreamLookup.java loads the
    whole lookup stream into one in-process hash map, i.e. it is only correct
    when the lookup side fits in memory; broadcast makes that contract explicit
    and removes the shuffle of the big side entirely.
    """
    if isinstance(retrieve, dict):
        defaults = {**retrieve, **(defaults or {})}
        retrieve = list(retrieve.keys())
    defaults = defaults or {}
    if keys and isinstance(keys[0], tuple):
        lk_cols = [rk for _, rk in keys]
        lkp = lookup.select(*lk_cols, *retrieve)
        cond = None
        for lk, rk in keys:
            c = stream[lk] == lkp[rk]
            cond = c if cond is None else (cond & c)
        out = stream.join(F.broadcast(lkp), cond, "left").drop(*lk_cols)
    else:
        lkp = lookup.select(*keys, *retrieve)
        out = stream.join(F.broadcast(lkp), on=list(keys), how="left")
    for f in retrieve:
        if f in defaults and defaults[f] is not None:
            out = out.withColumn(f, F.coalesce(F.col(f), F.lit(defaults[f])))
    return out


def join_rows_cartesian(
    left: DataFrame, right: DataFrame, condition: Column | str | None = None
) -> DataFrame:
    """JoinRows: cross join + optional Condition → theta join. Catalyst plans
    BroadcastNestedLoopJoin when one side is small; the reference spilled the
    cached side to temp files instead."""
    if condition is None:
        return left.crossJoin(right)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    return left.join(right, cond, "inner")


def semi_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    return left.join(right, on=keys, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    return left.join(right, on=keys, how="left_anti")


def fuzzy_match(
    stream: DataFrame,
    lookup: DataFrame,
    stream_field: str,
    lookup_field: str,
    algorithm: str = "levenshtein",  # levenshtein | jaro | jaro_winkler | soundex
    max_distance: int | None = None,
    min_similarity: float | None = None,
    match_field: str = "match",
    score_field: str = "score",
    blocking: str | None = None,  # None | "length" | "first_letter" | "soundex"
) -> DataFrame:
    """Nearest-string lookup: score candidate pairs, keep the best per
    stream row (min_by/max_by — single agg, no window).

    FuzzyMatch.java caches the whole lookup stream and scans it per row —
    O(n·m). `blocking=None` reproduces that exactly (broadcast crossJoin);
    fine when the lookup side is small. At scale pass a blocking scheme and
    the pairing becomes a broadcast EQUI-join on a candidate key, so cost is
    Σ block² instead of n·m:

      * ``"length"`` (levenshtein, requires max_distance): a candidate at
        edit distance ≤ d differs in length by ≤ d, so each lookup value is
        exploded into its d-band of lengths and joined on length(stream
        value) — lossless for the levenshtein + max_distance contract.
      * ``"first_letter"``: join on upper first char — standard lossy
        blocking (a best match not sharing the first letter is missed).
      * ``"soundex"``: join on soundex code — lossy, phonetic blocks.

    Stream rows whose block has no candidate keep a NULL match (left join),
    same as an over-threshold best score.
    """
    lkp = lookup.select(F.col(lookup_field).alias("_cand")).distinct()
    if blocking is None:
        paired = stream.crossJoin(F.broadcast(lkp))
    else:
        if blocking == "length":
            if algorithm != "levenshtein" or max_distance is None:
                raise ValueError(
                    "blocking='length' needs algorithm='levenshtein' and max_distance"
                )
            cand = lkp.select(
                "_cand",
                F.explode(
                    F.sequence(
                        F.length("_cand") - max_distance,
                        F.length("_cand") + max_distance,
                    )
                ).alias("_blk"),
            )
            skey = F.length(F.col(stream_field))
        elif blocking == "first_letter":
            cand = lkp.select("_cand", F.upper(F.substring("_cand", 1, 1)).alias("_blk"))
            skey = F.upper(F.substring(F.col(stream_field), 1, 1))
        elif blocking == "soundex":
            cand = lkp.select("_cand", F.soundex("_cand").alias("_blk"))
            skey = F.soundex(F.col(stream_field))
        else:
            raise ValueError(f"unknown blocking scheme {blocking!r}")
        paired = (
            stream.withColumn("_blk", skey)
            .join(F.broadcast(cand), on="_blk", how="left")
            .drop("_blk")
        )
    s, c = F.col(stream_field), F.col("_cand")
    # ties broken deterministically: lexicographically smallest candidate.
    # c.isNull() leads every ordering struct so unmatched-block rows (left
    # join put a NULL candidate on them) lose to any real candidate and
    # surface as NULL match.
    if algorithm == "levenshtein":
        score = F.levenshtein(s, c)
        best = F.min_by(c, F.struct(c.isNull(), score, c))
        best_score = F.min(score)  # min/max skip NULLs (NULL-candidate rows)
    elif algorithm in ("jaro", "jaro_winkler"):
        from pentaho_kettle_spark.functions.strings_udf import jaro_udf, jaro_winkler_udf

        udf = jaro_udf if algorithm == "jaro" else jaro_winkler_udf
        score = udf(s, c)
        best = F.min_by(c, F.struct(c.isNull(), -score, c))
        best_score = F.max(score)
    elif algorithm == "soundex":
        score = (F.soundex(s) == F.soundex(c)).cast("int")
        best = F.min_by(c, F.struct(c.isNull(), -score, c))
        best_score = F.max(score)
    else:
        raise ValueError(algorithm)
    keys = [x for x in stream.columns]
    agg = paired.groupBy(*keys).agg(
        best.alias(match_field), best_score.alias(score_field)
    )
    # threshold applied on the aggregated best score; a block with no
    # candidate left score_field NULL, which fails every comparison → NULL
    sc = F.col(score_field)
    if algorithm == "levenshtein":
        keep = sc.isNotNull() if max_distance is None else (sc <= max_distance)
    elif algorithm == "soundex":
        keep = sc == 1
    else:
        keep = sc.isNotNull() if min_similarity is None else (sc >= min_similarity)
    return agg.withColumn(match_field, F.when(keep, F.col(match_field)))


def closure_generator(
    df: DataFrame, parent_field: str, child_field: str, distance_field: str = "distance",
    max_depth: int = 50,
) -> DataFrame:
    """Transitive closure over a (parent, child) hierarchy by path doubling
    (ClosureGenerator.java builds the whole closure in one in-memory map;
    that caps at driver memory — this stays distributed). Includes the
    0-distance self rows like the reference.

    Scale design: path doubling needs only ceil(log2(max_depth)) self-join +
    min-aggregate rounds instead of one join per level, so a depth-10^4 chain
    is ~14 shuffles. Each round is eagerly materialized and the superseded
    round unpersisted — cached footprint is O(|closure|), and the logical
    plan stays polynomial (the naive union-per-level plan nests the previous
    closure twice per level and OOMs the planner past ~15 levels)."""
    edges = df.select(
        F.col(parent_field).alias("p"), F.col(child_field).alias("c")
    ).distinct()
    nodes = edges.select(F.col("p").alias("n")).union(edges.select("c")).distinct()
    closure = (
        nodes.select(F.col("n").alias("p"), F.col("n").alias("c"), F.lit(0).alias("d"))
        .union(edges.withColumn("d", F.lit(1)))
        .cache()
    )
    stats = closure.agg(F.count(F.lit(1)), F.sum("d")).collect()[0]
    reach = 1
    while reach < max_depth:
        paths = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.c") == F.col("b.p"))
            .select(
                F.col("a.p").alias("p"), F.col("b.c").alias("c"),
                (F.col("a.d") + F.col("b.d")).alias("d"),
            )
            .filter(F.col("d") <= max_depth)
        )
        new_closure = (
            closure.union(paths).groupBy("p", "c").agg(F.min("d").alias("d")).cache()
        )
        new_stats = new_closure.agg(F.count(F.lit(1)), F.sum("d")).collect()[0]
        converged = tuple(new_stats) == tuple(stats)
        closure.unpersist()
        closure, stats = new_closure, new_stats
        if converged:
            break
        reach *= 2
    return closure.select(
        F.col("p").alias(parent_field),
        F.col("c").alias(child_field),
        F.col("d").alias(distance_field),
    )
