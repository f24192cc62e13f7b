"""Round-13 lanes: graph-based ANN, executed reclustering, streaming
attribution retractions.

The graph-ANN family (q506–q509) completes the similarity ladder
(brute-force q47 → LSH q48 → IVF q68 → PQ q352 → graph): a
deterministic small-world search with every lane oracled the q68→q116
way — the full-beam variant provably equals exact top-k over the
reachable component (a recursive SQL CTE replays the walk), the greedy
beam's recall is bracket-gated against q47's truth, and inserts extend
a frozen graph (the q384 discipline).

Reference parity: the reference corpus (gbaliarda/databricks-etl,
transform.py/pre_analysis.py) has no vector surface; these extend
SURVEY.md §2.12 exactly as the earlier ANN rungs did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.operators import graph_ann as GA
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _dot_sql(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


_Q506_M = 8  # graph out-degree


def _edges_cte() -> str:
    """The kNN edge relation both engines agree on: exact top-M cosine
    per node, 6dp round, (sim DESC, dst ASC) tiebreak — q47's total
    order applied to every node as a query.  MATERIALIZED per the
    recursive-CTE inlining gotcha (CLAUDE.md)."""
    return f"""
    v AS MATERIALIZED (
        SELECT vec_id, embedding,
               sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
        FROM embeddings
    ),
    s AS MATERIALIZED (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               round({_dot_sql('a.embedding', 'b.embedding')}
                     / (a.nrm * b.nrm), 6) AS sim
        FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    e AS MATERIALIZED (
        SELECT src, dst, sim,
               CAST(row_number() OVER (
                   PARTITION BY src ORDER BY sim DESC, dst
               ) AS BIGINT) AS rank
        FROM s QUALIFY rank <= {_Q506_M}
    )
    """


# one graph per (session, sf_dir): the build is shared by the four
# lanes; localCheckpoint freezes it so reuse never recomputes the
# all-pairs scoring (and the frozen artifact is exactly what the
# incremental lane's contract requires)
# Epoch count for the streaming-twin lanes' deterministic slicing
# (q534/q535/q545/q564/q573). 2 = the driver-facing parity slicing;
# tests raise it (monkeypatch) to prove drain ≡ batch under a hostile
# many-tiny-batch slicing — the additive-partials contract must hold
# for ANY k, so the constant is semantics-neutral by design.
_STREAM_EPOCHS = 2

_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keyed on applicationId, not id(spark): CPython can reuse a
    # stopped session's id(), which would hand back DataFrames bound
    # to a dead JVM context
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EDGE_CACHE:
        e = read_table(spark, sf_dir, "embeddings")
        _EDGE_CACHE[key] = GA.build_knn_graph(
            e, _Q506_M
        ).localCheckpoint(eager=False)
    return _EDGE_CACHE[key]


def _q506_oracle() -> str:
    return f"""
        WITH {_edges_cte()}
        SELECT e.rank,
               CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_reciprocal,
               round(CAST(SUM(CAST(e.sim AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_sim
        FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
        GROUP BY e.rank
    """


@query("q506_knn_graph_build_audit", oracle=_q506_oracle())
def q506_knn_graph_build_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BUILD audit of the kNN graph behind the graph-ANN rung: each
    node's out-edges are its exact top-{_Q506_M} cosine neighbors
    (6dp, dst-ascending tiebreak — q47's total order), and the audit
    reports, per rank slot, the edge count, how many edges are
    RECIPROCAL (the reverse edge exists at any rank — the
    navigability measure HNSW's heuristic maximizes), and the exact
    decimal mean similarity.  Falling reciprocity by rank is the
    expected signature of a healthy kNN graph; a rank slot whose
    count ≠ n_nodes or whose mean_sim drifts flags a broken build.

    Scale shape: the exact build is the truth construction (blocked
    broadcast passes, like q47's baseline); production builds swap in
    IVF-cell candidates (operators.graph_ann.build_knn_graph's
    ``candidates`` arg) and this audit is unchanged.  The reciprocity
    join is edge-to-edge on (dst, src) — linear in N×M."""
    e = _edges(spark, sf_dir)
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("__rev"),
    )
    return (
        e.join(rev, ["src", "dst"], "left")
        .groupBy("rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(F.coalesce(F.col("__rev"), F.lit(0)))
            .cast("long")
            .alias("n_reciprocal"),
            F.round(
                F.sum(F.col("sim").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_sim"),
        )
    )


_Q507_ENTRY = 0
_Q507_K = 10


def _q507_oracle() -> str:
    return f"""
        WITH RECURSIVE {_edges_cte()},
        reach AS (
            SELECT CAST({_Q507_ENTRY} AS BIGINT) AS node
            UNION
            SELECT e.dst FROM e JOIN reach ON e.src = reach.node
        ),
        q AS (
            SELECT vec_id AS qid, embedding AS qe,
                   sqrt({_dot_sql('embedding', 'embedding')}) AS qn
            FROM embeddings WHERE vec_id < 5
        ),
        c AS (
            SELECT v.vec_id AS nid, v.embedding AS ce, v.nrm AS cn
            FROM v JOIN reach ON v.vec_id = reach.node
        ),
        scored AS (
            SELECT qid, nid,
                   round({_dot_sql('qe', 'ce')} / (qn * cn), 6)
                       AS cosine_sim
            FROM q, c WHERE qid <> nid
        ),
        r AS (
            SELECT qid AS query_id, nid AS neighbor_id, cosine_sim,
                   CAST(row_number() OVER (
                       PARTITION BY qid
                       ORDER BY cosine_sim DESC, nid
                   ) AS BIGINT) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, cosine_sim,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM reach) AS n_reached
        FROM r WHERE rank <= {_Q507_K}
    """


@query("q507_graph_reachable_topk", oracle=_q507_oracle())
def q507_graph_reachable_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL-BEAM graph search — the provable-equality lane: with an
    unbounded beam, greedy search visits exactly the entry point's
    reachable component, so its top-k IS exact top-k restricted to
    that component.  The Spark side walks the graph (iterative
    frontier BFS with visited anti-joins — q497's Pregel-superstep
    shape, run to the fixed point) and scores the reachable set
    exactly; the oracle replays the same walk as a recursive CTE over
    the same deterministic edge relation.  ``n_reached`` pins
    connectivity: at this corpus one node is unreachable from entry
    {_Q507_ENTRY}, and the search provably returns the true top-k
    over the other N−1 — the audit a graph index ships with.

    This is the TRUTH construction (like q47's brute force); the
    production query path is q508's bounded beam."""
    emb = read_table(spark, sf_dir, "embeddings")
    edges = _edges(spark, sf_dir)
    reach = GA.reachable_set(edges, _Q507_ENTRY)
    scored = GA.score_against_queries(
        reach, emb, emb.filter(F.col("vec_id") < 5)
    )
    n_reached = reach.agg(
        F.count(F.lit(1)).cast("long").alias("n_reached")
    )
    return GA.topk(scored, _Q507_K).crossJoin(F.broadcast(n_reached))


_Q508_BEAM = 32
_Q508_HOPS = 8


@query(
    "q508_graph_beam_recall_gate",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               TRUE AS graph_min_recall_ge_080,
               TRUE AS graph_mean_recall_ge_088
        FROM embeddings WHERE vec_id < 5
    """,
)
def q508_graph_beam_recall_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GREEDY BEAM search quality as a hash-checked artifact (the
    q145 bracket discipline): beam={_Q508_BEAM}, hops={_Q508_HOPS},
    entry 0, explicit (sim DESC, id ASC) tiebreak at every admission.
    Recall@10 against the exact q47 truth is computed in-Spark and
    emitted as tolerance brackets the oracle states as constants —
    measured min 0.9 / mean ≥0.94 at sf0.001, sf0.01 AND sf0.1, so
    the gates (min ≥ 0.80, mean ≥ 0.88) hold with margin; any
    regression in the walk (a tiebreak change, a beam-admission bug)
    flips a boolean and the driver hash catches it.

    Scale shape: per-hop state is ≤ |queries|×beam×m rows (broadcast
    side); the edge relation is joined by key.  The beam walk does
    ZERO corpus scans after the entry scoring — the whole point of a
    graph index at 100 TB."""
    emb = read_table(spark, sf_dir, "embeddings")
    edges = _edges(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    approx = GA.beam_search(
        emb, edges, q, _Q507_K, beam=_Q508_BEAM, hops=_Q508_HOPS,
        entry=_Q507_ENTRY,
    )
    from databricks_etl_spark.operators.similarity import cosine_topk

    exact = cosine_topk(emb, q, _Q507_K)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    recalls = (
        exact.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(_Q507_K)).alias(
                "recall"
            ),
        )
    )
    return recalls.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.min("recall") >= 0.80).alias("graph_min_recall_ge_080"),
        (F.avg("recall") >= 0.88).alias("graph_mean_recall_ge_088"),
    )


_Q509_SLICE = "0123"  # md5 first hex in this set → insert batch (~1/4)


def _q509_oracle() -> str:
    return f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id, embedding,
                   sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
            FROM embeddings
            WHERE strpos('{_Q509_SLICE}',
                  substr(md5('gi:' || CAST(vec_id AS VARCHAR)), 1, 1)) = 0
        ),
        ins AS MATERIALIZED (
            SELECT vec_id, embedding,
                   sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
            FROM embeddings
            WHERE strpos('{_Q509_SLICE}',
                  substr(md5('gi:' || CAST(vec_id AS VARCHAR)), 1, 1)) > 0
        ),
        scored AS (
            SELECT i.vec_id AS src, b.vec_id AS dst,
                   round({_dot_sql('i.embedding', 'b.embedding')}
                         / (i.nrm * b.nrm), 6) AS sim
            FROM ins i JOIN base b ON i.vec_id <> b.vec_id
        ),
        new_edges AS (
            SELECT src, dst, sim,
                   CAST(row_number() OVER (
                       PARTITION BY src ORDER BY sim DESC, dst
                   ) AS BIGINT) AS rank
            FROM scored QUALIFY rank <= {_Q506_M}
        )
        SELECT rank,
               CAST(COUNT(*) AS BIGINT) AS n_edges,
               round(CAST(SUM(CAST(sim AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_sim,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_base_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ins) AS n_inserted
        FROM new_edges GROUP BY rank
    """


@query("q509_graph_incremental_insert", oracle=_q509_oracle())
def q509_graph_incremental_insert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL insert into a frozen kNN graph (the q384
    frozen-artifact discipline applied to the graph rung): the base
    graph (vectors outside a deterministic md5 quarter-slice) is
    built once and never touched; each arriving vector searches the
    BASE corpus for its top-{_Q506_M} neighbors and links out —
    base nodes' own edge lists stay byte-identical (re-linking them
    is the periodic rebuild q424 prices for IVF cells, not the
    insert path).  The audit reports the inserted edges per rank
    slot with exact decimal mean similarity, plus the frozen/insert
    populations.

    Scale shape: one pass of the base corpus per insert batch with
    the batch broadcast (inserts are small relative to the corpus by
    definition); per-insert top-M is a bounded window."""
    emb = read_table(spark, sf_dir, "embeddings")
    is_ins = (
        F.instr(
            F.lit(_Q509_SLICE),
            F.substring(
                F.md5(F.concat(F.lit("gi:"), F.col("vec_id").cast("string"))),
                1,
                1,
            ),
        )
        > 0
    )
    base = emb.filter(~is_ins)
    ins = emb.filter(is_ins)
    # score (insert, base) pairs: base streams, insert batch broadcasts
    scored = GA._scored_pairs(base, ins, id_col="vec_id",
                              vec_col="embedding").select(
        F.col("dst").alias("src"),  # insert node
        F.col("src").alias("dst"),  # frozen base neighbor
        "sim",
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    new_edges = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _Q506_M)
    )
    counts = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_base_nodes")
    ).crossJoin(
        ins.agg(F.count(F.lit(1)).cast("long").alias("n_inserted"))
    )
    return (
        new_edges.groupBy("rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.round(
                F.sum(F.col("sim").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_sim"),
        )
        .select(F.col("rank").cast("long").alias("rank"), "n_edges",
                "mean_sim")
        .crossJoin(F.broadcast(counts))
    )


# ---------------------------------------------------------------------------
# q510 — recluster plan EXECUTION (really rewrite the planned files)
# ---------------------------------------------------------------------------

_Q510_BASE_FILES = 20
_Q510_APPEND_FILES = 2
_Q510_CUTOFF = "1998-06-01"  # appends = late-arriving recent ship-days


def _q510_oracle() -> str:
    return f"""
        WITH li AS MATERIALIZED (
            SELECT CAST(datediff('day', DATE '1970-01-01',
                                 CAST(l_shipdate AS DATE)) AS DOUBLE) AS sd,
                   l_orderkey, l_linenumber,
                   (l_orderkey % 10 = 0 AND CAST(l_shipdate AS DATE)
                        >= DATE '{_Q510_CUTOFF}') AS is_app
            FROM lineitem
        ),
        basef AS MATERIALIZED (
            SELECT sd, l_orderkey, l_linenumber,
                   ntile({_Q510_BASE_FILES}) OVER (
                       ORDER BY sd, l_orderkey, l_linenumber) AS fid
            FROM li WHERE NOT is_app
        ),
        appf AS MATERIALIZED (
            SELECT sd, l_orderkey, l_linenumber,
                   1000 + ntile({_Q510_APPEND_FILES}) OVER (
                       ORDER BY l_orderkey, l_linenumber) AS fid
            FROM li WHERE is_app
        ),
        bz AS MATERIALIZED (
            SELECT fid, MIN(sd) AS mn, MAX(sd) AS mx,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM basef GROUP BY fid
        ),
        az AS MATERIALIZED (
            SELECT fid, MIN(sd) AS mn, MAX(sd) AS mx,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM appf GROUP BY fid
        ),
        ov AS MATERIALIZED (
            SELECT DISTINCT b.fid FROM bz b JOIN az a
              ON b.mn <= a.mx AND b.mx >= a.mn
        ),
        dims AS MATERIALIZED (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ov) AS kk,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM basef WHERE fid IN (SELECT fid FROM ov))
                   + (SELECT CAST(COUNT(*) AS BIGINT) FROM appf) AS nrw
        ),
        rwr AS MATERIALIZED (
            SELECT sd,
                   row_number() OVER (
                       ORDER BY sd, l_orderkey, l_linenumber) AS rr
            FROM (
                SELECT sd, l_orderkey, l_linenumber FROM basef
                WHERE fid IN (SELECT fid FROM ov)
                UNION ALL
                SELECT sd, l_orderkey, l_linenumber FROM appf
            )
        ),
        newz AS MATERIALIZED (
            SELECT 2000 + ((rr - 1) * dims.kk) // dims.nrw AS fid,
                   MIN(sd) AS mn, MAX(sd) AS mx,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM rwr CROSS JOIN dims GROUP BY 1
        ),
        beforez AS MATERIALIZED (
            SELECT * FROM bz UNION ALL SELECT * FROM az
        ),
        afterz AS MATERIALIZED (
            SELECT * FROM bz WHERE fid NOT IN (SELECT fid FROM ov)
            UNION ALL SELECT * FROM newz
        ),
        dep_b AS (
            SELECT a.fid, CAST(COUNT(*) AS BIGINT) AS d
            FROM beforez a JOIN beforez b
              ON a.mn <= b.mx AND a.mx >= b.mn
            GROUP BY a.fid
        ),
        dep_a AS (
            SELECT a.fid, CAST(COUNT(*) AS BIGINT) AS d
            FROM afterz a JOIN afterz b
              ON a.mn <= b.mx AND a.mx >= b.mn
            GROUP BY a.fid
        )
        SELECT
            CAST({_Q510_BASE_FILES + _Q510_APPEND_FILES} AS BIGINT)
                AS n_files_before,
            (SELECT kk FROM dims) AS base_files_overlapping,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM afterz)
                AS n_files_after,
            (SELECT round(AVG(CAST(d AS DOUBLE)), 6) FROM dep_b)
                AS depth_before_avg,
            (SELECT round(AVG(CAST(d AS DOUBLE)), 6) FROM dep_a)
                AS depth_after_avg,
            (SELECT CAST(MAX(d) AS BIGINT) FROM dep_b)
                AS depth_before_max,
            (SELECT CAST(MAX(d) AS BIGINT) FROM dep_a)
                AS depth_after_max,
            (SELECT AVG(CAST(d AS DOUBLE)) FROM dep_a)
                < (SELECT AVG(CAST(d AS DOUBLE)) FROM dep_b)
                AS depth_improved,
            (SELECT SUM(c) FROM afterz)
                = (SELECT CAST(COUNT(*) AS BIGINT) FROM li)
                AS rows_conserved,
            TRUE AS untouched_intact
    """


def _q510_tree_digest(root: str) -> dict[str, str]:
    """md5 of every data file under ``root``, keyed by relative path —
    the byte-identity witness for untouched files (local-FS stand-in
    for an object store's checksum listing)."""
    import hashlib
    import os

    out: dict[str, str] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            if fn.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(
                    fh.read()
                ).hexdigest()
    return out


@query("q510_recluster_plan_execution", oracle=_q510_oracle())
def q510_recluster_plan_execution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXECUTE the recluster plan the q503 family only prices — the
    full OPTIMIZE loop on really-written files (q460's
    write-then-reread discipline): lay the table out as
    {_Q510_BASE_FILES} ship-day-clustered files plus
    {_Q510_APPEND_FILES} late-arriving append files (recent ship-days
    in arrival order — the localized-append case where incremental
    reclustering actually pays, unlike q503's pathological everything-
    overlap), re-read the REAL file zones, pick the rewrite set (the
    appends plus every base file whose zone overlaps them), rewrite
    exactly those rows re-sorted by ship-day into as many files as
    the overlapped base set had, and re-measure q475's clustering
    depth on the re-read result.  Pinned: depth strictly improves,
    rows are conserved across the rewrite, and the untouched files
    are BYTE-IDENTICAL (md5 of every part file before vs after —
    q346's diff discipline; the rewrite may only add files and
    retire the planned ones).

    Scale shape: planning reads file-grain zone metadata (|files|
    rows); the rewrite streams only the planned files' rows through
    one range-partitioned sort; the depth audit is a |files|² zone
    self-join on metadata.  Nothing global is re-sorted — that is
    the entire point of executing the INCREMENTAL plan."""
    import shutil

    from databricks_etl_spark.operators.quantile_bucket import exact_ntile
    from databricks_etl_spark.sources.writers import scratch_dir

    li = read_table(spark, sf_dir, "lineitem").select(
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("double")
        .alias("sd"),
        "l_orderkey",
        "l_linenumber",
        (
            (F.col("l_orderkey") % 10 == 0)
            & (
                F.col("l_shipdate").cast("date")
                >= F.lit(_Q510_CUTOFF).cast("date")
            )
        ).alias("is_app"),
    )
    cols = ["sd", "l_orderkey", "l_linenumber"]
    basef = exact_ntile(
        li.filter(~F.col("is_app")).select(*cols), cols,
        _Q510_BASE_FILES, out_col="fid",
    )
    appf = exact_ntile(
        li.filter(F.col("is_app")).select(*cols),
        ["l_orderkey", "l_linenumber"], _Q510_APPEND_FILES,
        out_col="fid0",
    ).select(*cols, (F.lit(1000) + F.col("fid0")).alias("fid"))
    root = scratch_dir("recluster_exec_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    (
        basef.unionByName(appf)
        .write.mode("overwrite")
        .partitionBy("fid")
        .parquet(f"{root}/table")
    )
    # --- plan from the RE-READ zones ---
    reread = spark.read.parquet(f"{root}/table")
    zones = (
        reread.groupBy("fid")
        .agg(
            F.min("sd").alias("mn"),
            F.max("sd").alias("mx"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    bz = zones.filter(F.col("fid") < 1000)
    az = zones.filter(F.col("fid") >= 1000)
    ov = (
        bz.alias("b")
        .join(
            F.broadcast(az.alias("a")),
            (F.col("b.mn") <= F.col("a.mx"))
            & (F.col("b.mx") >= F.col("a.mn")),
        )
        .select(F.col("b.fid").alias("fid"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ov_fids = sorted(r["fid"] for r in ov.collect())  # ≤ |files| rows
    kk = len(ov_fids)
    untouched_fids = [
        f
        for f in range(1, _Q510_BASE_FILES + 1)
        if f not in set(ov_fids)
    ]
    # --- snapshot untouched bytes, EXECUTE the rewrite, re-snapshot ---
    before_digest = {
        f: _q510_tree_digest(f"{root}/table/fid={f}")
        for f in untouched_fids
    }
    app_fids = [1000 + t for t in range(1, _Q510_APPEND_FILES + 1)]
    rw = reread.filter(F.col("fid").isin(ov_fids + app_fids)).select(
        *cols
    )
    nrw = rw.count()
    ranked = exact_ntile(rw, cols, nrw, out_col="rr")
    newf = ranked.select(
        "sd",
        F.expr(f"CAST(2000 + ((rr - 1) * {kk}) DIV {nrw} AS BIGINT)")
        .alias("fid"),
    )
    newf.write.mode("overwrite").partitionBy("fid").parquet(
        f"{root}/rewritten"
    )
    after_digest = {
        f: _q510_tree_digest(f"{root}/table/fid={f}")
        for f in untouched_fids
    }
    intact = before_digest == after_digest and all(
        before_digest[f] for f in untouched_fids
    )
    # --- depth audit on re-read zones, before vs after ---
    new_zones = (
        spark.read.parquet(f"{root}/rewritten")
        .groupBy("fid")
        .agg(
            F.min("sd").alias("mn"),
            F.max("sd").alias("mx"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
    )
    beforez = zones
    afterz = bz.filter(~F.col("fid").isin(ov_fids)).unionByName(
        new_zones
    ).localCheckpoint(eager=False)

    def depth(z: DataFrame):
        b = z.select(
            F.col("mn").alias("b_mn"), F.col("mx").alias("b_mx")
        )
        d = (
            z.join(
                F.broadcast(b),
                (F.col("mn") <= F.col("b_mx"))
                & (F.col("mx") >= F.col("b_mn")),
            )
            .groupBy("fid")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        return d.agg(
            F.round(F.avg(F.col("d").cast("double")), 6).alias("avg_d"),
            F.max("d").cast("long").alias("max_d"),
            F.avg(F.col("d").cast("double")).alias("raw_avg"),
        )

    db = depth(beforez)
    da = depth(afterz)
    tot = afterz.agg(
        F.sum("c").alias("after_rows"),
        F.count(F.lit(1)).cast("long").alias("n_after"),
    ).crossJoin(F.broadcast(li.agg(F.count(F.lit(1)).alias("n_li"))))
    return (
        db.select(
            F.col("avg_d").alias("depth_before_avg"),
            F.col("max_d").alias("depth_before_max"),
            F.col("raw_avg").alias("__rb"),
        )
        .crossJoin(
            F.broadcast(
                da.select(
                    F.col("avg_d").alias("depth_after_avg"),
                    F.col("max_d").alias("depth_after_max"),
                    F.col("raw_avg").alias("__ra"),
                )
            )
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit(_Q510_BASE_FILES + _Q510_APPEND_FILES)
            .cast("long")
            .alias("n_files_before"),
            F.lit(kk).cast("long").alias("base_files_overlapping"),
            F.col("n_after").alias("n_files_after"),
            "depth_before_avg",
            "depth_after_avg",
            "depth_before_max",
            "depth_after_max",
            (F.col("__ra") < F.col("__rb")).alias("depth_improved"),
            (F.col("after_rows") == F.col("n_li")).alias(
                "rows_conserved"
            ),
            F.lit(bool(intact)).alias("untouched_intact"),
        )
    )


# ---------------------------------------------------------------------------
# q511 — streaming multi-touch attribution WITH RETRACTIONS (late clicks)
# ---------------------------------------------------------------------------


def _q511_oracle() -> str:
    # registers q505 when this module is imported standalone (tests)
    import databricks_etl_spark.plans.queries_round12  # noqa: F401
    from databricks_etl_spark.plans.registry import QUERIES

    return QUERIES["q505_multi_touch_attribution"].oracle


def _q511_attrib(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """q505's linear attribution at (user, purchase, click) grain over
    an arbitrary click subset: every purchase's value splits equally
    across the clicks *currently known* in its 7-day lookback, each
    share 6dp-rounded (the per-touch rounding q505 pins)."""
    from databricks_etl_spark.plans.queries_round12 import _Q505_LOOKBACK_S

    touched = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")
            <= _Q505_LOOKBACK_S
        ),
    ).withColumn(
        "n_touches",
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id")).cast(
            "long"
        ),
    )
    return touched.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        F.round(F.col("value") / F.col("n_touches"), 6).alias("share"),
    )


_Q511_DELTA_SCHEMA = (
    "user_id long, purchase_id long, click_id long, share double,"
    " mult int, __epoch int"
)


def _make_q511_epoch(
    spark: SparkSession, partials_path: str, purchases: DataFrame
):
    """Retraction sink for LATE CLICKS: epoch e reads the clicks
    delivered by earlier epochs (partitions < e — replay idempotent),
    attributes against prior∪batch and prior alone, and lands only
    the delta: a late click inside a purchase's lookback changes that
    purchase's n_touches, so EVERY already-emitted share for it is
    retracted (−1) and re-emitted corrected (+1) alongside the new
    touch row — the q490/q501 negative-multiplicity discipline
    applied to q505's equal splits."""

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        prior = (
            spark.read.schema(
                "c_user long, click_id long, c_ts timestamp_ntz,"
                " __epoch int"
            )
            .parquet(f"{partials_path}/clicks")
            .filter(F.col("__epoch") < e)
            .drop("__epoch")
        )
        batch = batch_df.select("c_user", "click_id", "c_ts")
        old = _q511_attrib(purchases, prior)
        new = _q511_attrib(purchases, prior.unionByName(batch))
        key = ["user_id", "purchase_id", "click_id", "share"]
        delta = (
            new.exceptAll(old).select(*key, F.lit(1).alias("mult"))
            .unionByName(
                old.exceptAll(new).select(*key, F.lit(-1).alias("mult"))
            )
            .withColumn("__epoch", F.lit(e))
        )
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(f"{partials_path}/attrib")
        )
        (
            batch.withColumn("__epoch", F.lit(e))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(f"{partials_path}/clicks")
        )

    return ingest


def _drain_q511(spark: SparkSession, partials_path: str) -> DataFrame:
    """Fold the accumulated ±1 deltas to the net touch set (the deltas
    telescope, so net multiplicity is 1 for every live touch) and
    aggregate to q505's per-user card — column-for-column its oracle."""
    deltas = spark.read.schema(_Q511_DELTA_SCHEMA).parquet(
        f"{partials_path}/attrib"
    )
    net = (
        deltas.groupBy("user_id", "purchase_id", "click_id", "share")
        .agg(F.sum("mult").alias("m"))
        .filter(F.col("m") > 0)
    )
    return net.groupBy("user_id").agg(
        F.countDistinct("purchase_id").cast("long").alias(
            "attributed_purchases"
        ),
        F.sum(F.col("m")).cast("long").alias("touch_rows"),
        F.sum(
            (F.col("share") * F.col("m")).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("credited_value"),
    )


@query("q511_streaming_attribution_retractions", oracle=_q511_oracle())
def q511_streaming_attribution_retractions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q505's multi-touch attribution maintained under LATE-ARRIVING
    clicks — the marketing-pipeline case where equal splits make
    retractions unavoidable: a click landing inside a lookback window
    already attributed changes that purchase's touch count, so every
    emitted share for it is wrong at once.  Epoch e emits −1
    retractions for the invalidated shares plus corrected +1 rows
    (q501's CDC-delta discipline riding q505's split rule); deltas
    telescope, so ANY slicing of the click stream drains to the batch
    answer — proven by registering q505's oracle verbatim.  Clicks
    split by event-id parity, which lands a late click inside nearly
    every multi-touch window (retractions non-empty, pinned by test).

    Scale shape: per epoch the recompute is one co-shuffled
    window+join over (purchases, clicks-so-far) — production scopes
    it to users present in the batch; the emission/drain (the hard
    part) is grain-identical either way."""
    import shutil

    from databricks_etl_spark.sources.writers import scratch_dir

    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    ).localCheckpoint(eager=False)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    root = scratch_dir("mta_retract_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    partials_path = f"{root}/partials"
    (
        spark.createDataFrame(
            [], "c_user long, click_id long, c_ts timestamp_ntz,"
            " __epoch int"
        )
        .write.mode("overwrite")
        .partitionBy("__epoch")
        .parquet(f"{partials_path}/clicks")
    )
    (
        spark.createDataFrame([], _Q511_DELTA_SCHEMA)
        .write.mode("overwrite")
        .partitionBy("__epoch")
        .parquet(f"{partials_path}/attrib")
    )
    ingest = _make_q511_epoch(spark, partials_path, purchases)
    ingest(clicks.filter(F.col("click_id") % 2 == 0), 0)
    ingest(clicks.filter(F.col("click_id") % 2 == 1), 1)
    return _drain_q511(spark, partials_path)


# ---------------------------------------------------------------------------
# q512 — range-join acceleration via binning (provably ≡ inequality join)
# ---------------------------------------------------------------------------

_Q512_W = 7 * 86400  # join window: purchase within 7 days after click


def _q512_oracle() -> str:
    return f"""
        WITH c AS MATERIALIZED (
            SELECT user_id, event_id AS click_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ec
            FROM events WHERE event_type = 'click'
        ),
        p AS MATERIALIZED (
            SELECT user_id, event_id AS purchase_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ep
            FROM events WHERE event_type = 'purchase'
        ),
        pairs AS (
            SELECT c.user_id, c.click_id, p.purchase_id,
                   p.ep - c.ec AS gap_s
            FROM c JOIN p
              ON c.user_id = p.user_id
             AND p.ep - c.ec BETWEEN 0 AND {_Q512_W}
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT purchase_id) AS BIGINT)
                   AS n_purchases_matched,
               CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s,
               CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
        FROM pairs GROUP BY user_id
    """


@query("q512_range_join_binned", oracle=_q512_oracle())
def q512_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-JOIN acceleration by BINNING — the standard distributed
    technique for interval joins, finally first-class: the naive
    formulation (equi-join on user plus an inequality on time) is
    fine, but a bare inequality join (no equi key) degenerates to a
    nested loop, and even the keyed form piles every user's history
    into one comparison set.  Binning makes the window an EQUI key:
    each purchase belongs to its ⌊epoch/W⌋ bin; a click can only
    match purchases in its own bin or the next, so replicating clicks
    to exactly those two bins and equi-joining on (user, bin) yields
    a candidate set that provably CONTAINS every true pair and at
    most doubles the click side — the exact predicate then filters.
    The oracle is the plain inequality join: hash equality IS the
    correctness proof of the acceleration.  Outputs are exact
    integer-second gap aggregates (no float discipline needed).

    Scale shape: one shuffle on (user, bin) — SortMerge/Hash, never
    BroadcastNestedLoop (plan-asserted); the 2× click replication is
    the entire cost, against the nested-loop blowup it prevents."""
    e = read_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_timestamp("ts").alias("ec"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.unix_timestamp("ts").alias("ep"),
        (F.unix_timestamp("ts") / F.lit(_Q512_W))
        .cast("long")
        .alias("bin"),
    )
    cb = c.select(
        "*", F.explode(
            F.array(
                (F.col("ec") / F.lit(_Q512_W)).cast("long"),
                (F.col("ec") / F.lit(_Q512_W)).cast("long") + 1,
            )
        ).alias("bin"),
    )
    pairs = (
        cb.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (cb.bin == p.bin),
        )
        .withColumn("gap_s", F.col("ep") - F.col("ec"))
        .filter((F.col("gap_s") >= 0) & (F.col("gap_s") <= _Q512_W))
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("purchase_id").cast("long").alias(
            "n_purchases_matched"
        ),
        F.sum("gap_s").cast("long").alias("sum_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# q513 — dyadic exponential-decay scoring (EWMA made hash-checkable)
# ---------------------------------------------------------------------------

_Q513_AS_OF = "2024-02-01"  # deterministic as-of (F6 discipline)
_Q513_MAX_AGE = 40  # shiftleft bound: 2^40 fits long, decays to ~0


def _q513_oracle() -> str:
    return f"""
        WITH p AS (
            SELECT user_id, value,
                   datediff('day', CAST(ts AS DATE),
                            DATE '{_Q513_AS_OF}') AS age_d
            FROM events WHERE event_type = 'purchase'
        ),
        w AS (
            SELECT user_id,
                   CAST(round(value / (CAST(1 AS BIGINT) << age_d), 6)
                        AS DECIMAL(28,6)) AS t_day,
                   CAST(round(value / (CAST(1 AS BIGINT) << (age_d // 7)),
                              6) AS DECIMAL(28,6)) AS t_week
            FROM p WHERE age_d BETWEEN 0 AND {_Q513_MAX_AGE}
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(t_day) AS DOUBLE) AS decay_score_hl1d,
               CAST(SUM(t_week) AS DOUBLE) AS decay_score_hl7d
        FROM w GROUP BY user_id
    """


@query("q513_dyadic_decay_score", oracle=_q513_oracle())
def q513_dyadic_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIAL-DECAY (EWMA-style) scoring made bit-exact across
    engines — the recency weighting every engagement/risk score uses,
    which is normally hopeless to hash-check because ``pow(0.5, k)``
    and float summation both drift.  Two tricks close it: the decay
    base is DYADIC (half-life weights are exact powers of two, built
    by integer ``shiftleft`` — dividing a double by 2^k only moves
    the exponent, so each term is exact), and each term is 6dp-rounded
    into the exact-decimal sum (the q505 per-term discipline).  Scores
    at two half-lives (1 day, 7 days via integer-divided age) from a
    pinned as-of date; ages beyond {_Q513_MAX_AGE} days carry zero
    usable weight and are filtered — which also bounds the shift.

    Scale shape: one scan, one grouped decimal aggregate — the
    weights are row-local arithmetic, no window, no recursion (the
    recursive EWMA form telescopes into exactly this weighted sum)."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "value",
        F.datediff(
            F.lit(_Q513_AS_OF).cast("date"), F.col("ts").cast("date")
        ).alias("age_d"),
    ).filter(
        (F.col("age_d") >= 0) & (F.col("age_d") <= _Q513_MAX_AGE)
    )
    # shiftleft's Python wrapper only takes a literal shift — the SQL
    # form accepts a column
    t_day = F.round(
        F.col("value") / F.expr("shiftleft(CAST(1 AS BIGINT), age_d)"),
        6,
    ).cast("decimal(28,6)")
    t_week = F.round(
        F.col("value")
        / F.expr("shiftleft(CAST(1 AS BIGINT), CAST(age_d DIV 7 AS INT))"),
        6,
    ).cast("decimal(28,6)")
    return p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(t_day).cast("double").alias("decay_score_hl1d"),
        F.sum(t_week).cast("double").alias("decay_score_hl7d"),
    )


# ---------------------------------------------------------------------------
# q514 — ORACLED connected components (transitive closure, bounded slice)
# ---------------------------------------------------------------------------

_Q514_MOD = 97  # planted slice: orders with key % 97 == 0


def _q514_oracle() -> str:
    return f"""
        WITH RECURSIVE li AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem WHERE l_orderkey % {_Q514_MOD} = 0
        ),
        eu AS MATERIALIZED (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
        ),
        nodes AS MATERIALIZED (SELECT DISTINCT pk FROM li),
        reach AS (
            SELECT pk AS src, pk AS node FROM nodes
            UNION
            SELECT r.src, e.dst FROM reach r JOIN eu e ON e.src = r.node
        ),
        comp AS (
            SELECT src AS pk, MIN(node) AS comp_id
            FROM reach GROUP BY src
        )
        SELECT CAST(comp_id AS BIGINT) AS comp_id,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM comp GROUP BY comp_id
    """


@query("q514_connected_components_oracled", oracle=_q514_oracle())
def q514_connected_components_oracled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONNECTED COMPONENTS finally ORACLED — the graph family's CC
    (q169) and PageRank (q213) are rows-only by seeding; here the
    co-ordered-parts graph on a planted order slice is small enough
    for the oracle to take the TRANSITIVE CLOSURE (recursive CTE) and
    define each node's component as its minimum reachable id, while
    the Spark side runs the production algorithm — iterative min-label
    propagation (each round every node takes the min of its own and
    its neighbors' labels; fixed point = components), the
    hash-checkable proof that the Pregel-style loop computes the same
    partition the closure defines.  Output: component id (min part
    key) and size.

    Scale shape: the Spark side is label propagation — per round one
    equi-join edge pass + one grouped min, O(diameter) rounds,
    lineage cut per round (q213's checkpoint discipline); only the
    ORACLE uses the quadratic closure, which is why the slice is
    planted ({_Q514_MOD}-modulus orders)."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % _Q514_MOD == 0)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = li.select("ok", F.col("pk").alias("src"))
    b = li.select(F.col("ok").alias("ok2"), F.col("pk").alias("dst"))
    edges = (
        a.join(b, (a.ok == b.ok2) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = li.select(F.col("pk"), F.col("pk").alias("lbl")).distinct() \
        .localCheckpoint(eager=False)
    for _ in range(32):
        via = (
            edges.join(
                labels.withColumnRenamed("pk", "src").withColumnRenamed(
                    "lbl", "src_lbl"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("pk"))
            .agg(F.min("src_lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(via, "pk", "left")
            .select(
                "pk",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "pk")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:  # pragma: no cover - guards growth of the planted slice
        raise RuntimeError(
            "q514 label propagation did not converge in 32 rounds: "
            "component diameter exceeds the loop bound; raising instead "
            "of hashing a wrong comp_id assignment"
        )
    return labels.groupBy(F.col("lbl").cast("long").alias("comp_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


# ---------------------------------------------------------------------------
# q515 — sliding-window EXACT distinct (7-day active users)
# ---------------------------------------------------------------------------

_Q515_WIN_D = 7


def _q515_oracle() -> str:
    return f"""
        WITH du AS MATERIALIZED (
            SELECT DISTINCT
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS d, user_id
            FROM events
        ),
        days AS MATERIALIZED (SELECT DISTINCT d FROM du),
        dc AS MATERIALIZED (
            SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS d, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        )
        SELECT days.d AS window_end_day,
               (SELECT CAST(COUNT(DISTINCT du.user_id) AS BIGINT)
                FROM du
                WHERE du.d BETWEEN days.d - {_Q515_WIN_D - 1} AND days.d)
                   AS active_users,
               (SELECT CAST(SUM(dc.c) AS BIGINT) FROM dc
                WHERE dc.d BETWEEN days.d - {_Q515_WIN_D - 1} AND days.d)
                   AS window_events
        FROM days
    """


def _q515_fold(du: DataFrame, dc: DataFrame) -> DataFrame:
    """The replicate-to-windows fold shared by the batch lane and its
    streaming twin (q522): du = distinct (d, user_id) grain, dc =
    per-day event counts (d, c)."""
    days = du.select("d").distinct()
    offs = F.array(*[F.lit(i) for i in range(_Q515_WIN_D)])
    exploded = (
        du.select("d", "user_id", F.explode(offs).alias("off"))
        .select((F.col("d") + F.col("off")).alias("w"), "user_id")
        .join(days.withColumnRenamed("d", "w"), "w", "left_semi")
    )
    users = exploded.groupBy("w").agg(
        F.countDistinct("user_id").cast("long").alias("active_users")
    )
    evs = (
        dc.select("d", "c", F.explode(offs).alias("off"))
        .select((F.col("d") + F.col("off")).alias("w"), "c")
        .join(days.withColumnRenamed("d", "w"), "w", "left_semi")
        .groupBy("w")
        .agg(F.sum("c").cast("long").alias("window_events"))
    )
    return users.join(evs, "w").select(
        F.col("w").alias("window_end_day"), "active_users",
        "window_events",
    )


@query("q515_sliding_window_distinct", oracle=_q515_oracle())
def q515_sliding_window_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT sliding-window distinct counts — 7-day active users, the
    metric COUNT(DISTINCT) OVER a RANGE window cannot express
    distributively and naive rewrites recompute per window: dedup to
    (day, user) grain once, then REPLICATE each grain row to the
    {_Q515_WIN_D} windows it belongs to (window id = its end day) and
    count distinct per window — the replicate-to-windows technique
    that turns a sliding distinct into one grouped aggregate, with
    the replication factor bounded by the window length (the same
    bound q512 exploits for range joins).  Window event totals ride
    the same pass from the (day, count) pre-aggregate.  Emitted for
    every OBSERVED day (windows ending on silent days don't appear —
    stated, mirrored in the oracle).

    Scale shape: one dedup shuffle to (day,user), a 7× metadata-grain
    explode, one grouped count-distinct; no per-window rescans."""
    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    # ONE scan: (day, user) grain with per-grain counts; du and dc both
    # derive from the checkpointed grain (at 100 TB the corpus is read
    # once, everything downstream is grain-sized)
    grain = (
        e.groupBy(day.alias("d"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    du = grain.select("d", "user_id")
    dc = grain.groupBy("d").agg(F.sum("c").cast("long").alias("c"))
    return _q515_fold(du, dc)


# ---------------------------------------------------------------------------
# q516 — 2-D skyline (Pareto frontier) without a global sort
# ---------------------------------------------------------------------------


def _q516_oracle() -> str:
    return """
        WITH pts AS MATERIALIZED (
            SELECT o_custkey AS custkey,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0)
                                 AS DECIMAL(28,0))) AS BIGINT)
                       AS spend_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        SELECT p.custkey, p.spend_cents, p.n_orders
        FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.spend_cents >= p.spend_cents
              AND q.n_orders >= p.n_orders
              AND (q.spend_cents > p.spend_cents
                   OR q.n_orders > p.n_orders)
        )
    """


@query("q516_skyline_pareto_front", oracle=_q516_oracle())
def q516_skyline_pareto_front(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) — the multi-objective "best
    customers" query (maximize lifetime spend AND order count; a
    customer is on the frontier iff nobody beats-or-ties both while
    strictly beating one).  The textbook sweep is a global sort with
    a running max — the forbidden global-window shape; the
    :mod:`operators.skyline` kernel gets the identical answer with
    the exact_ntile two-phase architecture (per-d1 max → range
    partitions → literal cross-partition suffix maxes → bounded
    per-partition window).  Dimensions are quantized to exact
    integers (spend in cents via per-order decimal rounding, order
    count) so dominance never compares floats.  The oracle is the
    NOT-EXISTS dominance definition itself — hash equality proves
    the distributed sweep against the spec.

    Scale shape: one grouped aggregate, one shuffle on the spend key,
    driver state ≤ n_parts literals; the join back is unhinted (the
    frontier is usually tiny, worst case O(n))."""
    from databricks_etl_spark.operators.skyline import skyline_2d

    o = read_table(spark, sf_dir, "orders")
    pts = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("decimal(28,0)")
        )
        .cast("long")
        .alias("spend_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    return skyline_2d(pts, "spend_cents", "n_orders")


# ---------------------------------------------------------------------------
# q517 — set-similarity join via PREFIX FILTERING (provably complete)
# ---------------------------------------------------------------------------

_Q517_THETA = 0.9


def _q517_oracle() -> str:
    from databricks_etl_spark.plans.queries_dedup import _TOKS

    return f"""
        WITH d AS MATERIALIZED (
            SELECT doc_id, list_distinct({_TOKS}) AS toks
            FROM documents
        ),
        i AS MATERIALIZED (
            SELECT doc_id, unnest(toks) AS token FROM d
        ),
        sz AS MATERIALIZED (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS set_size
            FROM i GROUP BY 1
        ),
        sh AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS shared
            FROM i a JOIN i b USING (token)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT * FROM (
            SELECT id_a, id_b,
                   round(CAST(shared AS DOUBLE)
                         / (sa.set_size + sb.set_size - shared), 6)
                       AS jaccard
            FROM sh
            JOIN sz sa ON sh.id_a = sa.doc_id
            JOIN sz sb ON sh.id_b = sb.doc_id
        ) WHERE jaccard >= {_Q517_THETA}
    """


@query("q517_prefix_filtered_jaccard_join", oracle=_q517_oracle())
def q517_prefix_filtered_jaccard_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Set-similarity join via PREFIX FILTERING — the database-
    literature acceleration (PPJoin's core) the dedup stack was
    missing between the exact inverted-index join (q43 — complete
    but joins EVERY shared token) and MinHash banding (q45 —
    subquadratic but probabilistic): order every token by ascending
    global document frequency (rarest first, ties by token text);
    two sets with Jaccard ≥ θ MUST share a token within each other's
    first ``|S| − ⌈θ·|S|⌉ + 1`` rarest tokens, so equi-joining only
    those PREFIX postings generates a candidate superset — then one
    verification join computes exact Jaccard on candidates only.
    The oracle is the full inverted-index join with no filter: hash
    equality IS the completeness proof of the prefix bound.

    Scale shape: candidate generation joins the prefix postings
    (rarest tokens → shortest posting lists, the reason the ordering
    is by frequency); verification touches candidate pairs only —
    against the full join's sum-of-squares over every posting list."""
    from math import ceil  # noqa: F401  (doc: ceil via integer arith below)

    from databricks_etl_spark.operators.dedup import token_sets

    d = read_table(spark, sf_dir, "documents")
    i = token_sets(d).localCheckpoint(eager=False)
    # global token order: (df ASC, token ASC), dense rank via the
    # two-phase exact rank (q502's extractor)
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    tf = i.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ntok = tf.count()
    trank = exact_ntile(
        tf, ["df", "token"], max(ntok, 1), out_col="trank"
    ).select("token", "trank")
    ii = i.join(trank, "token")
    sz = ii.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("set_size")
    )
    # prefix length = s - ceil(θ·s) + 1 = s - ((9·s + 9) DIV 10) + 1
    # for θ=0.9 in exact integer arithmetic
    ranked = ii.join(sz, "doc_id").withColumn(
        "tpos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("trank")
        ),
    )
    prefix = ranked.filter(
        F.col("tpos")
        <= F.col("set_size")
        - F.expr("(9 * set_size + 9) DIV 10")
        + 1
    ).select("doc_id", "token")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    # verification: exact shared-token counts on candidates only
    ia = i.select(F.col("doc_id").alias("id_a"), "token")
    ib = i.select(
        F.col("doc_id").alias("__idb"), F.col("token").alias("tb")
    )
    shared = (
        cand.join(ia, "id_a")
        .join(
            ib,
            (F.col("id_b") == F.col("__idb"))
            & (F.col("token") == F.col("tb")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("sza"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("szb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared")
                / (F.col("sza") + F.col("szb") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _Q517_THETA)
    )


# ---------------------------------------------------------------------------
# q518 — correlated vs independent join-cardinality sampling
# ---------------------------------------------------------------------------

_Q518_HEX = "01"  # 1/8 sample: md5 first hex in this set


def _q518_oracle() -> str:
    return f"""
        WITH ck AS MATERIALIZED (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ),
        tru AS (SELECT CAST(SUM(c * c) AS BIGINT) AS t FROM ck),
        corr AS (
            SELECT CAST(8 * SUM(c * c) AS BIGINT) AS est FROM ck
            WHERE strpos('{_Q518_HEX}',
                  substr(md5('cs:' || CAST(k AS VARCHAR)), 1, 1)) > 0
        ),
        sa AS (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem
            WHERE strpos('{_Q518_HEX}', substr(md5('ia:'
                  || CAST(l_orderkey AS VARCHAR) || ':'
                  || CAST(l_linenumber AS VARCHAR)), 1, 1)) > 0
            GROUP BY 1
        ),
        sb AS (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem
            WHERE strpos('{_Q518_HEX}', substr(md5('ib:'
                  || CAST(l_orderkey AS VARCHAR) || ':'
                  || CAST(l_linenumber AS VARCHAR)), 1, 1)) > 0
            GROUP BY 1
        ),
        ind AS (
            SELECT CAST(64 * SUM(sa.c * sb.c) AS BIGINT) AS est
            FROM sa JOIN sb ON sa.k = sb.k
        )
        SELECT tru.t AS true_join_size,
               corr.est AS corr_estimate,
               ind.est AS indep_estimate,
               round(GREATEST(CAST(corr.est AS DOUBLE) / tru.t,
                              CAST(tru.t AS DOUBLE) / GREATEST(corr.est, 1)),
                     6) AS corr_qerror,
               round(GREATEST(CAST(ind.est AS DOUBLE) / tru.t,
                              CAST(tru.t AS DOUBLE) / GREATEST(ind.est, 1)),
                     6) AS indep_qerror,
               GREATEST(CAST(corr.est AS DOUBLE) / tru.t,
                        CAST(tru.t AS DOUBLE) / GREATEST(corr.est, 1))
                   < GREATEST(CAST(ind.est AS DOUBLE) / tru.t,
                              CAST(tru.t AS DOUBLE) / GREATEST(ind.est, 1))
                   AS correlated_wins
        FROM tru, corr, ind
    """


@query("q518_correlated_join_sampling", oracle=_q518_oracle())
def q518_correlated_join_sampling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CORRELATED sampling for join-cardinality estimation — the
    optimizer-stats technique q435's q-error audit motivates: to
    estimate a self-join size (Σ c_k² over the part key) from a 1/8
    sample, sampling BOTH sides by the SAME deterministic key
    predicate (md5 of the join key) keeps whole key-groups together,
    so the sampled join scales back by 1/p; sampling each side
    independently per-row only meets on p² of each group and scales
    by 1/p² — unbiased too, but its variance is catastrophic on
    skewed keys.  Both estimators, their q-errors against the exact
    answer, and the winner verdict in one card — every quantity
    deterministic (md5 sampling), so the whole comparison is
    hash-checked.

    Scale shape: the true size and both estimates are per-key count
    aggregates — one shuffle each on the join key; no join is ever
    materialized (the q457 measured-intermediates discipline)."""
    li = read_table(spark, sf_dir, "lineitem")
    ck = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    tru = ck.agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("t")
    )
    in_hex = lambda pref, col: (  # noqa: E731
        F.instr(
            F.lit(_Q518_HEX),
            F.substring(F.md5(F.concat(F.lit(pref), col)), 1, 1),
        )
        > 0
    )
    corr = ck.filter(in_hex("cs:", F.col("k").cast("string"))).agg(
        (F.lit(8) * F.sum(F.col("c") * F.col("c")))
        .cast("long")
        .alias("est_c")
    )
    rowkey = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    sa = (
        li.filter(in_hex("ia:", rowkey))
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
    )
    sb = (
        li.filter(in_hex("ib:", rowkey))
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    ind = sa.join(sb, "k").agg(
        (F.lit(64) * F.sum(F.col("ca") * F.col("cb")))
        .cast("long")
        .alias("est_i")
    )
    out = (
        tru.crossJoin(F.broadcast(corr))
        .crossJoin(F.broadcast(ind))
    )
    qe = lambda est: F.greatest(  # noqa: E731
        est.cast("double") / F.col("t"),
        F.col("t").cast("double") / F.greatest(est, F.lit(1)),
    )
    return out.select(
        F.col("t").alias("true_join_size"),
        F.col("est_c").alias("corr_estimate"),
        F.col("est_i").alias("indep_estimate"),
        F.round(qe(F.col("est_c")), 6).alias("corr_qerror"),
        F.round(qe(F.col("est_i")), 6).alias("indep_qerror"),
        (qe(F.col("est_c")) < qe(F.col("est_i"))).alias(
            "correlated_wins"
        ),
    )


# ---------------------------------------------------------------------------
# q519 — distribution drift monitor (PSI + exact KS over fixed bins)
# ---------------------------------------------------------------------------

_Q519_BINS = 10
_Q519_LO, _Q519_HI = 0.0, 400.0  # fixed literal edges over purchase value


def _q519_oracle() -> str:
    w = (_Q519_HI - _Q519_LO) / _Q519_BINS
    return f"""
        WITH p AS MATERIALIZED (
            SELECT LEAST(CAST(FLOOR((value - {_Q519_LO}) / {w})
                              AS BIGINT), {_Q519_BINS - 1}) AS bin,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       - (SELECT MIN(datediff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE))) FROM events)
                       AS rel_d
            FROM events WHERE event_type = 'purchase'
        ),
        a AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM p
              WHERE rel_d < 10 GROUP BY 1),
        b AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM p
              WHERE rel_d >= 20 GROUP BY 1),
        grid AS (SELECT i AS bin FROM range(0, {_Q519_BINS}) t(i)),
        na AS (SELECT SUM(c) AS n FROM a),
        nb AS (SELECT SUM(c) AS n FROM b),
        f AS (
            SELECT grid.bin,
                   COALESCE(a.c, 0) AS ca, COALESCE(b.c, 0) AS cb,
                   (COALESCE(a.c, 0) + 1.0)
                       / ((SELECT n FROM na) + {_Q519_BINS}) AS pa,
                   (COALESCE(b.c, 0) + 1.0)
                       / ((SELECT n FROM nb) + {_Q519_BINS}) AS pb
            FROM grid LEFT JOIN a USING (bin) LEFT JOIN b USING (bin)
        ),
        k AS (
            SELECT bin, ca, cb, pa, pb,
                   SUM(ca) OVER (ORDER BY bin) AS cum_a,
                   SUM(cb) OVER (ORDER BY bin) AS cum_b
            FROM f
        )
        SELECT bin, ca AS count_ref, cb AS count_cur,
               round((pa - pb) * ln(pa / pb), 6) AS psi_contrib,
               round(ABS(CAST(cum_a AS DOUBLE) / (SELECT n FROM na)
                         - CAST(cum_b AS DOUBLE) / (SELECT n FROM nb)),
                     6) AS ks_at_bin
        FROM k
    """


@query("q519_drift_monitor_psi_ks", oracle=_q519_oracle())
def q519_drift_monitor_psi_ks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distribution DRIFT monitoring — the ML-observability check
    every feature store runs between a reference and a current
    window: purchase values from the corpus's first 10 days vs its
    last 10, folded into {_Q519_BINS} fixed literal-edge bins, with
    two detectors per bin — the Population Stability Index
    contribution ((p−q)·ln(p/q), Laplace-smoothed so empty bins stay
    finite; ln parity is the q411/q415 9dp discipline) and the exact
    Kolmogorov–Smirnov distance at each bin boundary (pure rational
    arithmetic over cumulative counts — no transcendentals at all).
    The windows are derived from the data's own min day, so the lane
    is scale-factor portable.

    Scale shape: one scan bins both windows (conditional aggregates);
    the cumulative KS runs over the {_Q519_BINS}-row literal grid
    (the q247 bounded-window class)."""
    w = (_Q519_HI - _Q519_LO) / _Q519_BINS
    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.least(
            F.floor((F.col("value") - _Q519_LO) / w).cast("long"),
            F.lit(_Q519_BINS - 1).cast("long"),
        ).alias("bin"),
        day.alias("d"),
    )
    mind = p.agg(F.min("d").alias("m")).localCheckpoint(eager=False)
    p = p.crossJoin(F.broadcast(mind)).withColumn(
        "rel_d", F.col("d") - F.col("m")
    )
    counts = p.groupBy("bin").agg(
        F.sum(F.when(F.col("rel_d") < 10, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("rel_d") >= 20, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    grid = spark.range(_Q519_BINS).select(F.col("id").alias("bin"))
    f = (
        grid.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    tot = f.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    f2 = f.crossJoin(F.broadcast(tot)).select(
        "*",
        ((F.col("ca") + 1.0) / (F.col("na") + _Q519_BINS)).alias("pa"),
        ((F.col("cb") + 1.0) / (F.col("nb") + _Q519_BINS)).alias("pb"),
    )
    # KS cumulative over the literal 10-row grid (bounded window)
    cw = (
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    )
    return f2.select(
        "bin",
        F.col("ca").alias("count_ref"),
        F.col("cb").alias("count_cur"),
        F.round(
            (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")),
            6,
        ).alias("psi_contrib"),
        F.round(
            F.abs(
                F.sum("ca").over(cw).cast("double") / F.col("na")
                - F.sum("cb").over(cw).cast("double") / F.col("nb")
            ),
            6,
        ).alias("ks_at_bin"),
    )


# ---------------------------------------------------------------------------
# q520 — Lorenz curve + Gini coefficient (exact, no global window)
# ---------------------------------------------------------------------------

_Q520_DECILES = 10


def _q520_oracle() -> str:
    return f"""
        WITH s AS MATERIALIZED (
            SELECT o_custkey,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0)
                                 AS DECIMAL(28,0))) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        r AS MATERIALIZED (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, o_custkey) AS rk,
                   (SELECT COUNT(*) FROM s) AS n,
                   (SELECT SUM(cents) FROM s) AS tot
            FROM s
        ),
        dec AS (
            SELECT CAST(ntile({_Q520_DECILES}) OVER (ORDER BY rk)
                        AS BIGINT) AS decile, cents, n, tot
            FROM r
        ),
        curve AS (
            SELECT decile,
                   CAST(SUM(cents) AS BIGINT) AS decile_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   MAX(n) AS n, MAX(tot) AS tot
            FROM dec GROUP BY decile
        ),
        gini AS (
            SELECT round(
                CAST(2 * SUM(CAST(rk AS HUGEINT) * cents) AS DOUBLE)
                    / (MAX(n) * MAX(tot))
                - CAST(MAX(n) + 1 AS DOUBLE) / MAX(n), 6) AS g
            FROM r
        )
        SELECT curve.decile, curve.n_customers, curve.decile_cents,
               round(SUM(CAST(curve.decile_cents AS DOUBLE))
                     OVER (ORDER BY curve.decile) / MAX(curve.tot)
                     OVER (), 6) AS cum_share,
               (SELECT g FROM gini) AS gini
        FROM curve
    """


@query("q520_lorenz_gini", oracle=_q520_oracle())
def q520_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE and GINI coefficient of customer spend — the
    revenue-concentration analytics a marketplace health dashboard
    leads with, computed EXACTLY with no global-ordering window: each
    customer's lifetime spend in integer cents, the global spend rank
    from the two-phase exact rank (exact_ntile k=n — q502's
    extractor), deciles from the closed-form ntile rule on that rank,
    and Gini from the rank identity G = 2·Σ(rk·x)/(n·Σx) − (n+1)/n —
    one aggregate over the ranked relation, exact integer products
    (the rk·x sum runs in decimal so 10⁹ customers × large cents
    cannot overflow), rounded only at the edge.  The Lorenz curve is
    the per-decile cumulative share over a {_Q520_DECILES}-row
    relation (bounded window).

    Scale shape: one grouped aggregate, one range-partitioned rank
    pass, one {_Q520_DECILES}-row fold — against the naive global
    sort + running-sum window."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    o = read_table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("decimal(28,0)")
        )
        .cast("long")
        .alias("cents")
    )
    n = s.count()
    r = exact_ntile(s, ["cents", "o_custkey"], n, out_col="rk")
    tot = r.agg(
        F.sum("cents").cast("long").alias("tot"),
        F.sum(
            (F.col("rk").cast("decimal(28,0)") * F.col("cents")).cast(
                "decimal(38,0)"
            )
        ).alias("rx"),
    ).localCheckpoint(eager=False)
    gini = tot.select(
        F.round(
            (F.lit(2).cast("double") * F.col("rx") / (F.lit(n) * F.col("tot")))
            - (F.lit(n + 1).cast("double") / F.lit(n)),
            6,
        ).alias("gini"),
        "tot",
    )
    q, rem = divmod(n, _Q520_DECILES)
    # integer DIV, not float-divide-then-cast: exact at any rank
    # magnitude (the exact_ntile discipline — no float boundary can
    # misassign a decile)
    decile = F.when(
        F.col("rk") <= rem * (q + 1),
        F.expr(f"(rk - 1) DIV {q + 1}"),
    ).otherwise(
        F.lit(rem)
        + F.expr(f"(rk - {rem * (q + 1)} - 1) DIV {max(q, 1)}")
    ).cast("long") + 1
    curve = r.select(decile.alias("decile"), "cents").groupBy(
        "decile"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("decile_cents"),
    )
    cw = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        curve.crossJoin(F.broadcast(gini))
        .select(
            "decile",
            "n_customers",
            "decile_cents",
            F.round(
                F.sum("decile_cents").over(cw).cast("double")
                / F.col("tot"),
                6,
            ).alias("cum_share"),
            "gini",
        )
    )


# ---------------------------------------------------------------------------
# q521 — differential-privacy budget ledger (composition accounting)
# ---------------------------------------------------------------------------

# the planned release schedule: (release_id, scope, epsilon in millionths)
_Q521_RELEASES = [
    (1, "global", 100_000),
    (2, "by_nation", 200_000),
    (3, "global", 150_000),
    (4, "by_nation", 100_000),
    (5, "global", 50_000),
    (6, "by_nation", 300_000),
]
_Q521_BUDGET = 1_000_000  # ε = 1.0 in millionths


def _q521_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT {rid} AS release_id, '{scope}' AS scope,"
        f" CAST({eps} AS BIGINT) AS eps_micro"
        for rid, scope, eps in _Q521_RELEASES
    )
    return f"""
        WITH rel AS MATERIALIZED ({rows}),
        cov AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(MAX(cnt) AS BIGINT) AS max_partition
            FROM (
                SELECT c_nationkey, COUNT(*) AS cnt
                FROM customer GROUP BY 1
            )
        ),
        tot AS (SELECT SUM(cnt) AS n FROM (
            SELECT COUNT(*) AS cnt FROM customer))
        SELECT rel.release_id, rel.scope, rel.eps_micro,
               CASE WHEN rel.scope = 'global'
                    THEN (SELECT CAST(n AS BIGINT) FROM tot)
                    ELSE (SELECT n_rows * 0 + (SELECT CAST(n AS BIGINT)
                                               FROM tot) FROM cov) END
                   AS rows_covered,
               CASE WHEN rel.scope = 'global'
                    THEN (SELECT CAST(n AS BIGINT) FROM tot)
                    ELSE (SELECT max_partition FROM cov) END
                   AS max_group_rows,
               round(1000000.0 / rel.eps_micro, 6) AS laplace_scale,
               CAST(SUM(rel.eps_micro) OVER (ORDER BY rel.release_id)
                    AS BIGINT) AS eps_spent_micro,
               SUM(rel.eps_micro) OVER (ORDER BY rel.release_id)
                   <= {_Q521_BUDGET} AS within_budget
        FROM rel
    """


@query("q521_dp_budget_ledger", oracle=_q521_oracle())
def q521_dp_budget_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIAL-PRIVACY BUDGET accounting — the ledger a privacy
    platform keeps above q452's noisy releases: a planned release
    schedule (count queries at declared ε), each release priced with
    its Laplace noise scale (1/ε — the exact error a consumer should
    expect), its coverage (all rows either way — a partitioned
    ``by_nation`` histogram still reads everyone; what parallel
    composition buys is that DISJOINT partitions share one ε, which
    is why its cost enters the ledger once, not |nations| times —
    the ``max_group_rows`` column carries the largest partition, the
    sensitivity-relevant quantity), and the running ε spend under
    sequential composition with the within-budget verdict per row.
    Everything is integer micro-ε arithmetic plus one exact rational
    division — fully hash-checked, unlike the noise itself (q452
    handles that with the deterministic inverse-CDF).

    Scale shape: the schedule is a literal grid; the data side is two
    grouped counts over customer.  The running sum is a bounded
    window over {len(_Q521_RELEASES)} literal rows."""
    rel = spark.createDataFrame(
        _Q521_RELEASES, "release_id int, scope string, eps_micro long"
    )
    c = read_table(spark, sf_dir, "customer")
    cov = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    ).agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.max("cnt").cast("long").alias("max_partition"),
    )
    cw = Window.orderBy("release_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return rel.crossJoin(F.broadcast(cov)).select(
        "release_id",
        "scope",
        "eps_micro",
        F.col("n_total").alias("rows_covered"),
        F.when(F.col("scope") == "global", F.col("n_total"))
        .otherwise(F.col("max_partition"))
        .alias("max_group_rows"),
        F.round(F.lit(1000000.0) / F.col("eps_micro"), 6).alias(
            "laplace_scale"
        ),
        F.sum("eps_micro").over(cw).cast("long").alias(
            "eps_spent_micro"
        ),
        (F.sum("eps_micro").over(cw) <= _Q521_BUDGET).alias(
            "within_budget"
        ),
    )


# ---------------------------------------------------------------------------
# q522 — STREAMING sliding-window distinct (twin of q515)
# ---------------------------------------------------------------------------


def _q522_oracle() -> str:
    from databricks_etl_spark.plans.registry import QUERIES

    return QUERIES["q515_sliding_window_distinct"].oracle


@query("q522_streaming_sliding_distinct", oracle=_q522_oracle())
def q522_streaming_sliding_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q515's sliding 7-day active-user metric maintained AT INGEST:
    each micro-batch lands only its (day, user) grain pairs and its
    per-day event-count partial — both ASSOCIATIVE summaries (the
    q494 partial-landing discipline), so the drain dedups the grain
    across epochs (replayed or overlapping batches collapse — the
    idempotence that makes exactly-once cheap here) and sums the
    additive day counts, then runs the SAME replicate-to-windows fold
    as the batch lane.  Drain ≡ q515's oracle: any slicing of the
    event stream produces the identical window card.

    Scale shape: per-epoch state is day×user grain (the dedup bound a
    watermark would enforce in production); the drain fold is q515's."""
    import shutil

    from databricks_etl_spark.sources.writers import scratch_dir

    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    root = scratch_dir("sliding_distinct_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/partials"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(day.alias("d"), "user_id")
            .distinct()
            .withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(f"{path}/grain")
        )
        (
            batch_df.groupBy(day.alias("d"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(f"{path}/daycounts")
        )

    for _ep in range(_STREAM_EPOCHS):
        ingest(e.filter(
            F.col("event_id") % _STREAM_EPOCHS == _ep), _ep)
    du = (
        spark.read.schema("d int, user_id long, __epoch int")
        .parquet(f"{path}/grain")
        .select("d", "user_id")
        .distinct()
    )
    dc = (
        spark.read.schema("d int, c long, __epoch int")
        .parquet(f"{path}/daycounts")
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    return _q515_fold(du, dc)


# ---------------------------------------------------------------------------
# q523 — exact weighted quantiles (two-phase weighted rank)
# ---------------------------------------------------------------------------

_Q523_QS = [(1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75")]


def _q523_oracle() -> str:
    per_q = " UNION ALL ".join(
        f"""
        SELECT '{lbl}' AS quantile,
               (SELECT MIN(v) FROM cum
                WHERE c >= (({num} * (SELECT w FROM tot)) + {den} - 1)
                          // {den}) AS price,
               CAST((({num} * (SELECT w FROM tot)) + {den} - 1) // {den}
                    AS BIGINT) AS target_weight
        """
        for num, den, lbl in _Q523_QS
    )
    return f"""
        WITH li AS MATERIALIZED (
            SELECT l_extendedprice AS v,
                   CAST(l_quantity AS BIGINT) AS w,
                   l_orderkey, l_linenumber
            FROM lineitem
        ),
        tot AS (SELECT SUM(w) AS w FROM li),
        cum AS MATERIALIZED (
            SELECT v, SUM(w) OVER (
                ORDER BY v, l_orderkey, l_linenumber
                ROWS UNBOUNDED PRECEDING) AS c
            FROM li
        )
        {per_q}
    """


@query("q523_weighted_quantiles", oracle=_q523_oracle(), bench=True)
def q523_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT WEIGHTED QUANTILES — the statistic percentile_approx
    cannot give you and unweighted exact_ntile cannot either: the
    price below which a quarter/half/three-quarters of shipped
    QUANTITY (not of line rows) falls.  The q-th weighted quantile is
    the first row in the (price, orderkey, linenumber) total order
    whose cumulative weight reaches ⌈q·W⌉ — cumulative weights from
    the :func:`exact_cumsum` two-phase kernel (range partitions +
    literal prefix offsets — no global window), targets in exact
    integer arithmetic (quantities are integral), and the extractor
    is a min-aggregate over the threshold filter.  The oracle states
    the definition with a SQL running-sum window; hash equality
    proves the distributed kernel against it.

    Scale shape: one range-partitioned pass for the cumulative
    weights (the one materialization an exact rank costs — the
    exact_ntile tradeoff), then ONE fused conditional min-aggregate
    extracting all three quantiles in a single scan (W comes free
    from the kernel's collected partition sums — no extra total job,
    no checkpoint of the windowed relation)."""
    from databricks_etl_spark.operators.quantile_bucket import exact_cumsum

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    cum, total = exact_cumsum(
        li, ["v", "l_orderkey", "l_linenumber"], "w", out_col="c",
        with_total=True,
    )
    targets = [
        (lbl, (num * total + den - 1) // den) for num, den, lbl in _Q523_QS
    ]
    fused = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("c") >= F.lit(str(t)).cast("decimal(38,0)"),
                    F.col("v"),
                )
            ).alias(lbl)
            for lbl, t in targets
        ]
    )
    return fused.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lbl).alias("quantile"),
                        F.col(lbl).alias("price"),
                        F.lit(t).cast("long").alias("target_weight"),
                    )
                    for lbl, t in targets
                ]
            )
        ).alias("r")
    ).select("r.*")


# ---------------------------------------------------------------------------
# q524 — multi-step funnel with per-step conversion windows
# ---------------------------------------------------------------------------

_Q524_STEP_S = 7 * 86400  # each step must follow within 7 days


def _q524_oracle() -> str:
    return f"""
        WITH s AS MATERIALIZED (
            SELECT user_id,
                   MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t0
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        c AS MATERIALIZED (
            SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t1
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s.t0
              AND CAST(floor(epoch(e.ts)) AS BIGINT) - s.t0
                  <= {_Q524_STEP_S}
            GROUP BY 1
        ),
        p AS MATERIALIZED (
            SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t2
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= c.t1
              AND CAST(floor(epoch(e.ts)) AS BIGINT) - c.t1
                  <= {_Q524_STEP_S}
            GROUP BY 1
        )
        SELECT 1 AS step, 'signup' AS stage,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_users
        UNION ALL
        SELECT 2, 'click_within_7d',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
        UNION ALL
        SELECT 3, 'purchase_within_7d',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM p)
    """


@query("q524_multistep_funnel_windows", oracle=_q524_oracle())
def q524_multistep_funnel_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-STEP funnel with PER-STEP conversion windows — q90's
    funnel hardened to the product-analytics contract: each stage
    must occur AFTER the previous stage's first qualifying event and
    within its own 7-day window (first signup → first in-window
    click → first in-window purchase; "first" pinned by min-epoch so
    the anchor chain is deterministic).  Each step is a forward as-of
    join with tolerance — the dual of q67's backward last-click —
    built as equi-join on user + min-aggregate (never a per-user
    sort).  Floored epoch arithmetic on both engines.

    Scale shape: two chained (join on user → grouped min) steps over
    pre-filtered event types; each is one co-shuffle on user_id —
    at any scale the funnel is a fixed number of keyed passes."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ep")
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ep").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(
            (F.col("ep") >= F.col("t0"))
            & (F.col("ep") - F.col("t0") <= _Q524_STEP_S)
        )
        .groupBy("user_id")
        .agg(F.min("ep").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ep") >= F.col("t1"))
            & (F.col("ep") - F.col("t1") <= _Q524_STEP_S)
        )
        .groupBy("user_id")
        .agg(F.min("ep").alias("t2"))
    )

    def stage(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(step).alias("step"), F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(s, 1, "signup")
        .unionByName(stage(c, 2, "click_within_7d"))
        .unionByName(stage(p, 3, "purchase_within_7d"))
    )


# ---------------------------------------------------------------------------
# q525 — bitemporal point-in-time lookup (valid time × transaction time)
# ---------------------------------------------------------------------------

_Q525_PROBES = ["2024-01-10 00:00:00", "2024-01-20 00:00:00",
                "2024-01-30 00:00:00"]


def _q525_oracle() -> str:
    probes = " UNION ALL ".join(
        f"SELECT TIMESTAMP '{t}' AS probe_t" for t in _Q525_PROBES
    )
    return f"""
        WITH vers AS MATERIALIZED (
            SELECT user_id, ts AS valid_from, value AS acct_value,
                   event_id,
                   CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END
                       AS arrived_in
            FROM events WHERE event_type = 'purchase'
        ),
        sysv AS (SELECT 1 AS sys_version UNION ALL SELECT 2),
        probes AS MATERIALIZED ({probes}),
        visible AS (
            SELECT s.sys_version, p.probe_t, v.user_id,
                   v.valid_from, v.acct_value, v.event_id
            FROM sysv s
            JOIN vers v ON v.arrived_in <= s.sys_version
            CROSS JOIN probes p
            WHERE v.valid_from <= p.probe_t
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY sys_version, probe_t, user_id
                ORDER BY valid_from DESC, event_id DESC) AS rn
            FROM visible
        )
        SELECT sys_version, probe_t, user_id, acct_value
        FROM ranked WHERE rn = 1
    """


@query("q525_bitemporal_lookup", oracle=_q525_oracle())
def q525_bitemporal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL point-in-time lookup — VALID time (when a value was
    effective in the world) crossed with TRANSACTION time (when the
    system learned it): "what did the system, as of commit version V,
    believe user U's account value was at wall-clock time T?"  The
    valid-time axis is q498's purchase-version chain; the transaction
    axis plants late arrivals by event-id parity (odd versions land
    in system version 2 — q501's late-data setup).  For each (system
    version, probe time, user): the latest visible version at or
    before the probe, deterministic via (valid_from, event_id)
    tiebreak.  Where V1 and V2 answers differ, late data rewrote
    history — exactly what time-travel debugging (q443) needs to see;
    non-empty difference pinned by test.

    Scale shape: versions join the literal probe grid (broadcast) and
    reduce per (version, probe, user) — a partitioned window over
    bounded per-user version chains; the as-of is keyed, never
    sorted globally."""
    e = read_table(spark, sf_dir, "events")
    vers = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.col("value").alias("acct_value"),
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(2))
        .alias("arrived_in"),
    )
    sysv = spark.createDataFrame([(1,), (2,)], "sys_version int")
    probes = spark.createDataFrame(
        [(t,) for t in _Q525_PROBES], "p string"
    ).select(F.col("p").cast("timestamp_ntz").alias("probe_t"))
    visible = (
        vers.join(
            F.broadcast(sysv),
            F.col("arrived_in") <= F.col("sys_version"),
        )
        .crossJoin(F.broadcast(probes))
        .filter(F.col("valid_from") <= F.col("probe_t"))
    )
    w = Window.partitionBy("sys_version", "probe_t", "user_id").orderBy(
        F.desc("valid_from"), F.desc("event_id")
    )
    return (
        visible.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("sys_version", "probe_t", "user_id", "acct_value")
    )


# ---------------------------------------------------------------------------
# q526 — event-sequence transition matrix (first-order Markov)
# ---------------------------------------------------------------------------


def _q526_oracle() -> str:
    return """
        WITH seq AS MATERIALIZED (
            SELECT user_id, event_type, ts, event_id,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        trans AS (
            SELECT event_type AS from_type, next_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        outdeg AS (
            SELECT from_type, SUM(n) AS tot FROM trans GROUP BY 1
        )
        SELECT t.from_type, t.to_type, t.n AS n_transitions,
               round(CAST(t.n AS DOUBLE) / o.tot, 6) AS p_transition
        FROM trans t JOIN outdeg o USING (from_type)
    """


@query("q526_markov_transition_matrix", oracle=_q526_oracle())
def q526_markov_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order MARKOV transition matrix over per-user event
    sequences — the behavioral model product analytics fits before
    anything fancier: consecutive event pairs per user (ordered by
    timestamp with the event-id tiebreak — the W1 lag discipline),
    transition counts, and row-normalized probabilities (exact
    rational, rounded at the edge).  The |types|² matrix is the input
    to next-event prediction, anomaly scoring (improbable paths), and
    the funnel-design question "where do users actually go after a
    click?" that q524's fixed funnel presupposes an answer to.

    Scale shape: one partitioned lag window per user (bounded by
    per-user history), one grouped count to a |types|²-row matrix —
    the classic sessionize-then-aggregate shape of q80."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    outdeg = trans.groupBy("from_type").agg(
        F.sum("n_transitions").alias("tot")
    )
    return trans.join(outdeg, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("tot"), 6).alias(
            "p_transition"
        ),
    )


# ---------------------------------------------------------------------------
# q527 — grouped OLS trend (closed-form regression, one fused pass)
# ---------------------------------------------------------------------------


def _q527_oracle() -> str:
    return """
        WITH d AS MATERIALIZED (
            SELECT c.c_nationkey AS nation,
                   CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o.o_orderdate AS DATE)) AS BIGINT)
                       AS x,
                   CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        s AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                   SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                   SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                   SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
            FROM d GROUP BY nation
        )
        SELECT nation, n,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx), 6)
                   AS slope_cents_per_day,
               round((CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE) * sxy
                          - CAST(sx AS DOUBLE) * sy)
                         / (CAST(n AS DOUBLE) * sxx
                            - CAST(sx AS DOUBLE) * sx)) * sx)
                     / n, 6) AS intercept_cents
        FROM s WHERE n >= 2
    """


@query("q527_grouped_ols_trend", oracle=_q527_oracle())
def q527_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED LINEAR REGRESSION in ONE fused pass — the per-segment
    trend line (is order value rising per nation, and how fast?) via
    the closed-form OLS solution: slope = (n·Σxy − Σx·Σy)/(n·Σx² −
    (Σx)²), intercept = (Σy − slope·Σx)/n.  All five sufficient
    statistics accumulate as exact DECIMAL(38,0) sums of integer
    products (days since epoch × price in cents — products bounded by
    ~10⁴·10⁹, the decimal absorbs any row order), so both engines
    reach bit-identical doubles after a single division at the edge.
    No ML library, no iteration, no sampling — regression as a
    grouped aggregate, which is what makes it runnable per-segment
    across a 100 TB fact table in one shuffle.

    Scale shape: one join (orders→customer, AQE-broadcast at bench
    scale), one grouped aggregate carrying five decimal sums; output
    is |nations| rows."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    d = o.join(c, "o_custkey").select(
        "nation",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("long")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    s = d.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    ).filter(F.col("n") >= 2)
    slope = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return s.select(
        "nation",
        "n",
        F.round(slope, 6).alias("slope_cents_per_day"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"),
            6,
        ).alias("intercept_cents"),
    )


# ---------------------------------------------------------------------------
# Round-13b lanes (q528–q575): registered defer=True during round 13
# (window was exactly full); flags cleared at round-14 start per the
# rollover procedure — these now fill the round-14 driver window.
# ---------------------------------------------------------------------------

# q528 — result-cache invalidation matrix --------------------------------

# cached-query registry: (query_id, tables, columns, partition filter on
# orders' order-year; -1 = reads every partition)
_Q528_CACHE = [
    (1, "orders", "o_totalprice,o_orderdate", -1),
    (2, "orders", "o_orderstatus", 1995),
    (3, "orders", "o_totalprice", 1998),
    (4, "customer", "c_acctbal", -1),
    (5, "orders", "o_orderpriority,o_orderdate", 1996),
    (6, "lineitem", "l_quantity", -1),
]
# the arriving delta: an update batch touching orders rows with
# orderkey % 13 == 0, changing ONLY o_totalprice
_Q528_DELTA_COLS = "o_totalprice"


def _q528_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT {qid} AS query_id, '{tbl}' AS q_table,"
        f" '{cols}' AS q_columns, CAST({part} AS BIGINT) AS q_partition"
        for qid, tbl, cols, part in _Q528_CACHE
    )
    return f"""
        WITH reg AS MATERIALIZED ({rows}),
        delta AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT year(CAST(o_orderdate AS DATE)))
                        AS BIGINT) AS n_years
            FROM orders WHERE o_orderkey % 13 = 0
        ),
        dyears AS (
            SELECT DISTINCT CAST(year(CAST(o_orderdate AS DATE))
                                 AS BIGINT) AS y
            FROM orders WHERE o_orderkey % 13 = 0
        )
        SELECT reg.query_id, reg.q_table,
               (SELECT n_rows FROM delta) AS delta_rows,
               reg.q_table = 'orders' AS table_overlap,
               reg.q_table = 'orders'
                   AND strpos(reg.q_columns, '{_Q528_DELTA_COLS}') > 0
                   AS column_overlap,
               reg.q_table = 'orders'
                   AND (reg.q_partition = -1 OR reg.q_partition IN
                        (SELECT y FROM dyears)) AS partition_overlap,
               NOT (reg.q_table = 'orders'
                    AND strpos(reg.q_columns, '{_Q528_DELTA_COLS}') > 0
                    AND (reg.q_partition = -1 OR reg.q_partition IN
                         (SELECT y FROM dyears))) AS cache_still_valid
        FROM reg
    """


@query("q528_result_cache_invalidation", oracle=_q528_oracle())
def q528_result_cache_invalidation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RESULT-CACHE invalidation — the serving-layer decision above
    q476's cache admission: a registry of cached query footprints
    (table, column set, partition scope) is checked against an
    arriving update delta at THREE granularities — table overlap,
    column overlap (the delta only rewrites o_totalprice, so a
    status-only query survives), and partition overlap (the delta's
    actual order-years from the data, so a 1995-scoped cache survives
    a delta that only touched other years if it did).  A cache entry
    survives unless all three overlap — the fine-grained invalidation
    that makes result caches usable under continuous ingest.

    Scale shape: the registry is a literal grid; the delta summary is
    one filtered aggregate + a distinct-years relation (bounded by
    |years|) — invalidation costs metadata, never a table scan."""
    reg = spark.createDataFrame(
        _Q528_CACHE,
        "query_id int, q_table string, q_columns string, q_partition long",
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 13 == 0
    )
    year = F.year(F.col("o_orderdate").cast("date")).cast("long")
    delta = o.agg(F.count(F.lit(1)).cast("long").alias("delta_rows"))
    dyears = o.select(year.alias("y")).distinct().agg(
        F.collect_set("y").alias("ys")
    )
    tbl_ov = F.col("q_table") == "orders"
    col_ov = tbl_ov & (
        F.instr(F.col("q_columns"), _Q528_DELTA_COLS) > 0
    )
    part_ov = tbl_ov & (
        (F.col("q_partition") == -1)
        | F.array_contains(F.col("ys"), F.col("q_partition"))
    )
    return (
        reg.crossJoin(F.broadcast(delta))
        .crossJoin(F.broadcast(dyears))
        .select(
            "query_id",
            "q_table",
            "delta_rows",
            tbl_ov.alias("table_overlap"),
            col_ov.alias("column_overlap"),
            part_ov.alias("partition_overlap"),
            (~(col_ov & part_ov)).alias("cache_still_valid"),
        )
    )


# q529 — near-dup cluster canonicalization (transitive closure) ----------

_Q529_THETA = 0.9
_Q529_SLICE = 150  # doc_id bound: the oracle takes a transitive closure


def _q529_pairs_cte() -> str:
    from databricks_etl_spark.plans.queries_dedup import _TOKS

    return f"""
        d AS MATERIALIZED (
            SELECT doc_id, list_distinct({_TOKS}) AS toks
            FROM documents WHERE doc_id < {_Q529_SLICE}
        ),
        i AS MATERIALIZED (
            SELECT doc_id, unnest(toks) AS token FROM d
        ),
        sz AS MATERIALIZED (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS s FROM i GROUP BY 1
        ),
        sh AS MATERIALIZED (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS shared
            FROM i a JOIN i b USING (token)
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        ),
        pairs AS MATERIALIZED (
            SELECT id_a, id_b FROM sh
            JOIN sz sa ON sh.id_a = sa.doc_id
            JOIN sz sb ON sh.id_b = sb.doc_id
            WHERE CAST(shared AS DOUBLE) / (sa.s + sb.s - shared)
                  >= {_Q529_THETA}
        ),
        eu AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs
        ),
        nodes AS MATERIALIZED (SELECT doc_id FROM d)
    """


def _q529_oracle() -> str:
    return f"""
        WITH RECURSIVE {_q529_pairs_cte()},
        reach AS (
            SELECT doc_id AS src, doc_id AS node FROM nodes
            UNION
            SELECT r.src, e.dst FROM reach r JOIN eu e ON e.src = r.node
        ),
        comp AS (
            SELECT src AS doc_id, MIN(node) AS canonical
            FROM reach GROUP BY src
        )
        SELECT CAST(canonical AS BIGINT) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS cluster_size,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_duplicates_removed
        FROM comp GROUP BY canonical
        HAVING COUNT(*) > 1
    """


@query("q529_dedup_cluster_canonicalization", oracle=_q529_oracle())
def q529_dedup_cluster_canonicalization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup CLUSTER canonicalization — the step between pair
    generation (q517) and actually deleting documents: similar-pair
    edges at θ={_Q529_THETA} form clusters by TRANSITIVE closure (A~B,
    B~C ⇒ one cluster even when A,C are dissimilar — the chaining
    semantics every production dedup uses, q123's clusters now fully
    ORACLED via the q514 recursive-closure discipline), the survivor
    is the minimum doc id, and the report prices each multi-doc
    cluster's removable duplicates.  Spark runs min-label propagation
    over the pair edges; the oracle takes the closure on the planted
    slice.

    Scale shape: pair edges from the inverted-index join; label
    propagation is O(cluster diameter) keyed passes (near-dup
    clusters are shallow); the quadratic closure exists only in the
    oracle."""
    from databricks_etl_spark.operators.dedup import token_sets

    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _Q529_SLICE
    )
    i = token_sets(d).localCheckpoint(eager=False)
    sz = i.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    ia = i.select(F.col("doc_id").alias("id_a"), "token")
    ib = i.select(F.col("doc_id").alias("id_b"), "token")
    sh = (
        ia.join(ib, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    pairs = (
        sh.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.col("shared")
            / (F.col("sa") + F.col("sb") - F.col("shared"))
            >= _Q529_THETA
        )
        .select("id_a", "id_b")
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = d.select(
        F.col("doc_id").alias("pk"), F.col("doc_id").alias("lbl")
    ).localCheckpoint(eager=False)
    for _ in range(32):
        via = (
            edges.join(
                labels.withColumnRenamed("pk", "src").withColumnRenamed(
                    "lbl", "src_lbl"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("pk"))
            .agg(F.min("src_lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(via, "pk", "left")
            .select(
                "pk",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "pk")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:  # pragma: no cover - guards growth of the near-dup graph
        raise RuntimeError(
            "q529 label propagation did not converge in 32 rounds: "
            "cluster diameter exceeds the loop bound; raising instead "
            "of hashing a wrong canonical_id assignment"
        )
    return (
        labels.groupBy(F.col("lbl").cast("long").alias("canonical_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
        .filter(F.col("cluster_size") > 1)
        .select(
            "canonical_id",
            "cluster_size",
            (F.col("cluster_size") - 1).alias("n_duplicates_removed"),
        )
    )


# q530 — day-of-week seasonal index --------------------------------------


def _q530_oracle() -> str:
    return """
        WITH d AS MATERIALIZED (
            SELECT dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,  -- DuckDB 0=Sun -> Spark 1=Sun
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders
        ),
        per AS (
            SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(CAST(cents AS DECIMAL(38,0))) AS rev
            FROM d GROUP BY dow
        ),
        tot AS (SELECT SUM(n_orders) AS n, SUM(rev) AS r FROM per)
        SELECT CAST(per.dow AS BIGINT) AS dow, per.n_orders,
               CAST(per.rev AS BIGINT) AS revenue_cents,
               round((CAST(per.rev AS DOUBLE) / per.n_orders)
                     / (CAST(tot.r AS DOUBLE) / tot.n), 6)
                   AS seasonal_index
        FROM per, tot
    """


@query("q530_seasonal_dow_index", oracle=_q530_oracle())
def q530_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-OF-WEEK seasonal index — the first decomposition a demand
    forecast makes: mean order value per weekday relative to the
    global mean (index > 1 = that weekday runs hot).  Exact decimal
    revenue sums; one rational division per side at the edge.  The
    deterministic base for q531's anomaly flags — an 'anomalous
    Monday' only means something against the Monday index.

    Scale shape: one scan, one 7-row grouped aggregate, one 1-row
    global combine."""
    o = read_table(spark, sf_dir, "orders")
    d = o.select(
        F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    per = d.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("rev"),
    )
    tot = per.agg(
        F.sum("n_orders").alias("n"), F.sum("rev").alias("r")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("long").alias("dow"),
        "n_orders",
        F.col("rev").cast("long").alias("revenue_cents"),
        F.round(
            (F.col("rev").cast("double") / F.col("n_orders"))
            / (F.col("r").cast("double") / F.col("n")),
            6,
        ).alias("seasonal_index"),
    )


# q531 — robust anomaly detection (median / MAD, exact) ------------------

_Q531_K = 3  # flag |x − median| > K · MAD


def _q531_oracle() -> str:
    return f"""
        WITH daily AS MATERIALIZED (
            SELECT datediff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS d,
                   CAST(SUM(CAST(round(value * 100, 0)
                                 AS DECIMAL(28,0))) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        med AS (
            SELECT cents AS m FROM (
                SELECT cents, row_number() OVER (ORDER BY cents, d) AS rk,
                       COUNT(*) OVER () AS n
                FROM daily
            ) WHERE rk = (n + 1) // 2
        ),
        dev AS MATERIALIZED (
            SELECT d, cents, ABS(cents - (SELECT m FROM med)) AS adev
            FROM daily
        ),
        mad AS (
            SELECT adev AS mad FROM (
                SELECT adev, row_number() OVER (ORDER BY adev, d) AS rk,
                       COUNT(*) OVER () AS n
                FROM dev
            ) WHERE rk = (n + 1) // 2
        )
        SELECT d AS day, cents AS revenue_cents,
               (SELECT m FROM med) AS median_cents,
               (SELECT mad FROM mad) AS mad_cents,
               ABS(cents - (SELECT m FROM med))
                   > {_Q531_K} * (SELECT mad FROM mad) AS is_anomaly
        FROM dev
    """


@query("q531_robust_anomaly_mad", oracle=_q531_oracle())
def q531_robust_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST anomaly detection — median/MAD instead of mean/stddev,
    so one huge outlier day cannot mask itself by inflating the
    threshold (the breakdown-point argument for every production
    monitor): daily revenue in exact cents, the exact MEDIAN via the
    distributed rank (even-count median = lower-middle by both
    engines' integer median on BIGINT — DuckDB's median interpolates
    halves, so cents keep it integral-safe at odd counts; the even
    case yields .5 which floors identically under the BIGINT cast),
    absolute deviations, the MAD (median of deviations — same
    kernel), and the K·MAD flag in pure integer arithmetic.

    Scale shape: day-grain relation (bounded, q475 metadata class)
    after one scan+aggregate; both medians are rank extractions."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    e = read_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("decimal(28,0)")
            )
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )

    def exact_median_long(df: DataFrame, col: str, key: str) -> int:
        # LOWER median (rank ⌈n/2⌉ in the (value, key) total order) —
        # an actual element, so both engines state the same integer
        # with no interpolation/rounding question on even counts
        n = df.count()
        r = exact_ntile(df, [col, key], n, out_col="rk")
        return int(
            r.filter(F.col("rk") == (n + 1) // 2).collect()[0][col]
        )

    m = exact_median_long(daily, "cents", "d")
    dev = daily.select(
        "d", "cents", F.abs(F.col("cents") - F.lit(m)).alias("adev")
    ).localCheckpoint(eager=False)
    mad = exact_median_long(dev, "adev", "d")
    return dev.select(
        F.col("d").cast("long").alias("day"),
        F.col("cents").alias("revenue_cents"),
        F.lit(m).cast("long").alias("median_cents"),
        F.lit(mad).cast("long").alias("mad_cents"),
        (F.col("adev") > _Q531_K * mad).alias("is_anomaly"),
    )


# q532 — matryoshka truncation audit (recall vs dimension prefix) --------

_Q532_DIMS = [64, 32, 16, 8]
_Q532_K = 10


def _q532_dot_pfx(a: str, b: str, d: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {d} + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _q532_oracle() -> str:
    per_dim = []
    for d in _Q532_DIMS:
        per_dim.append(f"""
            SELECT {d} AS dim, qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY
                       round({_q532_dot_pfx('qe', 'ce', d)}
                             / (sqrt({_q532_dot_pfx('qe', 'qe', d)})
                                * sqrt({_q532_dot_pfx('ce', 'ce', d)})),
                             6) DESC, nid) AS rk
            FROM q, c WHERE qid <> nid""")
    return f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id AS qid, embedding AS qe FROM embeddings
            WHERE vec_id < 5
        ),
        c AS MATERIALIZED (
            SELECT vec_id AS nid, embedding AS ce FROM embeddings
        ),
        ranked AS MATERIALIZED ({" UNION ALL ".join(per_dim)}),
        tops AS MATERIALIZED (
            SELECT dim, qid, nid FROM ranked WHERE rk <= {_Q532_K}
        ),
        hits AS (
            -- LEFT join: a query with ZERO full-width hits must stay
            -- in the denominator (h = 0), not vanish from the mean
            SELECT t.dim, t.qid,
                   CAST(SUM(CASE WHEN f.nid IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS h
            FROM tops t LEFT JOIN tops f
              ON f.dim = 64 AND f.qid = t.qid AND f.nid = t.nid
            GROUP BY t.dim, t.qid
        )
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_queries,
               round(CAST(SUM(h) AS DOUBLE)
                     / (COUNT(*) * {_Q532_K}), 6) AS mean_recall,
               round(CAST(MIN(h) AS DOUBLE) / {_Q532_K}, 6)
                   AS min_recall
        FROM hits GROUP BY dim
    """


@query("q532_matryoshka_truncation_audit", oracle=_q532_oracle())
def q532_matryoshka_truncation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MATRYOSHKA truncation audit — the dimension-vs-recall tradeoff
    behind prefix-truncatable embeddings (serve 16 of 64 dims and pay
    4× less memory — at what recall?): exact cosine top-{_Q532_K}
    computed on each PREFIX length, compared against the full-width
    truth, mean and min recall per dimension.  Everything exact (the
    q47 fold, per prefix), so the whole tradeoff curve is
    hash-checked — this is the evidence a serving team needs before
    flipping the truncated index on, and the deterministic
    counterpart of q412's JL-projection distortion audit (random
    projection vs prefix truncation, the two dimensionality-reduction
    families, now both audited).

    Scale shape: one scored pass per prefix width over the corpus ×
    broadcast queries (the q47 shape, |dims| times); at production
    scale each pass reads the SAME scan (prefix slicing is free
    column arithmetic, no re-materialization)."""
    from databricks_etl_spark.operators.similarity import dot, norm

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("ce")
    )
    tops = None
    for d in _Q532_DIMS:
        qd = q.select("qid", F.slice("qe", 1, d).alias("qv"))
        cd = c.select("nid", F.slice("ce", 1, d).alias("cv"))
        scored = (
            cd.crossJoin(F.broadcast(qd.select(
                "qid", "qv", norm(F.col("qv")).alias("qn"))))
            .filter(F.col("nid") != F.col("qid"))
            .select(
                "qid",
                "nid",
                F.round(
                    dot(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * norm(F.col("cv"))),
                    6,
                ).alias("sim"),
            )
        )
        w = Window.partitionBy("qid").orderBy(
            F.desc("sim"), F.asc("nid")
        )
        t = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _Q532_K)
            .select(F.lit(d).alias("dim"), "qid", "nid")
        )
        tops = t if tops is None else tops.unionByName(t)
    tops = tops.localCheckpoint(eager=False)
    full = tops.filter(F.col("dim") == 64).select(
        "qid", "nid", F.lit(1).alias("__hit")
    )
    hits = (
        tops.join(F.broadcast(full), ["qid", "nid"], "left")
        .groupBy("dim", "qid")
        .agg(F.sum(F.coalesce("__hit", F.lit(0))).alias("h"))
    )
    return hits.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(
            F.sum("h").cast("double") / (F.count(F.lit(1)) * _Q532_K), 6
        ).alias("mean_recall"),
        F.round(F.min("h").cast("double") / _Q532_K, 6).alias(
            "min_recall"
        ),
    )


# q533 — class-balanced reweighting plan ---------------------------------

_Q533_BETA_NUM, _Q533_BETA_DEN = 999, 1000  # effective-number beta


def _q533_oracle() -> str:
    return f"""
        WITH per AS MATERIALIZED (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang
        ),
        tot AS (SELECT SUM(n) AS t, COUNT(*) AS k FROM per)
        SELECT per.lang, per.n,
               round(CAST((SELECT t FROM tot) AS DOUBLE)
                     / ((SELECT k FROM tot) * per.n), 6)
                   AS inv_freq_weight,
               round((1.0 - power({_Q533_BETA_NUM}.0 / {_Q533_BETA_DEN},
                                  per.n))
                     / (1.0 - {_Q533_BETA_NUM}.0 / {_Q533_BETA_DEN}), 6)
                   AS effective_n,
               per.n * (SELECT k FROM tot) >= (SELECT t FROM tot)
                   AS is_majority
        FROM per
    """


@query("q533_class_reweighting_plan", oracle=_q533_oracle())
def q533_class_reweighting_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CLASS-BALANCED reweighting — the loss-weight plan an imbalanced
    training run applies per class (language): inverse-frequency
    weights (total/(k·n) — mean weight exactly 1 by construction),
    the 'effective number of samples' (1−βⁿ)/(1−β) with rational β
    (the Cui et al. correction for diminishing returns of duplicated
    data — floating power of an exact rational, 6dp-rounded; both
    engines' pow agree at this precision, the q415 ln discipline),
    and the majority-class flag in exact integer cross-multiplication
    (n·k ≥ total, never a float compare).

    Scale shape: one grouped count, |classes| rows, one 1-row
    combine."""
    d = read_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per.agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("k")
    )
    beta = _Q533_BETA_NUM / _Q533_BETA_DEN
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        F.round(
            F.col("t").cast("double") / (F.col("k") * F.col("n")), 6
        ).alias("inv_freq_weight"),
        F.round(
            (F.lit(1.0) - F.pow(F.lit(beta), F.col("n")))
            / (F.lit(1.0) - F.lit(beta)),
            6,
        ).alias("effective_n"),
        (F.col("n") * F.col("k") >= F.col("t")).alias("is_majority"),
    )


# q534 — STREAMING drift monitor (twin of q519) --------------------------


def _q534_oracle() -> str:
    from databricks_etl_spark.plans.registry import QUERIES

    return QUERIES["q519_drift_monitor_psi_ks"].oracle


@query("q534_streaming_drift_monitor", oracle=_q534_oracle())
def q534_streaming_drift_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q519's PSI/KS drift card maintained AT INGEST: each micro-batch
    lands only its per-(bin, rel-day-window) COUNT partials —
    additive, so the drain sums them and finishes with q519's exact
    smoothing/ln/KS arithmetic.  Drain ≡ q519's oracle under any
    stream slicing; the observability surface a feature platform
    actually runs (drift re-priced each epoch without rescanning
    history).

    Scale shape: per-epoch state is {_Q519_BINS}×2 counters — the
    associative-partial class (q474/q494)."""
    import shutil

    from databricks_etl_spark.sources.writers import scratch_dir

    w = (_Q519_HI - _Q519_LO) / _Q519_BINS
    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    p_all = e.filter(F.col("event_type") == "purchase").select(
        F.least(
            F.floor((F.col("value") - _Q519_LO) / w).cast("long"),
            F.lit(_Q519_BINS - 1).cast("long"),
        ).alias("bin"),
        day.alias("d"),
        "event_id",
    )
    # the reference min-day is a property of the WHOLE corpus; a real
    # deployment pins it in config — here derived once, like q519
    mind = p_all.agg(F.min("d").alias("m")).localCheckpoint(eager=False)
    root = scratch_dir("drift_stream_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/partials"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.crossJoin(F.broadcast(mind))
            .withColumn("rel_d", F.col("d") - F.col("m"))
            .groupBy("bin")
            .agg(
                F.sum(F.when(F.col("rel_d") < 10, 1).otherwise(0))
                .cast("long")
                .alias("ca"),
                F.sum(F.when(F.col("rel_d") >= 20, 1).otherwise(0))
                .cast("long")
                .alias("cb"),
            )
            .withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(path)
        )

    for _ep in range(_STREAM_EPOCHS):
        ingest(p_all.filter(
            F.col("event_id") % _STREAM_EPOCHS == _ep), _ep)
    counts = (
        spark.read.schema("bin long, ca long, cb long, __epoch int")
        .parquet(path)
        .groupBy("bin")
        .agg(
            F.sum("ca").cast("long").alias("ca"),
            F.sum("cb").cast("long").alias("cb"),
        )
    )
    grid = spark.range(_Q519_BINS).select(F.col("id").alias("bin"))
    f = (
        grid.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    tot = f.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    f2 = f.crossJoin(F.broadcast(tot)).select(
        "*",
        ((F.col("ca") + 1.0) / (F.col("na") + _Q519_BINS)).alias("pa"),
        ((F.col("cb") + 1.0) / (F.col("nb") + _Q519_BINS)).alias("pb"),
    )
    cw = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return f2.select(
        "bin",
        F.col("ca").alias("count_ref"),
        F.col("cb").alias("count_cur"),
        F.round(
            (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")),
            6,
        ).alias("psi_contrib"),
        F.round(
            F.abs(
                F.sum("ca").over(cw).cast("double") / F.col("na")
                - F.sum("cb").over(cw).cast("double") / F.col("nb")
            ),
            6,
        ).alias("ks_at_bin"),
    )


# q535 — STREAMING transition matrix (twin of q526) ----------------------


def _q535_oracle() -> str:
    from databricks_etl_spark.plans.registry import QUERIES

    return QUERIES["q526_markov_transition_matrix"].oracle


@query("q535_streaming_transitions", oracle=_q535_oracle())
def q535_streaming_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q526's transition matrix under STREAMING ingest — the stitch
    problem that makes sequence analytics the hard streaming case: a
    transition can SPAN two micro-batches (the user's last event of
    epoch 0 chains to their first event of epoch 1), so per-batch
    transition counts alone are wrong.  The sink therefore lands the
    batch's raw (user, ts, event_id, type) rows — per-user sequence
    state, the q453-restore discipline — and the drain rebuilds
    adjacency over the union, where boundary transitions reappear by
    construction.  Drain ≡ q526's oracle under the event-id-parity
    slicing that makes nearly EVERY transition cross the boundary
    (the adversarial case, deliberately).

    Scale shape: per-epoch state is the batch's own rows (a
    production sink would watermark-compact per-user tails); the
    drain is q526's one window + one grouped count."""
    import shutil

    from databricks_etl_spark.sources.writers import scratch_dir

    e = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    root = scratch_dir("trans_stream_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/events"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(path)
        )

    for _ep in range(_STREAM_EPOCHS):
        ingest(e.filter(
            F.col("event_id") % _STREAM_EPOCHS == _ep), _ep)
    landed = (
        spark.read.schema(
            "user_id long, ts timestamp_ntz, event_id long,"
            " event_type string, __epoch int"
        )
        .parquet(path)
        .drop("__epoch")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = landed.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    outdeg = trans.groupBy("from_type").agg(
        F.sum("n_transitions").alias("tot")
    )
    return trans.join(outdeg, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("tot"), 6).alias(
            "p_transition"
        ),
    )


# q536 — graph-ANN index datasheet ---------------------------------------


def _q536_oracle() -> str:
    return f"""
        WITH RECURSIVE {_edges_cte()},
        reach AS (
            SELECT CAST({_Q507_ENTRY} AS BIGINT) AS node
            UNION
            SELECT e.dst FROM e JOIN reach ON e.src = reach.node
        )
        SELECT CAST({_Q506_M} AS BIGINT) AS out_degree,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM reach)
                   AS reachable_from_entry,
               round((SELECT CAST(COUNT(*) AS DOUBLE) FROM reach)
                     / (SELECT COUNT(*) FROM v), 6) AS reach_share,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e r
                WHERE EXISTS (SELECT 1 FROM e f
                              WHERE f.src = r.dst AND f.dst = r.src))
                   AS n_reciprocal_edges,
               CAST({_Q508_BEAM} AS BIGINT) AS serving_beam,
               CAST({_Q508_HOPS} AS BIGINT) AS serving_hops,
               TRUE AS recall_gates_green
    """


@query("q536_graph_index_datasheet", oracle=_q536_oracle())
def q536_graph_index_datasheet(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The graph-ANN index DATASHEET — the one-card summary a serving
    platform publishes with the index artifact (the q426/q459
    datasheet discipline applied to the graph rung): build parameters,
    node/edge counts, entry-point reachability (count and share —
    the q507 connectivity fact), total reciprocity (the navigability
    mass q506 breaks down by rank), the serving beam configuration,
    and the recall-gate verdict (recomputed in-Spark via q508's
    bracket; the oracle states the gate constant exactly as q508's
    does).

    Scale shape: everything reads the cached edge artifact +
    one BFS; 1-row output."""
    emb = read_table(spark, sf_dir, "embeddings")
    edges = _edges(spark, sf_dir)
    reach = GA.reachable_set(edges, _Q507_ENTRY)
    q = emb.filter(F.col("vec_id") < 5)
    approx = GA.beam_search(
        emb, edges, q, _Q507_K, beam=_Q508_BEAM, hops=_Q508_HOPS,
        entry=_Q507_ENTRY,
    )
    from databricks_etl_spark.operators.similarity import cosine_topk

    exact = cosine_topk(emb, q, _Q507_K)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    gate = (
        exact.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(_Q507_K)).alias(
                "recall"
            )
        )
        .agg(
            (
                (F.min("recall") >= 0.80) & (F.avg("recall") >= 0.88)
            ).alias("recall_gates_green")
        )
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("__rev"),
    )
    stats = (
        edges.join(rev, ["src", "dst"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(F.coalesce("__rev", F.lit(0)))
            .cast("long")
            .alias("n_reciprocal_edges"),
        )
    )
    nn = emb.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    nr = reach.agg(
        F.count(F.lit(1)).cast("long").alias("reachable_from_entry")
    )
    return (
        nn.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(gate))
        .select(
            F.lit(_Q506_M).cast("long").alias("out_degree"),
            "n_nodes",
            "n_edges",
            "reachable_from_entry",
            F.round(
                F.col("reachable_from_entry").cast("double")
                / F.col("n_nodes"),
                6,
            ).alias("reach_share"),
            "n_reciprocal_edges",
            F.lit(_Q508_BEAM).cast("long").alias("serving_beam"),
            F.lit(_Q508_HOPS).cast("long").alias("serving_hops"),
            "recall_gates_green",
        )
    )


# q537 — incremental skyline maintenance ---------------------------------

_Q537_SLICE = "01"  # md5 first hex → the arriving batch (~1/8)


def _q537_oracle() -> str:
    return f"""
        WITH pts AS MATERIALIZED (
            SELECT o_custkey AS custkey,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0)
                                 AS DECIMAL(28,0))) AS BIGINT)
                       AS spend_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_custkey
        ),
        sky AS (
            SELECT p.custkey, p.spend_cents, p.n_orders,
                   strpos('{_Q537_SLICE}',
                          substr(md5('sk:' || CAST(p.custkey AS VARCHAR)),
                                 1, 1)) > 0 AS arrived_late
            FROM pts p
            WHERE NOT EXISTS (
                SELECT 1 FROM pts q
                WHERE q.spend_cents >= p.spend_cents
                  AND q.n_orders >= p.n_orders
                  AND (q.spend_cents > p.spend_cents
                       OR q.n_orders > p.n_orders)
            )
        )
        SELECT custkey, spend_cents, n_orders, arrived_late FROM sky
    """


@query("q537_incremental_skyline", oracle=_q537_oracle())
def q537_incremental_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL skyline maintenance — the algebraic property that
    makes the Pareto frontier cheap to keep fresh: skyline(old ∪ new)
    = skyline(skyline(old) ∪ new), so an update needs only the OLD
    FRONTIER (tiny) plus the arriving batch, never the full history.
    The lane splits customers by a deterministic md5 slice into a
    base population and a late batch, maintains the frontier
    incrementally with the q516 kernel, and flags which frontier rows
    the late batch contributed.  The oracle computes the skyline of
    the WHOLE set directly — hash equality IS the proof of the
    incremental identity (a dominated-by-late base survivor or a
    missed late winner would break it).

    Scale shape: the incremental pass runs the kernel over
    |frontier| + |batch| rows — independent of history size."""
    from databricks_etl_spark.operators.skyline import skyline_2d

    o = read_table(spark, sf_dir, "orders")
    pts = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("decimal(28,0)")
        )
        .cast("long")
        .alias("spend_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    ).localCheckpoint(eager=False)
    is_late = (
        F.instr(
            F.lit(_Q537_SLICE),
            F.substring(
                F.md5(F.concat(F.lit("sk:"), F.col("custkey").cast("string"))),
                1,
                1,
            ),
        )
        > 0
    )
    base = pts.filter(~is_late)
    late = pts.filter(is_late)
    old_frontier = skyline_2d(base, "spend_cents", "n_orders")
    merged = old_frontier.unionByName(late).localCheckpoint(eager=False)
    return skyline_2d(merged, "spend_cents", "n_orders").select(
        "custkey",
        "spend_cents",
        "n_orders",
        is_late.alias("arrived_late"),
    )


# q538 — funnel step-latency percentiles ---------------------------------


def _q538_oracle() -> str:
    steps = []
    for lbl, a, b in [("signup_to_click", "s.t0", "c.t1"),
                      ("click_to_purchase", "c.t1", "p.t2")]:
        steps.append(f"""
            SELECT '{lbl}' AS step, {b} - {a} AS lat_s,
                   row_number() OVER (PARTITION BY '{lbl}'
                       ORDER BY {b} - {a}, s.user_id) AS rk,
                   COUNT(*) OVER (PARTITION BY '{lbl}') AS n
            FROM s JOIN c ON s.user_id = c.user_id
                   JOIN p ON s.user_id = p.user_id""")
    return f"""
        WITH s AS MATERIALIZED (
            SELECT user_id,
                   MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t0
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        c AS MATERIALIZED (
            SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t1
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s.t0
              AND CAST(floor(epoch(e.ts)) AS BIGINT) - s.t0
                  <= {_Q524_STEP_S}
            GROUP BY 1
        ),
        p AS MATERIALIZED (
            SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t2
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= c.t1
              AND CAST(floor(epoch(e.ts)) AS BIGINT) - c.t1
                  <= {_Q524_STEP_S}
            GROUP BY 1
        ),
        lat AS MATERIALIZED ({" UNION ALL ".join(steps)})
        SELECT step,
               CAST(MAX(n) AS BIGINT) AS n_users,
               CAST(MIN(CASE WHEN rk = (n + 1) // 2 THEN lat_s END)
                    AS BIGINT) AS p50_latency_s,
               CAST(MIN(CASE WHEN rk = (9 * n + 9) // 10 THEN lat_s END)
                    AS BIGINT) AS p90_latency_s
        FROM lat GROUP BY step
    """


@query("q538_funnel_latency_percentiles", oracle=_q538_oracle())
def q538_funnel_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FUNNEL STEP LATENCIES — how long converting users take per
    step, the p50/p90 a growth team actually watches (q524 counts who
    converts; this lane times them): per fully-converted user, the
    signup→click and click→purchase latencies in exact integer
    seconds, with the LOWER p50/p90 (the rank-⌈n/2⌉ / rank-⌈9n/10⌉
    elements of the (latency, user) total order — actual elements,
    the q531 lower-median discipline) extracted per step via the
    two-phase exact rank.

    Scale shape: q524's keyed min-chain, then one rank pass per step
    over |converted users| rows."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ep")
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ep").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(
            (F.col("ep") >= F.col("t0"))
            & (F.col("ep") - F.col("t0") <= _Q524_STEP_S)
        )
        .groupBy("user_id")
        .agg(F.min("ep").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ep") >= F.col("t1"))
            & (F.col("ep") - F.col("t1") <= _Q524_STEP_S)
        )
        .groupBy("user_id")
        .agg(F.min("ep").alias("t2"))
    )
    conv = (
        s.join(c, "user_id").join(p, "user_id").localCheckpoint(eager=False)
    )
    out = None
    for lbl, a, b in [("signup_to_click", "t0", "t1"),
                      ("click_to_purchase", "t1", "t2")]:
        lat = conv.select(
            "user_id", (F.col(b) - F.col(a)).alias("lat_s")
        )
        n = lat.count()
        r = exact_ntile(lat, ["lat_s", "user_id"], n, out_col="rk")
        row = r.filter(
            F.col("rk").isin((n + 1) // 2, (9 * n + 9) // 10)
        ).agg(
            F.lit(lbl).alias("step"),
            F.lit(n).cast("long").alias("n_users"),
            F.min(
                F.when(F.col("rk") == (n + 1) // 2, F.col("lat_s"))
            )
            .cast("long")
            .alias("p50_latency_s"),
            F.min(
                F.when(F.col("rk") == (9 * n + 9) // 10, F.col("lat_s"))
            )
            .cast("long")
            .alias("p90_latency_s"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# q539 — A/B test: two-proportion z with exact significance --------------

_Q539_Z2_NUM, _Q539_Z2_DEN = 38416, 10000  # z²≥3.8416 ⇔ p<0.05 two-sided


def _q539_oracle() -> str:
    return f"""
        WITH u AS MATERIALIZED (
            SELECT DISTINCT user_id,
                   strpos('01234567',
                          substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                                 1, 1)) > 0 AS arm_a
            FROM events
        ),
        conv AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase' AND value >= 150
        ),
        per AS (
            SELECT u.arm_a,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN conv.user_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS x
            FROM u LEFT JOIN conv ON u.user_id = conv.user_id
            GROUP BY u.arm_a
        ),
        w AS (
            SELECT
                (SELECT n FROM per WHERE arm_a) AS na,
                (SELECT x FROM per WHERE arm_a) AS xa,
                (SELECT n FROM per WHERE NOT arm_a) AS nb,
                (SELECT x FROM per WHERE NOT arm_a) AS xb
        )
        SELECT na AS n_a, xa AS conv_a, nb AS n_b, xb AS conv_b,
               round(CAST(xa AS DOUBLE) / na, 6) AS rate_a,
               round(CAST(xb AS DOUBLE) / nb, 6) AS rate_b,
               round((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
                     / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1.0 / na + 1.0 / nb)), 6) AS z_stat,
               -- exact rational significance: z² ≥ 3.8416 cross-
               -- multiplied in HUGEINT (never a float compare)
               CAST({_Q539_Z2_DEN} AS HUGEINT)
                   * CAST(xa * nb - xb * na AS HUGEINT)
                   * CAST(xa * nb - xb * na AS HUGEINT) * (na + nb)
                   >= CAST({_Q539_Z2_NUM} AS HUGEINT)
                   * CAST(xa + xb AS HUGEINT)
                   * CAST(na + nb - xa - xb AS HUGEINT)
                   * na * nb
                   AS significant_p05
        FROM w
    """


@query("q539_ab_test_proportions", oracle=_q539_oracle())
def q539_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B TEST readout — the two-proportion z-test every
    experimentation platform runs, with the significance verdict in
    EXACT integer arithmetic: users split into arms by deterministic
    md5 (50/50 — the bucketing a real assignment service does),
    conversion = any purchase of value ≥ 150 (a threshold that
    leaves both arms with real variance at every scale factor), the
    pooled z statistic reported at 6dp
    for humans, and the p<0.05 verdict decided by cross-multiplying
    z² ≥ 3.8416 into integers (decimal-exact — the boolean the
    driver hashes can never flip on a libm edge; derivation: z² =
    Δ²·na·nb·(na+nb) / (x(N−x)·N²)·N... folded to the HUGEINT form
    in the oracle, mirrored in Spark decimals).

    Scale shape: one distinct-user pass, one semi-join for
    converters, a 2-row aggregate — experiment readouts are
    metadata-cheap at any corpus size."""
    e = read_table(spark, sf_dir, "events")
    u = e.select("user_id").distinct().select(
        "user_id",
        (
            F.instr(
                F.lit("01234567"),
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ab:"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    1,
                ),
            )
            > 0
        ).alias("arm_a"),
    )
    conv = (
        e.filter(
            (F.col("event_type") == "purchase") & (F.col("value") >= 150)
        )
        .select("user_id")
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    per = (
        u.join(conv, "user_id", "left")
        .groupBy("arm_a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce("__c", F.lit(0))).cast("long").alias("x"),
        )
        .localCheckpoint(eager=False)
    )
    a = per.filter(F.col("arm_a")).select(
        F.col("n").alias("na"), F.col("x").alias("xa")
    )
    b = per.filter(~F.col("arm_a")).select(
        F.col("n").alias("nb"), F.col("x").alias("xb")
    )
    wjoin = a.crossJoin(F.broadcast(b))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    delta = F.col("xa") * F.col("nb") - F.col("xb") * F.col("na")
    lhs = (
        F.lit(_Q539_Z2_DEN).cast("decimal(38,0)")
        * dec(delta)
        * dec(delta)
        * dec(F.col("na") + F.col("nb"))
    )
    rhs = (
        F.lit(_Q539_Z2_NUM).cast("decimal(38,0)")
        * dec(F.col("xa") + F.col("xb"))
        * dec(
            F.col("na") + F.col("nb") - F.col("xa") - F.col("xb")
        )
        * dec(F.col("na"))
        * dec(F.col("nb"))
    )
    pooled = (F.col("xa") + F.col("xb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    return wjoin.select(
        F.col("na").alias("n_a"),
        F.col("xa").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("xb").alias("conv_b"),
        F.round(F.col("xa").cast("double") / F.col("na"), 6).alias(
            "rate_a"
        ),
        F.round(F.col("xb").cast("double") / F.col("nb"), 6).alias(
            "rate_b"
        ),
        F.round(
            (
                F.col("xa").cast("double") / F.col("na")
                - F.col("xb").cast("double") / F.col("nb")
            )
            / F.sqrt(
                pooled
                * (1 - pooled)
                * (1.0 / F.col("na") + 1.0 / F.col("nb"))
            ),
            6,
        ).alias("z_stat"),
        (lhs >= rhs).alias("significant_p05"),
    )


# q540 — Kaplan–Meier survival estimator ---------------------------------


def _q540_oracle() -> str:
    return """
        WITH t0 AS MATERIALIZED (
            SELECT user_id,
                   MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS s0
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        fp AS MATERIALIZED (
            SELECT e.user_id,
                   MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS tp
            FROM events e JOIN t0 ON e.user_id = t0.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= t0.s0
            GROUP BY 1
        ),
        last_seen AS MATERIALIZED (
            SELECT e.user_id,
                   MAX(CAST(floor(epoch(e.ts)) AS BIGINT)) AS tl
            FROM events e GROUP BY 1
        ),
        dur AS MATERIALIZED (
            SELECT t0.user_id,
                   CASE WHEN fp.tp IS NOT NULL
                        THEN (fp.tp - t0.s0) // 86400
                        ELSE (last_seen.tl - t0.s0) // 86400 END AS t,
                   fp.tp IS NOT NULL AS died
            FROM t0
            JOIN last_seen ON t0.user_id = last_seen.user_id
            LEFT JOIN fp ON t0.user_id = fp.user_id
        ),
        grid AS MATERIALIZED (
            SELECT DISTINCT t FROM dur WHERE died
        ),
        km AS (
            SELECT g.t,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM dur
                    WHERE dur.t >= g.t) AS n_at_risk,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM dur
                    WHERE dur.died AND dur.t = g.t) AS d_events
            FROM grid g
        )
        SELECT CAST(t AS BIGINT) AS t_days, n_at_risk, d_events,
               round(CAST(d_events AS DOUBLE) / n_at_risk, 6) AS hazard,
               -- a time where EVERYONE at risk converts zeroes the
               -- curve from there on (ln(0) guard)
               CASE WHEN MAX(CASE WHEN d_events = n_at_risk
                             THEN 1 ELSE 0 END) OVER (
                        ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                    THEN 0.0
                    ELSE round(exp(SUM(CASE WHEN d_events = n_at_risk
                             THEN 0.0
                             ELSE ln(1.0 - CAST(d_events AS DOUBLE)
                                     / n_at_risk) END) OVER (
                        ORDER BY t ROWS UNBOUNDED PRECEDING)), 6) END
                   AS survival
        FROM km
    """


@query("q540_kaplan_meier", oracle=_q540_oracle())
def q540_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN–MEIER survival estimator — time-to-conversion WITH
    CENSORING, the estimator naive conversion rates get wrong (a user
    who signed up yesterday hasn't 'failed to convert', they just
    haven't been observed long enough): durations in whole days from
    first signup to first subsequent purchase (events) or to last
    activity (censored), the risk set at each event time (everyone
    whose observation reaches it — censored users leave the
    denominator exactly when their observation ends, the entire
    point), per-time hazard d/n, and the product-limit survival curve
    — the cumulative product computed as exp(Σln(1−d/n)) over the
    bounded event-time grid (an ordered fold over the SAME ≤|days|
    rows in both engines, the q415 ln discipline, 6dp at the edge).

    Scale shape: durations are two keyed min/max passes; the curve
    lives on the bounded distinct-event-time grid (q475 metadata
    class)."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ep")
    )
    t0 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ep").alias("s0"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(t0, "user_id")
        .filter(F.col("ep") >= F.col("s0"))
        .groupBy("user_id")
        .agg(F.min("ep").alias("tp"))
    )
    last_seen = e.groupBy("user_id").agg(F.max("ep").alias("tl"))
    dur = (
        t0.join(last_seen, "user_id")
        .join(fp, "user_id", "left")
        .select(
            "user_id",
            F.when(
                F.col("tp").isNotNull(),
                F.expr("(tp - s0) DIV 86400"),
            )
            .otherwise(F.expr("(tl - s0) DIV 86400"))
            .alias("t"),
            F.col("tp").isNotNull().alias("died"),
        )
        .localCheckpoint(eager=False)
    )
    grid = dur.filter("died").select("t").distinct()
    # risk set per event time: suffix count over the bounded grid —
    # durations aggregate to (t, n_ending, d_at) then the grid joins
    at_t = dur.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_dur"),
        F.sum(F.when(F.col("died"), 1).otherwise(0))
        .cast("long")
        .alias("d_events"),
    )
    g2 = grid.withColumnRenamed("t", "gt")
    km = (
        g2.join(at_t, F.col("t") >= F.col("gt"))
        .groupBy("gt")
        .agg(
            F.sum("n_dur").cast("long").alias("n_at_risk"),
            F.sum(F.when(F.col("t") == F.col("gt"), F.col("d_events")))
            .cast("long")
            .alias("d_events"),
        )
    )
    cw = Window.orderBy("gt").rowsBetween(Window.unboundedPreceding, 0)
    dead_all = F.col("d_events") == F.col("n_at_risk")
    lnterm = F.when(dead_all, F.lit(0.0)).otherwise(
        F.log(
            F.lit(1.0)
            - F.col("d_events").cast("double") / F.col("n_at_risk")
        )
    )
    # a time where everyone at risk converts zeroes the curve onward
    zeroed = F.max(F.when(dead_all, 1).otherwise(0)).over(cw) == 1
    return km.select(
        F.col("gt").cast("long").alias("t_days"),
        "n_at_risk",
        "d_events",
        F.round(
            F.col("d_events").cast("double") / F.col("n_at_risk"), 6
        ).alias("hazard"),
        F.when(zeroed, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(lnterm).over(cw)), 6))
        .alias("survival"),
    )


# q541 — dyadic EWMA one-step-ahead backtest -----------------------------

_Q541_H = 5  # trailing horizon (days)


def _q541_oracle() -> str:
    den = (1 << _Q541_H) - 1
    num = " + ".join(
        f"(SELECT cents FROM daily b WHERE b.d = a.d - {k})"
        f" * {1 << (_Q541_H - k)}"
        for k in range(1, _Q541_H + 1)
    )
    have = " AND ".join(
        f"EXISTS (SELECT 1 FROM daily b WHERE b.d = a.d - {k})"
        for k in range(1, _Q541_H + 1)
    )
    return f"""
        WITH daily AS MATERIALIZED (
            SELECT datediff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS d,
                   CAST(SUM(CAST(round(value * 100, 0)
                                 AS DECIMAL(28,0))) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT CAST(a.d AS BIGINT) AS day,
               a.cents AS actual_cents,
               round(CAST(({num}) AS DOUBLE) / {den}, 6)
                   AS forecast_cents,
               round(ABS(a.cents - CAST(({num}) AS DOUBLE) / {den}), 6)
                   AS abs_error
        FROM daily a WHERE {have}
    """


@query("q541_ewma_backtest", oracle=_q541_oracle())
def q541_ewma_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-STEP-AHEAD forecast backtest with a DYADIC EWMA — q513's
    exact-decay discipline turned into a forecaster and scored
    against reality: each day's forecast is the exponentially-
    weighted mean of the previous {_Q541_H} days (weights 2⁻ᵏ,
    normalized by 2^{_Q541_H}−1 — the numerator is an exact INTEGER
    combination of daily cents, so forecast and error are one exact
    rational division each), emitted only where the full trailing
    window exists.  The per-day absolute errors are the backtest a
    forecasting service publishes before anyone trusts the model.

    Scale shape: the day-grain relation is bounded (q475 metadata
    class); the trailing window is a {_Q541_H}-way self-join on
    literal offsets — at 100 TB the daily aggregate is the only
    data-scale pass."""
    den = (1 << _Q541_H) - 1
    e = read_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100, 0).cast("decimal(28,0)")
            )
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    cur = daily.select(
        F.col("d"), F.col("cents").alias("actual_cents")
    )
    for k in range(1, _Q541_H + 1):
        prev = daily.select(
            (F.col("d") + k).alias("d"),
            F.col("cents").alias(f"c{k}"),
        )
        cur = cur.join(prev, "d")  # inner: full window required
    num = None
    for k in range(1, _Q541_H + 1):
        term = F.col(f"c{k}") * F.lit(1 << (_Q541_H - k))
        num = term if num is None else num + term
    fc = num.cast("double") / F.lit(den)
    return cur.select(
        F.col("d").cast("long").alias("day"),
        "actual_cents",
        F.round(fc, 6).alias("forecast_cents"),
        F.round(F.abs(F.col("actual_cents") - fc), 6).alias("abs_error"),
    )


# q542 — eager aggregation (group-by pushdown through a join) ------------


def _q542_oracle() -> str:
    return """
        WITH pre AS MATERIALIZED (
            SELECT l_orderkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(28,6))) AS rev,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem GROUP BY l_orderkey
        ),
        joined AS (
            SELECT c.c_nationkey AS nation, pre.rev, pre.n_lines
            FROM pre
            JOIN orders o ON pre.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        sizes AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
                       AS rows_lazy,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM pre)
                       AS rows_eager
        )
        SELECT nation,
               CAST(SUM(rev) AS DOUBLE) AS revenue,
               CAST(SUM(n_lines) AS BIGINT) AS n_lines,
               (SELECT rows_lazy FROM sizes) AS join_rows_lazy,
               (SELECT rows_eager FROM sizes) AS join_rows_eager,
               (SELECT rows_eager < rows_lazy FROM sizes)
                   AS pushdown_saves
        FROM joined GROUP BY nation
    """


@query("q542_eager_aggregation_rewrite", oracle=_q542_oracle())
def q542_eager_aggregation_rewrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EAGER AGGREGATION (group-by pushdown through a join) — the
    rewrite that keeps a 100 TB fact table from riding two joins at
    line grain: partially aggregate lineitem to order grain BEFORE
    joining orders and customer, then finish the per-nation rollup
    above — algebraically exact because the join keys functionally
    determine the pushed-down group (each order joins exactly one
    customer), and the decimal partials re-merge exactly.  The card
    carries the per-nation answer (the hash-checked core) plus the
    measured join input sizes both ways — lineitem's row count vs the
    order-grain pre-aggregate — and pins that the pushdown shrinks
    the join input (the optimizer evidence, q457's
    measured-intermediates discipline).

    Scale shape: the join moves |orders| pre-aggregated rows instead
    of |lineitem| raw rows — a 4× reduction here and the difference
    between shuffling 100 TB and 25 TB at the north star."""
    li = read_table(spark, sf_dir, "lineitem")
    pre = li.groupBy("l_orderkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        ).alias("rev"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    sizes = li.agg(
        F.count(F.lit(1)).cast("long").alias("join_rows_lazy")
    ).crossJoin(
        F.broadcast(
            pre.agg(
                F.count(F.lit(1)).cast("long").alias("join_rows_eager")
            )
        )
    )
    return (
        pre.join(o, "l_orderkey")
        .join(c, "o_custkey")
        .groupBy("nation")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
        .crossJoin(F.broadcast(sizes))
        .select(
            "nation",
            "revenue",
            "n_lines",
            "join_rows_lazy",
            "join_rows_eager",
            (F.col("join_rows_eager") < F.col("join_rows_lazy")).alias(
                "pushdown_saves"
            ),
        )
    )


# q543 — correlated-subquery decorrelation -------------------------------


def _q543_oracle() -> str:
    return """
        WITH spend AS MATERIALIZED (
            SELECT c.c_custkey, c.c_nationkey,
                   SUM(CAST(round(o.o_totalprice * 100, 0)
                            AS DECIMAL(28,0))) AS cents
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        ),
        -- the correlated form: spend > their own nation's average —
        -- stated here DECORRELATED (group avg joined back), which is
        -- exactly the rewrite the lane demonstrates
        nat AS (
            SELECT c_nationkey,
                   SUM(cents) AS tot, CAST(COUNT(*) AS BIGINT) AS n
            FROM spend GROUP BY 1
        )
        SELECT s.c_nationkey AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_above_avg,
               CAST(MIN(s.c_custkey) AS BIGINT) AS first_custkey
        FROM spend s JOIN nat ON s.c_nationkey = nat.c_nationkey
        WHERE CAST(s.cents AS HUGEINT) * nat.n
              > CAST(nat.tot AS HUGEINT)
        GROUP BY s.c_nationkey
    """


@query("q543_decorrelated_above_average", oracle=_q543_oracle())
def q543_decorrelated_above_average(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated-subquery DECORRELATION — "customers who spend more
    than their nation's average", the textbook correlated predicate,
    executed as the rewrite every optimizer applies: compute the
    per-nation aggregate ONCE and join it back, instead of
    re-evaluating a subquery per row (which at 100 TB is a
    nested-loop re-scan per customer).  The above-average comparison
    cross-multiplies in exact integers (spend·n > total — never a
    float average), so the per-nation survivor counts are
    hash-stable.

    Scale shape: one grouped aggregate + one keyed join back — the
    decorrelated plan's whole point; zero per-row subquery
    evaluation."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    o = read_table(spark, sf_dir, "orders")
    spend = (
        o.join(c, "o_custkey")
        .groupBy(F.col("o_custkey").alias("c_custkey"), "c_nationkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast(
                    "decimal(28,0)"
                )
            ).alias("cents")
        )
    )
    nat = spend.groupBy("c_nationkey").agg(
        F.sum("cents").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        spend.join(nat, "c_nationkey")
        .filter(
            F.col("cents").cast("decimal(38,0)") * F.col("n")
            > F.col("tot").cast("decimal(38,0)")
        )
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_above_avg"),
            F.min("c_custkey").cast("long").alias("first_custkey"),
        )
    )


# q544 — unigram-LM log-probability scoring (perplexity filtering) -------

_Q544_TOP_SUSPECTS = 20


def _q544_oracle() -> str:
    from databricks_etl_spark.plans.queries_dedup import _TOKS

    return f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, unnest({_TOKS}) AS token FROM documents
        ),
        vocab AS MATERIALIZED (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
            GROUP BY 1
        ),
        corpus AS (
            SELECT SUM(tf) AS n,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM vocab
        ),
        scored AS (
            SELECT t.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   SUM(ln((v.tf + 1.0)
                          / ((SELECT n FROM corpus)
                             + (SELECT v FROM corpus)))) AS lp
            FROM toks t JOIN vocab v USING (token)
            GROUP BY t.doc_id
        )
        SELECT doc_id, n_tokens,
               round(lp / n_tokens, 6) AS mean_logprob
        FROM scored
        -- rank on the ROUNDED mean: the raw double sum's last ulp is
        -- summation-order dependent, so near-ties could otherwise
        -- flip the cutoff between engines
        ORDER BY round(lp / n_tokens, 6), doc_id
        LIMIT {_Q544_TOP_SUSPECTS}
    """


@query("q544_unigram_logprob_scoring", oracle=_q544_oracle())
def q544_unigram_logprob_scoring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PERPLEXITY-STYLE quality scoring with a corpus unigram LM — the
    poor man's perplexity filter every pretraining pipeline runs
    before it can afford a neural one: token probabilities from the
    corpus itself (Laplace-smoothed rational — (tf+1)/(N+V)), each
    document scored by its mean token log-probability (the q415 ln
    discipline; the per-doc SUM of lns is order-dependent in the last
    ulp, so the 6dp round happens on the mean — and the ranking keys
    on the raw sum with doc-id tiebreak identically in both engines),
    and the {_Q544_TOP_SUSPECTS} most-atypical documents surfaced
    (gibberish/outlier candidates; the opposite tail is boilerplate).

    Scale shape: one tokenize pass, one vocab aggregate, one
    index-join score — the inverted-index shape of q43 pointed at
    quality instead of similarity."""
    from databricks_etl_spark.operators.dedup import token_sets  # noqa: F401

    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens_col("text")).alias("token")
    ).localCheckpoint(eager=False)
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    corpus = vocab.agg(
        F.sum("tf").alias("n"), F.count(F.lit(1)).cast("long").alias("v")
    )
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.log(
                    (F.col("tf") + 1.0) / (F.col("n") + F.col("v"))
                )
            ).alias("lp"),
        )
    )
    return (
        scored.orderBy(
            F.round(F.col("lp") / F.col("n_tokens"), 6).asc(),
            F.asc("doc_id"),
        )
        .limit(_Q544_TOP_SUSPECTS)
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("lp") / F.col("n_tokens"), 6).alias(
                "mean_logprob"
            ),
        )
    )


# q545 — STREAMING unigram-LM scoring (twin of q544) ---------------------


def _q545_oracle() -> str:
    from databricks_etl_spark.plans.registry import QUERIES

    return QUERIES["q544_unigram_logprob_scoring"].oracle


@query("q545_streaming_logprob_scoring", oracle=_q545_oracle())
def q545_streaming_logprob_scoring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q544's LM scoring under STREAMING ingest — the model-refresh
    problem in miniature: token frequencies are ASSOCIATIVE, so each
    epoch lands only its (token, tf) partials and (doc, token, tf)
    grain; the drain merges the vocabulary (the refreshed LM) and
    re-scores ALL landed documents against it — because a unigram LM
    trained on half the corpus scores documents differently, interim
    epoch scores are provisional by nature and only the drain's
    rescoring is the release artifact (stated; the reason production
    pipelines version their filter models).  Drain ≡ q544's oracle.

    Scale shape: per-epoch state is token-frequency partials
    (vocabulary-grain) + doc-token grain for landed docs."""
    import shutil

    from databricks_etl_spark.operators.text import tokens_col
    from databricks_etl_spark.sources.writers import scratch_dir

    d = read_table(spark, sf_dir, "documents")
    root = scratch_dir("lm_stream_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/partials"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        toks = batch_df.select(
            "doc_id", F.explode(tokens_col("text")).alias("token")
        )
        grain = toks.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        ).localCheckpoint(eager=False)
        (
            grain.groupBy("token")
            .agg(F.sum("tf").cast("long").alias("tf"))
            .withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(f"{path}/vocab")
        )
        (
            grain.withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(f"{path}/grain")
        )

    for _ep in range(_STREAM_EPOCHS):
        ingest(d.filter(
            F.col("doc_id") % _STREAM_EPOCHS == _ep), _ep)
    vocab = (
        spark.read.schema("token string, tf long, __epoch int")
        .parquet(f"{path}/vocab")
        .groupBy("token")
        .agg(F.sum("tf").cast("long").alias("tf"))
    )
    grain = (
        spark.read.schema(
            "doc_id long, token string, tf long, __epoch int"
        )
        .parquet(f"{path}/grain")
        .groupBy("doc_id", "token")
        .agg(F.sum("tf").cast("long").alias("dtf"))
    )
    corpus = vocab.agg(
        F.sum("tf").alias("n"), F.count(F.lit(1)).cast("long").alias("v")
    )
    scored = (
        grain.join(vocab, "token")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum("dtf").cast("long").alias("n_tokens"),
            F.sum(
                F.col("dtf")
                * F.log((F.col("tf") + 1.0) / (F.col("n") + F.col("v")))
            ).alias("lp"),
        )
    )
    return (
        scored.orderBy(
            F.round(F.col("lp") / F.col("n_tokens"), 6).asc(),
            F.asc("doc_id"),
        )
        .limit(_Q544_TOP_SUSPECTS)
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("lp") / F.col("n_tokens"), 6).alias(
                "mean_logprob"
            ),
        )
    )


# q546 — SLO burn-rate alerting (multi-window) ---------------------------

_Q546_SLO_PPM = 300_000  # error budget: 30% of events may be errors
_Q546_WINDOWS = [(1, 14), (3, 6), (7, 2)]  # (days, burn-rate threshold)


def _q546_oracle() -> str:
    win_rows = " UNION ALL ".join(
        f"SELECT {days} AS win_days, {thr} AS burn_threshold"
        for days, thr in _Q546_WINDOWS
    )
    return f"""
        WITH daily AS MATERIALIZED (
            SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS d,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'error'
                            THEN 1 ELSE 0 END) AS BIGINT) AS errs
            FROM events GROUP BY 1
        ),
        anchor AS (SELECT MAX(d) AS dmax FROM daily),
        wins AS MATERIALIZED ({win_rows}),
        agg AS (
            SELECT w.win_days, w.burn_threshold,
                   SUM(daily.n) AS n, SUM(daily.errs) AS errs
            FROM wins w JOIN daily
              ON daily.d > (SELECT dmax FROM anchor) - w.win_days
            GROUP BY 1, 2
        )
        SELECT win_days, CAST(burn_threshold AS BIGINT)
                   AS burn_threshold,
               CAST(n AS BIGINT) AS window_events,
               CAST(errs AS BIGINT) AS window_errors,
               round(CAST(errs AS DOUBLE) / n, 6) AS error_rate,
               round(CAST(errs AS DOUBLE) * 1000000
                     / (n * {_Q546_SLO_PPM}), 6) AS burn_rate,
               -- alert in exact integers: errs·10⁶ > thr·slo_ppm·n
               CAST(errs AS HUGEINT) * 1000000
                   > CAST(burn_threshold AS HUGEINT)
                     * {_Q546_SLO_PPM} * n AS alert_fires
        FROM agg
    """


@query("q546_slo_burn_rate", oracle=_q546_oracle())
def q546_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-WINDOW SLO BURN-RATE alerting — the SRE pattern that
    replaces naive threshold alerts: the error budget
    ({_Q546_SLO_PPM} ppm) burns at rate = error_rate/budget, and
    three lookback windows with descending thresholds (1d@14x, 3d@6x,
    7d@2x) catch fast burns quickly and slow burns reliably.
    Windows anchor to the corpus's max day; each alert verdict is
    decided by integer cross-multiplication (errors·10⁶ >
    threshold·budget·n — the q539 discipline), so the hashed booleans
    are float-proof.

    Scale shape: one scan to the day-grain relation; the window
    aggregates join the bounded day relation against a 3-row literal
    grid."""
    e = read_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            .cast("long")
            .alias("errs"),
        )
        .localCheckpoint(eager=False)
    )
    anchor = daily.agg(F.max("d").alias("dmax"))
    wins = spark.createDataFrame(
        _Q546_WINDOWS, "win_days int, burn_threshold int"
    )
    agg = (
        wins.crossJoin(F.broadcast(anchor))
        .join(
            daily,
            F.col("d") > F.col("dmax") - F.col("win_days"),
        )
        .groupBy("win_days", "burn_threshold")
        .agg(
            F.sum("n").cast("long").alias("window_events"),
            F.sum("errs").cast("long").alias("window_errors"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return agg.select(
        "win_days",
        F.col("burn_threshold").cast("long").alias("burn_threshold"),
        "window_events",
        "window_errors",
        F.round(
            F.col("window_errors").cast("double") / F.col("window_events"),
            6,
        ).alias("error_rate"),
        F.round(
            F.col("window_errors").cast("double")
            * 1000000
            / (F.col("window_events") * _Q546_SLO_PPM),
            6,
        ).alias("burn_rate"),
        (
            dec(F.col("window_errors")) * 1000000
            > dec(F.col("burn_threshold"))
            * _Q546_SLO_PPM
            * dec(F.col("window_events"))
        ).alias("alert_fires"),
    )


# q547 — RFM segmentation (recency/frequency/monetary quintiles) ---------

_Q547_AS_OF = "2002-01-01"  # orders-side as-of (F6 discipline)
_Q547_Q = 5


def _q547_oracle() -> str:
    return f"""
        WITH per AS MATERIALIZED (
            SELECT o_custkey AS custkey,
                   datediff('day', MAX(CAST(o_orderdate AS DATE)),
                            DATE '{_Q547_AS_OF}') AS rec_days,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0)
                                 AS DECIMAL(28,0))) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        scored AS MATERIALIZED (
            SELECT custkey, rec_days, freq, cents,
                   ntile({_Q547_Q}) OVER (
                       ORDER BY rec_days DESC, custkey) AS r_score,
                   ntile({_Q547_Q}) OVER (
                       ORDER BY freq, custkey) AS f_score,
                   ntile({_Q547_Q}) OVER (
                       ORDER BY cents, custkey) AS m_score
            FROM per
        )
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS segment_cents
        FROM scored GROUP BY 1, 2, 3
    """


@query("q547_rfm_segmentation", oracle=_q547_oracle())
def q547_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the marketing workhorse: every customer
    scored 1–{_Q547_Q} on Recency (days since last order, HIGHER
    score = more recent via the descending order), Frequency (order
    count) and Monetary (lifetime cents), each an exact quintile from
    :func:`exact_ntile` with the customer-key tiebreak, then the
    {_Q547_Q}³-cell segment matrix with populations and revenue.
    Champions are (5,5,5); at-risk big spenders are (1,·,5) — the
    grid a CRM acts on, with every boundary bit-reproducible (the
    whole point of exact quantiles for segmentation: a customer's
    segment cannot flip between runs).

    Scale shape: one grouped aggregate to customer grain, three
    two-phase rank passes, one ≤{_Q547_Q}³-row rollup."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    o = read_table(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_Q547_AS_OF).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("rec_days"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("decimal(28,0)")
        )
        .cast("long")
        .alias("cents"),
    ).localCheckpoint(eager=False)
    r = exact_ntile(
        per, [F.desc("rec_days"), F.asc("custkey")], _Q547_Q,
        out_col="r_score",
    ).select("custkey", "r_score")
    f = exact_ntile(
        per, ["freq", "custkey"], _Q547_Q, out_col="f_score"
    ).select("custkey", "f_score")
    m = exact_ntile(
        per, ["cents", "custkey"], _Q547_Q, out_col="m_score"
    ).select("custkey", "m_score")
    return (
        per.join(r, "custkey")
        .join(f, "custkey")
        .join(m, "custkey")
        .groupBy(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("segment_cents"),
        )
    )


# q548 — duplicate-payment detection (same payer+amount, close in time) --

_Q548_WIN_S = 86400  # within 24 hours
_Q548_GRAIN_CENTS = 100  # amounts match at DOLLAR grain


def _q548_oracle() -> str:
    return f"""
        WITH p AS MATERIALIZED (
            SELECT user_id, event_id,
                   CAST(round(value * 100, 0) AS BIGINT)
                       // {_Q548_GRAIN_CENTS} AS amt,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ep
            FROM events WHERE event_type = 'purchase'
        ),
        pairs AS (
            SELECT a.user_id, a.event_id AS first_id,
                   b.event_id AS second_id, a.amt,
                   b.ep - a.ep AS gap_s
            FROM p a JOIN p b
              ON a.user_id = b.user_id AND a.amt = b.amt
             AND a.event_id < b.event_id
             AND b.ep >= a.ep AND b.ep - a.ep <= {_Q548_WIN_S}
        )
        SELECT user_id, first_id, second_id,
               CAST(amt AS BIGINT) AS amount_dollars,
               CAST(gap_s AS BIGINT) AS gap_s
        FROM pairs
    """


@query("q548_duplicate_payment_detection", oracle=_q548_oracle())
def q548_duplicate_payment_detection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DUPLICATE-PAYMENT detection — the fraud/ops staple: two
    purchases by the same payer for the same DOLLAR amount within 24
    hours, ordered by event id so each suspicious pair appears once
    (exact-cent matching on this synthetic corpus is vacuously empty —
    the dollar grain is the screen a real ops team starts from).  The join is equi on (user, cents) — a skinny
    composite key that already bounds candidates to same-amount
    repeats — with the time window as a residual predicate (the
    amount key makes q512's bin replication unnecessary: the equi key
    exists naturally; the lane shows WHEN binning is and isn't
    needed).

    Scale shape: one self-join on (user_id, cents) — per-key groups
    are tiny by construction (few same-amount repeats per user), so
    the pair expansion is bounded the q504 way."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.expr(
            f"CAST(round(value * 100, 0) AS BIGINT)"
            f" DIV {_Q548_GRAIN_CENTS}"
        ).alias("amt"),
        F.unix_timestamp("ts").alias("ep"),
    )
    a = p.select(
        "user_id", F.col("event_id").alias("first_id"), "amt",
        F.col("ep").alias("ep_a"),
    )
    b = p.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("second_id"),
        F.col("amt").alias("a2"),
        F.col("ep").alias("ep_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("amt") == F.col("a2"))
            & (F.col("first_id") < F.col("second_id"))
            & (F.col("ep_b") >= F.col("ep_a"))
            & (F.col("ep_b") - F.col("ep_a") <= _Q548_WIN_S),
        )
        .select(
            "user_id",
            "first_id",
            "second_id",
            F.col("amt").cast("long").alias("amount_dollars"),
            (F.col("ep_b") - F.col("ep_a")).cast("long").alias("gap_s"),
        )
    )


# q549 — Benford first-digit audit ---------------------------------------

# Benford expected first-digit shares in ppm (literal — no log10 at
# runtime, so the χ² arithmetic stays rational end to end)
_Q549_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_Q549_CHI2_CRIT_MILLI = 15507  # χ²(8 df, 0.05) = 15.507


def _q549_oracle() -> str:
    grid = " UNION ALL ".join(
        f"SELECT {d} AS digit, CAST({ppm} AS BIGINT) AS expected_ppm"
        for d, ppm in _Q549_BENFORD_PPM.items()
    )
    return f"""
        WITH v AS MATERIALIZED (
            SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
                        AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM orders WHERE o_totalprice > 0
        ),
        counts AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1
        ),
        tot AS (SELECT SUM(c) AS n FROM counts),
        grid AS MATERIALIZED ({grid}),
        f AS (
            SELECT grid.digit, grid.expected_ppm,
                   COALESCE(counts.c, 0) AS observed,
                   (SELECT n FROM tot) AS n
            FROM grid LEFT JOIN counts USING (digit)
        )
        SELECT digit, observed, expected_ppm,
               round(CAST(observed AS DOUBLE) * 1000000 / n, 6)
                   AS observed_ppm,
               round(CAST((observed * 1000000 - n * expected_ppm)
                          AS DOUBLE)
                     * (observed * 1000000 - n * expected_ppm)
                     / (CAST(n AS DOUBLE) * expected_ppm * 1000000),
                     6) AS chi2_contrib
        FROM f
    """


@query("q549_benford_audit", oracle=_q549_oracle())
def q549_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit — the forensic-accounting
    screen for fabricated numbers: first digits of order totals (in
    cents, so the digit extraction is pure string arithmetic on an
    integer) against the Benford expectation stated as LITERAL ppm
    constants (no log10 at runtime), with per-digit χ² contributions
    in rational arithmetic rounded at the edge.  Synthetic TPC-H
    prices are uniform-ish, NOT Benford — the audit correctly flags
    them, which is the demonstration: the test detects distributional
    fabrication, and a real procurement ledger passing it is the
    null result.

    Scale shape: one scan to a 9-row digit histogram against a 9-row
    literal grid."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    v = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    counts = v.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = counts.agg(F.sum("c").alias("n"))
    grid = spark.createDataFrame(
        sorted(_Q549_BENFORD_PPM.items()),
        "digit long, expected_ppm long",
    )
    f = (
        grid.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("c", F.lit(0)).cast("long").alias("observed"),
            "expected_ppm",
            "n",
        )
    )
    dev = F.col("observed") * 1000000 - F.col("n") * F.col("expected_ppm")
    return f.select(
        "digit",
        "observed",
        "expected_ppm",
        F.round(
            F.col("observed").cast("double") * 1000000 / F.col("n"), 6
        ).alias("observed_ppm"),
        F.round(
            dev.cast("double")
            * dev
            / (
                F.col("n").cast("double")
                * F.col("expected_ppm")
                * 1000000
            ),
            6,
        ).alias("chi2_contrib"),
    )


# q550 — ABC (Pareto) classification via exact cumulative shares ---------


def _q550_oracle() -> str:
    return """
        WITH per AS MATERIALIZED (
            SELECT l_partkey AS pk,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(28,6))) AS DECIMAL(28,6))
                       AS rev
            FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT SUM(rev) AS t FROM per),
        ranked AS MATERIALIZED (
            SELECT pk, rev,
                   SUM(rev) OVER (ORDER BY rev DESC, pk
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM per
        ),
        classed AS (
            SELECT pk, rev,
                   CASE WHEN cum * 10 <= (SELECT t FROM tot) * 8
                            THEN 'A'
                        WHEN cum * 100 <= (SELECT t FROM tot) * 95
                            THEN 'B'
                        ELSE 'C' END AS cls
            FROM ranked
        )
        SELECT cls,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(rev) AS DOUBLE) AS class_revenue
        FROM classed GROUP BY cls
    """


@query("q550_abc_classification", oracle=_q550_oracle())
def q550_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (PARETO) CLASSIFICATION — the inventory-management
    workhorse: parts ranked by revenue, class A = the head covering
    the first 80% of cumulative revenue, B to 95%, C the tail.
    Cumulative revenue comes from :func:`exact_cumsum` over the
    (revenue DESC, part) total order — micro-cent-integer quantized
    so the running sum is exact — and the class boundaries compare in
    integer cross-multiplication (cum·10 ≤ total·8), never a float
    share.  On real
    demand data a few percent of parts land in class A; on THIS
    synthetic corpus per-part revenue is near-uniform, so the A head
    holds ~73% of parts — the honest reading of a flat catalog (the
    q549/q558 discipline: the instrument reports the data it sees).

    Scale shape: one grouped aggregate to part grain, one two-phase
    cumulative pass, a 3-row rollup — no global-ordering window."""
    from databricks_etl_spark.operators.quantile_bucket import exact_cumsum

    li = read_table(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        ).alias("rev")
    )
    # micro-units: decimal(28,6) × 1e6 → exact integer for the kernel
    perm = per.select(
        "pk", "rev", (F.col("rev") * 1000000).cast("long").alias("rev_u")
    )
    ranked = exact_cumsum(
        perm, [F.desc("rev_u"), F.desc("pk")], "rev_u", out_col="cum_u"
    )
    tot = ranked.agg(F.sum("rev_u").cast("decimal(38,0)").alias("t"))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "pk",
        "rev",
        F.when(
            F.col("cum_u") * 10 <= F.col("t") * 8, F.lit("A")
        )
        .when(F.col("cum_u") * 100 <= F.col("t") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("cls"),
    )
    return classed.groupBy("cls").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev").cast("double").alias("class_revenue"),
    )


# q551 — A/B test on MEANS (exact-arithmetic z verdict) ------------------


def _q551_oracle() -> str:
    return f"""
        WITH p AS MATERIALIZED (
            SELECT user_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents,
                   strpos('01234567',
                          substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                                 1, 1)) > 0 AS arm_a
            FROM events WHERE event_type = 'purchase'
        ),
        per AS (
            SELECT arm_a,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(cents AS DECIMAL(38,0))) AS s,
                   SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS ss
            FROM p GROUP BY arm_a
        ),
        w AS (
            SELECT (SELECT n FROM per WHERE arm_a) AS na,
                   (SELECT s FROM per WHERE arm_a) AS sa,
                   (SELECT ss FROM per WHERE arm_a) AS ssa,
                   (SELECT n FROM per WHERE NOT arm_a) AS nb,
                   (SELECT s FROM per WHERE NOT arm_a) AS sb,
                   (SELECT ss FROM per WHERE NOT arm_a) AS ssb
        )
        SELECT na AS n_a, nb AS n_b,
               round(CAST(sa AS DOUBLE) / na / 100, 6) AS mean_a,
               round(CAST(sb AS DOUBLE) / nb / 100, 6) AS mean_b,
               round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                     / sqrt(
                        (CAST(na AS DOUBLE) * ssa - CAST(sa AS DOUBLE)
                             * sa) / na / na / (na - 1) / na
                        + (CAST(nb AS DOUBLE) * ssb - CAST(sb AS DOUBLE)
                             * sb) / nb / nb / (nb - 1) / nb), 6)
                   AS z_stat,
               -- z² ≥ 3.8416 in exact rationals: Δ²·den ≥ crit·num
               -- with Δ = sa·nb − sb·na over the common denom na·nb
               10000 * (CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT)
                        * na)
                     * (CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT)
                        * na) * (na - 1) * (nb - 1)
               >= 38416 * (
                    (CAST(na AS HUGEINT) * ssa - CAST(sa AS HUGEINT)
                         * sa) * (nb - 1) * nb * nb
                  + (CAST(nb AS HUGEINT) * ssb - CAST(sb AS HUGEINT)
                         * sb) * (na - 1) * na * na)
                   AS significant_p05
        FROM w
    """


@query("q551_ab_test_means", oracle=_q551_oracle())
def q551_ab_test_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test on MEANS (revenue per purchase) — q539's proportions
    discipline extended to continuous metrics: per-arm count, sum and
    sum-of-squares accumulate as exact decimals (cents), the Welch z
    is reported at 6dp, and the significance verdict again decides in
    EXACT integer arithmetic — z² ≥ 3.8416 cleared of every division
    (Δ=sa·nb−sb·na over na·nb; variances as (nΣx²−(Σx)²)/(n(n−1)n);
    one cross-multiplied inequality in DECIMAL(38) / HUGEINT).  The
    float z is for humans; the hashed boolean cannot flake.

    Scale shape: one scan, a 2-row sufficient-statistics aggregate —
    the q527 pattern pointed at inference."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (
            F.instr(
                F.lit("01234567"),
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ab:"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    1,
                ),
            )
            > 0
        ).alias("arm_a"),
    )
    per = p.groupBy("arm_a").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "ss"
        ),
    ).localCheckpoint(eager=False)
    a = per.filter(F.col("arm_a")).select(
        F.col("n").alias("na"), F.col("s").alias("sa"),
        F.col("ss").alias("ssa"),
    )
    b = per.filter(~F.col("arm_a")).select(
        F.col("n").alias("nb"), F.col("s").alias("sb"),
        F.col("ss").alias("ssb"),
    )
    w = a.crossJoin(F.broadcast(b))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    delta = dec(F.col("sa")) * F.col("nb") - dec(F.col("sb")) * F.col("na")
    var_term_a = (
        (dec(F.col("na")) * F.col("ssa") - dec(F.col("sa")) * F.col("sa"))
        * (F.col("nb") - 1)
        * F.col("nb")
        * F.col("nb")
    )
    var_term_b = (
        (dec(F.col("nb")) * F.col("ssb") - dec(F.col("sb")) * F.col("sb"))
        * (F.col("na") - 1)
        * F.col("na")
        * F.col("na")
    )
    va = (
        F.col("na").cast("double") * F.col("ssa")
        - F.col("sa").cast("double") * F.col("sa")
    ) / F.col("na") / F.col("na") / (F.col("na") - 1) / F.col("na")
    vb = (
        F.col("nb").cast("double") * F.col("ssb")
        - F.col("sb").cast("double") * F.col("sb")
    ) / F.col("nb") / F.col("nb") / (F.col("nb") - 1) / F.col("nb")
    return w.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(
            F.col("sa").cast("double") / F.col("na") / 100, 6
        ).alias("mean_a"),
        F.round(
            F.col("sb").cast("double") / F.col("nb") / 100, 6
        ).alias("mean_b"),
        F.round(
            (
                F.col("sa").cast("double") / F.col("na")
                - F.col("sb").cast("double") / F.col("nb")
            )
            / F.sqrt(va + vb),
            6,
        ).alias("z_stat"),
        (
            F.lit(10000).cast("decimal(38,0)")
            * delta
            * delta
            * (F.col("na") - 1)
            * (F.col("nb") - 1)
            >= F.lit(38416).cast("decimal(38,0)")
            * (var_term_a + var_term_b)
        ).alias("significant_p05"),
    )


# q552 — position-based (U-shaped) multi-touch attribution ---------------

_Q552_FIRST_PCT = 40
_Q552_LAST_PCT = 40


def _q552_oracle() -> str:
    from databricks_etl_spark.plans.queries_round12 import _Q505_LOOKBACK_S

    return f"""
        WITH purchases AS MATERIALIZED (
            SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
            FROM events WHERE event_type = 'purchase'
        ),
        clicks AS MATERIALIZED (
            SELECT user_id, event_id AS click_id, ts AS c_ts
            FROM events WHERE event_type = 'click'
        ),
        touched AS MATERIALIZED (
            SELECT p.user_id, p.purchase_id, p.value, c.click_id,
                   row_number() OVER (PARTITION BY p.purchase_id
                       ORDER BY c.c_ts, c.click_id) AS pos,
                   CAST(COUNT(*) OVER (PARTITION BY p.purchase_id)
                        AS BIGINT) AS n_touches
            FROM purchases p JOIN clicks c
              ON p.user_id = c.user_id
             AND c.c_ts <= p.p_ts
             AND floor(epoch(p.p_ts)) - floor(epoch(c.c_ts))
                 <= {_Q505_LOOKBACK_S}
        ),
        shares AS (
            SELECT user_id, purchase_id, click_id,
                   CASE
                     WHEN n_touches = 1 THEN round(value, 6)
                     WHEN n_touches = 2 THEN round(value / 2, 6)
                     WHEN pos = 1
                         THEN round(value * {_Q552_FIRST_PCT} / 100, 6)
                     WHEN pos = n_touches
                         THEN round(value * {_Q552_LAST_PCT} / 100, 6)
                     ELSE round(value
                                * {100 - _Q552_FIRST_PCT - _Q552_LAST_PCT}
                                / 100 / (n_touches - 2), 6)
                   END AS share
            FROM touched
        )
        SELECT user_id,
               CAST(COUNT(DISTINCT purchase_id) AS BIGINT)
                   AS attributed_purchases,
               CAST(COUNT(*) AS BIGINT) AS touch_rows,
               CAST(SUM(CAST(share AS DECIMAL(28,6))) AS DOUBLE)
                   AS credited_value
        FROM shares GROUP BY user_id
    """


@query("q552_position_attribution", oracle=_q552_oracle())
def q552_position_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POSITION-BASED (U-shaped) attribution — the second attribution
    model next to q505's linear split: the first and last touches in
    the 7-day lookback earn {_Q552_FIRST_PCT}%/{_Q552_LAST_PCT}% of
    the purchase value, interior touches split the remainder
    ({100 - _Q552_FIRST_PCT - _Q552_LAST_PCT}%); one- and two-touch
    paths degrade to full / half shares.  Touch positions come from
    the (click time, click id) total order within each purchase
    window; every share 6dp-rounds before the exact decimal sum (the
    q505 billing discipline).  Together with q67 (last-touch), q505
    (linear) and q511 (streaming retractions) this completes the
    attribution model family a marketing platform ships.

    Scale shape: the same co-shuffle as q505 plus a per-purchase
    position window (bounded by clicks-per-user-week)."""
    from databricks_etl_spark.plans.queries_round12 import _Q505_LOOKBACK_S

    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    touched = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")
            <= _Q505_LOOKBACK_S
        ),
    )
    wp = Window.partitionBy("purchase_id")
    touched = touched.withColumn(
        "pos",
        F.row_number().over(wp.orderBy("c_ts", "click_id")),
    ).withColumn("n_touches", F.count(F.lit(1)).over(wp).cast("long"))
    mid_pct = 100 - _Q552_FIRST_PCT - _Q552_LAST_PCT
    share = (
        F.when(F.col("n_touches") == 1, F.round(F.col("value"), 6))
        .when(F.col("n_touches") == 2, F.round(F.col("value") / 2, 6))
        .when(
            F.col("pos") == 1,
            F.round(F.col("value") * _Q552_FIRST_PCT / 100, 6),
        )
        .when(
            F.col("pos") == F.col("n_touches"),
            F.round(F.col("value") * _Q552_LAST_PCT / 100, 6),
        )
        .otherwise(
            F.round(
                F.col("value") * mid_pct / 100 / (F.col("n_touches") - 2),
                6,
            )
        )
    )
    return (
        touched.withColumn("share", share)
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.countDistinct("purchase_id").cast("long").alias(
                "attributed_purchases"
            ),
            F.count(F.lit(1)).cast("long").alias("touch_rows"),
            F.sum(F.col("share").cast("decimal(28,6)"))
            .cast("double")
            .alias("credited_value"),
        )
    )


# q553 — DSAR access report (what do we hold about these subjects?) ------

_Q553_MOD = 37  # planted request set: user_id % 37 == 0


def _q553_oracle() -> str:
    return f"""
        WITH req AS MATERIALIZED (
            SELECT DISTINCT user_id FROM events
            WHERE user_id % {_Q553_MOD} = 0
        )
        SELECT 'events' AS table_name, 'user_id' AS link_column,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM req) AS n_subjects,
               CAST(COUNT(*) AS BIGINT) AS n_rows_held,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
                   AS n_subjects_present
        FROM events e JOIN req ON e.user_id = req.user_id
        UNION ALL
        SELECT 'customer', 'c_custkey',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM req),
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT)
        FROM customer c JOIN req ON c.c_custkey = req.user_id
        UNION ALL
        SELECT 'orders', 'o_custkey',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM req),
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
        FROM orders o JOIN req ON o.o_custkey = req.user_id
    """


@query("q553_dsar_access_report", oracle=_q553_oracle())
def q553_dsar_access_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSAR ACCESS report — the right-of-access complement of q479's
    right-to-be-forgotten: for a planted data-subject request set,
    how many rows each table holds about them, per table with its
    linking column, subject coverage included (a subject with zero
    rows in a table is a meaningful null result the report must
    state).  This is the inventory a privacy office exports before
    an erasure (q479) or a portability bundle, and the same keyed
    semi-join discipline does all three.

    Scale shape: the request set broadcasts into keyed joins per
    table — three filtered aggregates, no table ever shuffles on the
    request key."""
    ev = read_table(spark, sf_dir, "events")
    req = (
        ev.filter(F.col("user_id") % _Q553_MOD == 0)
        .select("user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_req = req.agg(F.count(F.lit(1)).cast("long").alias("n_subjects"))

    def card(name: str, link: str, df: DataFrame, key: str) -> DataFrame:
        j = df.join(
            F.broadcast(req.withColumnRenamed("user_id", key)), key
        )
        return (
            j.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows_held"),
                F.countDistinct(key).cast("long").alias(
                    "n_subjects_present"
                ),
            )
            .crossJoin(F.broadcast(n_req))
            .select(
                F.lit(name).alias("table_name"),
                F.lit(link).alias("link_column"),
                "n_subjects",
                "n_rows_held",
                "n_subjects_present",
            )
        )

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        card("events", "user_id", ev, "user_id")
        .unionByName(card("customer", "c_custkey", c, "c_custkey"))
        .unionByName(card("orders", "o_custkey", o, "o_custkey"))
    )


# q554 — feature-store materialization (user feature table) --------------

_Q554_AS_OF = "2024-02-01"


def _q554_oracle() -> str:
    return f"""
        WITH u AS MATERIALIZED (
            SELECT DISTINCT user_id FROM events
        ),
        pur AS MATERIALIZED (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   CAST(SUM(CAST(round(value * 100, 0)
                                 AS DECIMAL(28,0))) AS BIGINT)
                       AS monetary_cents,
                   datediff('day', MAX(CAST(ts AS DATE)),
                            DATE '{_Q554_AS_OF}') AS rec_days
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        decay AS MATERIALIZED (
            SELECT user_id,
                   CAST(SUM(CAST(round(value / (CAST(1 AS BIGINT)
                        << (datediff('day', CAST(ts AS DATE),
                            DATE '{_Q554_AS_OF}') // 7)), 6)
                        AS DECIMAL(28,6))) AS DOUBLE) AS decay_hl7d
            FROM events
            WHERE event_type = 'purchase'
              AND datediff('day', CAST(ts AS DATE),
                           DATE '{_Q554_AS_OF}')
                  BETWEEN 0 AND {_Q513_MAX_AGE}
            GROUP BY 1
        ),
        s AS MATERIALIZED (
            SELECT user_id,
                   MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t0
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        c AS MATERIALIZED (
            SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t1
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s.t0
              AND CAST(floor(epoch(e.ts)) AS BIGINT) - s.t0
                  <= {_Q524_STEP_S}
            GROUP BY 1
        ),
        p3 AS MATERIALIZED (
            SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t2
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= c.t1
              AND CAST(floor(epoch(e.ts)) AS BIGINT) - c.t1
                  <= {_Q524_STEP_S}
            GROUP BY 1
        )
        SELECT u.user_id,
               COALESCE(pur.frequency, 0) AS frequency,
               COALESCE(pur.monetary_cents, 0) AS monetary_cents,
               CAST(COALESCE(pur.rec_days, -1) AS BIGINT) AS rec_days,
               round(COALESCE(decay.decay_hl7d, 0.0), 6) AS decay_hl7d,
               CAST(CASE WHEN p3.user_id IS NOT NULL THEN 3
                         WHEN c.user_id IS NOT NULL THEN 2
                         WHEN s.user_id IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS funnel_stage
        FROM u
        LEFT JOIN pur ON u.user_id = pur.user_id
        LEFT JOIN decay ON u.user_id = decay.user_id
        LEFT JOIN s ON u.user_id = s.user_id
        LEFT JOIN c ON u.user_id = c.user_id
        LEFT JOIN p3 ON u.user_id = p3.user_id
    """


@query("q554_feature_store_materialization", oracle=_q554_oracle())
def q554_feature_store_materialization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FEATURE-STORE materialization — the user feature table a churn
    model trains on, composing this round's primitives into ONE
    deterministic artifact: RFM raw features (recency days vs the
    pinned as-of, frequency, monetary cents), the dyadic decay score
    (q513's exact kernel at the 7-day half-life), and the furthest
    funnel stage reached (q524's chain, 0–3).  Missing features
    resolve to explicit sentinels (-1 recency, 0 elsewhere) — a
    feature table must be total over the entity set or training
    silently drops rows.  Every feature is exact, so the WHOLE
    training table is hash-checked — the property a feature store
    needs before anyone debugs train/serve skew (q555 then measures
    exactly that).

    Scale shape: one entity scan plus four keyed aggregates joined
    back at user grain — materialization is embarrassingly keyed."""
    return _q554_features(read_table(spark, sf_dir, "events"))


def _q554_features(e: DataFrame) -> DataFrame:
    """q554's feature build over an arbitrary events relation — the
    SAME code path serves the offline lane and q555's online rebuild
    (which is the audit's point: one definition, two data paths)."""
    u = e.select("user_id").distinct()
    pur = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("decimal(28,0)")
            )
            .cast("long")
            .alias("monetary_cents"),
            F.datediff(
                F.lit(_Q554_AS_OF).cast("date"),
                F.max(F.col("ts").cast("date")),
            ).alias("rec_days"),
        )
    )
    age = F.datediff(
        F.lit(_Q554_AS_OF).cast("date"), F.col("ts").cast("date")
    )
    decay = (
        e.filter(
            (F.col("event_type") == "purchase")
            & (age >= 0)
            & (age <= _Q513_MAX_AGE)
        )
        .select(
            "user_id",
            F.round(
                F.col("value")
                / F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(datediff("
                    f"DATE'{_Q554_AS_OF}', CAST(ts AS DATE)) DIV 7"
                    " AS INT))"
                ),
                6,
            )
            .cast("decimal(28,6)")
            .alias("t"),
        )
        .groupBy("user_id")
        .agg(F.sum("t").cast("double").alias("decay_hl7d"))
    )
    ep = F.unix_timestamp("ts")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ep).alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(
            (ep >= F.col("t0")) & (ep - F.col("t0") <= _Q524_STEP_S)
        )
        .groupBy("user_id")
        .agg(F.min(ep).alias("t1"))
    )
    p3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (ep >= F.col("t1")) & (ep - F.col("t1") <= _Q524_STEP_S)
        )
        .groupBy("user_id")
        .agg(F.min(ep).alias("t2"))
    )
    return (
        u.join(pur, "user_id", "left")
        .join(decay, "user_id", "left")
        .join(s.select("user_id", F.lit(1).alias("__s")), "user_id", "left")
        .join(c.select("user_id", F.lit(1).alias("__c")), "user_id", "left")
        .join(
            p3.select("user_id", F.lit(1).alias("__p")), "user_id", "left"
        )
        .select(
            "user_id",
            F.coalesce("frequency", F.lit(0)).cast("long").alias(
                "frequency"
            ),
            F.coalesce("monetary_cents", F.lit(0)).cast("long").alias(
                "monetary_cents"
            ),
            F.coalesce("rec_days", F.lit(-1)).cast("long").alias(
                "rec_days"
            ),
            F.round(F.coalesce("decay_hl7d", F.lit(0.0)), 6).alias(
                "decay_hl7d"
            ),
            F.when(F.col("__p").isNotNull(), 3)
            .when(F.col("__c").isNotNull(), 2)
            .when(F.col("__s").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("funnel_stage"),
        )
    )


# q555 — train/serve skew audit (batch vs streaming-derived features) ----


@query(
    "q555_train_serve_skew_audit",
    oracle="""
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS n_entities_compared,
               CAST(0 AS BIGINT) AS n_skewed_entities,
               TRUE AS paths_agree
        FROM events
    """,
    )
def q555_train_serve_skew_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRAIN/SERVE SKEW audit — the feature-store failure mode that
    silently ruins models: the OFFLINE path (q554's batch
    materialization) and the ONLINE path (the same features rebuilt
    from streaming-landed partials — per-epoch purchase grain, the
    q522 sink discipline) must produce IDENTICAL features for every
    entity.  The audit recomputes both sides and counts per-entity
    mismatches across all feature columns; the oracle pins zero skew
    and full entity coverage — any divergence between the two
    pipelines (a rounding order, a late-data cutoff, a sentinel
    default) flips the hashed verdict.

    Scale shape: both feature builds are keyed aggregates; the
    comparison is one join at entity grain."""
    import shutil

    from databricks_etl_spark.sources.writers import scratch_dir

    offline = q554_feature_store_materialization(spark, sf_dir)
    # "online": land raw event partials per epoch, rebuild features
    # from the landed union (a real deployment folds per-epoch
    # feature partials; landing grain keeps this audit total)
    e = read_table(spark, sf_dir, "events")
    root = scratch_dir("tss_stream_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/events"
    for epoch, batch in [
        (0, e.filter(F.col("event_id") % 2 == 0)),
        (1, e.filter(F.col("event_id") % 2 == 1)),
    ]:
        (
            batch.withColumn("__epoch", F.lit(epoch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(path)
        )
    landed = (
        spark.read.schema(
            "event_id long, user_id long, event_type string,"
            " ts timestamp_ntz, value double, __epoch int"
        )
        .parquet(path)
        .drop("__epoch")
    )

    # rebuild via the SAME feature definition against the landed
    # relation: the audit would be vacuous if online re-used the
    # offline frame
    online = _q554_features(landed)
    diff = (
        offline.exceptAll(online).count()
        + online.exceptAll(offline).count()
    )
    n = offline.count()
    return spark.createDataFrame(
        [(n, diff // 2 if diff else 0, diff == 0)],
        "n_entities_compared long, n_skewed_entities long,"
        " paths_agree boolean",
    )


# q556 — hot-key detection (the measured case for salting) ---------------

_Q556_TOP = 10


def _q556_oracle() -> str:
    return f"""
        WITH per AS MATERIALIZED (
            SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT SUM(c) AS n, COUNT(*) AS nk,
                       MAX(c) AS mx FROM per),
        top AS (
            SELECT k, c,
                   row_number() OVER (ORDER BY c DESC, k) AS rk
            FROM per QUALIFY rk <= {_Q556_TOP}
        )
        SELECT top.k AS hot_key, top.c AS n_rows,
               CAST(top.rk AS BIGINT) AS rank,
               round(CAST(top.c AS DOUBLE) / tot.n, 6) AS share,
               -- skew verdict in exact integers: max key exceeds 4x
               -- the mean key load ⇔ mx·nk > 4·n
               CAST(tot.mx AS HUGEINT) * tot.nk > 4 * CAST(tot.n AS HUGEINT)
                   AS salting_recommended
        FROM top, tot
    """


@query("q556_hot_key_detection", oracle=_q556_oracle())
def q556_hot_key_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOT-KEY detection — the measurement that DECIDES salting
    (q147/q387 apply it; this lane says when): per-join-key row
    counts, the top-{_Q556_TOP} heaviest keys with their load shares,
    and the salting verdict in exact integer cross-multiplication
    (max key load > 4× the mean key load).  On uniform TPC-H
    supplier keys the verdict is NO — the honest null result; the
    q387 planted-hot-key fixtures show the YES path.  This card is
    what AQE's skew-join statistics look like surfaced as a relation.

    Scale shape: one grouped count (the key histogram every shuffle
    already materializes), a top-k heap, a 1-row stat combine."""
    li = read_table(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    tot = per.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nk"),
        F.max("c").alias("mx"),
    )
    # TakeOrderedAndProject for the heap, then rank over the ≤10-row
    # result (a global row_number window over the key histogram would
    # single-partition-sort |keys| rows — the forbidden shape)
    top10 = per.orderBy(F.desc("c"), F.asc("k")).limit(_Q556_TOP)
    w = Window.orderBy(F.desc("c"), F.asc("k"))  # ≤10 rows here
    top = top10.withColumn("rk", F.row_number().over(w))
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("k").alias("hot_key"),
        F.col("c").alias("n_rows"),
        F.col("rk").cast("long").alias("rank"),
        F.round(F.col("c").cast("double") / F.col("n"), 6).alias("share"),
        (
            F.col("mx").cast("decimal(38,0)") * F.col("nk")
            > F.lit(4).cast("decimal(38,0)") * F.col("n")
        ).alias("salting_recommended"),
    )


# q557 — salted-join equivalence (the rewrite's correctness proof) -------

_Q557_SALT = 8


def _q557_oracle() -> str:
    return """
        SELECT s.s_nationkey AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS total_qty
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_nationkey
    """


@query("q557_salted_join_equivalence", oracle=_q557_oracle())
def q557_salted_join_equivalence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SALTED-JOIN EQUIVALENCE — the correctness proof of the skew
    rewrite q556 recommends: the fact side gets a deterministic salt
    (md5 of the row key, mod {_Q557_SALT}), the dimension side
    replicates across all {_Q557_SALT} salt values, and the join runs
    on (key, salt) — splitting every hot key's row group across
    {_Q557_SALT} reducers.  The oracle is the PLAIN unsalted join:
    hash equality proves the rewrite changes the partitioning and
    nothing else (the q512 proof discipline applied to skew).  The
    salt must be derived from something the join predicate doesn't
    see — here the fact row identity — so no pair is lost or doubled.

    Scale shape: the dimension replicates {_Q557_SALT}× (dimension-
    sized, cheap); the fact side never replicates; every hot key's
    group fans out {_Q557_SALT}-ways — the entire point."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_quantity",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("l_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % _Q557_SALT
        ).alias("salt"),
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    salts = spark.range(_Q557_SALT).select(F.col("id").alias("salt"))
    s_rep = s.crossJoin(F.broadcast(salts))
    return (
        li.join(s_rep, ["l_suppkey", "salt"])
        .groupBy(F.col("s_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("total_qty"),
        )
    )


# q558 — order/line reconciliation (double-entry audit) ------------------

_Q558_BANDS = [0, 100, 1000, 10000, 100000]  # |delta| cents band edges


def _q558_oracle() -> str:
    band = "CASE "
    for i, lo in enumerate(_Q558_BANDS):
        hi = (
            _Q558_BANDS[i + 1] if i + 1 < len(_Q558_BANDS) else None
        )
        if hi is None:
            band += f"ELSE '{lo}+' "
        else:
            band += (
                f"WHEN adx < {hi} THEN '{lo}-{hi}' "
            )
    band += "END"
    return f"""
        WITH lines AS MATERIALIZED (
            SELECT l_orderkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            * (1 + l_tax) AS DECIMAL(28,6))) AS line_total
            FROM lineitem GROUP BY 1
        ),
        rec AS MATERIALIZED (
            SELECT o.o_orderkey,
                   CAST(round((CAST(o.o_totalprice AS DECIMAL(28,6))
                               - lines.line_total) * 100, 0) AS BIGINT)
                       AS delta_cents
            FROM orders o JOIN lines ON o.o_orderkey = lines.l_orderkey
        ),
        banded AS (
            SELECT ABS(delta_cents) AS adx, delta_cents FROM rec
        )
        SELECT {band} AS delta_band,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN delta_cents > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_over,
               CAST(SUM(CASE WHEN delta_cents < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_under,
               CAST(SUM(CASE WHEN delta_cents = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_reconciled
        FROM banded GROUP BY 1
    """


@query("q558_order_reconciliation", oracle=_q558_oracle())
def q558_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER/LINE RECONCILIATION — the double-entry audit a finance
    pipeline runs nightly: each order's header total against the
    TPC-H pricing identity over its lines (extprice·(1−disc)·(1+tax),
    exact decimal), deltas in exact cents, banded by magnitude with
    over/under/reconciled splits.  On THIS synthetic corpus the
    header totals are generated independently of the lines, so ZERO
    orders reconcile — the audit correctly reports a systemic break
    (the q549 honest-detection discipline: the lane's value is that
    it WOULD catch this in production, and here it provably does).

    Scale shape: one line-grain aggregate co-shuffled with the header
    join, a banded rollup — reconciliation is one keyed pass."""
    li = read_table(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).cast("decimal(28,6)")
        ).alias("line_total")
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    rec = o.join(lines, "l_orderkey").select(
        F.round(
            (
                F.col("o_totalprice").cast("decimal(28,6)")
                - F.col("line_total")
            )
            * 100,
            0,
        )
        .cast("long")
        .alias("delta_cents")
    )
    adx = F.abs(F.col("delta_cents"))
    band = None
    for i, lo in enumerate(_Q558_BANDS):
        hi = _Q558_BANDS[i + 1] if i + 1 < len(_Q558_BANDS) else None
        if hi is None:
            tail = F.lit(f"{lo}+")
        else:
            cond = adx < hi
            lbl = F.lit(f"{lo}-{hi}")
            band = (
                F.when(cond, lbl) if band is None else band.when(cond, lbl)
            )
    band = band.otherwise(tail)
    return rec.select(band.alias("delta_band"), "delta_cents").groupBy(
        "delta_band"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("delta_cents") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_over"),
        F.sum(F.when(F.col("delta_cents") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_under"),
        F.sum(F.when(F.col("delta_cents") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_reconciled"),
    )


# q559 — brand affinity matrix (category-grain market basket) ------------

_Q559_MIN_PAIR = 5


def _q559_oracle() -> str:
    return f"""
        WITH items AS MATERIALIZED (
            SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
        sup AS MATERIALIZED (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS s FROM items GROUP BY 1
        ),
        pairs AS (
            SELECT a.b AS brand_a, c.b AS brand_b,
                   CAST(COUNT(*) AS BIGINT) AS pair_orders
            FROM items a JOIN items c
              ON a.ok = c.ok AND a.b < c.b
            GROUP BY 1, 2
            HAVING COUNT(*) >= {_Q559_MIN_PAIR}
        )
        SELECT p.brand_a, p.brand_b, p.pair_orders,
               round(CAST(p.pair_orders AS DOUBLE) * (SELECT n FROM n)
                     / (sa.s * sb.s), 6) AS lift,
               CAST(p.pair_orders AS HUGEINT) * (SELECT n FROM n)
                   > CAST(sa.s AS HUGEINT) * sb.s AS positively_associated
        FROM pairs p
        JOIN sup sa ON p.brand_a = sa.b
        JOIN sup sb ON p.brand_b = sb.b
    """


@query("q559_brand_affinity_matrix", oracle=_q559_oracle())
def q559_brand_affinity_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BRAND AFFINITY matrix — q504's market basket lifted to
    category grain, where merchandising decisions actually happen:
    distinct (order, brand) incidences, co-occurrence counts from the
    key-local self-join (bounded per order), lift against
    independence, and the positive-association verdict in exact
    integer cross-multiplication (pair·N > s_a·s_b — never a float
    threshold).  Category grain keeps supports dense where item-grain
    pairs (q504) go sparse — the reason affinity analyses run at both
    grains.

    Scale shape: the brand projection collapses the item dimension
    before the self-join (≤|brands| incidences per order); supports
    join back unhinted (brand cardinality is small but the q504
    lesson stands — let AQE decide)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), "l_partkey"
    )
    p = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("b")
    )
    items = li.join(p, "l_partkey").select("ok", "b").distinct() \
        .localCheckpoint(eager=False)
    n = items.select("ok").distinct().count()
    sup = items.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("s"))
    a = items.select("ok", F.col("b").alias("brand_a"))
    c = items.select(F.col("ok").alias("ok2"), F.col("b").alias("brand_b"))
    pairs = (
        a.join(c, (a.ok == c.ok2) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_orders"))
        .filter(F.col("pair_orders") >= _Q559_MIN_PAIR)
    )
    sa = sup.select(F.col("b").alias("brand_a"), F.col("s").alias("sa"))
    sb = sup.select(F.col("b").alias("brand_b"), F.col("s").alias("sb"))
    return (
        pairs.join(sa, "brand_a")
        .join(sb, "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(
                F.col("pair_orders").cast("double")
                * n
                / (F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
            (
                F.col("pair_orders").cast("decimal(38,0)") * F.lit(n)
                > F.col("sa").cast("decimal(38,0)") * F.col("sb")
            ).alias("positively_associated"),
        )
    )


# q560 — grouped boxplot statistics (exact quartiles per group) ----------


def _q560_oracle() -> str:
    return """
        WITH per AS MATERIALIZED (
            SELECT c_nationkey AS nation, o_custkey,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                   row_number() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY round(o_totalprice * 100, 0), o_orderkey
                   ) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY c_nationkey)
                        AS BIGINT) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        quart AS (
            SELECT nation, MAX(n) AS n,
                   MIN(CASE WHEN rk = (n + 3) // 4 THEN cents END) AS q1,
                   MIN(CASE WHEN rk = (n + 1) // 2 THEN cents END) AS med,
                   MIN(CASE WHEN rk = (3 * n + 1) // 4 THEN cents END)
                       AS q3
            FROM per GROUP BY nation
        )
        SELECT q.nation, q.n AS n_orders,
               q.q1 AS q1_cents, q.med AS median_cents, q.q3 AS q3_cents,
               q.q3 - q.q1 AS iqr_cents,
               -- outliers beyond 1.5·IQR in integer arithmetic
               (SELECT CAST(COUNT(*) AS BIGINT) FROM per
                WHERE per.nation = q.nation
                  AND (2 * per.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)
                       OR 2 * per.cents < 2 * q.q1 - 3 * (q.q3 - q.q1)))
                   AS n_outliers
        FROM quart q
    """


@query("q560_grouped_boxplot_stats", oracle=_q560_oracle())
def q560_grouped_boxplot_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GROUPED BOXPLOT statistics — the per-segment distribution card
    every BI tool draws: exact lower quartile/median/upper quartile of
    order value per nation (rank-⌈n/4⌉/⌈n/2⌉/⌈3n/4⌉ elements of the
    per-group total order — actual values, the q531 lower-statistic
    discipline), the IQR, and Tukey-fence outlier counts with the
    1.5·IQR comparison cross-multiplied into integers (2x > 2·q3 +
    3·IQR).  Per-GROUP quartiles use partitioned windows — bounded by
    group size, the scale-safe window class (unlike global quantiles,
    which ride exact_ntile).

    Scale shape: one join, one partitioned rank window per group, a
    |groups|-row rollup + one fence-count pass."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    per = o.join(c, "o_custkey").select(
        "nation",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("nation").orderBy("cents", "o_orderkey")
    ranked = per.select(
        "nation",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("nation")).cast(
            "long"
        ).alias("n"),
    ).localCheckpoint(eager=False)
    # rank targets in integer DIV (a float /4 could misround a boundary)
    quart = ranked.groupBy("nation").agg(
        F.max("n").alias("n_orders"),
        F.min(
            F.when(
                F.col("rk") == F.expr("(n + 3) DIV 4"), F.col("cents")
            )
        ).alias("q1_cents"),
        F.min(
            F.when(
                F.col("rk") == F.expr("(n + 1) DIV 2"), F.col("cents")
            )
        ).alias("median_cents"),
        F.min(
            F.when(
                F.col("rk") == F.expr("(3 * n + 1) DIV 4"), F.col("cents")
            )
        ).alias("q3_cents"),
    )
    fences = ranked.select("nation", "cents").join(quart, "nation")
    outliers = fences.filter(
        (
            2 * F.col("cents")
            > 2 * F.col("q3_cents")
            + 3 * (F.col("q3_cents") - F.col("q1_cents"))
        )
        | (
            2 * F.col("cents")
            < 2 * F.col("q1_cents")
            - 3 * (F.col("q3_cents") - F.col("q1_cents"))
        )
    ).groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_outliers")
    )
    return (
        quart.join(outliers, "nation", "left")
        .select(
            "nation",
            "n_orders",
            "q1_cents",
            "median_cents",
            "q3_cents",
            (F.col("q3_cents") - F.col("q1_cents")).alias("iqr_cents"),
            F.coalesce("n_outliers", F.lit(0)).cast("long").alias(
                "n_outliers"
            ),
        )
    )


# q561 — process-conformance checking (allowed-transition audit) ---------

# the declared process model: which event-type transitions a healthy
# user journey is ALLOWED to make (everything else is a deviation)
_Q561_ALLOWED = [
    ("signup", "view"), ("view", "view"), ("view", "click"),
    ("click", "view"), ("click", "purchase"), ("purchase", "view"),
    ("view", "error"), ("error", "view"),
]


def _q561_oracle() -> str:
    allowed = " UNION ALL ".join(
        f"SELECT '{a}' AS from_type, '{b}' AS to_type"
        for a, b in _Q561_ALLOWED
    )
    return f"""
        WITH seq AS MATERIALIZED (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        trans AS MATERIALIZED (
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
        ),
        allowed AS MATERIALIZED ({allowed})
        SELECT t.from_type, t.to_type, t.n AS n_transitions,
               a.from_type IS NOT NULL AS conforms
        FROM trans t LEFT JOIN allowed a
          ON t.from_type = a.from_type AND t.to_type = a.to_type
    """


@query("q561_process_conformance", oracle=_q561_oracle())
def q561_process_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROCESS-MINING conformance checking — the declared journey
    model (an allowed-transition whitelist) against the observed
    transition matrix (q526's relation): every observed transition
    with its count and a conformance verdict; non-conforming mass is
    the process debt an operations team works down.  On this corpus
    event types are generated independently, so most transitions
    occur and the deviations are load-bearing (non-empty, pinned by
    the |types|² vs |allowed| gap).

    Scale shape: one partitioned lag window + grouped count (q526's
    shape) left-joined against a literal whitelist."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    allowed = spark.createDataFrame(
        _Q561_ALLOWED, "from_type string, to_type string"
    ).withColumn("__ok", F.lit(1))
    return trans.join(allowed, ["from_type", "to_type"], "left").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.col("__ok").isNotNull().alias("conforms"),
    )


# q562 — top event paths of length 3 (sequence trigrams) -----------------

_Q562_TOP = 15


def _q562_oracle() -> str:
    return f"""
        WITH seq AS MATERIALIZED (
            SELECT event_type AS a,
                   lead(event_type, 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS b,
                   lead(event_type, 2) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS c
            FROM events
        ),
        tri AS (
            SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
            GROUP BY 1, 2, 3
        )
        SELECT a || '>' || b || '>' || c AS path, n AS n_paths
        FROM tri
        ORDER BY n DESC, path
        LIMIT {_Q562_TOP}
    """


@query("q562_top_event_paths", oracle=_q562_oracle())
def q562_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP EVENT PATHS (length-3 sequence mining) — the "what do users
    actually do" report behind every journey map: per-user consecutive
    event trigrams via double lead (the W1 discipline), counted and
    top-{_Q562_TOP} by frequency with a path-string tiebreak (counts
    are integers, so the order is exact).  The trigram grain is where
    journey analysis starts paying beyond q526's pairs — long enough
    to see intent (view>click>purchase vs view>click>view), short
    enough to stay dense.

    Scale shape: one partitioned window pass, a grouped count over
    ≤|types|³ rows, a top-k heap."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    tri = seq.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    return (
        tri.select(
            F.concat_ws(">", "a", "b", "c").alias("path"), "n_paths"
        )
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(_Q562_TOP)
    )


# q563 — activity heatmap (day-of-week × hour matrix) --------------------


def _q563_oracle() -> str:
    return """
        WITH cells AS (
            SELECT dayofweek(CAST(ts AS DATE)) + 1 AS dow,
                   CAST(hour(ts) AS BIGINT) AS hr,
                   event_type
            FROM events
        )
        SELECT CAST(dow AS BIGINT) AS dow, hr,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
        FROM cells GROUP BY dow, hr
    """


@query("q563_activity_heatmap", oracle=_q563_oracle())
def q563_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTIVITY HEATMAP — the day-of-week × hour-of-day intensity
    matrix every ops dashboard opens with (when do users act? when do
    purchases cluster?), as a ≤7×24-cell relation with total and
    purchase counts per cell.  NTZ hour extraction is
    timezone-pinned by construction; the DuckDB dow convention is
    aligned to Spark's (+1, the q530 fix).

    Scale shape: one scan, one ≤168-group aggregate — the canonical
    map-side-combine shape."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.select(
            F.dayofweek(F.col("ts").cast("date")).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
            "event_type",
        )
        .groupBy("dow", "hr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_purchases"),
        )
    )


# q564 — STREAMING RFM (twin of q547: associative partials, drain ranks) -


def _q564_oracle() -> str:
    from databricks_etl_spark.plans.registry import QUERIES

    return QUERIES["q547_rfm_segmentation"].oracle


@query("q564_streaming_rfm", oracle=_q564_oracle())
def q564_streaming_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q547's RFM segmentation maintained AT INGEST — the pattern for
    any quantile-based segmentation under streaming: the per-customer
    RAW aggregates (max order date, count, cents) are ASSOCIATIVE, so
    each epoch lands only its per-customer partials; the drain merges
    them (max/sum/sum) and runs the three exact-quantile passes on
    the merged customer grain — because quantile BOUNDARIES are
    global properties, re-ranking at drain is the correct semantics
    (an epoch-local rank would segment against a partial population;
    the reason feature platforms version their segment cut-offs).
    Drain ≡ q547's oracle under any order-stream slicing.

    Scale shape: per-epoch state is customer-grain partials; the
    drain is q547's rank passes."""
    import shutil

    from databricks_etl_spark.operators.quantile_bucket import exact_ntile
    from databricks_etl_spark.sources.writers import scratch_dir

    o = read_table(spark, sf_dir, "orders")
    root = scratch_dir("rfm_stream_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/partials"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
                F.count(F.lit(1)).cast("long").alias("freq"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast(
                        "decimal(28,0)"
                    )
                )
                .cast("long")
                .alias("cents"),
            )
            .withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(path)
        )

    for _ep in range(_STREAM_EPOCHS):
        ingest(o.filter(
            F.col("o_orderkey") % _STREAM_EPOCHS == _ep), _ep)
    per = (
        spark.read.schema(
            "custkey long, last_d date, freq long, cents long,"
            " __epoch int"
        )
        .parquet(path)
        .groupBy("custkey")
        .agg(
            F.datediff(
                F.lit(_Q547_AS_OF).cast("date"), F.max("last_d")
            ).alias("rec_days"),
            F.sum("freq").cast("long").alias("freq"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .localCheckpoint(eager=False)
    )
    r = exact_ntile(
        per, [F.desc("rec_days"), F.asc("custkey")], _Q547_Q,
        out_col="r_score",
    ).select("custkey", "r_score")
    f = exact_ntile(
        per, ["freq", "custkey"], _Q547_Q, out_col="f_score"
    ).select("custkey", "f_score")
    m = exact_ntile(
        per, ["cents", "custkey"], _Q547_Q, out_col="m_score"
    ).select("custkey", "m_score")
    return (
        per.join(r, "custkey")
        .join(f, "custkey")
        .join(m, "custkey")
        .groupBy(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("segment_cents"),
        )
    )


# q565 — cohort-week LTV with dyadic discounting -------------------------


def _q565_oracle() -> str:
    return """
        WITH first_seen AS MATERIALIZED (
            SELECT user_id,
                   MIN(datediff('day', DATE '1970-01-01',
                                CAST(ts AS DATE))) AS d0
            FROM events GROUP BY 1
        ),
        rev AS MATERIALIZED (
            SELECT e.user_id,
                   (first_seen.d0 - (SELECT MIN(d0) FROM first_seen))
                       // 7 AS cohort_week,
                   (datediff('day', DATE '1970-01-01', CAST(e.ts AS DATE))
                    - first_seen.d0) // 7 AS week_offset,
                   CAST(round(e.value * 100, 0) AS BIGINT) AS cents
            FROM events e JOIN first_seen ON e.user_id = first_seen.user_id
            WHERE e.event_type = 'purchase'
        ),
        cells AS MATERIALIZED (
            SELECT cohort_week, week_offset,
                   CAST(SUM(CAST(cents AS DECIMAL(28,0))) AS BIGINT)
                       AS revenue_cents
            FROM rev GROUP BY 1, 2
        )
        SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
               CAST(week_offset AS BIGINT) AS week_offset,
               revenue_cents,
               CAST(SUM(revenue_cents) OVER (
                   PARTITION BY cohort_week ORDER BY week_offset
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ltv_cents,
               round(CAST(revenue_cents AS DOUBLE)
                     / (CAST(1 AS BIGINT) << week_offset), 6)
                   AS discounted_cents
        FROM cells
    """


@query("q565_cohort_ltv_discounted", oracle=_q565_oracle())
def q565_cohort_ltv_discounted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COHORT LTV triangle with DYADIC discounting — the finance view
    of q91's retention triangle: users cohorted by first-seen week,
    purchase revenue bucketed by week offset since joining, the
    cumulative LTV curve per cohort (partitioned running sum over the
    bounded offset axis), and a present-value column discounted at
    the dyadic rate (dividing by 2^offset is exact — the q513
    discipline — so even the discounted view is hash-stable).  The
    triangle shape (younger cohorts have fewer observed offsets) is
    the censoring q540 treats formally.

    Scale shape: one first-seen aggregate, one keyed join, a
    cohort×offset-grain rollup with a bounded partitioned window."""
    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    first_seen = e.groupBy("user_id").agg(F.min(day).alias("d0"))
    base = first_seen.agg(F.min("d0").alias("base")).localCheckpoint(eager=False)
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .crossJoin(F.broadcast(base))
        .withColumn("off_d", day - F.col("d0"))
        .select(
            F.expr("(d0 - base) DIV 7").alias("cohort_week"),
            # integer DIV like the cohort axis — no float boundary
            F.expr("off_d DIV 7").alias("week_offset"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    cells = rev.groupBy("cohort_week", "week_offset").agg(
        F.sum(F.col("cents").cast("decimal(28,0)"))
        .cast("long")
        .alias("revenue_cents")
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cells.select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("week_offset").cast("long").alias("week_offset"),
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("long").alias(
            "cum_ltv_cents"
        ),
        F.round(
            F.col("revenue_cents").cast("double")
            / F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                " CAST(week_offset AS INT))"
            ),
            6,
        ).alias("discounted_cents"),
    )


# q566 — growth accounting (new / retained / resurrected / churned) ------


def _q566_oracle() -> str:
    return """
        WITH du AS MATERIALIZED (
            SELECT DISTINCT
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS d, user_id
            FROM events
        ),
        f AS MATERIALIZED (
            SELECT user_id, MIN(d) AS d0 FROM du GROUP BY 1
        ),
        days AS MATERIALIZED (SELECT DISTINCT d FROM du)
        SELECT days.d AS day,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM du a
                JOIN f ON a.user_id = f.user_id
                WHERE a.d = days.d AND f.d0 = days.d) AS new_users,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM du a
                JOIN du b ON a.user_id = b.user_id AND b.d = days.d - 1
                JOIN f ON a.user_id = f.user_id
                WHERE a.d = days.d AND f.d0 < days.d) AS retained,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM du a
                JOIN f ON a.user_id = f.user_id
                WHERE a.d = days.d AND f.d0 < days.d
                  AND NOT EXISTS (SELECT 1 FROM du b
                                  WHERE b.user_id = a.user_id
                                    AND b.d = days.d - 1)) AS resurrected,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM du a
                WHERE a.d = days.d - 1
                  AND NOT EXISTS (SELECT 1 FROM du b
                                  WHERE b.user_id = a.user_id
                                    AND b.d = days.d)) AS churned_from_prev
        FROM days
    """


@query("q566_growth_accounting", oracle=_q566_oracle())
def q566_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING — the new/retained/resurrected/churned
    decomposition (the Social Capital framework) that explains WHERE
    a DAU number came from: per day, users active for the first time
    ever (new), active yesterday too (retained), active before but
    not yesterday (resurrected), and yesterday's actives who went
    silent today (churned).  All four classes from the (day, user)
    grain with first-seen joins and day-adjacent anti/semi-joins —
    exact integers, and the identity DAU = new + retained +
    resurrected holds by construction (pinned by test).

    Scale shape: the grain relation (one dedup shuffle) feeds four
    keyed joins on (user, day±1) — no window over user history."""
    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    du = e.select(day.alias("d"), "user_id").distinct().localCheckpoint(eager=False)
    f = du.groupBy("user_id").agg(F.min("d").alias("d0"))
    days = du.select("d").distinct()
    today = du.join(f, "user_id")
    prev = du.select(
        (F.col("d") + 1).alias("pd1"), F.col("user_id").alias("u2")
    )
    today_flags = (
        today.join(
            prev,
            (F.col("d") == F.col("pd1"))
            & (F.col("user_id") == F.col("u2")),
            "left",
        )
        .select(
            "d",
            "user_id",
            (F.col("d0") == F.col("d")).alias("is_new"),
            F.col("u2").isNotNull().alias("active_prev"),
        )
    )
    per_day = today_flags.groupBy("d").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(
            F.when(~F.col("is_new") & F.col("active_prev"), 1).otherwise(0)
        )
        .cast("long")
        .alias("retained"),
        F.sum(
            F.when(~F.col("is_new") & ~F.col("active_prev"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("resurrected"),
    )
    nxt = du.select(
        (F.col("d") - 1).alias("pd"), F.col("user_id").alias("u3")
    )
    churn = (
        du.join(
            nxt,
            (F.col("d") == F.col("pd"))
            & (F.col("user_id") == F.col("u3")),
            "left_anti",
        )
        .select((F.col("d") + 1).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("churned_from_prev"))
    )
    return (
        days.join(per_day, "d", "left")
        .join(churn, "d", "left")
        .select(
            F.col("d").alias("day"),
            F.coalesce("new_users", F.lit(0)).cast("long").alias(
                "new_users"
            ),
            F.coalesce("retained", F.lit(0)).cast("long").alias(
                "retained"
            ),
            F.coalesce("resurrected", F.lit(0)).cast("long").alias(
                "resurrected"
            ),
            F.coalesce("churned_from_prev", F.lit(0)).cast("long").alias(
                "churned_from_prev"
            ),
        )
    )


# q567 — stickiness (DAU / trailing WAU ratio per day) -------------------


def _q567_oracle() -> str:
    return """
        WITH du AS MATERIALIZED (
            SELECT DISTINCT
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS d, user_id
            FROM events
        ),
        days AS MATERIALIZED (SELECT DISTINCT d FROM du)
        SELECT days.d AS day,
               (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM du
                WHERE du.d = days.d) AS dau,
               (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM du
                WHERE du.d BETWEEN days.d - 6 AND days.d) AS wau,
               round((SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE)
                      FROM du WHERE du.d = days.d)
                     / (SELECT COUNT(DISTINCT user_id) FROM du
                        WHERE du.d BETWEEN days.d - 6 AND days.d), 6)
                   AS stickiness
        FROM days
    """


@query("q567_dau_wau_stickiness", oracle=_q567_oracle())
def q567_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STICKINESS (DAU/WAU) per day — the engagement-frequency ratio
    growth teams track beside raw actives: daily actives, trailing
    7-day actives (the q515 replicate-to-windows fold — exact sliding
    distinct, not an approximation), and their exact rational ratio.
    A stickiness near 1/7 means users show up once a week; near 1
    means daily habit — the difference between a tool and a
    dashboard.

    Scale shape: one grain dedup feeds both counts; the WAU rides
    q515's 7× bounded replication."""
    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    du = e.select(day.alias("d"), "user_id").distinct().localCheckpoint(eager=False)
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    offs = F.array(*[F.lit(i) for i in range(_Q515_WIN_D)])
    wau = (
        du.select("d", "user_id", F.explode(offs).alias("off"))
        .select((F.col("d") + F.col("off")).alias("w"), "user_id")
        .join(days.withColumnRenamed("d", "w"), "w", "left_semi")
        .groupBy("w")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
        .withColumnRenamed("w", "d")
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau"), 6
            ).alias("stickiness"),
        )
    )


# q568 — power-user curve (users by active-day count) --------------------


def _q568_oracle() -> str:
    return """
        WITH du AS MATERIALIZED (
            SELECT DISTINCT
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS d, user_id
            FROM events
        ),
        per AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS active_days
            FROM du GROUP BY 1
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per)
        SELECT active_days,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               round(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot), 6)
                   AS share
        FROM per GROUP BY active_days
    """


@query("q568_power_user_curve", oracle=_q568_oracle())
def q568_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POWER-USER CURVE — the activity-frequency histogram (how many
    users were active on exactly k days of the period): a
    smile-shaped curve means a core of daily habits plus a casual
    tail; a monotone decay means no habit formed.  Exact integers
    and one rational share per bucket — the single most copied
    engagement chart in growth analytics, here as a ≤|days|-row
    relation.

    Scale shape: grain dedup → per-user count → ≤|days|-bucket
    histogram; three map-side-combine aggregates end to end."""
    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    du = e.select(day.alias("d"), "user_id").distinct()
    per = du.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("active_days")
    )
    tot = per.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        per.groupBy("active_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "active_days",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("n"), 6
            ).alias("share"),
        )
    )


# q569 — seasonal-adjusted anomaly detection (q530 ∘ q531) ---------------


def _q569_oracle() -> str:
    return f"""
        WITH daily AS MATERIALIZED (
            SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS d,
                   dayofweek(CAST(ts AS DATE)) + 1 AS dow,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100, 0)
                                      AS DECIMAL(28,0))
                            ELSE 0 END) AS BIGINT) AS cents
            FROM events GROUP BY 1, 2
        ),
        idx AS MATERIALIZED (
            SELECT dow,
                   SUM(CAST(cents AS DECIMAL(38,0))) AS dow_rev,
                   CAST(COUNT(*) AS BIGINT) AS dow_n
            FROM daily GROUP BY dow
        ),
        tot AS (
            SELECT SUM(dow_rev) AS t, SUM(dow_n) AS n FROM idx
        ),
        resid AS MATERIALIZED (
            SELECT daily.d, daily.dow, daily.cents,
                   -- seasonally adjusted value: cents / dow_index,
                   -- 6dp-rounded so the ranked order is drift-proof
                   round(CAST(daily.cents AS DOUBLE)
                         / ((CAST(idx.dow_rev AS DOUBLE) / idx.dow_n)
                            / (CAST((SELECT t FROM tot) AS DOUBLE)
                               / (SELECT n FROM tot))), 6) AS adj
            FROM daily JOIN idx ON daily.dow = idx.dow
        ),
        med AS (
            SELECT adj AS m FROM (
                SELECT adj, row_number() OVER (ORDER BY adj, d) AS rk,
                       COUNT(*) OVER () AS n
                FROM resid
            ) WHERE rk = (n + 1) // 2
        ),
        dev AS MATERIALIZED (
            SELECT d, dow, cents, adj,
                   ABS(adj - (SELECT m FROM med)) AS adev
            FROM resid
        ),
        mad AS (
            SELECT adev AS mad FROM (
                SELECT adev, row_number() OVER (ORDER BY adev, d) AS rk,
                       COUNT(*) OVER () AS n
                FROM dev
            ) WHERE rk = (n + 1) // 2
        )
        SELECT CAST(d AS BIGINT) AS day, CAST(dow AS BIGINT) AS dow,
               cents AS revenue_cents, adj AS adjusted,
               ABS(adj - (SELECT m FROM med))
                   > {_Q531_K} * (SELECT mad FROM mad) AS is_anomaly
        FROM dev
    """


@query("q569_seasonal_adjusted_anomaly", oracle=_q569_oracle())
def q569_seasonal_adjusted_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEASONALLY-ADJUSTED anomaly detection — q530's day-of-week
    index composed with q531's robust MAD flags: raw daily revenue is
    divided by its weekday's seasonal index FIRST (so a strong Monday
    isn't flagged merely for being Monday — the false-positive class
    plain thresholds produce every week), then the lower-median/MAD
    fences run on the adjusted series.  Adjusted values are
    6dp-rounded before ranking (the q544 drift-proofing), all medians
    are actual elements.  This is the two-stage decomposition
    (deseasonalize → robust-detect) real monitors ship.

    Scale shape: day-grain composition — one scan to the day relation,
    a 7-row index, two rank extractions (q531's kernel)."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    e = read_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            F.dayofweek(F.col("ts").cast("date")).cast("long").alias(
                "dow"
            ),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("decimal(28,0)"),
                ).otherwise(F.lit(0).cast("decimal(28,0)"))
            )
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    idx = daily.groupBy("dow").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("dow_rev"),
        F.count(F.lit(1)).cast("long").alias("dow_n"),
    )
    tot = idx.agg(
        F.sum("dow_rev").alias("t"), F.sum("dow_n").alias("n")
    )
    resid = (
        daily.join(idx, "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            "dow",
            "cents",
            F.round(
                F.col("cents").cast("double")
                / (
                    (F.col("dow_rev").cast("double") / F.col("dow_n"))
                    / (F.col("t").cast("double") / F.col("n"))
                ),
                6,
            ).alias("adj"),
        )
        .localCheckpoint(eager=False)
    )

    def lower_median(df: DataFrame, col: str, key: str) -> float:
        n = df.count()
        r = exact_ntile(df, [col, key], n, out_col="rk")
        return float(
            r.filter(F.col("rk") == (n + 1) // 2).collect()[0][col]
        )

    m = lower_median(resid, "adj", "d")
    dev = resid.select(
        "*", F.abs(F.col("adj") - F.lit(m)).alias("adev")
    ).localCheckpoint(eager=False)
    mad = lower_median(dev, "adev", "d")
    return dev.select(
        F.col("d").cast("long").alias("day"),
        "dow",
        F.col("cents").alias("revenue_cents"),
        F.col("adj").alias("adjusted"),
        (F.col("adev") > _Q531_K * mad).alias("is_anomaly"),
    )


# q570 — sorted-neighborhood record linkage vs blocking ------------------

_Q570_WINDOW = 5  # rank-distance window


def _q570_oracle() -> str:
    return f"""
        WITH p AS MATERIALIZED (
            SELECT p_partkey, p_name,
                   string_split(p_name, ' ')[-1] AS noun,
                   row_number() OVER (ORDER BY p_name, p_partkey) AS rk
            FROM part WHERE p_partkey < 800
        ),
        truth AS MATERIALIZED (
            SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
            FROM p a JOIN p b ON a.noun = b.noun
             AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 3
              AND a.p_name <> b.p_name
        ),
        snm AS MATERIALIZED (
            SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
            FROM p a JOIN p b
              ON b.rk - a.rk BETWEEN 1 AND {_Q570_WINDOW}
             AND a.p_partkey <> b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 3
              AND a.p_name <> b.p_name
        ),
        snm_c AS (
            SELECT LEAST(key_a, key_b) AS key_a,
                   GREATEST(key_a, key_b) AS key_b
            FROM snm
        )
        SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS blocking_pairs,
            (SELECT CAST(COUNT(DISTINCT (key_a, key_b)) AS BIGINT)
             FROM snm_c) AS snm_pairs,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM (
                 SELECT DISTINCT key_a, key_b FROM snm_c) s
             JOIN truth USING (key_a, key_b)) AS snm_found_of_truth,
            round((SELECT CAST(COUNT(*) AS DOUBLE) FROM (
                     SELECT DISTINCT key_a, key_b FROM snm_c) s
                   JOIN truth USING (key_a, key_b))
                  / (SELECT COUNT(*) FROM truth), 6) AS snm_recall
    """


@query("q570_sorted_neighborhood_linkage", oracle=_q570_oracle())
def q570_sorted_neighborhood_linkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SORTED-NEIGHBORHOOD record linkage — the THIRD candidate-
    generation method beside blocking (q92) and prefix filtering
    (q517), priced against the blocking truth: sort records by the
    match key (name), compare only rank-neighbors within a window of
    {_Q570_WINDOW}, verify with exact edit distance.  The card
    reports both methods' pair counts, the overlap, and SNM's recall
    of the blocking truth — the method-comparison evidence a linkage
    pipeline needs before choosing (SNM wins when typos keep sorted
    names adjacent; blocking wins when the blocking key is reliable).
    Ranks from the exact two-phase kernel; the window join is a
    rank-band join (q512's binning would make it equi at scale).

    Scale shape: one rank pass + a bounded band join (each record
    meets ≤{_Q570_WINDOW} neighbors)."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    p = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 800)
        .select(
            "p_partkey",
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("noun"),
        )
        .localCheckpoint(eager=False)
    )
    n = p.count()
    rk = exact_ntile(p, ["p_name", "p_partkey"], n, out_col="rk")
    ta = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "noun",
    )
    tb = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("noun").alias("noun_b"),
    )
    truth = (
        ta.join(tb, F.col("noun") == F.col("noun_b"))
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.levenshtein("name_a", "name_b") <= 3)
            & (F.col("name_a") != F.col("name_b"))
        )
        .select("key_a", "key_b")
        .localCheckpoint(eager=False)
    )
    ra = rk.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("rk").alias("rk_a"),
    )
    rb = rk.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("rk").alias("rk_b"),
    )
    snm = (
        ra.join(
            rb,
            (F.col("rk_b") - F.col("rk_a") >= 1)
            & (F.col("rk_b") - F.col("rk_a") <= _Q570_WINDOW)
            & (F.col("key_a") != F.col("key_b")),
        )
        .filter(
            (F.levenshtein("name_a", "name_b") <= 3)
            & (F.col("name_a") != F.col("name_b"))
        )
        .select(
            F.least("key_a", "key_b").alias("key_a"),
            F.greatest("key_a", "key_b").alias("key_b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    bt = truth.agg(
        F.count(F.lit(1)).cast("long").alias("blocking_pairs")
    )
    sn = snm.agg(F.count(F.lit(1)).cast("long").alias("snm_pairs"))
    ov = snm.join(truth, ["key_a", "key_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("snm_found_of_truth")
    )
    return (
        bt.crossJoin(F.broadcast(sn))
        .crossJoin(F.broadcast(ov))
        .select(
            "blocking_pairs",
            "snm_pairs",
            "snm_found_of_truth",
            F.round(
                F.col("snm_found_of_truth").cast("double")
                / F.col("blocking_pairs"),
                6,
            ).alias("snm_recall"),
        )
    )


# q571 — burst detection (sliding RANGE-frame rate limiting) -------------

_Q571_WIN_S = 3600  # any 60-minute window
_Q571_K = 8  # flag users whose peak exceeds this


def _q571_oracle() -> str:
    return f"""
        WITH e AS MATERIALIZED (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
            FROM events
        ),
        rates AS MATERIALIZED (
            SELECT user_id, ep,
                   CAST(COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY ep
                       RANGE BETWEEN {_Q571_WIN_S} PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS win_events
            FROM e
        )
        SELECT user_id,
               CAST(MAX(win_events) AS BIGINT) AS peak_rate,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(win_events) > {_Q571_K} AS is_bursty
        FROM rates GROUP BY user_id
    """


@query("q571_burst_detection", oracle=_q571_oracle())
def q571_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURST DETECTION (rate limiting's analytical twin) — for every
    user, the PEAK number of events inside ANY trailing 60-minute
    window, via a partitioned RANGE frame over epoch seconds (the
    window-frame feature the repo's W-family hadn't exercised: RANGE
    frames bound by a VALUE interval, not a row count — exactly the
    sliding-rate semantics a row frame cannot express when events
    cluster).  Users whose peak exceeds {_Q571_K} are flagged — the
    abuse/bot screen an API gateway materializes.

    Scale shape: one partitioned range window per user (bounded by
    per-user history), one grouped max — never a self-join."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("ep")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep")
        .rangeBetween(-_Q571_WIN_S, 0)
    )
    rates = e.select(
        "user_id", F.count(F.lit(1)).over(w).cast("long").alias("win_events")
    )
    return rates.groupBy("user_id").agg(
        F.max("win_events").cast("long").alias("peak_rate"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("win_events") > _Q571_K).alias("is_bursty"),
    )


# q572 — conversion funnel per experiment arm ----------------------------


def _q572_oracle() -> str:
    return f"""
        WITH u AS MATERIALIZED (
            SELECT DISTINCT user_id,
                   strpos('01234567',
                          substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                                 1, 1)) > 0 AS arm_a
            FROM events
        ),
        s AS MATERIALIZED (
            SELECT user_id,
                   MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t0
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        c AS MATERIALIZED (
            SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t1
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s.t0
              AND CAST(floor(epoch(e.ts)) AS BIGINT) - s.t0
                  <= {_Q524_STEP_S}
            GROUP BY 1
        ),
        p AS MATERIALIZED (
            SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t2
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= c.t1
              AND CAST(floor(epoch(e.ts)) AS BIGINT) - c.t1
                  <= {_Q524_STEP_S}
            GROUP BY 1
        )
        SELECT u.arm_a,
               CAST(COUNT(s.user_id) AS BIGINT) AS stage_signup,
               CAST(COUNT(c.user_id) AS BIGINT) AS stage_click,
               CAST(COUNT(p.user_id) AS BIGINT) AS stage_purchase,
               round(CAST(COUNT(p.user_id) AS DOUBLE)
                     / COUNT(s.user_id), 6) AS end_to_end_rate
        FROM u
        LEFT JOIN s ON u.user_id = s.user_id
        LEFT JOIN c ON u.user_id = c.user_id
        LEFT JOIN p ON u.user_id = p.user_id
        GROUP BY u.arm_a
    """


@query("q572_funnel_by_experiment_arm", oracle=_q572_oracle())
def q572_funnel_by_experiment_arm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FUNNEL × EXPERIMENT overlay — the readout an A/B platform
    actually renders: q524's windowed funnel chain split by q539's
    deterministic md5 arms, per-arm stage populations and the
    end-to-end conversion rate.  Because the arm split and every
    stage anchor are deterministic, the whole two-dimensional readout
    is hash-checked — the per-stage drop-off DIFFERENCE between arms
    is where an experiment's effect localizes (the reason platforms
    overlay funnels instead of reporting one conversion number).

    Scale shape: q524's keyed min-chain left-joined at user grain,
    one 2-row rollup."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ep")
    )
    u = e.select("user_id").distinct().select(
        "user_id",
        (
            F.instr(
                F.lit("01234567"),
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ab:"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    1,
                ),
            )
            > 0
        ).alias("arm_a"),
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ep").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(
            (F.col("ep") >= F.col("t0"))
            & (F.col("ep") - F.col("t0") <= _Q524_STEP_S)
        )
        .groupBy("user_id")
        .agg(F.min("ep").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ep") >= F.col("t1"))
            & (F.col("ep") - F.col("t1") <= _Q524_STEP_S)
        )
        .groupBy("user_id")
        .agg(F.min("ep").alias("t2"))
    )
    return (
        u.join(s.select("user_id", F.lit(1).alias("__s")), "user_id", "left")
        .join(c.select("user_id", F.lit(1).alias("__c")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("__p")), "user_id", "left")
        .groupBy("arm_a")
        .agg(
            F.count("__s").cast("long").alias("stage_signup"),
            F.count("__c").cast("long").alias("stage_click"),
            F.count("__p").cast("long").alias("stage_purchase"),
            F.round(
                F.count("__p").cast("double") / F.count("__s"), 6
            ).alias("end_to_end_rate"),
        )
    )


# q573 — STREAMING growth accounting (twin of q566) ----------------------


def _q573_oracle() -> str:
    from databricks_etl_spark.plans.registry import QUERIES

    return QUERIES["q566_growth_accounting"].oracle


@query("q573_streaming_growth_accounting", oracle=_q573_oracle())
def q573_streaming_growth_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q566's growth decomposition maintained AT INGEST: the (day,
    user) activity grain is the fully associative summary (dedup on
    merge — the q522 discipline), so each epoch lands only its grain
    slice and the drain rebuilds the new/retained/resurrected/churned
    ledger from the merged grain.  First-seen days are a DRAIN
    property (an early epoch's "new" verdict can be retroactively
    wrong when an older event arrives late — the q564 re-rank
    argument applied to cohorting; interim ledgers are provisional by
    nature).  Drain ≡ q566's oracle under event-id-parity slicing.

    Scale shape: per-epoch state is the day×user grain; the drain is
    q566's keyed adjacency joins."""
    import shutil

    from databricks_etl_spark.sources.writers import scratch_dir

    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    root = scratch_dir("growth_stream_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/grain"

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(day.alias("d"), "user_id")
            .distinct()
            .withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(path)
        )

    for _ep in range(_STREAM_EPOCHS):
        ingest(e.filter(
            F.col("event_id") % _STREAM_EPOCHS == _ep), _ep)
    du = (
        spark.read.schema("d int, user_id long, __epoch int")
        .parquet(path)
        .select("d", "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    f = du.groupBy("user_id").agg(F.min("d").alias("d0"))
    days = du.select("d").distinct()
    today = du.join(f, "user_id")
    prev = du.select(
        (F.col("d") + 1).alias("pd1"), F.col("user_id").alias("u2")
    )
    today_flags = today.join(
        prev,
        (F.col("d") == F.col("pd1")) & (F.col("user_id") == F.col("u2")),
        "left",
    ).select(
        "d",
        "user_id",
        (F.col("d0") == F.col("d")).alias("is_new"),
        F.col("u2").isNotNull().alias("active_prev"),
    )
    per_day = today_flags.groupBy("d").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(
            F.when(~F.col("is_new") & F.col("active_prev"), 1).otherwise(0)
        )
        .cast("long")
        .alias("retained"),
        F.sum(
            F.when(~F.col("is_new") & ~F.col("active_prev"), 1).otherwise(0)
        )
        .cast("long")
        .alias("resurrected"),
    )
    nxt = du.select(
        (F.col("d") - 1).alias("pd"), F.col("user_id").alias("u3")
    )
    churn = (
        du.join(
            nxt,
            (F.col("d") == F.col("pd"))
            & (F.col("user_id") == F.col("u3")),
            "left_anti",
        )
        .select((F.col("d") + 1).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("churned_from_prev"))
    )
    return (
        days.join(per_day, "d", "left")
        .join(churn, "d", "left")
        .select(
            F.col("d").alias("day"),
            F.coalesce("new_users", F.lit(0)).cast("long").alias(
                "new_users"
            ),
            F.coalesce("retained", F.lit(0)).cast("long").alias(
                "retained"
            ),
            F.coalesce("resurrected", F.lit(0)).cast("long").alias(
                "resurrected"
            ),
            F.coalesce("churned_from_prev", F.lit(0)).cast("long").alias(
                "churned_from_prev"
            ),
        )
    )


# q574 — net revenue retention by week-over-week cohort ------------------


def _q574_oracle() -> str:
    return """
        WITH rev AS MATERIALIZED (
            SELECT user_id,
                   (datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    - (SELECT MIN(datediff('day', DATE '1970-01-01',
                                  CAST(ts AS DATE))) FROM events)) // 7
                       AS wk,
                   CAST(SUM(CAST(round(value * 100, 0)
                                 AS DECIMAL(28,0))) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.wk AS base_week,
                   CAST(SUM(a.cents) AS BIGINT) AS base_cents,
                   CAST(SUM(COALESCE(b.cents, 0)) AS BIGINT)
                       AS retained_cents,
                   CAST(SUM(CASE WHEN b.cents > a.cents
                            THEN b.cents - a.cents ELSE 0 END) AS BIGINT)
                       AS expansion_cents,
                   CAST(SUM(CASE WHEN b.cents IS NULL THEN a.cents
                            WHEN b.cents < a.cents THEN a.cents - b.cents
                            ELSE 0 END) AS BIGINT) AS contraction_cents
            FROM rev a LEFT JOIN rev b
              ON a.user_id = b.user_id AND b.wk = a.wk + 1
            GROUP BY a.wk
        )
        SELECT CAST(base_week AS BIGINT) AS base_week,
               base_cents, retained_cents, expansion_cents,
               contraction_cents,
               round(CAST(retained_cents AS DOUBLE) / base_cents, 6)
                   AS nrr
        FROM pairs
    """


@query("q574_net_revenue_retention", oracle=_q574_oracle())
def q574_net_revenue_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NET REVENUE RETENTION week-over-week — the SaaS board metric
    decomposed honestly: for each base week's paying users, next
    week's revenue FROM THOSE SAME USERS (new users never inflate
    NRR — the definitional point), split into expansion (users who
    paid more) and contraction/churn (paid less or vanished).  Exact
    integer cents throughout; NRR is one rational per base week.
    NRR > 1 means the existing base grows by itself — the compounding
    engine every subscription business hunts for.

    Scale shape: user-week revenue grain, one self-join on (user,
    adjacent week), a per-week rollup."""
    e = read_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", day.alias("d"),
        F.round(F.col("value") * 100, 0).cast("decimal(28,0)").alias(
            "cents"
        ),
    )
    base = p.agg(F.min("d").alias("b")).localCheckpoint(eager=False)
    rev = (
        p.crossJoin(base)
        .select(
            "user_id",
            F.expr("(d - b) DIV 7").alias("wk"),
            "cents",
        )
        .groupBy("user_id", "wk")
        .agg(F.sum("cents").cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    nxt = rev.select(
        "user_id",
        (F.col("wk") - 1).alias("wk"),
        F.col("cents").alias("next_cents"),
    )
    return (
        rev.join(nxt, ["user_id", "wk"], "left")
        .groupBy(F.col("wk").cast("long").alias("base_week"))
        .agg(
            F.sum("cents").cast("long").alias("base_cents"),
            F.sum(F.coalesce("next_cents", F.lit(0)))
            .cast("long")
            .alias("retained_cents"),
            F.sum(
                F.when(
                    F.col("next_cents") > F.col("cents"),
                    F.col("next_cents") - F.col("cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("expansion_cents"),
            F.sum(
                F.when(F.col("next_cents").isNull(), F.col("cents"))
                .when(
                    F.col("next_cents") < F.col("cents"),
                    F.col("cents") - F.col("next_cents"),
                )
                .otherwise(0)
            )
            .cast("long")
            .alias("contraction_cents"),
        )
        .select(
            "base_week",
            "base_cents",
            "retained_cents",
            "expansion_cents",
            "contraction_cents",
            F.round(
                F.col("retained_cents").cast("double")
                / F.col("base_cents"),
                6,
            ).alias("nrr"),
        )
    )


# q575 — session statistics (gap sessionization rollup) ------------------

_Q575_GAP_S = 1800  # 30-minute inactivity ends a session


def _q575_oracle() -> str:
    return f"""
        WITH e AS MATERIALIZED (
            SELECT user_id, event_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ep
            FROM events
        ),
        marked AS MATERIALIZED (
            SELECT user_id, event_id, ep,
                   CASE WHEN ep - lag(ep) OVER (
                            PARTITION BY user_id
                            ORDER BY ep, event_id) > {_Q575_GAP_S}
                        OR lag(ep) OVER (
                            PARTITION BY user_id
                            ORDER BY ep, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM e
        ),
        sess AS MATERIALIZED (
            SELECT user_id,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ep, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess_id,
                   ep
            FROM marked
        ),
        per_sess AS MATERIALIZED (
            SELECT user_id, sess_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   MAX(ep) - MIN(ep) AS dur_s
            FROM sess GROUP BY 1, 2
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bounces,
               round(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS bounce_rate,
               CAST(SUM(dur_s) AS BIGINT) AS total_duration_s,
               CAST(SUM(n_events) AS BIGINT) AS total_events,
               round(CAST(SUM(dur_s) AS DOUBLE) / COUNT(*), 6)
                   AS mean_duration_s
        FROM per_sess
    """


@query("q575_session_statistics", oracle=_q575_oracle())
def q575_session_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION STATISTICS — q80's gap sessionization rolled up to the
    product card: sessions cut at {_Q575_GAP_S // 60}-minute
    inactivity gaps (per-user lag + running session counter — the
    canonical partitioned-window pair), then the numbers a product
    review opens with: session count, single-event BOUNCES and the
    bounce rate, and total/mean session duration in exact integer
    seconds.  Bounce rate is the first metric a 30-minute gap
    threshold distorts if chosen badly — q431's watermark
    recommendation discipline applies to this knob too.

    Scale shape: two partitioned windows per user + one global 1-row
    rollup; durations never leave integer seconds."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ep")
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    marked = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ep").over(w).isNull()
            | (F.col("ep") - F.lag("ep").over(w) > _Q575_GAP_S),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("ep") - F.min("ep")).alias("dur_s"),
    )
    return per_sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
        F.sum("dur_s").cast("long").alias("total_duration_s"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.round(
            F.sum("dur_s").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_duration_s"),
    )
