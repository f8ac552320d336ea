"""Similarity search over embedding columns (array<float>).

Two paths:

- ``knn_bruteforce``: exact top-k cosine neighbors. The query set is
  broadcast against the candidate corpus, so the plan is a single
  broadcast-nested-loop with codegen'd array math — correct baseline at
  any corpus size as long as |queries| is bounded.
- ``knn_lsh``: sign-random-projection LSH buckets prune the candidate
  set before the exact cosine — the 100 TB path. Buckets come from
  deterministic md5-derived hyperplanes (functions/vectors.py), so
  results are reproducible run-to-run and engine-to-engine.

No MLlib: higher-order array functions keep everything inside
whole-stage codegen and avoid Vector serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .._util import spread
from ..functions import vectors as V


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _id_is_integral(df: DataFrame, id_col: str) -> bool:
    """The Python/Arrow scoring kernels materialize the id column as
    int64 (``to_numpy(dtype="int64")``) and declare it ``long`` in
    their output schema, so they only accept integral id columns; the
    pure-plan join kernels carry any orderable id type. Callers of
    the kernel-defaulted operators get an automatic fallback."""
    return dict(df.dtypes).get(id_col) in _INTEGRAL_TYPES


def _paired_cosine(qv="qv", cv="cv", qn="qn", cn="cn"):
    """cos from per-row precomputed norms: dot/(qn*cn). Identical IEEE
    ops in the same order as V.cosine (norm product, >0 guard, one
    divide), but the norms are computed once per ROW before the join
    instead of once per PAIR after it — 3x fewer array folds on the
    scored-pairs path, which dominates candidate scoring."""
    d = F.col(qn) * F.col(cn)
    return F.when(d > 0, V.dot(F.col(qv), F.col(cv)) / d)


def _numpy_paired_scores(pairs: DataFrame) -> DataFrame:
    """Vectorized dual of :func:`_paired_cosine` for candidate-pair
    scoring: input (id_a, id_b, va, vb, na, nb), output
    (id_a, id_b, cos_raw) — one einsum row-wise dot per Arrow batch
    instead of a per-row 64-element expression fold. The fold costs
    ~10 us per pair (it is what pinned dedup_embedding_lsh's sf1 wall
    at ~37 s, ~2.5M collision candidates — docs/SCALING.md); the
    batched kernel is ~100x cheaper per pair. numpy pairwise
    summation may reassociate the dot vs the sequential JVM fold —
    6-dp agreement is pinned empirically by the kernels-equality
    tests, the same contract as all_pairs_cosine_matmul. Pairs with
    na*nb == 0 are dropped in the kernel (the expression path NULLs
    them via ``when(d > 0, ...)`` and they die at the caller's
    threshold filter — NaN must not reach that filter, since Spark
    orders NaN above every double and ``NaN >= t`` is true)."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            va = np.stack([np.asarray(v, dtype="float64")
                           for v in pdf["va"]])
            vb = np.stack([np.asarray(v, dtype="float64")
                           for v in pdf["vb"]])
            denom = pdf["na"].to_numpy(dtype="float64") \
                * pdf["nb"].to_numpy(dtype="float64")
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.einsum("ij,ij->i", va, vb) / denom
            keep = denom > 0
            yield pd.DataFrame({
                "id_a": pdf["id_a"].to_numpy(dtype="int64")[keep],
                "id_b": pdf["id_b"].to_numpy(dtype="int64")[keep],
                "cos_raw": cos[keep],
            })

    return pairs.mapInPandas(
        run, schema="id_a long, id_b long, cos_raw double")


def _chunk_split_oversized(keyed: DataFrame, group_cols, max_group: int,
                           row_bound: int | None = None):
    """Straggler split for the per-group pair-scoring kernels.

    ``applyInPandas`` runs ONE task per group, and a power-law corpus
    puts its boilerplate cluster into one LSH bucket / k-means cell
    regardless of parameter choice — that task then does |group|²/2 of
    the total work while every other core idles (the uniform growth
    corpora in docs/SCALING.md can never produce this shape; the skew
    measurement is addendum 4). Groups larger than ``max_group`` rows
    split into C = ceil(|group|/max_group) deterministic id-chunks
    (``pmod(vid, C)``); each unordered chunk pair (lo <= hi) becomes an
    independent subtask scoring only its wedge — lo == hi the
    within-chunk upper triangle, lo < hi the cross rectangle — so every
    candidate pair is scored exactly once and the giant group
    parallelizes into C(C+1)/2 bounded tasks. Rows replicate C ways
    (Arrow volume × C for the oversized groups ONLY); pair arithmetic
    is unchanged.

    The size pass is a map-side-combined count of (group, n) pairs
    with only OVERSIZED groups collected to the driver at plan-build
    time — by the skew premise these are few (a boilerplate cluster,
    not the bulk; with the n_planes/k sizing rules a uniform corpus
    has none), so the collect is bounded like the Lloyd centroid
    literals. Uniform corpora (empty list) keep the pinned
    one-task-per-group plan with ZERO per-row overhead — no join, no
    Generate node in the hot path (the always-split layout measured
    +1.0s on the sf0.1 bench for nothing). When oversized groups
    exist, C arrives per-row via a literal when-chain (few groups) or
    a broadcast-joined lookup (many), and the explode adds one
    Generate over rows that is the price of de-quadraticing the
    straggler.

    Returns ``(keyed, group_cols)`` — extended with ["_lo", "_hi"]
    only when a split engaged; the kernel reads each row's chunk id
    from ``_ci``. Callers that know an upper bound on any group's size
    (for these kernels: n input rows — a bucket/cell never holds more
    than one row per input vector) pass it as ``row_bound`` so small
    corpora skip the size pass entirely (one cheap input count beats
    re-keying + aggregating the exploded frame; worth ~0.3-0.5 s per
    sf0.1 bench entry).
    """
    group_cols = list(group_cols)
    if row_bound is not None and row_bound <= max_group:
        return keyed, group_cols
    sizes = (keyed.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
             .filter(F.col("_n") > max_group))
    # bounded collect: the skew premise is that oversized groups are
    # FEW; if a mis-sized max_group makes them legion (e.g. max_group
    # far below the uniform load), stop materializing at the cap and
    # fall back to the distributed broadcast-join lookup — the split
    # stays correct, only the uniform-case zero-overhead shortcut and
    # the when-chain literal path are skipped
    _CAP = 100_000
    big = sizes.limit(_CAP + 1).collect()
    import functools
    import math
    import operator

    if not big:
        return keyed, group_cols
    if len(big) <= 64:
        c = F.lit(1)
        for row in big:
            cond = functools.reduce(operator.and_, [
                F.col(k).eqNullSafe(F.lit(row[k])) for k in group_cols])
            c = F.when(cond,
                       F.lit(math.ceil(row["_n"] / max_group))).otherwise(c)
    else:
        if len(big) > _CAP:
            # too many to ship as driver rows: join the sizes frame
            # itself (still only oversized groups wide) — as a PLAIN
            # shuffle join: broadcasting it would materialize the
            # unbounded oversized-groups frame on the driver, exactly
            # the blowup this cap branch exists to avoid
            lut = sizes.withColumn(
                "_c0", F.ceil(F.col("_n") / F.lit(max_group)).cast("int")
            ).drop("_n")
            broadcast_lut = False
        else:
            rows = [tuple(row[k] for k in group_cols)
                    + (math.ceil(row["_n"] / max_group),) for row in big]
            lut = keyed.sparkSession.createDataFrame(
                rows,
                schema=keyed.select(*group_cols).schema.add("_c0", "integer"))
            broadcast_lut = True
        # null-safe join so a NULL-keyed oversized group (null bucket/
        # cell key) splits like any other — the <=64-group when-chain
        # above uses eqNullSafe, and a plain key join here would leave
        # such a group _c0=NULL -> c=1, a silently unsplit straggler
        lut = lut.select(
            *[F.col(k).alias(f"_k_{k}") for k in group_cols], "_c0")
        if broadcast_lut:
            lut = F.broadcast(lut)
        cond = functools.reduce(operator.and_, [
            keyed[k].eqNullSafe(lut[f"_k_{k}"]) for k in group_cols])
        keyed = keyed.join(lut, cond, "left") \
            .drop(*[f"_k_{k}" for k in group_cols])
        c = F.coalesce(F.col("_c0"), F.lit(1))
    keyed = (
        keyed.withColumn("_ci", F.pmod(F.col("vid"), c).cast("int"))
        .withColumn("_cj", F.explode(F.sequence(F.lit(0), c - F.lit(1))))
        .withColumn("_lo", F.least("_ci", "_cj"))
        .withColumn("_hi", F.greatest("_ci", "_cj"))
        .drop("_cj", "_c0")
    )
    return keyed, group_cols + ["_lo", "_hi"]


def _score_group_pairs(pdf, vec_field: str, thr: float, chunk: int = 1024):
    """Shared numpy kernel for one pair-scoring (sub)group: returns
    (id_a, id_b, cos) arrays with id_a < id_b, cos >= thr.

    The hot loop is MEMORY-BANDWIDTH-bound at 32-way task concurrency
    (measured: the same loop runs 5x slower in 32 concurrent workers
    than alone), so it touches each candidate-slot matrix as few times
    as possible: pre-normalize rows ONCE (no denom rectangle, no divide
    pass; zero-norm rows become zero vectors and die at the threshold),
    GEMM only the surviving wedge, one threshold compare, and the
    id/self filter runs on the EXTRACTED 1-D candidates, not the 2-D
    grid. Output is assembled once per group, not once per chunk.
    Pre-normalized cosines differ from dot/(na*nb) in the last ulps —
    covered by the same empirical 6-dp parity contract as
    all_pairs_cosine_matmul, pinned by the kernel-equality tests and
    the oracle gates.

    Two shapes, selected by the :func:`_chunk_split_oversized` columns:

    - within-chunk group (no split columns, or ``_lo == _hi``): sort by
      id, upper-wedge GEMM — ids sorted means only columns j > i can
      survive the id-order filter, so each chunk row-block multiplies
      against the tail only.
    - cross-chunk group (``_lo < _hi``): the group holds chunk-_lo rows
      and chunk-_hi rows; GEMM the full A×B rectangle (every cross pair
      is a candidate exactly once — chunks are disjoint id classes, so
      no self pairs and no double counting) and order ids per pair.
    """
    import numpy as np

    ids = pdf["vid"].to_numpy(dtype="int64")
    empty = (np.empty(0, dtype="int64"), np.empty(0, dtype="int64"),
             np.empty(0, dtype="float64"))
    if not len(ids):
        return empty
    m = np.stack(pdf[vec_field].to_numpy())
    norms = np.linalg.norm(m, axis=1)
    nz = norms > 0
    mn = m / np.where(nz, norms, 1.0)[:, None]
    mn[~nz] = 0.0
    out_a, out_b, out_c = [], [], []
    if "_lo" in pdf.columns and int(pdf["_lo"].iloc[0]) != int(pdf["_hi"].iloc[0]):
        side_a = pdf["_ci"].to_numpy() == int(pdf["_lo"].iloc[0])
        ia = np.nonzero(side_a)[0]
        ib = np.nonzero(~side_a)[0]
        if not len(ia) or not len(ib):
            return empty
        for lo in range(0, len(ia), chunk):
            sel = ia[lo:lo + chunk]
            sims = mn[sel] @ mn[ib].T
            xi, yi = np.nonzero(sims >= thr)
            sv = sims[xi, yi]
            gi, gj = sel[xi], ib[yi]
            keep = nz[gi] & nz[gj]
            gi, gj, sv = gi[keep], gj[keep], sv[keep]
            out_a.append(np.minimum(ids[gi], ids[gj]))
            out_b.append(np.maximum(ids[gi], ids[gj]))
            out_c.append(sv)
    else:
        order = np.argsort(ids)
        ids = ids[order]
        mn = mn[order]
        nz = nz[order]
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            sims = mn[lo:hi] @ mn[lo:].T
            ai, bi = np.nonzero(sims >= thr)
            # id order + the old denom>0 guard (exact at thr<=0 too),
            # applied to the extracted 1-D candidates
            keep = (ids[lo:][bi] > ids[lo + ai]) \
                & nz[lo + ai] & nz[lo:][bi]
            ai, bi = ai[keep], bi[keep]
            out_a.append(ids[lo + ai])
            out_b.append(ids[lo:][bi])
            out_c.append(sims[ai, bi])
    if not out_a:
        return empty
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_c))


def knn_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (excluding
    itself). Embeddings are cast float->double BEFORE the products so
    the arithmetic is engine-portable (float*float truncates)."""
    qv = _as_double(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"), qv.alias("qv"), V.norm(qv).alias("qn")
    )
    cv = _as_double(F.col(vec_col))
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), cv.alias("cv"), V.norm(cv).alias("cn")
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _paired_cosine().alias("cos_raw"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_raw", 6).alias("cosine"))
    )


def knn_matmul(corpus: DataFrame, queries: DataFrame, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors via Arrow-batched BLAS — the
    vectorized-Pandas-UDF dual of :func:`knn_bruteforce` (same result).

    The (small-by-contract) query set is collected once into a numpy
    matrix (with its row norms) and broadcast; each corpus Arrow batch
    then costs ONE `Q @ C_batch.T` matmul, and only |Q| x k candidate
    rows per batch ever leave the executor (local top-k inside the UDF,
    global top-k after). This is the shape that wins as dim or |Q|
    grows: the crossJoin plan evaluates |Q| x |C| expression trees,
    the matmul path hands the same arithmetic to BLAS. At 100 TB the
    corpus side stays fully distributed; if |Q| outgrows a broadcast,
    shard the query matrix and union the shards.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype="int64")
    qm = np.asarray([list(r[1]) for r in qrows], dtype="float64")
    qnorm = np.linalg.norm(qm, axis=1)
    bq = corpus.sparkSession.sparkContext.broadcast((qids, qm, qnorm))

    def run(batches):
        b_qids, b_qm, b_qnorm = bq.value
        kk = k
        for pdf in batches:
            if not len(pdf):
                continue
            nids = pdf[id_col].to_numpy(dtype="int64")
            cm = np.asarray([list(v) for v in pdf[vec_col]], dtype="float64")
            cnorm = np.linalg.norm(cm, axis=1)
            # dot / (|q| * |c|) — the same final-division order as
            # V.cosine, so ties rank identically across the two paths
            # (normalize-then-matmul rounds differently in the low bits)
            sims = (b_qm @ cm.T) / (b_qnorm[:, None] * cnorm[None, :])
            # a query vector present in this batch must not match itself
            self_mask = b_qids[:, None] == nids[None, :]
            sims[self_mask] = -np.inf
            take = min(kk, sims.shape[1])
            idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            out_q, out_n, out_c = [], [], []
            for qi in range(sims.shape[0]):
                cols = idx[qi][np.isfinite(sims[qi, idx[qi]])]
                out_q.extend([b_qids[qi]] * len(cols))
                out_n.extend(nids[cols])
                out_c.extend(sims[qi, cols])
            yield pd.DataFrame({
                "query_id": np.array(out_q, dtype="int64"),
                "neighbor_id": np.array(out_n, dtype="int64"),
                "cos_raw": np.array(out_c, dtype="float64"),
            })

    candidates = spread(corpus).select(id_col, vec_col).mapInPandas(
        run, schema="query_id long, neighbor_id long, cos_raw double")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_raw", 6).alias("cosine"))
    )


def all_pairs_cosine_matmul(emb: DataFrame, threshold: float = 0.42,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine >= ``threshold`` via Arrow-batched BLAS —
    the vectorized dual of the expression-tree all-pairs join. The
    division order (dot/(na*nb)) matches V.cosine, but BLAS may
    reassociate the dot-product summation vs a sequential fold, so
    6-dp/threshold agreement with the expression path is *verified
    empirically on the gated corpora* (property-pinned against numpy
    brute force in tests), not bit-guaranteed by construction — a
    cosine landing exactly on a rounding/threshold boundary could in
    principle flip on other data.

    This op is the small-SF recall BASELINE for the banded-LSH scale
    path, so the O(n²) arithmetic is by design — the matmul kernel
    just stops paying it as n² interpreted expression folds. The full
    (id, vector, norm) matrix is collected and broadcast (bounded by
    the baseline contract: sf0.1 is 6000 x 64 doubles ≈ 3 MB; at real
    scale use embedding_lsh_pairs, which is the gated path). Each
    corpus Arrow batch costs one ``M @ B.T``; only pairs at or above
    the threshold leave the executor.
    """
    import numpy as np
    import pandas as pd

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype="int64")
    m = np.asarray([list(r[1]) for r in rows], dtype="float64")
    norms = np.linalg.norm(m, axis=1)
    bc = emb.sparkSession.sparkContext.broadcast((ids, m, norms))
    thr = threshold

    def run(batches):
        a_ids, am, an = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            b_ids = pdf[id_col].to_numpy(dtype="int64")
            bm = np.asarray([list(v) for v in pdf[vec_col]], dtype="float64")
            bn = np.linalg.norm(bm, axis=1)
            denom = an[:, None] * bn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (am @ bm.T) / denom
            mask = (a_ids[:, None] < b_ids[None, :]) & (denom > 0) \
                & (sims >= thr)
            ai, bi = np.nonzero(mask)
            yield pd.DataFrame({
                "id_a": a_ids[ai], "id_b": b_ids[bi],
                "cos_raw": sims[ai, bi],
            })

    out = spread(emb).select(id_col, vec_col).mapInPandas(
        run, schema="id_a long, id_b long, cos_raw double")
    return out.select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine"))


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell).

    Centroids arrive as driver-side literals (in production: a k-means
    fit on a sample, broadcast). Assignment is a codegen'd argmin over
    k distance expressions — no shuffle; the later search shuffles on
    the small cell id instead of cross-joining the corpus.
    """
    v = spread(df).select(F.col(id_col), _as_double(F.col(vec_col)).alias("dv"))
    return (_staged_argmin(v, "dv", list(enumerate(centroids)))
            .select(F.col(id_col), "dv", "cell"))


def deterministic_centroids(corpus: DataFrame, n_cells: int = 8,
                            id_col: str = "vec_id", vec_col: str = "embedding") -> list[list[float]]:
    """Pick n_cells seed vectors deterministically (lowest ids) — the
    reproducible stand-in for a k-means fit; adequate for cell routing."""
    rows = (
        corpus.orderBy(id_col).limit(n_cells)
        .select(_as_double(F.col(vec_col)).alias("v")).collect()
    )
    return [list(r.v) for r in rows]


def knn_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5, n_cells: int = 8,
            id_col: str = "vec_id", vec_col: str = "embedding",
            cents: list | None = None) -> DataFrame:
    """IVF-style ANN: route query + corpus vectors to centroid cells,
    search exactly within the query's cell. The 100 TB shape: one
    equi-join on cell id; recall tuned by probing >1 cell (nprobe).

    Both assignment frames are locally checkpointed: CollapseProject
    merges the staged-argmin projections back together when the join
    consumes them, re-substituting every per-centroid distance fold
    into the least()/when-chain references — a 276 KB plan with 161
    zip_with folds whose per-action analysis+codegen dominated the
    query (measured 7.9 s -> 1.9 s at sf0.1 with the barrier).

    ``cents``: pre-selected cell centroids (the registry pattern —
    IVF index construction is offline in production); omitted, the
    deterministic seed pick runs inline (identical result)."""
    if cents is None:
        cents = deterministic_centroids(corpus, n_cells, id_col, vec_col)
    c = ivf_assign(corpus, cents, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("dv").alias("cv"),
        V.norm(F.col("dv")).alias("cn"), "cell").localCheckpoint(eager=False)
    q = ivf_assign(queries, cents, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("dv").alias("qv"),
        V.norm(F.col("dv")).alias("qn"), "cell").localCheckpoint(eager=False)
    scored = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _paired_cosine().alias("cos_raw"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_raw", 6).alias("cosine"))
    )


def knn_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            n_planes: int = 8, seed: int = 7, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-LSH
    bucket, then exact cosine within it. At scale the bucket join is an
    equi-join (shuffle on bucket key) instead of a cross join; recall
    is tuned by n_planes (fewer planes = bigger buckets = higher
    recall, more compute)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        V.norm(_as_double(F.col(vec_col))).alias("qn"),
        V.sign_lsh_key(_as_double(F.col(vec_col)), n_planes, seed, dim).alias("bucket"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        V.norm(_as_double(F.col(vec_col))).alias("cn"),
        V.sign_lsh_key(_as_double(F.col(vec_col)), n_planes, seed, dim).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _paired_cosine().alias("cos_raw"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_raw", 6).alias("cosine"))
    )


def embedding_lsh_pairs(emb: DataFrame, threshold: float = 0.42,
                        n_planes: int = 4, n_tables: int = 8, seed: int = 101,
                        dim: int = 64, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        carry_vectors: bool = True,
                        kernel: str = "bucket",
                        scorer: str = "expr",
                        max_group: int | None = 8192,
                        n_rows: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded sign-LSH — the scale
    path that replaces the all-pairs self-join.

    ``n_tables`` independent hash tables, each keyed by an
    ``n_planes``-bit sign-LSH bucket (deterministic md5-derived
    hyperplanes, seeds ``seed..seed+n_tables-1``). Candidates are pairs
    colliding in ANY table (explode (table, bucket) keys -> self
    equi-join on both), scored exactly, filtered at ``threshold``, then
    deduped across tables with groupBy+max (map-side combine — never
    `.distinct()` on the scored triple). The plan contains no all-pairs
    join: work is proportional to colliding pairs.

    Recall for a pair at cosine c is 1-(1-p^n_planes)^n_tables with
    p = 1 - arccos(c)/pi (~0.80 theoretical at c=0.42 for the 4x8
    default; 71-76% measured against the exact all-pairs oracle on the
    synthetic corpus, whose 0.42-0.51 cosine band is hyperplane LSH's
    weakest regime — production near-dup thresholds ~0.9 bucket far
    more sharply). At 100 TB, grow n_planes with log2(n) to keep buckets
    bounded, and raise n_tables to buy recall back.

    Shuffle-width knob: with ``carry_vectors=True`` the exploded rows
    carry the vector (dim doubles) x n_tables through the bucket join
    and pairs dedupe AFTER scoring (groupBy+max, map-side combine).
    With ``carry_vectors=False`` only (id, table, bucket) triples are
    exploded and joined; candidate PAIRS are deduped pre-score
    (dropDuplicates on two longs), then the vectors join back once per
    side and each surviving pair is scored exactly once. Same result
    by construction (both paths are tested equal).

    Which to pick: ``False`` wins whenever pairs collide in more than
    ~1 table on average (the cosine fold is then paid per collision
    instead of per pair — measured 12.2s vs 4.9s warm at sf0.1 with
    the 4x8 default, avg multiplicity ~2) AND always at large dim
    (1024-dim pushes ~8 KB x n_tables per row through the exchange).
    ``True`` only pays off when buckets are so sparse that collisions
    are near-unique (high n_planes) and dim is small, where skipping
    the two vector re-joins saves more than duplicate scoring costs.

    ``kernel="bucket"`` (default) skips the bucket self-JOIN entirely:
    explode (vid, vector) by (table, bucket) once, group by the bucket
    key, and score every within-bucket pair with a chunked BLAS
    ``M_chunk @ M.T`` inside ``applyInPandas`` — then dedupe surviving
    pairs across tables with the same groupBy+max. Vectors cross the
    Arrow boundary once per EXPLODED ROW (n x n_tables), never once
    per candidate pair. This is decisive on collision-heavy corpora:
    at 10x sf0.1 the uniform test embeddings produce 104.6M
    table-collisions (82.1M distinct candidate pairs) under the 4x8
    default, and the join kernels pay per pair — measured 30.4s
    (expression fold, ~14 us/pair/core) and 45.9s (per-pair einsum:
    the row-wise kernel is fast but ships 2 x 64 doubles per PAIR
    through Arrow, ~84 GB) vs the bucket kernel's one 90 MB explode
    plus BLAS arithmetic (docs/SCALING.md). Same empirical 6-dp BLAS
    parity contract as all_pairs_cosine_matmul, pinned by the
    path-equality tests. Per-bucket memory is chunk x |bucket|
    doubles; n_planes ~ log2(n) keeps |bucket| bounded at scale —
    for UNIFORM data. A power-law corpus (real crawls: one
    boilerplate cluster holding 5-10% of all docs) lands its whole
    cluster in ONE bucket in every table regardless of plane count,
    so ``max_group`` (default 8192) chunk-splits any bucket larger
    than that into C(C+1)/2 independent wedge/rectangle subtasks via
    :func:`_chunk_split_oversized` — identical pair set, bounded task
    size (straggler measurement: docs/SCALING.md addendum 4). Pass
    ``max_group=None`` to pin the one-task-per-bucket layout, and
    ``n_rows`` (a caller-known row-count bound: catalog stats /
    parquet footer metadata) to make the no-split decision job-free —
    a bucket never holds more than one row per input vector, so
    ``n_rows <= max_group`` proves no split is needed without running
    any Spark job at plan-build time.
    The kernel requires an INTEGRAL ``id_col`` (ids cross Arrow as
    int64 and the output schema says ``long``); non-integral ids
    fall back to ``kernel="join"`` automatically.

    ``kernel="join"`` keeps the pure-plan bucket self-join (the
    in-engine cross-check and the shape to reach for when buckets are
    sharp and collisions sparse): ``carry_vectors`` picks the shuffle
    width as above, and ``scorer`` picks the candidate scorer —
    ``"expr"`` (default) the JVM fold, ``"numpy"`` the Arrow einsum
    (:func:`_numpy_paired_scores`, only sensible when candidates are
    few and wide).
    """
    dv = _as_double(F.col(vec_col))
    pre_spread = emb  # count the un-spread frame (spread's round-robin
    # repartition would turn a metadata-ish count into a shuffle)
    emb = spread(emb)
    keys = F.array(*[
        V.sign_lsh_key(dv, n_planes, seed + t, dim) for t in range(n_tables)
    ])
    if kernel == "bucket" and not _id_is_integral(emb, id_col):
        # the BLAS kernel int64-casts ids and emits schema `long`; a
        # string/decimal id would fail inside the Arrow worker, so fall
        # back to the pure-plan bucket join which carries any id type
        kernel = "join"
    if kernel == "bucket":
        import pandas as pd

        thr = threshold
        keyed = emb.select(
            F.col(id_col).alias("vid"), dv.alias("v"),
            F.posexplode(keys).alias("tbl", "bucket"),
        )
        group_cols = ["tbl", "bucket"]
        if max_group:
            # |bucket| <= n (one exploded row per vector per table), so
            # a corpus at or under max_group provably needs no split —
            # a caller-supplied ``n_rows`` (catalog stats / parquet
            # footer metadata) makes that decision JOB-FREE; without
            # the hint, one cheap count of the un-spread input skips
            # the exploded-frame size pass (measured +0.3-0.6 s per
            # sf0.1 bench entry — the hint exists to shave exactly that)
            keyed, group_cols = _chunk_split_oversized(
                keyed, group_cols, max_group,
                row_bound=n_rows if n_rows is not None
                else pre_spread.count())

        def score_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
            # bandwidth-lean shared kernel (_score_group_pairs): wedge
            # GEMM for within-chunk groups, cross rectangle for
            # chunk-pair subtasks of a split oversized bucket
            id_a, id_b, cos = _score_group_pairs(pdf, "v", thr)
            return pd.DataFrame(
                {"id_a": id_a, "id_b": id_b, "cos_raw": cos})

        scored = keyed.groupBy(*group_cols).applyInPandas(
            score_bucket, schema="id_a long, id_b long, cos_raw double")
        return (
            scored.groupBy("id_a", "id_b")
            .agg(F.round(F.max("cos_raw"), 6).alias("cosine"))
        )
    if carry_vectors:
        keyed = emb.select(
            F.col(id_col).alias("vid"), dv.alias("v"), V.norm(dv).alias("nrm"),
            F.posexplode(keys).alias("tbl", "bucket"),
        )
        a, b = keyed.alias("a"), keyed.alias("b")
        cand = (
            a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vid") < F.col("b.vid")))
        )
        if scorer == "numpy":
            scored = _numpy_paired_scores(cand.select(
                F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"),
                F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
                F.col("a.nrm").alias("na"), F.col("b.nrm").alias("nb")))
        else:
            scored = cand.select(
                F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"),
                _paired_cosine("a.v", "b.v", "a.nrm", "b.nrm")
                .alias("cos_raw"))
        scored = scored.filter(F.col("cos_raw") >= threshold)
        return (
            scored.groupBy("id_a", "id_b")
            .agg(F.round(F.max("cos_raw"), 6).alias("cosine"))
        )
    keyed = emb.select(F.col(id_col).alias("vid"),
                       F.posexplode(keys).alias("tbl", "bucket"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vid") < F.col("b.vid")))
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = emb.select(F.col(id_col).alias("vid"), dv.alias("v"),
                      V.norm(dv).alias("nrm"))
    paired = (
        cand
        .join(vecs.select(F.col("vid").alias("id_a"), F.col("v").alias("va"),
                          F.col("nrm").alias("na")), "id_a")
        .join(vecs.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"),
                          F.col("nrm").alias("nb")), "id_b")
    )
    if scorer == "numpy":
        scored = _numpy_paired_scores(
            paired.select("id_a", "id_b", "va", "vb", "na", "nb"))
    else:
        scored = paired.select(
            "id_a", "id_b",
            _paired_cosine("va", "vb", "na", "nb").alias("cos_raw"))
    scored = scored.filter(F.col("cos_raw") >= threshold)
    return scored.select("id_a", "id_b",
                         F.round("cos_raw", 6).alias("cosine"))


def lloyd_centroids(emb: DataFrame, k: int = 4, iters: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> list:
    """Train the deterministic Lloyd centroids and return them as
    labeled (cell, centroid) pairs — the OFFLINE half of the k-means
    family, split out so callers that cluster the same corpus
    repeatedly (a codebook/centroid registry; production systems
    train an index once and serve many) can skip the per-call
    training jobs. Seeds = the k lowest-id vectors; per iteration one
    argmin scan + one (cell, pos) decimal-mean aggregation collected
    to the driver (k*dim doubles). Deterministic, so a cached result
    is byte-identical to retraining on unchanged input."""
    v = spread(emb).select(F.col(id_col), _as_double(F.col(vec_col)).alias("dv"))
    cents = [(i, c) for i, c in
             enumerate(deterministic_centroids(emb, k, id_col, vec_col))]
    for _ in range(iters):
        a = _staged_argmin(v, "dv", cents)
        m = (
            a.select("cell", F.posexplode("dv").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(
                F.sum(F.col("x").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)), 6).alias("cx"))
            .collect()
        )
        new = {}
        for r in m:
            new.setdefault(r.cell, {})[r.pos] = r.cx
        cents = [(cell, [d[p] for p in sorted(d)])
                 for cell, d in sorted(new.items())]
    return cents


def lloyd_assignments(emb: DataFrame, k: int = 4, iters: int = 2,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      centroids: list | None = None) -> DataFrame:
    """Final per-vector cell assignments from a deterministic Lloyd
    run: seeds = the k lowest-id vectors, a fixed number of iterations,
    argmin ties broken toward the lower cell index, and element-wise
    centroid means computed as exact DECIMAL sums rounded to 6 dp
    (order-independent across partitions — a plain double AVG would
    hash-diverge between engines).

    Per iteration: one scan with a codegen'd argmin over k broadcast
    centroid literals (no shuffle), then a (cell, pos) aggregation —
    k*dim groups — to rebuild centroids on the driver. The iterative
    loop moves k*dim doubles per round; the data never re-shuffles, so
    the pattern holds at 100 TB (each pass is a map + tiny agg).

    ``centroids``: pre-trained labeled pairs (:func:`lloyd_centroids`
    return shape) — skips the training jobs entirely; the assignment
    is then ONE argmin scan. Training is deterministic, so passing a
    registry's centroids for unchanged input is result-identical.

    Returns (id, dv, cell, d2) — d2 is the squared distance to the
    final centroid. Shared by :func:`lloyd_kmeans_stats` (per-cell
    stats) and :func:`semantic_dedup_cells` (SemDeDup bucketing).
    """
    if centroids is None:
        centroids = lloyd_centroids(emb, k, iters, id_col, vec_col)
    v = spread(emb).select(F.col(id_col), _as_double(F.col(vec_col)).alias("dv"))
    return _staged_argmin(v, "dv", centroids)


def lloyd_kmeans_stats(emb: DataFrame, k: int = 4, iters: int = 2,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       centroids: list | None = None) -> DataFrame:
    """Per-cell stats over :func:`lloyd_assignments`: size,
    decimal-exact inertia, and an md5 digest of the ordered member ids
    certifying the exact clustering."""
    final = lloyd_assignments(emb, k, iters, id_col, vec_col, centroids)
    final = final.withColumn(
        "d2_6", F.round("d2", 6).cast("decimal(18,6)"))
    return final.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("d2_6").cast("double").alias("inertia"),
        F.md5(F.concat_ws(",", F.transform(
            F.sort_array(F.collect_list(F.col(id_col))),
            lambda x: x.cast("string")))).alias("member_digest"),
    )


def knn_ivf_probe(corpus: DataFrame, queries: DataFrame, k: int = 5,
                  n_cells: int = 8, nprobe: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  cents: list | None = None) -> DataFrame:
    """IVF ANN with multi-cell probing: the query searches its
    ``nprobe`` nearest cells instead of 1 — the standard recall knob
    (recall grows with nprobe at proportional cost; nprobe = n_cells
    degenerates to exact search). Corpus routing stays single-cell;
    only the query side fans out, so the join cost scales with
    queries × nprobe, not corpus size. The corpus assignment is
    locally checkpointed (same CollapseProject plan blowup as
    knn_ivf; see its docstring). ``cents`` as in :func:`knn_ivf`."""
    if cents is None:
        cents = deterministic_centroids(corpus, n_cells, id_col, vec_col)
    c = ivf_assign(corpus, cents, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("dv").alias("cv"),
        V.norm(F.col("dv")).alias("cn"), "cell").localCheckpoint(eager=False)

    qv = queries.select(F.col(id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("qv"))
    dists = []
    for i, cent in enumerate(cents):
        cvec = V.lit_double_array(cent)
        d = F.aggregate(F.zip_with(F.col("qv"), cvec,
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda acc, v: acc + v)
        dists.append(F.struct(d.alias("d2"), F.lit(i).alias("cell")))
    # sort the k (d2, cell) structs ascending -> first nprobe cells;
    # ties break toward the lower cell id (struct field order)
    probed = qv.select(
        "query_id", "qv",
        F.explode(F.slice(F.array_sort(F.array(*dists)), 1, nprobe))
        .alias("pc"))
    q = probed.select("query_id", "qv", V.norm(F.col("qv")).alias("qn"),
                      F.col("pc.cell").alias("cell"))
    # No post-score dedup is needed: ivf_assign routes every corpus
    # vector to exactly ONE cell (strict-< argmin) and the probed cells
    # per query are distinct by construction, so each (query, neighbor)
    # pair is scored at most once. The previous `.distinct()` here
    # inserted a full shuffle of every scored candidate pair (4.4x
    # slower than single-probe at sf0.1) for rows that were already
    # unique. If corpus routing ever becomes multi-cell, dedupe with
    # groupBy(query_id, neighbor_id).agg(F.max("cos_raw")) — map-side
    # combine — never `.distinct()` on the near-unique scored triple.
    scored = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _paired_cosine().alias("cos_raw"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos_raw", 6).alias("cosine"))
    )


def semantic_dedup_cells(emb: DataFrame, k: int = 4, iters: int = 2,
                         threshold: float = 0.42,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         kernel: str = "blas", salt: int = 8,
                         max_group: int | None = 8192,
                         n_rows: int | None = None,
                         centroids: list | None = None) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public paper):
    k-means cells bound the candidate space, exact cosine runs only
    WITHIN a cell. The standard embedding-dedup shape for web-scale
    corpora — clustering cost is linear (see lloyd_assignments), and
    in-cell pair scoring is sum over cells of |cell|², kept small by
    growing k with n (the paper uses k ~ sqrt(n)).

    Like IVF search, pairs that straddle a cell boundary are missed by
    construction — the recall knob is k (smaller k = bigger cells =
    higher recall, more in-cell work); the banded sign-LSH dedup
    (embedding_lsh_pairs) is the multi-table alternative when recall
    must be tunable without re-clustering.

    Deterministic end-to-end (lowest-id seeds, decimal-exact centroid
    means, tie-broken argmin), so an SQL oracle can replay the exact
    cell assignment AND the in-cell pair set.

    Two in-cell scoring kernels, identical output (equality pinned in
    tests; sf1 measurement in docs/SCALING.md):

    - ``kernel="blas"`` (default): one ``applyInPandas`` per cell,
      chunked ``M_chunk @ M.T`` so peak memory is chunk*|cell| doubles
      regardless of cell size. The expression path costs ~10 us per
      candidate pair (measured: 2*10^8 HOF cosine folds = ~30 s of a
      32 s sf1 wall); the BLAS kernel pays the same n²/k arithmetic at
      vectorized speed. Same empirical-not-bit-guaranteed 6-dp parity
      caveat as :func:`all_pairs_cosine_matmul` (BLAS may reassociate
      the dot sum); the expr kernel exists as the in-engine
      cross-check. Requires an INTEGRAL ``id_col`` (ids cross Arrow
      as int64, output schema ``long``); non-integral ids fall back
      to ``kernel="expr"`` automatically.
      Parallelism is k tasks (one per cell) — with the
      paper's k ~ sqrt(n) that is also the scale-out knob, and cells
      arrive via one shuffle of (id, vector), never a broadcast.
      On a power-law corpus the dominant cluster is one CELL whatever
      k is, so ``max_group`` (default 8192) chunk-splits oversized
      cells into independent wedge/rectangle subtasks exactly like
      embedding_lsh_pairs' bucket kernel (:func:`_chunk_split_oversized`;
      identical pair set, docs/SCALING.md addendum 4); ``None`` pins
      the one-task-per-cell layout, and ``n_rows`` (caller-known row
      bound) makes the no-split decision job-free exactly as in
      embedding_lsh_pairs.
    - ``kernel="expr"``: pure-JVM salted self-join. Each right-side
      row keeps one deterministic bucket (vid % salt) and the left
      side explodes to all ``salt`` buckets, so every (u, v) pair
      meets exactly once (via u's copy in v's bucket) over k*salt
      join keys — output identical for any salt value.

    Assignments are locally checkpointed first so the Lloyd argmin
    chain (a k*dim-literal expression tree) is computed once and the
    scoring stage carries a truncated lineage, not extra copies of
    the staged-argmin plan.
    """
    a = lloyd_assignments(emb, k, iters, id_col, vec_col, centroids).select(
        F.col(id_col).alias("vid"), "dv", "cell",
    ).withColumn("nrm", V.norm(F.col("dv"))).localCheckpoint(eager=False)

    if kernel == "blas" and not _id_is_integral(emb, id_col):
        # same int64-id constraint as embedding_lsh_pairs' bucket
        # kernel: fall back to the pure-plan salted join for
        # non-integral id columns
        kernel = "expr"
    if kernel == "blas":
        import numpy as np
        import pandas as pd

        thr = threshold
        group_cols = ["cell"]
        if max_group:
            # |cell| <= n; a caller-supplied ``n_rows`` keeps plan
            # construction job-free (the lazy checkpoint then
            # materializes at the scoring action); without the hint,
            # counting `a` also materializes the checkpoint the size
            # pass would have materialized anyway
            a, group_cols = _chunk_split_oversized(
                a, group_cols, max_group,
                row_bound=n_rows if n_rows is not None else a.count())

        def score_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
            # bandwidth-lean shared kernel (_score_group_pairs): wedge
            # GEMM within a (chunk of a) cell, cross rectangle for the
            # chunk-pair subtasks of a split oversized cell
            cell = int(pdf["cell"].iloc[0])
            id_a, id_b, cos = _score_group_pairs(pdf, "dv", thr)
            return pd.DataFrame({
                "id_a": id_a,
                "id_b": id_b,
                "cell": np.full(len(id_a), cell, dtype="int32"),
                "cos_raw": cos})

        pairs = a.groupBy(*group_cols).applyInPandas(
            score_cell, schema="id_a long, id_b long, cell int, cos_raw double")
    else:
        l = a.withColumn(
            "s", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        # any deterministic per-row bucket works (each pair still meets
        # exactly once via u's copy in v's bucket); pmod on the id
        # needs a numeric id, so non-integral ids bucket by hash
        r_salt = (F.pmod(F.col("vid"), F.lit(salt))
                  if _id_is_integral(emb, id_col)
                  else F.pmod(F.abs(F.hash(F.col("vid"))), F.lit(salt)))
        r = a.withColumn("s", r_salt)
        pairs = (
            l.alias("l").join(
                r.alias("r"),
                (F.col("l.cell") == F.col("r.cell"))
                & (F.col("l.s") == F.col("r.s"))
                & (F.col("l.vid") < F.col("r.vid")))
            .select(
                F.col("l.vid").alias("id_a"), F.col("r.vid").alias("id_b"),
                F.col("l.cell").alias("cell"),
                _paired_cosine("l.dv", "r.dv", "l.nrm", "r.nrm")
                .alias("cos_raw"),
            )
            .filter(F.col("cos_raw") >= threshold)
        )
    return pairs.select("id_a", "id_b", "cell",
                        F.round("cos_raw", 6).alias("cosine"))


def _staged_argmin(df: DataFrame, dv_name: str, cent_pairs,
                   cell_name: str = "cell", d2_name: str = "d2") -> DataFrame:
    """Argmin over centroid literals with per-centroid distances staged
    as NAMED COLUMNS. The fold-the-when-chain alternative nests each
    distance subtree inside every later comparison — the expression
    tree (and analysis + codegen time) grows superlinearly in k; staged
    columns are computed once each (see the dedup.py PERF note on
    multi-referenced aliases). Ties break toward the lower cell index
    (first equality wins), matching the SQL oracle's ORDER BY d2, cell.

    Plan-construction cost note: the k distance folds are built as ONE
    F.expr parse each and appended in ONE select (not k sequential
    withColumns — every withColumn re-analyzes the whole growing plan
    on the JVM, which made a 4x8 PQ argmin cost ~1.4 s of driver time
    before any job ran). The staged-columns EXECUTION shape is
    unchanged: withColumn and select("*", ...) produce the same
    Project, only the number of analysis passes differs.
    """
    return _staged_argmin_multi(df, [(dv_name, cent_pairs, cell_name,
                                      d2_name)])


def _staged_argmin_multi(df: DataFrame, specs) -> DataFrame:
    """N independent staged argmins appended in ONE three-select pass
    (all distance folds, then all mins, then all when-chains) — the
    m-subspace PQ assignment is one call instead of m, so the driver
    pays 3 analysis passes instead of 3m on a plan that grows with
    every subspace. ``specs``: (dv_name, cent_pairs, cell_name,
    d2_name) tuples; temp distance columns are namespaced by d2_name
    (unique per spec by construction at every call site)."""
    dcols, per_spec = [], []
    for dv_name, cent_pairs, cell_name, d2_name in specs:
        names = []
        for label, c in cent_pairs:
            arr = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in c)
            dist = F.expr(
                f"aggregate(zip_with(`{dv_name}`, array({arr}), "
                "(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), "
                "(acc, d) -> acc + d)")
            names.append((label, f"_d{d2_name}_{label}"))
            dcols.append(dist.alias(names[-1][1]))
        per_spec.append((names, cell_name, d2_name))
    df = df.select("*", *dcols)
    df = df.select("*", *[
        F.least(*[F.col(n) for _, n in names]).alias(d2_name)
        for names, _, d2_name in per_spec])
    cells = []
    for names, cell_name, d2_name in per_spec:
        cell = None
        for label, n in names:
            cond = F.col(n) == F.col(d2_name)
            cell = (F.when(cond, F.lit(label)) if cell is None
                    else cell.when(cond, F.lit(label)))
        cells.append(cell.alias(cell_name))
    return df.select("*", *cells).drop(
        *[n for names, _, _ in per_spec for _, n in names])


def pq_train(emb: DataFrame, m: int = 2, k: int = 4, iters: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: the vector is split into ``m``
    contiguous subspaces and each gets an independent deterministic
    Lloyd codebook (lowest-id seeds, ``iters`` iterations,
    decimal-exact means rounded to 6 dp — the same oracle-replayable
    recipe as lloyd_assignments). Returns m codebooks of LABELED
    (cell_id, centroid) pairs — labels are preserved through Lloyd
    updates (not re-enumerated) so that if a cell ever empties, code
    ids stay aligned with the SQL oracle's label-preserving
    mean-update CTE, exactly as lloyd_assignments does.

    Training is FUSED across subspaces: one seed collect (the k
    lowest-id FULL vectors, sliced driver-side — byte-identical to
    slicing in-plan) and, per Lloyd iteration, ONE job computing every
    (subspace, cell, pos) decimal mean via struct-explode, instead of
    m sequential (seed + mean) job pairs. On driver-job-overhead-bound
    corpora the sequential shape was the whole wall: knn_cosine_pq_adc
    measured ~7.5 s of corpus-size-independent fixed cost at every SF
    (docs/SCALING.md). The per-subspace math, seeds, labels, and
    6-dp-rounded means are unchanged, so the SQL oracle replays
    identically. The driver still holds only m*k*subdim floats —
    the IVF-PQ memory story at 100 TB.
    """
    subdim = dim // m
    v = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("dv"))
    seed_rows = (v.orderBy(id_col).limit(k).select("dv").collect())
    books = [
        [(i, list(r.dv[s * subdim:(s + 1) * subdim]))
         for i, r in enumerate(seed_rows)]
        for s in range(m)
    ]
    for _ in range(iters):
        # all m slices appended in one select (not m withColumns) —
        # same Project, m fewer full-plan analysis passes
        df = v.select("*", *[
            F.slice("dv", s * subdim + 1, subdim).alias(f"_sub{s}")
            for s in range(m)])
        df = _staged_argmin_multi(df, [
            (f"_sub{s}", books[s], f"_cell{s}", f"_d2_{s}")
            for s in range(m)])
        structs = [
            F.struct(
                F.lit(s).alias("s"), F.col(f"_cell{s}").alias("cell"),
                F.col(f"_sub{s}").alias("sub"))
            for s in range(m)]
        rows = (
            df.select(F.explode(F.array(*structs)).alias("e"))
            .select("e.s", "e.cell", F.posexplode("e.sub").alias("pos", "x"))
            .groupBy("s", "cell", "pos")
            .agg(F.round(
                F.sum(F.col("x").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)), 6).alias("cx"))
            .collect()
        )
        new: list[dict[int, dict[int, float]]] = [{} for _ in range(m)]
        for r in rows:
            new[r.s].setdefault(r.cell, {})[r.pos] = r.cx
        books = [
            [(cell_id, [d[p] for p in sorted(d)])
             for cell_id, d in sorted(new[s].items())]
            for s in range(m)
        ]
    return books


def pq_assign_long(emb: DataFrame, codebooks: list[list[tuple[int, list[float]]]],
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Long-form PQ code assignment: one row per (vector, subspace)
    with the nearest-centroid code and the quantization error d2.
    Map-only (argmin over broadcast centroid literals) — no shuffle,
    and ONE corpus scan for all m subspaces (each row computes its m
    argmins, then struct-explodes to long form) instead of an m-way
    union of per-subspace scans. Codes are the codebooks' own cell
    labels (pq_train preserves them through Lloyd updates), never
    re-enumerated positions."""
    m = len(codebooks)
    subdim = len(codebooks[0][0][1])
    df = spread(emb).select(F.col(id_col), _as_double(F.col(vec_col)).alias("dv"))
    df = df.select("*", *[
        F.slice("dv", s * subdim + 1, subdim).alias(f"_sub{s}")
        for s in range(m)])
    df = _staged_argmin_multi(df, [
        (f"_sub{s}", book, f"_cell{s}", f"_d2_{s}")
        for s, book in enumerate(codebooks)])
    structs = [
        F.struct(
            F.lit(s).alias("subspace"), F.col(f"_cell{s}").alias("code"),
            F.col(f"_d2_{s}").alias("d2"))
        for s in range(m)]
    return (
        df.select(F.col(id_col), F.explode(F.array(*structs)).alias("e"))
        .select(F.col(id_col), "e.subspace", "e.code", "e.d2")
    )


def pq_quantization_stats(emb: DataFrame, m: int = 2, k: int = 4,
                          iters: int = 1, id_col: str = "vec_id",
                          vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Per-(subspace, code) PQ stats: population, decimal-exact summed
    quantization error, and an md5 digest of the ordered member ids —
    certifying the exact code assignment against the SQL oracle."""
    books = pq_train(emb, m, k, iters, id_col, vec_col, dim)
    codes = pq_assign_long(emb, books, id_col, vec_col)
    return (
        codes.withColumn("d2_6", F.round("d2", 6).cast("decimal(18,6)"))
        .groupBy("subspace", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("d2_6").cast("double").alias("sq_err"),
            F.md5(F.concat_ws(",", F.transform(
                F.sort_array(F.collect_list(F.col(id_col))),
                lambda x: x.cast("string")))).alias("member_digest"),
        )
    )


def knn_pq_adc(corpus: DataFrame, queries: DataFrame, k: int = 5,
               m: int = 2, n_codes: int = 4, iters: int = 1,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int = 64, books: list | None = None) -> DataFrame:
    """Approximate top-k cosine via PQ asymmetric distance computation
    (ADC): the corpus is reduced to ``m`` small codes per vector; each
    query precomputes dot(q_sub, centroid) for every (subspace, code) —
    an m×n_codes lookup — and a candidate's approximate cosine is
    assembled from m lookup entries, never from its raw vector.

    The 100 TB shape: the scored join carries only (id, subspace,
    code) — the 8-byte-per-subspace compressed corpus — against a
    broadcast |Q|×m×n_codes lookup; per-pair math is m additions. The
    recall knob is n_codes (codebook resolution) and m (subspace
    granularity); re-ranking the ADC top-k' with exact vectors is the
    standard refinement (knn_bruteforce on the candidate set).

    Deterministic end-to-end (training, codes, tie-broken ranking), so
    the SQL oracle replays training AND scoring exactly.

    ``books``: pre-trained codebooks (the :func:`pq_train` return
    shape). PQ training is an OFFLINE amortized step in any production
    ANN system — train once, serve many — so callers that search the
    same corpus repeatedly pass their registry's codebooks here and
    skip the per-call Lloyd jobs; omitted, training runs inline
    (identical output — training is deterministic).
    """
    if books is None:
        books = pq_train(corpus, m, n_codes, iters, id_col, vec_col, dim)
    subdim = len(books[0][0][1])
    codes = pq_assign_long(corpus, books, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "subspace", "code")

    qv = _as_double(F.col(vec_col))
    q = queries.select(F.col(id_col).alias("query_id"), qv.alias("qv"),
                       V.norm(qv).alias("qn"))
    # per-query ADC lookup: qdot + centroid norm² for every (s, code).
    # Each entry is ONE F.expr parse (same plan-construction rationale
    # as _staged_argmin_multi): same zip_with/aggregate fold as V.dot.
    lut_rows = []
    for s, book in enumerate(books):
        for code, cent in book:
            arr = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in cent)
            cn2 = float(sum(x * x for x in cent))
            lut_rows.append(F.expr(
                f"named_struct('subspace', {s}, 'code', {code}, "
                f"'qdot', aggregate(zip_with("
                f"slice(qv, {s * subdim + 1}, {subdim}), array({arr}), "
                "(x, y) -> x * y), CAST(0.0 AS DOUBLE), "
                "(acc, v) -> acc + v), "
                f"'cn2', CAST('{cn2!r}' AS DOUBLE))"))
    lut = q.select(
        "query_id", "qn", F.explode(F.array(*lut_rows)).alias("e")
    ).select("query_id", "qn", "e.subspace", "e.code", "e.qdot", "e.cn2")

    scored = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qdot").alias("dot_adc"), F.sum("cn2").alias("cn2_sum"),
             F.min("qn").alias("qn"))
        .withColumn("cos_adc",
                    F.when(F.col("qn") * F.sqrt("cn2_sum") > 0,
                           F.col("dot_adc") / (F.col("qn") * F.sqrt("cn2_sum"))))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_adc"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos_adc", 6).alias("cosine_adc"))
    )


def knn_pq_rerank(corpus: DataFrame, queries: DataFrame, k: int = 5,
                  shortlist: int = 50, m: int = 4, n_codes: int = 8,
                  iters: int = 1, id_col: str = "vec_id",
                  vec_col: str = "embedding", dim: int = 64,
                  books: list | None = None) -> DataFrame:
    """The full IVF-PQ search pattern: ADC over the compressed corpus
    produces a ``shortlist`` of candidates per query, then ONLY those
    |Q| x shortlist pairs fetch their raw vectors for exact cosine
    re-ranking. Reported cosines are therefore exact (identical values
    to knn_bruteforce for the pairs returned); the approximation lives
    entirely in which candidates make the shortlist.

    Measured on the synthetic corpus (uniform-random 64-dim vectors —
    distance concentration makes this the hardest regime for vector
    quantization): true-top-5 shortlist coverage 0.40 at sf0.01
    (k'=50/500) and 0.49 at sf0.1 (k'=200/5000); clustered production
    embeddings bucket far more sharply. Recall knobs: shortlist width,
    n_codes, m.
    """
    cand = knn_pq_adc(corpus, queries, k=shortlist, m=m, n_codes=n_codes,
                      iters=iters, id_col=id_col, vec_col=vec_col,
                      dim=dim, books=books).select("query_id", "neighbor_id")
    qv = _as_double(F.col(vec_col))
    q = queries.select(F.col(id_col).alias("query_id"), qv.alias("qv"),
                       V.norm(qv).alias("qn"))
    cv = _as_double(F.col(vec_col))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), cv.alias("cv"),
                      V.norm(cv).alias("cn"))
    scored = (
        cand.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
        .select("query_id", "neighbor_id", _paired_cosine().alias("cos_raw"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos_raw", 6).alias("cosine"))
    )


def knn_ivf_pq(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_cells: int = 8, nprobe: int = 2, shortlist: int = 50,
               m: int = 4, n_codes: int = 8, iters: int = 1,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int = 64, cents: list | None = None,
               books: list | None = None) -> DataFrame:
    """The full production ANN composition (FAISS IVFADC): an IVF
    coarse quantizer routes each query to its ``nprobe`` nearest
    cells, PQ-ADC scores ONLY the compressed codes living in those
    cells, and the top-``shortlist`` candidates fetch raw vectors for
    exact cosine re-ranking.

    What each prior operator lacked alone: :func:`knn_pq_adc` /
    :func:`knn_pq_rerank` scan EVERY corpus code per query (compressed
    but exhaustive — memory solved, CPU not); :func:`knn_ivf_probe`
    prunes the candidate set but scores raw vectors (CPU per pair high,
    memory unsolved). Composed, the scored join touches ~nprobe/n_cells
    of the corpus AND moves only (id, cell, subspace, code) — at 100 TB
    that is the difference between an exhaustive pass over compressed
    codes and reading ~2/8 of an 8-byte-per-subspace index, which is
    why this is the shape every production vector store ships.

    Deterministic end-to-end (seeded centroids, decimal-exact Lloyd,
    strict argmins, tie-broken ranks), so the DuckDB oracle replays
    coarse routing, codebook training, code assignment, restricted ADC,
    and the re-rank. Reported cosines are exact (the approximation is
    confined to shortlist membership, as in :func:`knn_pq_rerank`).
    ``cents``/``books``: pass registry artifacts to skip the offline
    training jobs (train-once-serve-many), as in the other ANN ops.
    """
    if cents is None:
        cents = deterministic_centroids(corpus, n_cells, id_col, vec_col)
    if books is None:
        books = pq_train(corpus, m, n_codes, iters, id_col, vec_col, dim)
    subdim = len(books[0][0][1])

    # corpus side: one row per (vector, subspace) carrying its coarse
    # cell + PQ code — the entire serving index. The coarse-cell argmin
    # and the m subspace argmins are all independent argmins over the
    # SAME row, so they run in ONE _staged_argmin_multi pass over ONE
    # corpus scan (r15, guide §2.4: the previous shape ran ivf_assign
    # and pq_assign_long as separate scans and re-attached them with a
    # neighbor_id shuffle join — two Exchanges plus a SortMergeJoin to
    # glue together columns born on the same row). Assignments are
    # bit-identical: same argmin machinery, same centroid literals,
    # same lower-label tie-break. Lineage barrier for the same
    # CollapseProject reason as knn_ivf/knn_ivf_probe.
    m_sub = len(books)
    cdf = spread(corpus).select(F.col(id_col),
                                _as_double(F.col(vec_col)).alias("dv"))
    cdf = cdf.select("*", *[
        F.slice("dv", s * subdim + 1, subdim).alias(f"_sub{s}")
        for s in range(m_sub)])
    cdf = _staged_argmin_multi(cdf, [
        ("dv", list(enumerate(cents)), "cell", "_d2c")] + [
        (f"_sub{s}", book, f"_cell{s}", f"_d2_{s}")
        for s, book in enumerate(books)])
    structs = [
        F.struct(F.lit(s).alias("subspace"),
                 F.col(f"_cell{s}").alias("code"))
        for s in range(m_sub)]
    coded = (
        cdf.select(F.col(id_col).alias("neighbor_id"), "cell",
                   F.explode(F.array(*structs)).alias("e"))
        .select("neighbor_id", "cell", "e.subspace", "e.code")
        .localCheckpoint(eager=False)
    )

    # query side: nprobe nearest cells (struct-sort argmin, ties to
    # the lower cell id — same as knn_ivf_probe) ...
    qv = queries.select(F.col(id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("qv"))
    dists = []
    for i, cent in enumerate(cents):
        cvec = V.lit_double_array(cent)
        d = F.aggregate(F.zip_with(F.col("qv"), cvec,
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda acc, v: acc + v)
        dists.append(F.struct(d.alias("d2"), F.lit(i).alias("cell")))
    probed = qv.select(
        "query_id",
        F.explode(F.slice(F.array_sort(F.array(*dists)), 1, nprobe))
        .alias("pc")).select("query_id", F.col("pc.cell").alias("cell"))

    # ... and the ADC lookup (identical construction to knn_pq_adc)
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    q = q.select("query_id", "qv", V.norm(F.col("qv")).alias("qn"))
    lut_rows = []
    for s, book in enumerate(books):
        for code, cent in book:
            arr = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in cent)
            cn2 = float(sum(x * x for x in cent))
            lut_rows.append(F.expr(
                f"named_struct('subspace', {s}, 'code', {code}, "
                f"'qdot', aggregate(zip_with("
                f"slice(qv, {s * subdim + 1}, {subdim}), array({arr}), "
                "(x, y) -> x * y), CAST(0.0 AS DOUBLE), "
                "(acc, v) -> acc + v), "
                f"'cn2', CAST('{cn2!r}' AS DOUBLE))"))
    lut = q.select(
        "query_id", "qn", F.explode(F.array(*lut_rows)).alias("e")
    ).select("query_id", "qn", "e.subspace", "e.code", "e.qdot", "e.cn2")

    # broadcast |Q| x nprobe x m x n_codes probe-scoped lookup; the
    # (cell, subspace, code) equi-join restricts the ADC scan to the
    # probed cells. Corpus routing is single-cell and a query's probed
    # cells are distinct, so each (query, neighbor, subspace) scores
    # exactly once — the groupBy sums exactly m rows per pair.
    probe_lut = probed.join(lut, "query_id")
    scored = (
        coded.join(F.broadcast(probe_lut), ["cell", "subspace", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qdot").alias("dot_adc"), F.sum("cn2").alias("cn2_sum"),
             F.min("qn").alias("qn"))
        .withColumn("cos_adc",
                    F.when(F.col("qn") * F.sqrt("cn2_sum") > 0,
                           F.col("dot_adc") / (F.col("qn") * F.sqrt("cn2_sum"))))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_adc"), F.asc("neighbor_id"))
    cand = (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= shortlist)
            .select("query_id", "neighbor_id"))

    # exact re-rank of the shortlist (identical tail to knn_pq_rerank)
    qx = queries.select(F.col(id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("qv"))
    qx = qx.select("query_id", "qv", V.norm(F.col("qv")).alias("qn"))
    cx = corpus.select(F.col(id_col).alias("neighbor_id"),
                       _as_double(F.col(vec_col)).alias("cv"))
    cx = cx.select("neighbor_id", "cv", V.norm(F.col("cv")).alias("cn"))
    exact = (
        cand.join(F.broadcast(qx), "query_id").join(cx, "neighbor_id")
        .select("query_id", "neighbor_id", _paired_cosine().alias("cos_raw"))
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos_raw", 6).alias("cosine"))
    )


def sq_train(emb: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64
             ) -> tuple[list[float], list[float]]:
    """Scalar-quantizer training: per-dimension (min, max) over the
    corpus — the entire SQ 'codebook' is 2*dim doubles (FAISS
    ScalarQuantizer QT_8bit recipe). ONE global aggregate with 2*dim
    expressions (no explode, no shuffle beyond the map-side-combined
    final merge); min/max are order-independent exact, so the SQL
    oracle's per-position MIN/MAX reproduces them bit-for-bit."""
    dv = _as_double(F.col(vec_col))
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.element_at("dv", i + 1)).alias(f"mn{i}"))
        aggs.append(F.max(F.element_at("dv", i + 1)).alias(f"mx{i}"))
    row = emb.select(dv.alias("dv")).agg(*aggs).collect()[0]
    return ([row[f"mn{i}"] for i in range(dim)],
            [row[f"mx{i}"] for i in range(dim)])


def sq_assign(emb: DataFrame, vmins: list[float], vmaxs: list[float],
              levels: int = 255, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """8-bit scalar-quantization codes: per element,
    ``round((x - vmin_d) * levels / span_d)`` clamped to [0, levels]
    (code 0 when the dimension is constant). Map-only — zip_with over
    broadcast literal min/span arrays inside whole-stage codegen; the
    output row is (id, array<int>) — the 1-byte-per-dimension
    compressed corpus (64 B/vector vs 512 B raw at dim=64).

    Every step is single IEEE ops in a fixed order (subtract, multiply,
    divide, +0.5, floor), so the DuckDB oracle replays the exact codes.
    Out-of-range values (queries quantized against stale stats) clamp
    to the edge codes instead of corrupting neighbors — the same
    graceful-degradation contract as functions/layout.normalize_dim."""
    mn = V.lit_double_array(vmins)
    span = V.lit_double_array([mx - mnv for mnv, mx in zip(vmins, vmaxs)])
    lv = float(levels)
    dv = _as_double(F.col(vec_col))
    shifted = F.zip_with(dv, mn, lambda x, m: x - m)
    codes = F.zip_with(
        shifted, span,
        lambda y, s: F.when(
            s > 0,
            F.floor(F.greatest(F.lit(0.0), F.least(
                F.lit(lv), y * F.lit(lv) / s)) + F.lit(0.5))
        ).otherwise(F.lit(0)).cast("int"))
    return spread(emb).select(F.col(id_col), codes.alias("codes"))


def knn_sq8(corpus: DataFrame, queries: DataFrame, k: int = 5,
            levels: int = 255, id_col: str = "vec_id",
            vec_col: str = "embedding", dim: int = 64,
            stats: tuple[list[float], list[float]] | None = None
            ) -> DataFrame:
    """Approximate top-k cosine over an 8-bit scalar-quantized corpus
    (FAISS IndexScalarQuantizer / QT_8bit flat search). The corpus is
    stored as 1-byte-per-dimension codes; each candidate dequantizes
    ``vhat_d = vmin_d + code_d * span_d / levels`` at scan time and
    scores exact cosine against the raw query vector (asymmetric:
    query uncompressed, corpus compressed).

    The 100 TB shape: exhaustive like knn_bruteforce, but the scanned
    index is 8× smaller (64 B vs 512 B per vector at dim=64 float64,
    4× vs float32) — the memory/IO axis of ANN, complementary to IVF's
    CPU-pruning axis; compose with an IVF route for both (the
    knn_ivf_pq precedent). Decode is map-only zip_with math in
    whole-stage codegen; scoring is the same broadcast-|Q| pattern as
    the rest of the family.

    Deterministic end-to-end — training (order-independent min/max),
    codes (fixed-order IEEE ops + floor), dequantize, tie-broken
    ranking — so the DuckDB oracle replays training, quantization, and
    scoring exactly. ``stats``: pre-trained (vmins, vmaxs) from a model
    registry (train-once-serve-many, as the other ANN ops)."""
    if stats is None:
        stats = sq_train(corpus, id_col, vec_col, dim)
    vmins, vmaxs = stats
    mn = V.lit_double_array(vmins)
    span = V.lit_double_array([mx - mnv for mnv, mx in zip(vmins, vmaxs)])
    lv = float(levels)

    coded = sq_assign(corpus, vmins, vmaxs, levels, id_col, vec_col)
    # decode-at-scan: vhat derives from the CODES (the persisted form),
    # never from the raw vector — information flows through 1 byte/dim.
    vhat = F.zip_with(
        F.zip_with(F.col("codes"), span, lambda c, s: c * s / F.lit(lv)),
        mn, lambda x, m: x + m)
    c = coded.select(F.col(id_col).alias("neighbor_id"),
                     vhat.alias("vhat"))
    c = c.select("neighbor_id", "vhat", V.norm(F.col("vhat")).alias("cn"))

    qv = _as_double(F.col(vec_col))
    q = queries.select(F.col(id_col).alias("query_id"), qv.alias("qv"),
                       V.norm(qv).alias("qn"))
    scored = (
        c.join(F.broadcast(q),
               F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.when(F.col("qn") * F.col("cn") > 0,
                       V.dot(F.col("qv"), F.col("vhat"))
                       / (F.col("qn") * F.col("cn"))).alias("cos_sq"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sq"),
                                          F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos_sq", 6).alias("cosine_sq8"))
    )


def hard_negatives(corpus: DataFrame, queries: DataFrame, k: int = 3,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive / embedding-model
    training: per query, the top-k most-cosine-similar corpus vectors
    whose LABEL DIFFERS from the query's — the near-misses a triplet
    or InfoNCE loss learns most from (easy negatives are already far;
    these are the boundary cases).

    Same broadcast-|Q| exhaustive shape as knn_bruteforce with the
    label-mismatch predicate fused into the join condition, so
    same-label pairs are dropped BEFORE scoring ever materializes —
    at 100 TB the pruned pairs never enter the pair stream. Swap the
    corpus side for an IVF/SQ8-indexed variant exactly as the main
    search tier does when exhaustive stops paying."""
    qv = _as_double(F.col(vec_col))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(label_col).alias("query_label"),
                       qv.alias("qv"), V.norm(qv).alias("qn"))
    cv = _as_double(F.col(vec_col))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(label_col).alias("neighbor_label"),
                      cv.alias("cv"), V.norm(cv).alias("cn"))
    scored = (
        c.join(F.broadcast(q),
               (F.col("query_id") != F.col("neighbor_id"))
               & (F.col("query_label") != F.col("neighbor_label")))
        .select("query_id", "query_label", "neighbor_id",
                "neighbor_label", _paired_cosine().alias("cos_raw"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"),
                                          F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "query_label", "rank", "neighbor_id",
                "neighbor_label", F.round("cos_raw", 6).alias("cosine"))
    )


def knn_ivf_sq8(corpus: DataFrame, queries: DataFrame, k: int = 5,
                n_cells: int = 8, nprobe: int = 2, levels: int = 255,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int = 64, cents: list | None = None,
                stats: tuple[list[float], list[float]] | None = None
                ) -> DataFrame:
    """FAISS IVF-SQ composition: an IVF coarse quantizer routes each
    query to its ``nprobe`` nearest cells, and scoring touches ONLY
    the 1-byte-per-dimension SQ8 codes living in those cells —
    :func:`knn_ivf_probe`'s CPU-pruning axis times :func:`knn_sq8`'s
    memory axis. Where IVF-PQ's codebook floors recall (~0.4 on
    uniform vectors at the pinned params), IVF-SQ keeps SQ8's
    near-lossless codes (recall limited only by cell routing) at 4-8×
    less index than IVF-flat — the standard middle tier real vector
    stores ship between IVFFlat and IVFPQ.

    Deterministic end-to-end (seeded centroids, min/max stats,
    fixed-order quantize ops, tie-broken ranks): the oracle replays
    routing, quantization, decode, and scoring. ``cents``/``stats``:
    registry artifacts (train once, serve many)."""
    if cents is None:
        cents = deterministic_centroids(corpus, n_cells, id_col, vec_col)
    if stats is None:
        stats = sq_train(corpus, id_col, vec_col, dim)
    vmins, vmaxs = stats
    mn = V.lit_double_array(vmins)
    span = V.lit_double_array([mx - mnv for mnv, mx in zip(vmins, vmaxs)])
    lv = float(levels)

    # corpus index: (neighbor_id, cell, vhat, cn) — decode-at-scan from
    # the 1-byte codes, routed by the coarse quantizer. The coarse-cell
    # argmin and the quantize/dequantize are independent row-local
    # functions of the same vector, so they run in ONE pass over ONE
    # corpus scan (r15, guide §2.4 — previously sq_assign and
    # ivf_assign scanned the corpus separately and a neighbor_id
    # shuffle join glued together columns born on the same row; the
    # fused form is map-only end to end). Codes/cells are
    # bit-identical: same fixed-order quantize ops (sq_assign's
    # formula), same staged argmin + lower-cell tie-break. Lineage
    # barrier for the same CollapseProject reason as knn_ivf_pq.
    v = spread(corpus).select(F.col(id_col).alias("neighbor_id"),
                              _as_double(F.col(vec_col)).alias("dv"))
    v = _staged_argmin(v, "dv", list(enumerate(cents)),
                       cell_name="cell", d2_name="_d2c")
    shifted = F.zip_with(F.col("dv"), mn, lambda x, m: x - m)
    codes = F.zip_with(
        shifted, span,
        lambda y, s: F.when(
            s > 0,
            F.floor(F.greatest(F.lit(0.0), F.least(
                F.lit(lv), y * F.lit(lv) / s)) + F.lit(0.5))
        ).otherwise(F.lit(0)).cast("int"))
    # vhat derives from the CODES (the persisted form), never from the
    # raw vector — information still flows through 1 byte/dim
    vhat = F.zip_with(
        F.zip_with(codes, span, lambda c, s: c * s / F.lit(lv)),
        mn, lambda x, m: x + m)
    c = v.select("neighbor_id", "cell", vhat.alias("vhat"))
    c = c.select("neighbor_id", "cell", "vhat",
                 V.norm(F.col("vhat")).alias("cn")) \
        .localCheckpoint(eager=False)

    # query side: nprobe nearest cells (struct-sort argmin, ties to
    # the lower cell id — identical to knn_ivf_pq's router)
    qv0 = queries.select(F.col(id_col).alias("query_id"),
                         _as_double(F.col(vec_col)).alias("qv"))
    dists = []
    for i, cent in enumerate(cents):
        cvec = V.lit_double_array(cent)
        d = F.aggregate(F.zip_with(F.col("qv"), cvec,
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda acc, v: acc + v)
        dists.append(F.struct(d.alias("d2"), F.lit(i).alias("cell")))
    probed = qv0.select(
        "query_id",
        F.explode(F.slice(F.array_sort(F.array(*dists)), 1, nprobe))
        .alias("pc")).select("query_id", F.col("pc.cell").alias("cell"))
    q = qv0.select("query_id", "qv", V.norm(F.col("qv")).alias("qn"))

    scored = (
        c.join(F.broadcast(probed.join(q, "query_id")), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.when(F.col("qn") * F.col("cn") > 0,
                       V.dot(F.col("qv"), F.col("vhat"))
                       / (F.col("qn") * F.col("cn"))).alias("cos_sq"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sq"),
                                          F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id",
                F.round("cos_sq", 6).alias("cosine_sq8"))
    )
