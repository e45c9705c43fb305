"""Iterative domain-mixture reweighting (DoReMi-flavored, exact).

Closes the mixture loop VERDICT r11 item 5 named: q_mixture_drift
diagnoses a skewed mixture and q_sample_temperature applies a static
power-law correction, but nothing ITERATED from per-domain loss
signals to per-domain sample rates. This operator is the
multiplicative-weights update at the core of DoReMi ("DoReMi:
Optimizing Data Mixtures Speeds Up Language Model Pretraining",
Xie et al. 2023 — public arXiv:2305.10429): domains whose proxy loss is high (under-modeled)
get upweighted, smoothed toward uniform so no domain starves.

Exactness contract (the q_vec_pca_power playbook): the whole
iteration is integer arithmetic — per-domain multiply by an integer
update factor, renormalize to a fixed integer mass by truncating
division, smooth by integer convex combination — so DuckDB mirrors
every round bit-exactly with HUGEINT CTEs and the only doubles in the
query keys are final presentation divisions of already-exact
integers. exp(eta * loss) is linearized to (SCALE + ETA * loss): a
valid multiplicative-weights instance (positive, monotone in loss)
that needs no transcendentals, and under renormalization the
fixed-point ranking matches the exponential update's.

Scale shape: the weights relation has ONE ROW PER DOMAIN (tens, not
billions) — every round is a map over it plus a 1-row global sum
broadcast back. The corpus-sized work (computing the loss proxy)
happens ONCE, upstream, and is pinned by the caller; nothing here
touches the corpus again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hive_similarity_join_spark.functions import text as TX

SCALE = 1_000_000       # weight fixed-point unit; also the uniform weight
ETA = 2                 # update factor = SCALE + ETA * loss_scaled
KEEP, MIX, SMOOTH_DEN = 9, 1, 10   # w <- (9*w_norm + 1*uniform) / 10
REWEIGHT_ROUNDS = 5

_D38 = "decimal(38,0)"


def doc_bigrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(_dom, w1, w2, is_ref): every ordered bigram occurrence of every
    doc, tagged with the md5(id) reference/held-out coin — the shared
    front of the batch loss proxy and the streaming mirror's partials
    (streaming/incremental_rollup.py reweight_partials), so the two
    cannot drift on tokenization or the split."""
    occ = docs.select(
        F.col(id_col).alias("_id"),
        F.col(domain_col).alias("_dom"),
        F.posexplode(TX.bag_tokens(text_col)).alias("pos", "tok"),
    )
    wdoc = Window.partitionBy("_id").orderBy("pos")
    return occ.select(
        "_dom",
        F.col("tok").alias("w1"),
        F.lead("tok").over(wdoc).alias("w2"),
        (
            F.substring(
                F.md5(F.col("_id").cast("string").cast("binary")), 1, 1
            )
            < "8"
        ).alias("is_ref"),
    ).filter(F.col("w2").isNotNull())


def oov_loss_from_parts(refv: DataFrame, held: DataFrame) -> DataFrame:
    """Per-domain OOV loss from a reference-vocabulary relation
    (w1, w2) and a held-out occurrence-count relation (_dom, w1, w2,
    cnt) — the back half of the loss proxy, shared with the streaming
    mirror (whose carry stores exactly these two relations). All
    occurrences of a bigram TYPE share OOV status, so summing counts
    per type equals counting occurrences row by row."""
    probed = held.join(
        refv.withColumn("_hit", F.lit(1)), ["w1", "w2"], "left"
    )
    return (
        probed.groupBy("_dom")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_heldout_bigrams"),
            F.sum(F.when(F.col("_hit").isNull(), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            F.col("_dom").alias("source"),
            "n_heldout_bigrams",
            "n_oov",
            F.expr(
                f"CAST((n_oov * {SCALE}) DIV n_heldout_bigrams AS BIGINT)"
            ).alias("loss_scaled"),
        )
    )


def heldout_oov_loss(
    docs: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Exact per-domain loss proxy: held-out bigram OOV rate.

    Docs split 50/50 by an md5(id) coin into reference/held-out
    halves; a held-out bigram occurrence is OOV iff its (w1, w2) type
    never appears anywhere in the reference half. Returns (domain,
    n_heldout_bigrams, n_oov, loss_scaled) with loss_scaled =
    (n_oov * SCALE) DIV n_heldout_bigrams — exact integers end to end,
    so the DuckDB mirror in queries/hygiene_q.py matches bit-for-bit.

    Scale shape: bigrams from ONE id-partitioned lead window, the
    reference-vocabulary probe is a bigram-type-keyed shuffle join,
    the rollup partial-aggregates to one row per domain."""
    bg = doc_bigrams(docs, id_col, domain_col, text_col)
    refv = bg.filter(F.col("is_ref")).select("w1", "w2").distinct()
    held = (
        bg.filter(~F.col("is_ref"))
        .groupBy("_dom", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    loss = oov_loss_from_parts(refv, held)
    if domain_col != "source":
        loss = loss.withColumnRenamed("source", domain_col)
    return loss


def multiplicative_reweight(
    loss: DataFrame,
    domain_col: str = "source",
    loss_col: str = "loss_scaled",
    rounds: int = REWEIGHT_ROUNDS,
) -> DataFrame:
    """``rounds`` exact multiplicative-weights rounds over a
    (domain, loss_scaled) relation; returns (domain, weight_scaled)
    with total mass D * SCALE (D = number of domains).

    Per round, in integers: u(d) = w(d) * (SCALE + ETA * L(d)); then
    renormalize v(d) = (u(d) * TOTAL) DIV sum(u); then smooth
    w'(d) = (KEEP * v(d) + MIX * SCALE) DIV SMOOTH_DEN (the uniform
    weight is exactly SCALE because TOTAL = D * SCALE). All quantities
    are positive, so Spark's truncating DIV and DuckDB's // agree.
    Magnitude bound: w <= TOTAL, u <= TOTAL * (SCALE + ETA * SCALE),
    u * TOTAL < 1e28 for D <= 100 domains — inside decimal(38,0) /
    HUGEINT on both engines."""
    rounds_w = _mw_rounds(loss, domain_col, loss_col, rounds)
    return rounds_w[-1].select(
        F.col("_dom").alias(domain_col),
        F.col("_w").cast("bigint").alias("weight_scaled"),
    )


def _mw_rounds(
    loss: DataFrame, domain_col: str, loss_col: str, rounds: int
) -> list[DataFrame]:
    """The MW loop, returning the weights relation AFTER each round
    (internal: columns _dom, _loss, _w) — multiplicative_reweight
    takes the last, the trace key unions them all."""
    base = loss.select(
        F.col(domain_col).alias("_dom"),
        F.col(loss_col).cast(_D38).alias("_loss"),
    )
    tot = base.agg(
        (F.count(F.lit(1)).cast(_D38) * F.lit(SCALE).cast(_D38))
        .cast(_D38)
        .alias("_tot")
    )
    w = base.select("_dom", "_loss", F.lit(SCALE).cast(_D38).alias("_w"))
    out = []
    for _ in range(rounds):
        u = w.select(
            "_dom",
            "_loss",
            (F.col("_w") * (F.lit(SCALE).cast(_D38) + F.lit(ETA).cast(_D38) * F.col("_loss")))
            .cast(_D38)
            .alias("_u"),
        )
        su = u.agg(F.sum("_u").cast(_D38).alias("_su"))
        w = (
            u.crossJoin(F.broadcast(su))
            .crossJoin(F.broadcast(tot))
            .select(
                "_dom",
                "_loss",
                F.expr(
                    f"CAST(({KEEP} * ((_u * _tot) DIV _su) + {MIX} * {SCALE})"
                    f" DIV {SMOOTH_DEN} AS {_D38})"
                ).alias("_w"),
            )
            # Lazy lineage truncation (the pagerank/CC device): without
            # it each round's broadcast subplans re-nest the previous
            # rounds' broadcasts and the JOB count grows ~3x per round
            # (measured 204 jobs at 5 rounds; 38 with the checkpoint).
            # The relation is D rows, so the checkpoint is
            # memory-trivial; values are unchanged.
            .localCheckpoint(eager=False)
        )
        out.append(w)
    return out


def multiplicative_reweight_trace(
    loss: DataFrame,
    domain_col: str = "source",
    loss_col: str = "loss_scaled",
    rounds: int = REWEIGHT_ROUNDS,
) -> DataFrame:
    """(mw_round, domain, weight_scaled) for every round 1..rounds —
    the convergence trajectory multiplicative_reweight's final answer
    summarizes. Same loop, every intermediate relation emitted."""
    out = None
    for r, w in enumerate(
        _mw_rounds(loss, domain_col, loss_col, rounds), 1
    ):
        leg = w.select(
            F.lit(r).cast("bigint").alias("mw_round"),
            F.col("_dom").alias(domain_col),
            F.col("_w").cast("bigint").alias("weight_scaled"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out


def reweight_report(loss: DataFrame, shares: DataFrame) -> DataFrame:
    """q_mixture_reweight's output relation from a (source,
    n_heldout_bigrams, n_oov, loss_scaled) loss relation and a
    (source, n_docs) shares relation — ONE definition shared by the
    batch key and the streaming mirror's emit, so the two cannot
    drift on the MW rounds or the share arithmetic. Callers pin
    ``loss`` (the MW rounds and the totals reference it repeatedly)."""
    weights = multiplicative_reweight(loss)
    nd = shares.agg(F.sum("n_docs").cast("bigint").alias("total"))
    totw = loss.agg(
        (
            F.count(F.lit(1)).cast(_D38)
            * F.lit(SCALE).cast(_D38)
        )
        .cast(_D38)
        .alias("t")
    )
    base_share = F.col("n_docs").cast("double") / F.col("total").cast(
        "double"
    )
    weight_frac = F.col("weight_scaled").cast("double") / F.col("t").cast(
        "double"
    )
    return (
        loss.join(weights, "source")
        .join(F.broadcast(shares), "source")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(totw))
        .select(
            "source",
            "n_docs",
            base_share.alias("base_share"),
            "n_heldout_bigrams",
            "n_oov",
            "loss_scaled",
            "weight_scaled",
            weight_frac.alias("weight_frac"),
            (weight_frac / base_share).alias("rate_multiplier"),
        )
    )


def duck_reweight_ctes(
    loss_cte: str, rounds: int = REWEIGHT_ROUNDS
) -> tuple[str, str]:
    """DuckDB mirror of :func:`multiplicative_reweight` as CTE text:
    ``loss_cte`` must expose (source, loss_scaled). Returns the CTE
    block and the name of the final weights CTE (source,
    weight_scaled)."""
    parts = [
        f"rw_tot AS (SELECT CAST(count(*) AS HUGEINT) * {SCALE} AS t"
        f" FROM {loss_cte})",
        f"rw_w0 AS (SELECT source, CAST(loss_scaled AS HUGEINT) AS l,"
        f" CAST({SCALE} AS HUGEINT) AS w FROM {loss_cte})",
    ]
    for r in range(rounds):
        parts.append(
            f"rw_u{r} AS (SELECT source, l, w * ({SCALE} + {ETA} * l) AS u"
            f" FROM rw_w{r})"
        )
        parts.append(
            f"rw_s{r} AS (SELECT SUM(u) AS su FROM rw_u{r})"
        )
        parts.append(
            f"rw_w{r + 1} AS (SELECT source, l,"
            f" ({KEEP} * ((u * t.t) // s.su) + {MIX} * {SCALE})"
            f" // {SMOOTH_DEN} AS w"
            f" FROM rw_u{r} CROSS JOIN rw_s{r} s CROSS JOIN rw_tot t)"
        )
    parts.append(
        f"rw_final AS (SELECT source, CAST(w AS BIGINT) AS weight_scaled"
        f" FROM rw_w{rounds})"
    )
    return ",\n".join(parts), "rw_final"
