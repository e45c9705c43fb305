"""Privacy & contamination hygiene query keys (EXT: LLM-pipeline
breadth, round 5).

The operators a training-data platform runs between crawling and
training, beyond dedup/decontamination (search_q.py): PII redaction,
cross-document boilerplate detection, the per-document contamination
REPORT (fraction, not just a flag), temperature-flattened mixture
resampling, and the hashed-shingle decontamination variant (the
smaller-broadcast 100 TB form of q_decontaminate). All UDF-free Column
expressions; every key carries a bit-exact DuckDB oracle.

Bit-exactness devices used here (see queries/tpch_q.py header for the
general rules): md5-derived integers (identical hex on both engines,
60-bit prefixes fit BIGINT exactly), sqrt (IEEE-correctly-rounded on
both engines, unlike log/pow), and exact double division of integral
counts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.operators.cache import pin
from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.sources.loader import load_table

from hive_similarity_join_spark.queries.search_q import _DECON_MOD, _DECON_N


def _duck_grams(n: int) -> str:
    """DuckDB word n-gram list over a ``bag`` column — same construction
    as search_q._DECON_GRAMS (n=4) generalized: starts i = 1 ..
    len(bag)-n+1, inclusive-indexed; empty for docs shorter than n."""
    parts = " || ' ' || ".join(f"bag[i+{k}]" if k else "bag[i]" for k in range(n))
    return f"list_transform(range(1, len(bag) - {n - 2}), i -> {parts})"


# ---------------------------------------------------------------- PII

@query(
    "q_pii_redact",
    oracle="""
SELECT c_custkey,
       regexp_replace(
           regexp_replace(c_name, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
           '[0-9]+', 'X', 'g') AS name_redacted,
       CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS BIGINT)
           AS n_digits
FROM customer
""",
)
def q_pii_redact(spark, sf_dir):
    """PII redaction pass: scrub identifier-like substrings from a text
    column before it can enter a training corpus — here email-shaped
    spans then digit runs on customer names (the redaction chain a
    production pipeline extends with phone/SSN/address patterns; each
    added pattern is one more regexp_replace in the same projection).
    Emits the redacted text plus the redacted-digit count for audit.

    Scale shape: pure map-side — a chain of regexp_replace inside
    whole-stage codegen, zero shuffles, parallelism is the scan's. The
    regexes use the portable character-class subset (identical
    semantics in Java regex and DuckDB's RE2)."""
    c = load_table(spark, sf_dir, "customer")
    no_email = F.regexp_replace(
        F.col("c_name"), "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"
    )
    return c.select(
        "c_custkey",
        F.regexp_replace(no_email, "[0-9]+", "X").alias("name_redacted"),
        F.length(F.regexp_replace(F.col("c_name"), "[^0-9]", ""))
        .cast("bigint")
        .alias("n_digits"),
    )


# ------------------------------------------------------- boilerplate

_BOILER_N = 8
_BOILER_MIN_DOCS = 2


@query(
    "q_boilerplate_passages",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t.g
  FROM bags, unnest({_duck_grams(_BOILER_N)}) AS t(g)
  WHERE len(bag) >= {_BOILER_N}
)
SELECT g AS passage,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS example_doc
FROM sh GROUP BY g HAVING count(*) >= {_BOILER_MIN_DOCS}
""",
)
def q_boilerplate_passages(spark, sf_dir):
    """Cross-document boilerplate detection (C4/CCNet-style): word
    8-gram passages appearing verbatim in >=2 DISTINCT
    documents, with the document count and an example doc id. The
    output is the blocklist a cleaning pass subtracts (navigation
    chrome, license banners, templated headers duplicate verbatim
    across pages; prose does not).

    Scale shape: per-doc array_distinct BEFORE the explode makes the
    groupBy a plain count (no count-distinct shuffle), with map-side
    partial aggregation on the passage key; output is bounded by the
    corpus's repeated-passage structure, never pairwise. At 100 TB,
    hash the passages (md5 prefix, as q_decontaminate_hashed does) and
    sink the full list bucketed by hash."""
    d = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(TX.word_ngrams(TX.bag_tokens("text"), _BOILER_N))
    sh = d.select("doc_id", F.explode(grams).alias("g"))
    return (
        sh.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= _BOILER_MIN_DOCS)
        .select(F.col("g").alias("passage"), "n_docs", "example_doc")
    )


# ------------------------------------------------------- repetition

_REP_TOP_N = 2   # top n-gram signal: 2-grams (Gopher's strongest)
_REP_DUP_N = 5   # duplicated n-gram signal: 5-grams
# flag thresholds as exact integer cross-products (engine-portable):
# top-2-gram chars > 20% of text, duplicated-5-gram chars > 15%
_REP_TOP_PCT = 20
_REP_DUP_PCT = 15


@query(
    "q_text_gopher_rules",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS total,
         {TX.duck_bag()} AS bag
  FROM documents
),
c2 AS (
  SELECT doc_id, t.g, CAST(count(*) AS BIGINT) AS n
  FROM bags, unnest({_duck_grams(_REP_TOP_N)}) AS t(g)
  WHERE len(bag) >= {_REP_TOP_N}
  GROUP BY 1, 2
),
top2 AS (
  SELECT doc_id, n * CAST(length(g) AS BIGINT) AS top2_chars
  FROM (
    SELECT doc_id, g, n,
           row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, g) AS rn
    FROM c2
  ) WHERE rn = 1
),
c5 AS (
  SELECT doc_id, t.g, CAST(count(*) AS BIGINT) AS n
  FROM bags, unnest({_duck_grams(_REP_DUP_N)}) AS t(g)
  WHERE len(bag) >= {_REP_DUP_N}
  GROUP BY 1, 2
),
dup5 AS (
  SELECT doc_id, CAST(sum(n * length(g)) AS BIGINT) AS dup5_chars
  FROM c5 WHERE n >= 2 GROUP BY doc_id
),
m AS (
  SELECT b.source, b.total,
         coalesce(t.top2_chars, 0) AS top2_chars,
         coalesce(d.dup5_chars, 0) AS dup5_chars
  FROM bags b
  LEFT JOIN top2 t ON t.doc_id = b.doc_id
  LEFT JOIN dup5 d ON d.doc_id = b.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN top2_chars * 100 > total * {_REP_TOP_PCT}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_top2,
       CAST(sum(CASE WHEN dup5_chars * 100 > total * {_REP_DUP_PCT}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup5,
       CAST(sum(top2_chars) AS DOUBLE) / CAST(sum(total) AS DOUBLE)
           AS top2_frac,
       CAST(sum(dup5_chars) AS DOUBLE) / CAST(sum(total) AS DOUBLE)
           AS dup5_frac
FROM m GROUP BY source ORDER BY source
""",
)
def q_text_gopher_rules(spark, sf_dir):
    """Repetition-based quality signals per source — the Gopher rules
    (Rae et al. 2021, "Scaling Language Models", table A1) a
    production corpus pipeline gates on: the character fraction
    covered by the single most frequent word 2-gram (templated/spam
    text) and by duplicated word 5-grams (boilerplate loops), plus
    per-source counts of documents over the classic 20%/15%
    thresholds. Thresholds compare as exact integer cross-products
    (chars*100 > total*pct) so the flags are engine-portable; the two
    corpus-level fractions are each a SINGLE double division of two
    exact bigint sums — no float accumulation anywhere.

    Scale shape: n-gram counts aggregate on (doc_id, gram) with
    map-side combine; the top-2-gram pick is a rank-1 filter that
    plans as WindowGroupLimit over the HIGH-cardinality doc_id (per
    group = one doc's grams, never the fact table through few tasks);
    everything then collapses to one row per doc before the tiny
    per-source rollup. Overlapping occurrences count (5-gram dup
    chars can exceed total — it is a signal, not a proportion; the
    flags use it one-sided, matching the published rule).

    Split as gopher_doc_metrics + gopher_report so the streaming
    mirror (streaming/incremental_rollup.py incremental_gopher)
    shares the per-doc expressions and the report aggregate verbatim
    — the carry is the per-doc metrics relation itself."""
    d = load_table(spark, sf_dir, "documents")
    return gopher_report(gopher_doc_metrics(d))


def gopher_doc_metrics(d):
    """(doc_id, source, total, top2_chars, dup5_chars) per document —
    each a pure function of the document text, so the relation is
    idempotent under recomputation (the property the streaming
    mirror's replay-safe carry merge stakes on)."""
    bags = d.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("total"),
        TX.bag_tokens("text").alias("bag"),
    )
    c2 = bags.select(
        "doc_id",
        F.explode(TX.word_ngrams(F.col("bag"), _REP_TOP_N)).alias("g"),
    ).groupBy("doc_id", "g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("g"))
    top2 = (
        c2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("n") * F.length("g").cast("bigint")).alias("top2_chars"),
        )
    )
    c5 = bags.select(
        "doc_id",
        F.explode(TX.word_ngrams(F.col("bag"), _REP_DUP_N)).alias("g"),
    ).groupBy("doc_id", "g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dup5 = (
        c5.filter(F.col("n") >= 2)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.length("g").cast("bigint"))
            .cast("bigint")
            .alias("dup5_chars")
        )
    )
    return (
        bags.select("doc_id", "source", "total")
        .join(top2, "doc_id", "left")
        .join(dup5, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "total",
            F.coalesce("top2_chars", F.lit(0)).cast("bigint").alias("top2_chars"),
            F.coalesce("dup5_chars", F.lit(0)).cast("bigint").alias("dup5_chars"),
        )
    )


def gopher_report(m):
    """Per-source Gopher report from the per-doc metrics relation —
    exact-integer flags, single-division fractions (see
    q_text_gopher_rules)."""
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("top2_chars") * 100 > F.col("total") * _REP_TOP_PCT,
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_flag_top2"),
            F.sum(
                F.when(
                    F.col("dup5_chars") * 100 > F.col("total") * _REP_DUP_PCT,
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_flag_dup5"),
            (
                F.sum("top2_chars").cast("double")
                / F.sum("total").cast("double")
            ).alias("top2_frac"),
            (
                F.sum("dup5_chars").cast("double")
                / F.sum("total").cast("double")
            ).alias("dup5_frac"),
        )
        .orderBy("source")
    )


# --------------------------------------------- contamination report

_CONTAM_FLAG_T = 0.1


@query(
    "q_contamination_report",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t.g
  FROM bags, unnest({_duck_grams(_DECON_N)}) AS t(g)
  WHERE len(bag) >= {_DECON_N}
),
ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % {_DECON_MOD} = 0),
tot AS (
  SELECT doc_id, count(*) AS n_grams FROM sh
  WHERE doc_id % {_DECON_MOD} <> 0 GROUP BY doc_id
),
hit AS (
  SELECT s.doc_id, count(*) AS n_shared
  FROM sh s JOIN ev USING (g)
  WHERE s.doc_id % {_DECON_MOD} <> 0
  GROUP BY s.doc_id
)
SELECT t.doc_id,
       CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
       CAST(coalesce(h.n_shared, 0) AS DOUBLE) / t.n_grams
           AS contamination_frac,
       CAST(CASE WHEN CAST(coalesce(h.n_shared, 0) AS DOUBLE) / t.n_grams
                 >= {_CONTAM_FLAG_T} THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM tot t LEFT JOIN hit h USING (doc_id)
""",
)
def q_contamination_report(spark, sf_dir):
    """Per-document contamination REPORT — the operational extension of
    the binary q_decontaminate screen: for EVERY training document, its
    distinct-shingle count, how many shingles the eval set shares, the
    overlap fraction, and a review flag at 0.1. A pipeline
    triages by fraction (drop / review / keep) rather than dropping on
    any single shared shingle.

    Scale shape: identical to q_decontaminate — the eval shingle set
    broadcasts, the corpus never shuffles shingle strings; the report
    adds only a doc-id-keyed total-count aggregate and a node-sized
    left join. Fraction is exact double division of integral counts;
    the flag is emitted as 0/1 BIGINT so the hash compare never sees
    engine boolean encodings."""
    d = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(TX.word_ngrams(TX.bag_tokens("text"), _DECON_N))
    sh = d.select("doc_id", F.explode(grams).alias("g"))
    ev = sh.filter(F.col("doc_id") % _DECON_MOD == 0).select("g").distinct()
    train = sh.filter(F.col("doc_id") % _DECON_MOD != 0)
    tot = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    hit = (
        train.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    frac = F.col("n_shared").cast("double") / F.col("n_grams")
    return (
        tot.join(hit, "doc_id", "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0).cast("bigint")))
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            frac.alias("contamination_frac"),
            F.when(frac >= _CONTAM_FLAG_T, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("flagged"),
        )
    )


# ------------------------------------------- hashed decontamination

@query(
    "q_decontaminate_hashed",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, {TX.duck_md5_prefix60('t.g')} AS h
  FROM bags, unnest({_duck_grams(_DECON_N)}) AS t(g)
  WHERE len(bag) >= {_DECON_N}
),
ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % {_DECON_MOD} = 0)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
FROM sh s JOIN ev USING (h)
WHERE s.doc_id % {_DECON_MOD} <> 0
GROUP BY s.doc_id
""",
)
def q_decontaminate_hashed(spark, sf_dir):
    """q_decontaminate's 100 TB form: the join key is a 60-bit md5
    prefix of each shingle instead of the shingle STRING, shrinking the
    broadcast eval set to 8 bytes/shingle (the form its docstring
    promised). Still deterministic and hash-checked — the oracle
    mirrors the same md5-prefix hashing, so even the (cosmically rare)
    hash collision would be identical on both engines. On this corpus
    the output equals q_decontaminate's exactly.

    Scale shape: unchanged from q_decontaminate — broadcast hash join,
    map-side probe, doc-id-keyed count; the per-doc distinct is over
    hashed longs instead of strings, which also cheapens the explode
    shuffle at stream scale (incremental_decontaminate.py notes the
    same trade)."""
    d = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(TX.word_ngrams(TX.bag_tokens("text"), _DECON_N))
    sh = (
        d.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", TX.md5_prefix60(F.col("g")).alias("h"))
        .distinct()
    )
    ev = sh.filter(F.col("doc_id") % _DECON_MOD == 0).select("h").distinct()
    return (
        sh.filter(F.col("doc_id") % _DECON_MOD != 0)
        .join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
    )


# --------------------------------------- Bloom decontamination screen

BLOOM_D = 3        # hash functions
BLOOM_M = 16384    # bits (2^14): sized so the FP audit is non-vacuous at test SFs


def _duck_bloom_bit(j_ref: str, g_ref: str) -> str:
    seed = f"concat(CAST({j_ref} AS VARCHAR), ':', {g_ref})"
    return f"{TX.duck_md5_prefix60(seed)} % {BLOOM_M}"


@query(
    "q_decontaminate_bloom",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t.g
  FROM bags, unnest({_duck_grams(_DECON_N)}) AS t(g)
  WHERE len(bag) >= {_DECON_N}
),
ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % {_DECON_MOD} = 0),
js AS (SELECT unnest(generate_series(0, {BLOOM_D - 1})) AS j),
bits AS (
  SELECT DISTINCT {_duck_bloom_bit('js.j', 'ev.g')} AS b
  FROM ev CROSS JOIN js
),
tr AS (SELECT doc_id, g FROM sh WHERE doc_id % {_DECON_MOD} <> 0),
probe AS (
  SELECT tr.doc_id, tr.g, {_duck_bloom_bit('js.j', 'tr.g')} AS b
  FROM tr CROSS JOIN js
),
pos AS (
  SELECT doc_id, g
  FROM probe JOIN bits USING (b)
  GROUP BY doc_id, g
  HAVING count(*) = {BLOOM_D}
),
nb AS (SELECT doc_id, count(*) AS n_bloom FROM pos GROUP BY doc_id),
nx AS (
  SELECT tr.doc_id, count(*) AS n_exact
  FROM tr JOIN ev USING (g) GROUP BY tr.doc_id
),
ng AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY doc_id)
SELECT ng.doc_id,
       CAST(ng.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(nb.n_bloom, 0) AS BIGINT) AS n_bloom,
       CAST(coalesce(nx.n_exact, 0) AS BIGINT) AS n_exact,
       CAST(coalesce(nb.n_bloom, 0) - coalesce(nx.n_exact, 0) AS BIGINT)
           AS n_false_pos
FROM ng LEFT JOIN nb USING (doc_id) LEFT JOIN nx USING (doc_id)
""",
)
def q_decontaminate_bloom(spark, sf_dir):
    """Bloom-filter decontamination PRE-FILTER, with its false-positive
    cost measured (Bloom 1970; the standard 100 TB trick: at scale the
    eval-set shingle relation is replaced by an m-bit filter a few
    hundred KB wide, the probe becomes a map-side bitmap test, and only
    bloom-positive shingles reach the exact join). Per training doc:
    distinct-shingle count, bloom-positive count (one-sided: always >=
    exact), the exact shared count, and the false-positive overcount —
    the audit that tells a pipeline whether ({BLOOM_D} hashes,
    {BLOOM_M} bits) is sized right for its eval set.

    Deterministic and hash-checkable: bit j(g) = md5_prefix60('j:'+g)
    mod {BLOOM_M}; membership = all {BLOOM_D} bits present. The bit
    set is represented RELATIONALLY (distinct bit ids, broadcast) so
    the DuckDB oracle mirrors it verbatim; a production deployment
    compiles the same set into an actual bitmap broadcast (Spark's own
    runtime-filter bloom works this way) with identical semantics.

    Scale shape: bits relation is bounded by m = {BLOOM_M} rows
    regardless of eval-set size — broadcast; probes explode each
    training shingle x{BLOOM_D} map-side, partial-agg into per-shingle
    verdicts, then per-doc counts; the exact leg reuses the
    q_decontaminate broadcast join on bloom-survivors only at true
    scale (here both legs run corpus-wide so n_false_pos is exact)."""
    d = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(TX.word_ngrams(TX.bag_tokens("text"), _DECON_N))
    sh = d.select("doc_id", F.explode(grams).alias("g")).distinct()
    ev = sh.filter(F.col("doc_id") % _DECON_MOD == 0).select("g").distinct()
    js = F.explode(F.array(*[F.lit(j) for j in range(BLOOM_D)])).alias("j")

    def bit(j_col, g_col):
        return TX.md5_prefix60(
            F.concat(j_col.cast("string"), F.lit(":"), g_col)
        ) % BLOOM_M

    bits = (
        ev.select("g", js)
        .select(bit(F.col("j"), F.col("g")).alias("b"))
        .distinct()
    )
    tr = sh.filter(F.col("doc_id") % _DECON_MOD != 0)
    probe = tr.select("doc_id", "g", js).select(
        "doc_id", "g", bit(F.col("j"), F.col("g")).alias("b")
    )
    pos = (
        probe.join(F.broadcast(bits), "b")
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == BLOOM_D)
    )
    nb = pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_bloom"))
    nx = tr.join(F.broadcast(ev), "g").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    ng = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    n_bloom = F.coalesce(F.col("n_bloom"), F.lit(0))
    n_exact = F.coalesce(F.col("n_exact"), F.lit(0))
    return (
        ng.join(nb, "doc_id", "left")
        .join(nx, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            n_bloom.cast("bigint").alias("n_bloom"),
            n_exact.cast("bigint").alias("n_exact"),
            (n_bloom - n_exact).cast("bigint").alias("n_false_pos"),
        )
    )


# -------------------------------------- temperature-flattened sampling

@query(
    "q_sample_temperature",
    oracle="""
WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
m AS (SELECT min(n_lang) AS n_min FROM c),
r AS (
  SELECT lang,
         sqrt(CAST(m.n_min AS DOUBLE) / CAST(c.n_lang AS DOUBLE))
             AS sample_rate
  FROM c, m
)
SELECT d.doc_id, d.lang, r.sample_rate
FROM documents d JOIN r USING (lang)
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) / 4294967296.0 < r.sample_rate
""",
)
def q_sample_temperature(spark, sf_dir):
    """Temperature-flattened mixture resampling (T=2): keep each doc of
    language L with probability sqrt(n_min / n_L), so the smallest
    language survives whole while over-represented ones are downsampled
    toward a flatter mixture — the standard multiplicative rebalancing
    LLM data recipes apply to dominant domains/languages. Keyed on
    ``lang`` because this corpus's language mixture is genuinely skewed
    (en is ~3x the smallest; sources are uniform by construction, which
    would make every rate 1.0). T=2 is deliberate: n^(1/T) is sqrt,
    which IEEE mandates correctly rounded on both engines, where a
    general pow/log would drift in the last ulp.

    Deterministic per-doc coin: the first 8 md5 hex chars of the doc id
    as a uniform in [0,1) — reproducible across runs/engines, no RNG
    state (same device as q_split_train_val). Scale shape: the
    per-language rate table is languages-sized and BROADCASTS; the keep
    decision is map-side; one small aggregate shuffle on lang."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    n_min = cnt.agg(F.min("n_lang").alias("n_min"))
    rates = cnt.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_lang").cast("double")).alias(
            "sample_rate"
        ),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(u < F.col("sample_rate"))
        .select("doc_id", "lang", "sample_rate")
    )


# ------------------------------------------------- tokenizer training

_BPE_TOP = 50


@query(
    "q_bpe_pairs",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
p AS (
  SELECT t.g AS pair
  FROM bags, unnest({_duck_grams(2)}) AS t(g)
),
c AS (
  SELECT pair, count(*) AS n_occ FROM p GROUP BY 1
)
SELECT pair, n_occ, rank FROM (
  SELECT pair, CAST(n_occ AS BIGINT) AS n_occ,
         CAST(row_number() OVER (ORDER BY n_occ DESC, pair) AS BIGINT) AS rank
  FROM c
) WHERE rank <= {_BPE_TOP}
""",
)
def q_bpe_pairs(spark, sf_dir):
    """Adjacent-pair frequency counting — the inner loop of BPE/WordPiece
    tokenizer training, run corpus-wide: every adjacent token pair (bag
    semantics: each OCCURRENCE counts, exactly what a merge step
    consumes), globally counted, top-50 merge candidates by
    (count DESC, pair ASC). One round of this per merge is how a
    distributed BPE trainer runs over 100 TB; the key pins the
    first-round candidate table bit-exactly.

    Scale shape: the pair explode is map work fused into the scan;
    the count is one partial-aggregated shuffle keyed by pair (the
    token-pair space is vocabulary-squared-bounded but Zipf-sparse);
    the global top-k plans as TakeOrderedAndProject (per-partition
    heaps, no global sort — same posture as q_search_bm25), and the
    final rank window runs over 50 rows. Deterministic: counts
    are exact integers, ties break on the pair string."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    pairs = d.select(
        F.explode(TX.word_ngrams(TX.bag_tokens("text"), 2)).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    top = counts.orderBy(F.desc("n_occ"), F.asc("pair")).limit(_BPE_TOP)
    w = Window.orderBy(F.desc("n_occ"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


_BPE_ROUNDS = 3


def _bpe_round_ctes(r: int, p: str = "") -> str:
    """One BPE training round as SQL: decode symbols, count adjacent
    pairs (overlap-inclusive, weighted by word count), pick the winner
    by (count DESC, left, right), apply it with plain replace() —
    greedy left-to-right non-overlapping, exactly the reference merge.
    ``p`` prefixes every CTE name (q_tokenizer_compare composes these
    with the unigram trainer's CTEs, whose pc{{r}} names collide)."""
    return f"""
{p}sy{r} AS (
  SELECT w, n, string_split(trim(w, '|'), '||') AS sy FROM {p}w{r}
),
{p}pc{r} AS (
  SELECT sy[i] AS a, sy[i + 1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM {p}sy{r}, unnest(generate_series(1, len(sy) - 1)) AS t(i)
  GROUP BY 1, 2
),
{p}b{r} AS (SELECT a, b, cnt FROM {p}pc{r} ORDER BY cnt DESC, a, b LIMIT 1),
{p}w{r + 1} AS (
  SELECT replace(s.w, '|' || t.a || '||' || t.b || '|',
                 '|' || t.a || t.b || '|') AS w, s.n
  FROM {p}w{r} s CROSS JOIN {p}b{r} t
)"""


def bpe_trained(spark, sf_dir):
    """Session-memoized BPE training chain — r16 optimization: five
    keys (merges, segment, encode_docs, oov, rounds_sweep) re-ran the
    same word count + greedy merge rounds. Returns {"words": [vocab
    after 0..6 merges], "bests": [per-round 1-row winners]} — the
    sweep's snapshots are prefixes of the same chain, the 3-round keys
    read words[3]. Each stage is localCheckpoint(eager=True)-ed
    (operators/cache.py session_state): identical values to the lazy
    composition (best_pair/apply_merge are deterministic), but built
    once per session and immune to the bench's per-key clearCache.
    A new session recomputes from parquet."""
    from hive_similarity_join_spark.operators import bpe
    from hive_similarity_join_spark.operators.cache import session_state

    def build():
        d = load_table(spark, sf_dir, "documents")
        cur = bpe.word_freqs(d, TX.bag_tokens("text")).localCheckpoint(
            eager=True
        )
        bests, words = [], [cur]
        for _ in range(_BPE_SWEEP_ROUNDS):
            best = bpe.best_pair(cur).localCheckpoint(eager=True)
            bests.append(best)
            cur = bpe.apply_merge(cur, best).localCheckpoint(eager=True)
            words.append(cur)
        return {"words": words, "bests": bests}

    scope = f"{spark.sparkContext.applicationId}:{sf_dir}"
    return session_state("bpe_trained", scope, build)


@query(
    "q_bpe_merges",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
wf AS (
  SELECT t.tok AS word, count(*) AS n
  FROM bags, unnest(bag) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+')
  GROUP BY 1
),
w1 AS (
  SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS w,
         CAST(n AS BIGINT) AS n
  FROM wf
),
{",".join(_bpe_round_ctes(r) for r in range(1, _BPE_ROUNDS + 1))}
SELECT CAST(1 AS BIGINT) AS merge_round, a AS lhs, b AS rhs,
       cnt AS n_occ, a || b AS merged FROM b1
UNION ALL SELECT 2, a, b, cnt, a || b FROM b2
UNION ALL SELECT 3, a, b, cnt, a || b FROM b3
""",
)
def q_bpe_merges(spark, sf_dir):
    """The iterated BPE trainer's first {_BPE_ROUNDS} merge rounds,
    pinned bit-exactly — the loop q_bpe_pairs' docstring describes,
    actually run: character-level symbols over the word-frequency
    table, each round counts adjacent pairs (overlap-inclusive,
    weighted by word occurrences), merges the (count DESC, left,
    right)-first pair greedily left-to-right, and re-counts on the
    merged vocabulary (operators/bpe.py; Sennrich et al. ACL 2016
    semantics, pytest-verified against the single-node reference in
    tests/test_bpe.py).

    Scale shape: the trainer runs on the vocabulary-sized word-
    frequency sketch, not the corpus — the one corpus-sized pass is
    the initial word count; each round is one partial-aggregated
    pair-count shuffle plus a broadcast 1-row merge relation, and the
    merge application is a single codegen'd string replace per word
    (the |a||b| encoding makes SQL replace() exactly the reference's
    greedy non-overlapping scan). The production N-round form
    (bpe_train) collects one scalar row per round and localCheckpoints
    the evolving words; this 3-round key uses the fully-lazy zero-
    collect form so the oracle mirrors the whole computation."""
    bests = bpe_trained(spark, sf_dir)["bests"]
    out = None
    for r, best in enumerate(bests[:_BPE_ROUNDS], 1):
        leg = best.select(
            F.lit(r).cast("bigint").alias("merge_round"),
            F.col("a").alias("lhs"),
            F.col("b").alias("rhs"),
            F.col("cnt").alias("n_occ"),
            F.concat("a", "b").alias("merged"),
        )
        out = leg if out is None else out.unionAll(leg)
    return out


_BPE_SEG_TOP = 50


@query(
    "q_bpe_segment",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
wf AS (
  SELECT t.tok AS word, count(*) AS n
  FROM bags, unnest(bag) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+')
  GROUP BY 1
),
w1 AS (
  SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS w,
         CAST(n AS BIGINT) AS n
  FROM wf
),
{",".join(_bpe_round_ctes(r) for r in range(1, _BPE_ROUNDS + 1))}
SELECT replace(w, '|', '') AS word, n,
       CAST(len(string_split(trim(w, '|'), '||')) AS BIGINT) AS n_symbols,
       array_to_string(string_split(trim(w, '|'), '||'), ' ') AS segmented
FROM w{_BPE_ROUNDS + 1}
ORDER BY n DESC, word LIMIT {_BPE_SEG_TOP}
""",
)
def q_bpe_segment(spark, sf_dir):
    """The trained tokenizer APPLIED: the top-{_BPE_SEG_TOP} corpus
    words (by occurrence count) with their symbol segmentation after
    q_bpe_merges' {_BPE_ROUNDS} learned merges — word, count, number of
    symbols, and the space-joined segmentation. Together with
    q_bpe_merges this pins the full train-then-encode loop bit-exactly
    (the merge TABLE there, the resulting SEGMENTATIONS here).

    Scale shape: identical to the trainer (vocabulary-sized relation,
    one pair-count shuffle + broadcast 1-row merge per round); the
    top-k is TakeOrderedAndProject over the vocab. The segmentation
    column is derived by the same trim/split both engines run on the
    encoded string."""
    from hive_similarity_join_spark.operators import bpe

    final = bpe_trained(spark, sf_dir)["words"][_BPE_ROUNDS]
    sy = bpe.decode_symbols("w")
    return (
        final.select(
            F.replace(F.col("w"), F.lit("|"), F.lit("")).alias("word"),
            "n",
            F.size(sy).cast("bigint").alias("n_symbols"),
            F.array_join(sy, " ").alias("segmented"),
        )
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(_BPE_SEG_TOP)
    )


@query(
    "q_bpe_encode_docs",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
wf AS (
  SELECT t.tok AS word, count(*) AS n
  FROM bags, unnest(bag) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+')
  GROUP BY 1
),
w1 AS (
  SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS w,
         CAST(n AS BIGINT) AS n
  FROM wf
),
{",".join(_bpe_round_ctes(r) for r in range(1, _BPE_ROUNDS + 1))},
seg AS (
  SELECT replace(w, '|', '') AS word,
         len(string_split(trim(w, '|'), '||')) AS n_sym
  FROM w{_BPE_ROUNDS + 1}
),
occ AS (
  SELECT doc_id, t.tok AS word
  FROM bags, unnest(bag) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+')
)
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(o.word)) AS BIGINT) AS n_chars,
       CAST(sum(s.n_sym) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(length(o.word)) AS DOUBLE) / sum(s.n_sym)
           AS compression
FROM occ o JOIN seg s ON s.word = o.word
GROUP BY o.doc_id
""",
)
def q_bpe_encode_docs(spark, sf_dir):
    """The trained tokenizer's per-document budget: for every doc, its
    encodable word count, character count, BPE token count after the
    {_BPE_ROUNDS} learned merges, and the chars-per-token compression
    ratio — the tokens-per-document planning artifact that feeds
    q_pack_sequences' bin packing (you pack token budgets, not char
    budgets; this key is where the two meet). Occurrence-weighted:
    each word occurrence costs its segmentation length.

    Determinism: integer counts joined through the word relation
    (every encodable occurrence matches exactly one segmented word);
    the single double division per row has identical association both
    sides.

    Scale shape: the segmented vocabulary (vocab-sized) BROADCASTS
    into the per-occurrence join — the corpus-sized relation never
    shuffles on the word key; per-doc aggregation is the only
    corpus-sized shuffle, keyed on doc_id."""
    from hive_similarity_join_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    final = bpe_trained(spark, sf_dir)["words"][_BPE_ROUNDS]
    seg = final.select(
        F.replace(F.col("w"), F.lit("|"), F.lit("")).alias("word"),
        F.size(bpe.decode_symbols("w")).alias("n_sym"),
    )
    occ = d.select(
        "doc_id", F.explode(TX.bag_tokens("text")).alias("word")
    ).filter(F.col("word").rlike("^[a-z0-9]+$"))
    return (
        occ.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
            (
                F.sum(F.length("word")).cast("double") / F.sum("n_sym")
            ).alias("compression"),
        )
    )


@query(
    "q_bpe_oov",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
wf AS (
  SELECT t.tok AS word, count(*) AS n
  FROM bags, unnest(bag) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+')
  GROUP BY 1
),
w1 AS (
  SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS w,
         CAST(n AS BIGINT) AS n
  FROM wf
),
{",".join(_bpe_round_ctes(r) for r in range(1, _BPE_ROUNDS + 1))},
seg AS (
  SELECT replace(w, '|', '') AS word,
         len(string_split(trim(w, '|'), '||')) AS n_sym
  FROM w{_BPE_ROUNDS + 1}
),
occ_all AS (
  SELECT doc_id, t.tok AS word FROM bags, unnest(bag) AS t(tok)
),
j AS (
  SELECT o.doc_id, o.word, s.n_sym
  FROM occ_all o LEFT JOIN seg s ON s.word = o.word
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(CASE WHEN n_sym IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov_words,
       CAST(sum(CASE WHEN n_sym IS NULL THEN strlen(word) ELSE 0 END)
            AS BIGINT) AS n_oov_bytes,
       CAST(sum(COALESCE(n_sym, 0)) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(COALESCE(n_sym, strlen(word))) AS BIGINT)
           AS n_total_tokens,
       CAST(sum(CASE WHEN n_sym IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS oov_frac
FROM j GROUP BY doc_id
""",
)
def q_bpe_oov(spark, sf_dir):
    """The BPE tokenizer's OUT-OF-VOCABULARY budget — q_unigram_oov's
    twin (r13 VERDICT item #5 closed for BOTH tokenizer families, the
    same way the encode_docs pair mirrors each other): per doc, over
    ALL whitespace tokens, the total word count, OOV word count (BPE's
    trainable scope is lowercase alnum — no length cap, unlike
    unigram's), the byte-fallback budget (UTF-8 bytes of OOV words),
    the in-scope BPE token count after the learned merges, the TOTAL
    token budget, and the OOV fraction.

    Full-budget identity, emitted not derived: n_total_tokens =
    sum(COALESCE(n_sym, strlen(word))) — every word costs its merge
    segmentation if trainable, else one byte-token per byte, so
    n_total_tokens = n_bpe_tokens + n_oov_bytes by construction on
    both engines and the driver hash pins it.

    Determinism and scale shape: q_unigram_oov verbatim — OOV decided
    by LEFT-JOIN NULLNESS against the segmented vocabulary (never a
    re-stated regex), the vocab-sized (word, n_sym) relation
    broadcasts into the all-occurrence join, the per-doc aggregation
    is the only corpus-sized shuffle."""
    from hive_similarity_join_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    final = bpe_trained(spark, sf_dir)["words"][_BPE_ROUNDS]
    seg = final.select(
        F.replace(F.col("w"), F.lit("|"), F.lit("")).alias("word"),
        F.size(bpe.decode_symbols("w")).alias("n_sym"),
    )
    occ = d.select("doc_id", F.explode(TX.bag_tokens("text")).alias("word"))
    oov = F.col("n_sym").isNull()
    j = occ.join(F.broadcast(seg), "word", "left")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.when(oov, 1).otherwise(0)).cast("bigint").alias("n_oov_words"),
        F.sum(F.when(oov, F.octet_length("word")).otherwise(0))
        .cast("bigint")
        .alias("n_oov_bytes"),
        F.sum(F.coalesce(F.col("n_sym"), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.sum(F.coalesce(F.col("n_sym"), F.octet_length("word")))
        .cast("bigint")
        .alias("n_total_tokens"),
        (
            F.sum(F.when(oov, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("oov_frac"),
    )


# ------------------------------------- BPE merge-count (vocab) sweep

_BPE_SWEEP_ROUNDS = 6
_BPE_SWEEP_SNAPSHOTS = (0, 2, 4, 6)


def _bpe_rounds_sweep_oracle() -> str:
    """One 6-round lazy merge chain (bs_-prefixed CTEs), snapshot legs
    reading the words relation after 0/2/4/6 merges."""
    chain = ",".join(
        _bpe_round_ctes(r, p="bs_")
        for r in range(1, _BPE_SWEEP_ROUNDS + 1)
    )
    legs = []
    for r in _BPE_SWEEP_SNAPSHOTS:
        legs.append(f"""SELECT CAST({r} AS BIGINT) AS n_merges,
       (SELECT CAST(count(DISTINCT s) AS BIGINT) FROM (
          SELECT unnest(string_split(trim(w, '|'), '||')) AS s
          FROM bs_w{r + 1}
       )) AS vocab_symbols,
       CAST(sum(n * len(string_split(trim(w, '|'), '||'))) AS BIGINT)
           AS n_tokens,
       CAST(sum(n * len(replace(w, '|', ''))) AS BIGINT) AS n_chars,
       CAST(sum(n * len(string_split(trim(w, '|'), '||'))) AS DOUBLE)
           / CAST(sum(n) AS DOUBLE) AS fertility,
       CAST(sum(n * len(replace(w, '|', ''))) AS DOUBLE)
           / CAST(sum(n * len(string_split(trim(w, '|'), '||'))) AS DOUBLE)
           AS compression
FROM bs_w{r + 1}""")
    union = "\nUNION ALL\n".join(legs)
    return f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
wf AS (
  SELECT t.tok AS word, count(*) AS n
  FROM bags, unnest(bag) AS t(tok)
  WHERE regexp_full_match(t.tok, '[a-z0-9]+')
  GROUP BY 1
),
bs_w1 AS (
  SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS w,
         CAST(n AS BIGINT) AS n
  FROM wf
),
{chain}
{union}
"""


@query("q_bpe_rounds_sweep", oracle=_bpe_rounds_sweep_oracle())
def q_bpe_rounds_sweep(spark, sf_dir):
    """Merge-COUNT sweep for the BPE tokenizer — q_unigram_vocab_sweep's
    BPE sibling, completing the tokenizer-selection pair (unigram
    prices the seed-vocabulary knob; this prices BPE's only knob, the
    number of learned merges): one lazy 6-round training chain,
    snapshotted after 0/2/4/6 merges, reporting per snapshot the
    in-use symbol vocabulary (distinct symbols across the segmented
    word relation — characters + merged units), corpus token/char
    budgets, occurrence-weighted fertility and compression. The
    0-merge row is the character-level anchor (compression exactly
    1.0, fertility = mean word length); each merge monotonically
    lowers fertility and grows the symbol vocabulary — the curve that
    tells a tokenizer rollout where the marginal merge stops paying.

    Determinism: the established BPE contract (exact integer pair
    counts, (count DESC, left, right) winner, replace()-based greedy
    merge — operators/bpe.py); every reported stat is exact bigint
    sums with one int/int double divide.

    Scale shape: the whole sweep runs on the vocabulary-sized word
    sketch (the one corpus pass is the word count, pinned); snapshots
    share the single lazy merge chain (Spark reuses the common
    subplans via exchange reuse), so the sweep costs one 6-round
    training plus four vocab-sized aggregates."""
    from hive_similarity_join_spark.operators import bpe

    # r16: the snapshots are prefixes of the session-memoized chain
    # (bpe_trained) — identical per-round composition, built once.
    words = bpe_trained(spark, sf_dir)["words"]
    out = None
    for target in _BPE_SWEEP_SNAPSHOTS:
        cur = words[target]
        sy = bpe.decode_symbols("w")
        nsym = F.size(sy)
        wlen = F.length(F.replace(F.col("w"), F.lit("|"), F.lit("")))
        stats = cur.agg(
            F.sum(F.col("n") * nsym).cast("bigint").alias("n_tokens"),
            F.sum(F.col("n") * wlen).cast("bigint").alias("n_chars"),
            F.sum("n").cast("bigint").alias("n_occ"),
        )
        vocab = cur.select(F.explode(sy).alias("s")).agg(
            F.countDistinct("s").cast("bigint").alias("vocab_symbols")
        )
        leg = (
            stats.crossJoin(F.broadcast(vocab)).select(
                F.lit(target).cast("bigint").alias("n_merges"),
                "vocab_symbols",
                "n_tokens",
                "n_chars",
                (
                    F.col("n_tokens").cast("double")
                    / F.col("n_occ").cast("double")
                ).alias("fertility"),
                (
                    F.col("n_chars").cast("double")
                    / F.col("n_tokens").cast("double")
                ).alias("compression"),
            )
        )
        out = leg if out is None else out.unionByName(leg)
    return out


# -------------------------------------------------- corpus novelty

_NOVELTY_N = 3


@query(
    "q_text_novelty",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t.g
  FROM bags, unnest({_duck_grams(_NOVELTY_N)}) AS t(g)
),
fst AS (
  SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY 1
)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*) AS novelty
FROM sh JOIN fst f ON f.g = sh.g
GROUP BY 1
""",
)
def q_text_novelty(spark, sf_dir):
    """Per-document n-gram novelty against everything ingested BEFORE
    it (doc_id order): the fraction of a document's distinct
    3-gram shingles whose FIRST corpus occurrence is this
    document. The streaming-ingest curation signal — a near-zero
    novelty score marks a document that adds nothing the corpus hasn't
    seen (the continuous-crawl complement of pairwise dedup: no pair
    enumeration, one global first-occurrence table).

    Determinism/exactness: first occurrence is min(doc_id) per shingle
    (exact integer), counts are exact, novelty is a single int/int
    double division — correctly rounded identically on both engines.
    Docs with fewer than 3 tokens emit no shingles and are
    absent by definition (documented contract, same as
    q_boilerplate_passages' length gate).

    Scale shape: shingle explode fused into the scan; first-occurrence
    is one partial-aggregated shuffle keyed by shingle; the join back
    to per-doc shingles reuses that same hash partitioning (no extra
    exchange on the fst side) and the per-doc rollup is one more
    doc-keyed shuffle. Nothing collects; the first-occurrence relation
    is shingle-space-sized and stays fully distributed — at 100 TB
    this is the same shape as the inverted-index build."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.word_ngrams(TX.bag_tokens("text"), _NOVELTY_N))
        ).alias("g"),
    )
    fst = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(fst, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            novel.cast("bigint").alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
    )


# ------------------------------------------------ keyword extraction

_KEYTERMS_K = 3


@query(
    "q_text_keyterms",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
tf AS (
  SELECT doc_id, t.tok, count(*) AS tf
  FROM bags, unnest(bag) AS t(tok)
  GROUP BY 1, 2
),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n FROM bags WHERE len(bag) > 0),
scored AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * ((SELECT n FROM nd) - d.df + 1) AS score
  FROM tf JOIN dfreq d ON d.tok = tf.tok
)
SELECT doc_id, tok AS term, CAST(score AS BIGINT) AS score,
       CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT doc_id, tok, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, tok) AS rnk
  FROM scored
) WHERE rnk <= {_KEYTERMS_K}
""",
)
def q_text_keyterms(spark, sf_dir):
    """Per-document key-term extraction: top-3 tokens by
    tf x rarity (score = tf * (N - df + 1), the integer-exact tf-idf
    surrogate the weighted join family already uses) — the corpus
    auto-labeling op behind faceted browsing / topic sampling of a
    training corpus. Deterministic: integer scores, (score DESC, term)
    tie-break, so the key hash-matches its relational oracle.

    Scale shape: tf is one (doc, token)-keyed partial-aggregated
    shuffle; document frequency reuses the same relation aggregated by
    token (vocabulary-sized result joined back BROADCAST); the per-doc
    top-k is a window over each doc's distinct tokens — partitioned by
    doc_id, never global. The corpus count joins as a 1-row broadcast
    (no driver action). At 100 TB this is the inverted-index build's
    shuffle shape with a per-doc instead of global rollup."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(TX.bag_tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    nd = tf.select("doc_id").distinct().agg(F.count(F.lit(1)).alias("_nd"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (F.col("_tf") * (F.col("_nd") - F.col("_df") + F.lit(1)))
            .cast("bigint")
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _KEYTERMS_K)
    )


# ------------------------------------------------- vocabulary encode

@query(
    "q_text_encode",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
occ AS (
  SELECT doc_id, t.i AS pos, bag[t.i] AS tok
  FROM bags, unnest(generate_series(1, len(bag))) AS t(i)
),
vocab AS (
  SELECT tok,
         row_number() OVER (ORDER BY count(*) DESC, tok) AS id
  FROM occ GROUP BY tok
)
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       array_to_string(list(CAST(v.id AS VARCHAR) ORDER BY o.pos), ',') AS ids,
       CAST(SUM(v.id) AS BIGINT) AS ids_sum
FROM occ o JOIN vocab v ON v.tok = o.tok
GROUP BY o.doc_id
""",
)
def q_text_encode(spark, sf_dir):
    """Vocabulary encoding — the tokenize-to-ids step between corpus
    hygiene and sequence packing: every document's ORDERED token bag
    mapped to integer ids from a frequency-sorted vocabulary (id 1 =
    most frequent, ties by token — the BPE-rank convention), emitted
    with the id sequence and an exact integer checksum. This is the
    artifact q_pack_sequences' bins would actually carry to a trainer.

    The id sequence is serialized to a single comma-joined string
    because the driver's canonicalizer cannot hash array cells (the
    r1 q_agg_collect rule, relational_q.py; r7 regression fixed here).

    Determinism: the vocabulary is a strict total order (count DESC,
    token ASC) computed with the distributed two-pass rank (no
    single-partition sort — operators/rank.py); per-doc sequences
    re-assemble ordered by original position. Docs with zero tokens
    emit nothing (documented exclusion, both sides).

    Scale shape: the vocabulary is |vocab|-sized and BROADCASTS into
    the per-occurrence join; occurrences shuffle once on doc_id for
    the ordered re-collect. At 100 TB this is the inverted-index
    shuffle shape with the dictionary flowing the other way."""
    from hive_similarity_join_spark.operators.rank import ranked_by

    d = load_table(spark, sf_dir, "documents")
    occ = d.select(
        "doc_id", F.posexplode(TX.bag_tokens("text")).alias("pos", "tok")
    )
    freq = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    vocab = ranked_by(freq, [F.desc("_c"), F.asc("tok")], "id").select(
        "tok", F.col("id").cast("bigint").alias("id")
    )
    return (
        occ.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct("pos", "id"))
            ).alias("_pi"),
            F.sum("id").cast("bigint").alias("ids_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.array_join(
                F.transform(F.col("_pi.id"), lambda x: x.cast("string")), ","
            ).alias("ids"),
            "ids_sum",
        )
    )


# --------------------------------------------- mixture drift report

@query(
    "q_mixture_drift",
    oracle="""
WITH n_all AS (SELECT count(*) AS total FROM documents),
per_src AS (SELECT source, count(*) AS src_total FROM documents GROUP BY 1),
per_lang AS (SELECT lang, count(*) AS lang_total FROM documents GROUP BY 1),
cells AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
)
SELECT c.source, c.lang, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / s.src_total AS src_share,
       CAST(l.lang_total AS DOUBLE) / a.total AS corpus_share,
       (CAST(c.n AS DOUBLE) / s.src_total)
         / (CAST(l.lang_total AS DOUBLE) / a.total) AS share_ratio
FROM cells c
JOIN per_src s ON s.source = c.source
JOIN per_lang l ON l.lang = c.lang
CROSS JOIN n_all a
""",
)
def q_mixture_drift(spark, sf_dir):
    """Per-source language-mix drift — the corpus-composition monitor a
    multi-source ingest runs continuously: for every (source, lang)
    cell, the source's internal language share, the corpus-wide share,
    and their ratio (1.0 = this source mirrors the corpus; far from 1
    = this source skews the mixture and the sampler weights need
    rebalancing — the diagnostic feeding q_sample_mixture /
    q_sample_temperature's rates).

    Exactness: every share is ONE division of exact integer counts
    (identically rounded on both engines); the ratio is a second
    single division of those two doubles with identical association —
    no float accumulation anywhere.

    Scale shape: three partial-aggregated count shuffles (cell,
    source, lang) over the same scan, the two marginals and the 1-row
    total all broadcast back onto the cells relation — group-count-
    sized join sides, the corpus is scanned once and never shuffled
    whole. Pure map/agg arithmetic at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("src_total"))
    per_lang = d.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_total"))
    n_all = d.agg(F.count(F.lit(1)).alias("total"))
    src_share = F.col("n").cast("double") / F.col("src_total")
    corpus_share = F.col("lang_total").cast("double") / F.col("total")
    return (
        cells.join(F.broadcast(per_src), "source")
        .join(F.broadcast(per_lang), "lang")
        .crossJoin(F.broadcast(n_all))
        .select(
            "source",
            "lang",
            "n",
            src_share.alias("src_share"),
            corpus_share.alias("corpus_share"),
            (src_share / corpus_share).alias("share_ratio"),
        )
    )


# ----------------- iterative domain reweighting (DoReMi-flavored)


def _reweight_loss_ctes() -> str:
    """Shared DuckDB CTE block (bags .. lossx) mirroring
    operators/reweight.heldout_oov_loss — ONE definition so the
    reweighting key and the apply key cannot desync on the proxy."""
    from hive_similarity_join_spark.operators.reweight import SCALE

    return f"""bags AS (
  SELECT doc_id, source, {TX.duck_bag()} AS bag FROM documents
),
occ AS (
  SELECT doc_id, source, t.i AS pos, bag[t.i] AS tok
  FROM bags, unnest(generate_series(1, len(bag))) AS t(i)
),
bgw AS (
  SELECT doc_id, source, tok AS w1,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_ref
  FROM occ
),
b AS (SELECT * FROM bgw WHERE w2 IS NOT NULL),
refv AS (SELECT DISTINCT w1, w2 FROM b WHERE is_ref),
loss_raw AS (
  SELECT b.source,
         CAST(count(*) AS BIGINT) AS n_heldout_bigrams,
         CAST(sum(CASE WHEN r.w1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov
  FROM b LEFT JOIN refv r ON r.w1 = b.w1 AND r.w2 = b.w2
  WHERE NOT b.is_ref
  GROUP BY b.source
),
lossx AS (
  SELECT source, n_heldout_bigrams, n_oov,
         CAST((n_oov * {SCALE}) // n_heldout_bigrams AS BIGINT)
             AS loss_scaled
  FROM loss_raw
)"""


def _mixture_reweight_oracle() -> str:
    from hive_similarity_join_spark.operators.reweight import (
        REWEIGHT_ROUNDS,
        SCALE,
        duck_reweight_ctes,
    )

    rw_ctes, rw_final = duck_reweight_ctes("lossx", REWEIGHT_ROUNDS)
    return f"""
WITH {_reweight_loss_ctes()},
{rw_ctes},
shares AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
totw AS (SELECT CAST(count(*) AS HUGEINT) * {SCALE} AS t FROM lossx)
SELECT l.source, s.n_docs,
       CAST(s.n_docs AS DOUBLE) / CAST(nd.total AS DOUBLE) AS base_share,
       l.n_heldout_bigrams, l.n_oov, l.loss_scaled,
       f.weight_scaled,
       CAST(f.weight_scaled AS DOUBLE) / CAST(totw.t AS DOUBLE)
           AS weight_frac,
       (CAST(f.weight_scaled AS DOUBLE) / CAST(totw.t AS DOUBLE))
           / (CAST(s.n_docs AS DOUBLE) / CAST(nd.total AS DOUBLE))
           AS rate_multiplier
FROM lossx l
JOIN {rw_final} f USING (source)
JOIN shares s USING (source)
CROSS JOIN nd CROSS JOIN totw
"""


def mixture_loss(spark, sf_dir):
    """Session-checkpointed per-domain held-out OOV loss relation (D
    rows) — r16 optimization: all three mixture keys re-ran the corpus
    bigram pass + reference-vocabulary probe (~2-4 s apiece at sf0.1)
    to get the same D-row relation. Degrade is recompute."""
    from hive_similarity_join_spark.operators.cache import session_ckpt
    from hive_similarity_join_spark.operators.reweight import (
        heldout_oov_loss,
    )

    scope = f"{spark.sparkContext.applicationId}:{sf_dir}"
    return session_ckpt(
        "mixture_heldout_loss",
        scope,
        lambda: heldout_oov_loss(load_table(spark, sf_dir, "documents")),
    )


@query("q_mixture_reweight", oracle=_mixture_reweight_oracle())
def q_mixture_reweight(spark, sf_dir):
    """Iterative domain-mixture reweighting (DoReMi-flavored) — closes
    the loop q_mixture_drift only diagnoses (VERDICT r11 item 5): from
    a per-domain loss proxy to per-domain sample-rate multipliers in
    REWEIGHT_ROUNDS exact multiplicative-weights rounds
    (operators/reweight.py — positive-integer arithmetic throughout,
    so DuckDB mirrors every round bit-exactly; exp is linearized to
    (SCALE + ETA*loss), a monotone MW update needing no
    transcendentals).

    The loss proxy is a held-out bigram OOV rate, itself exact: docs
    split 50/50 by an md5(doc_id) coin into reference/held-out halves;
    a held-out bigram occurrence is OOV iff its (w1, w2) type never
    appears in the reference half; loss_scaled = (n_oov * SCALE) DIV
    n_heldout_bigrams. Production pipelines would plug per-domain
    proxy-model log-loss (q_text_bigram_lm's ppl) into the same
    update; the OOV rate is the transcendental-free stand-in with the
    same ordering (under-modeled domains score high on both).

    Output per domain: the corpus share (base_share), the loss proxy,
    the converged weight (weight_frac, mass-normalized), and
    rate_multiplier = weight_frac / base_share — the number a sampler
    multiplies each domain's inclusion rate by. Smoothing (9:1 toward
    uniform each round) floors every domain's weight near SCALE/10, so
    no domain starves — DoReMi's u-mixing, in integers.

    Scale shape: the corpus is touched once — bigrams from ONE
    doc-partitioned lead window (the q_text_bigram_lm shape), the
    reference-vocabulary probe is a bigram-type-keyed shuffle join
    (AQE may broadcast the vocab when small), and the per-domain
    rollup is a partial agg to D rows. The MW rounds then iterate on
    the PINNED D-row loss relation: per round one map + one 1-row sum
    broadcast back — nothing corpus-sized is ever re-read, the PCA
    power-iteration discipline."""
    from hive_similarity_join_spark.operators.reweight import (
        reweight_report,
    )

    d = load_table(spark, sf_dir, "documents")
    loss = mixture_loss(spark, sf_dir)
    shares = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return reweight_report(loss, shares)


def _mixture_reweight_trace_oracle() -> str:
    from hive_similarity_join_spark.operators.reweight import (
        REWEIGHT_ROUNDS,
        duck_reweight_ctes,
    )

    rw_ctes, _ = duck_reweight_ctes("lossx", REWEIGHT_ROUNDS)
    legs = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS mw_round, source,"
        f" CAST(w AS BIGINT) AS weight_scaled FROM rw_w{r}"
        for r in range(1, REWEIGHT_ROUNDS + 1)
    )
    return f"""
WITH {_reweight_loss_ctes()},
{rw_ctes}
{legs}
"""


@query("q_mixture_reweight_trace", oracle=_mixture_reweight_trace_oracle())
def q_mixture_reweight_trace(spark, sf_dir):
    """The MW convergence TRAJECTORY q_mixture_reweight's final answer
    summarizes: (mw_round, source, weight_scaled) after every one of
    the REWEIGHT_ROUNDS rounds — the q_unigram_lm_em of the mixture
    loop (per-round state oracle-checked, not just the fixed point).
    This is the artifact that shows WHERE the update settles: by which
    round the hard domains' gains flatten (round count is a tuning
    knob; too few rounds under-corrects, and the smoothed fixed point
    is visible as consecutive rounds agreeing). Same exact integer
    arithmetic as the parent key — every round's weights are
    bit-deterministic, and the DuckDB oracle simply reads the rounds
    its CTE chain already materializes.

    Scale shape: identical to q_mixture_reweight (the rounds exist in
    its plan too); emitting them all costs rounds x D extra rows."""
    from hive_similarity_join_spark.operators.reweight import (
        multiplicative_reweight_trace,
    )

    loss = mixture_loss(spark, sf_dir)
    return multiplicative_reweight_trace(loss)


def _mixture_reweight_apply_oracle() -> str:
    from hive_similarity_join_spark.operators.reweight import (
        REWEIGHT_ROUNDS,
        SCALE,
        duck_reweight_ctes,
    )

    rw_ctes, rw_final = duck_reweight_ctes("lossx", REWEIGHT_ROUNDS)
    return f"""
WITH {_reweight_loss_ctes()},
{rw_ctes},
shares AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
totw AS (SELECT CAST(count(*) AS HUGEINT) * {SCALE} AS t FROM lossx),
coin AS (
  SELECT doc_id, source,
         CAST(concat('0x',
              substr(md5('rw' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS u32
  FROM documents
),
sel AS (
  SELECT c.source
  FROM coin c
  JOIN {rw_final} f USING (source)
  JOIN shares s USING (source)
  CROSS JOIN nd CROSS JOIN totw
  WHERE CAST(c.u32 AS HUGEINT) * totw.t * s.n_docs
        < CAST(f.weight_scaled AS HUGEINT) * nd.total * 4294967296
),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_selected
  FROM sel GROUP BY source
),
ts AS (
  SELECT CAST(coalesce(sum(n_selected), 0) AS BIGINT) AS total_selected
  FROM per
)
SELECT s.source, s.n_docs,
       CAST(coalesce(p.n_selected, 0) AS BIGINT) AS n_selected,
       least(1.0, CAST(f.weight_scaled * nd.total AS DOUBLE)
                  / CAST(totw.t * s.n_docs AS DOUBLE)) AS target_rate,
       CAST(coalesce(p.n_selected, 0) AS DOUBLE)
           / CAST(s.n_docs AS DOUBLE) AS achieved_rate,
       CAST(coalesce(p.n_selected, 0) AS DOUBLE)
           / CAST(ts.total_selected AS DOUBLE) AS achieved_share
FROM shares s
JOIN {rw_final} f USING (source)
LEFT JOIN per p USING (source)
CROSS JOIN nd CROSS JOIN totw CROSS JOIN ts
"""


@query("q_mixture_reweight_apply", oracle=_mixture_reweight_apply_oracle())
def q_mixture_reweight_apply(spark, sf_dir):
    """APPLY the DoReMi weights: turn q_mixture_reweight's converged
    per-domain weights into a deterministic resampled corpus and
    report what the sampler actually achieved — the last arc of the
    mixture loop (diagnose: q_mixture_drift -> optimize:
    q_mixture_reweight -> apply: this key). Each doc flips an
    independent md5 coin ('rw'-salted so its bits are independent of
    the loss proxy's reference/held-out split coin) and is kept iff
    u32 / 2^32 < target_rate, where target_rate = min(1,
    weight_frac / base_share) — the inclusion test is a pure integer
    cross-multiplication (u32 * total_weight * n_docs_d <
    weight_d * total_docs * 2^32), so selection is bit-deterministic
    on both engines and REPRODUCIBLE at any scale: re-running the
    sampler on the same corpus selects the same docs, the property a
    100 TB pipeline needs to resume a half-written resample.

    Per domain: target_rate vs achieved_rate (binomial realization of
    the coin at this corpus size) and achieved_share of the resampled
    corpus — the drift between target mixture and achieved mixture IS
    the report; a sampler bug (wrong cap, correlated coin, swapped
    ratio) shows up as achieved_rate far from target_rate.

    Scale shape: weights come from the D-row MW iteration (pinned loss
    relation, see q_mixture_reweight); the corpus pass is ONE map —
    broadcast-join the D-row rates, one md5 per row, integer compare —
    then a per-domain partial-agg count. No shuffle of the corpus,
    no second pass."""
    from hive_similarity_join_spark.operators.reweight import (
        SCALE,
        multiplicative_reweight,
    )

    d = load_table(spark, sf_dir, "documents")
    loss = mixture_loss(spark, sf_dir)
    weights = multiplicative_reweight(loss)
    shares = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    totw = loss.agg(
        (
            F.count(F.lit(1)).cast("decimal(38,0)")
            * F.lit(SCALE).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("t")
    )
    rates = (
        shares.join(weights, "source")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(totw))
    )
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("rw"), F.col("doc_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    d38 = "decimal(38,0)"
    sel = (
        d.select("doc_id", "source", u32.alias("u32"))
        .join(F.broadcast(rates), "source")
        .filter(
            F.col("u32").cast(d38) * F.col("t") * F.col("n_docs").cast(d38)
            < F.col("weight_scaled").cast(d38)
            * F.col("total").cast(d38)
            * F.lit(4294967296).cast(d38)
        )
        .select("source")
    )
    per = sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected")
    )
    ts = per.agg(
        F.coalesce(F.sum("n_selected"), F.lit(0))
        .cast("bigint")
        .alias("total_selected")
    )
    n_sel = F.coalesce(F.col("n_selected"), F.lit(0)).cast("bigint")
    return (
        shares.join(weights, "source")
        .join(per, "source", "left")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(totw))
        .crossJoin(F.broadcast(ts))
        .select(
            "source",
            "n_docs",
            n_sel.alias("n_selected"),
            F.least(
                F.lit(1.0),
                (F.col("weight_scaled").cast(d38) * F.col("total").cast(d38))
                .cast("double")
                / (F.col("t") * F.col("n_docs").cast(d38)).cast("double"),
            ).alias("target_rate"),
            (n_sel.cast("double") / F.col("n_docs").cast("double")).alias(
                "achieved_rate"
            ),
            (
                n_sel.cast("double")
                / F.col("total_selected").cast("double")
            ).alias("achieved_share"),
        )
    )


# ------------------------- fuzzy (MinHash-LSH) decontamination


FUZZY_DECON_T = 0.8


def _fuzzy_decon_oracle() -> str:
    from hive_similarity_join_spark.operators.dedup import (
        MINHASH_SIG_CTES,
    )

    return f"""
{MINHASH_SIG_CTES},
cand AS (
  SELECT DISTINCT a.doc_id AS tid, b.doc_id AS eid
  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
  WHERE a.doc_id % {_DECON_MOD} <> 0 AND b.doc_id % {_DECON_MOD} = 0
),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT c.tid, c.eid, count(*) AS i
  FROM cand c
  JOIN tok x ON x.doc_id = c.tid
  JOIN tok y ON y.doc_id = c.eid AND y.tok = x.tok
  GROUP BY 1, 2
),
hits AS (
  SELECT c.tid, c.eid,
         CAST(coalesce(i.i, 0) AS DOUBLE)
             / (s1.n + s2.n - coalesce(i.i, 0)) AS sim
  FROM cand c
  LEFT JOIN inter i ON i.tid = c.tid AND i.eid = c.eid
  JOIN sz s1 ON s1.doc_id = c.tid
  JOIN sz s2 ON s2.doc_id = c.eid
)
SELECT tid AS doc_id,
       CAST(count(*) AS BIGINT) AS n_eval_matches,
       max(sim) AS max_sim
FROM hits WHERE sim >= {FUZZY_DECON_T}
GROUP BY tid
"""


@query("q_decontaminate_fuzzy", oracle=_fuzzy_decon_oracle())
def q_decontaminate_fuzzy(spark, sf_dir):
    """FUZZY decontamination: training documents that NEAR-match an
    eval-set document (MinHash-LSH candidates, exact-Jaccard verified
    at FUZZY_DECON_T=0.8) — the screen that catches paraphrased or
    lightly-edited benchmark leakage the exact n-gram checks
    (q_decontaminate / _hashed / _bloom) miss. This is the
    "fuzzy dedup against eval" stage of public LLM-corpus pipelines
    (Dolma / RedPajama-style), run train-vs-eval instead of
    train-vs-train. Emits, per contaminated training doc, how many
    eval docs it matches and the strongest match similarity.

    Shares EVERYTHING with the dedup family: the signature relation
    (operators/dedup.py minhash_signatures — one shuffle, NUM_PERM
    parallel mins) is computed over the union corpus so train and eval
    tokens rank against one shared dictionary, then the band join is
    typed train x eval ONLY — candidates never form inside the train
    side, so the blowup is bounded by the EVAL side's band buckets
    (eval sets are tiny; at 100 TB the eval band relation broadcasts).
    Deterministic end to end (fixed permutation constants), hence
    hash-checkable like q_dedup_minhash_lsh.

    max(sim) is a SELECTION over per-pair single-division doubles, not
    an accumulation — order-independent, bit-exact (CLAUDE.md rule)."""
    from hive_similarity_join_spark.operators.dedup import band_signatures
    from hive_similarity_join_spark.operators.partitions import parallelism
    from hive_similarity_join_spark.queries.dedup_q import docs_minhash_sigs

    # r17: the union-corpus signature relation IS the dedup family's
    # shared session-checkpointed relation (identical builder).
    sigs = docs_minhash_sigs(spark, sf_dir)
    bands = band_signatures(sigs)
    is_eval = F.col("_id") % _DECON_MOD == 0
    n_part = parallelism(spark)
    tr = bands.filter(~is_eval).select(
        F.col("_id").alias("tid"), "_band", "_bsig"
    ).repartition(n_part, "_band", "_bsig")
    ev = bands.filter(is_eval).select(
        F.col("_id").alias("eid"),
        F.col("_band").alias("_eband"),
        F.col("_bsig").alias("_ebsig"),
    )
    cand = (
        tr.join(
            F.broadcast(ev),
            (F.col("_band") == F.col("_eband"))
            & (F.col("_bsig") == F.col("_ebsig")),
        )
        .select("tid", "eid")
        .distinct()
    )
    t1 = sigs.select(F.col("_id").alias("tid"), F.col("_rks").alias("_rks1"))
    t2 = sigs.select(F.col("_id").alias("eid"), F.col("_rks").alias("_rks2"))
    inter = F.size(F.array_intersect("_rks1", "_rks2")).cast("double")
    union = (F.size("_rks1") + F.size("_rks2")).cast("double") - inter
    return (
        cand.join(t1, "tid")
        .join(t2, "eid")
        .select("tid", "eid", (inter / union).alias("sim"))
        .filter(F.col("sim") >= FUZZY_DECON_T)
        .groupBy(F.col("tid").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_matches"),
            F.max("sim").alias("max_sim"),
        )
    )
