"""Corpus curation: decontamination, deterministic sampling, data mixing.

The training-data counterpart of the dedup family (SURVEY.md §2.8): before a
corpus feeds a training run, a pipeline must (a) strip documents that leak
evaluation data (decontamination — the train/test n-gram-overlap check every
published LLM data card reports), (b) draw reproducible samples (per-stratum
and budget-constrained), and (c) compose sources into a weighted mixture.
None of these exist in the MapReduce reference model (OSDI 2004 covers only
the generic map/shuffle/reduce primitives); they are driver-mandated
LLM-pipeline extensions, expressed Spark-first:

- Decontamination is an inverted-index equi-join on hashed 5-gram shingles —
  the same posting-list shape as ``dedup_ngram_jaccard`` but train⋈eval
  instead of self-join, so the shuffle is O(train postings + eval postings),
  never all-pairs. Long shingles (5-grams vs the dedup family's trigrams)
  match decontamination practice: overlap on a long n-gram is evidence of
  leakage, not shared style, and long n-grams are near-unique so the join
  keys carry no stop-shingle skew.
- The eval side of the contamination join is sized by AQE, not a forced
  hint: a production eval suite (thousands of documents against a 100 TB
  train corpus) broadcasts at runtime, making the check a map-side join
  over the train postings with no shuffle of the 100 TB side; an eval split
  that is a corpus fraction (like this fixture's ``doc_id % 10``) degrades
  to sort-merge with the identical result instead of OOMing the executors.
- Sampling is hash-ordered and key-deterministic (md5 of the row key, same
  bytes on any engine): no ``rand()``, no sampler state, so any re-run or
  incremental reprocess selects the identical rows. With only a handful of
  strata, naive stratum-partitioned windows would sort a full corpus slice
  per task — per-stratum top-k runs through the salted two-stage top-k
  (``plans.salted_topk``) and running-budget selection through the chunked
  distributed prefix sum (``plans.chunked_running_sum``), both
  row-identical to the naive windows the oracles keep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import track
from ..plans.scan import chunked_running_sum
from ..plans.topk import salted_topk
from ..exactmath import round_div, sql_round_div
from ..registry import register
from ..sources.io import load
from .dedup import shingle_expr

#: decontamination n-gram length: long enough that a shared shingle means
#: copied text, short enough that every fixture doc (>= 10 tokens) has some.
DECONTAM_NGRAM = 5

#: eval split: pure function of the key (doc_id % 10 == 0 → eval) so both
#: engines and any re-run agree on membership; a real pipeline would join
#: an explicit eval-suite table instead, with the same plan shape.
_EVAL_MOD = 10

#: DuckDB CTE prefix shared by the decontamination oracles: distinct 5-gram
#: shingles per document (string shingles — the Spark side hashes them to
#: 64-bit join keys, value-identical for counting), split into eval/train.
_DECONTAM_CTE = f"""
    tok as (select doc_id, string_split(text, ' ') as t from documents),
    sh as (
      select distinct doc_id, shingle from (
        select doc_id,
               unnest(list_transform(
                 list_zip(t[1:len(t)-4], t[2:len(t)-3], t[3:len(t)-2],
                          t[4:len(t)-1], t[5:len(t)]),
                 x -> x[1] || ' ' || x[2] || ' ' || x[3] || ' ' ||
                      x[4] || ' ' || x[5])) as shingle
        from tok where len(t) >= {DECONTAM_NGRAM})),
    ev as (select doc_id as eval_id, shingle from sh
           where doc_id % {_EVAL_MOD} = 0),
    tr as (select doc_id, shingle from sh
           where doc_id % {_EVAL_MOD} <> 0)
"""


def _md5_order() -> "tuple[Column, Column]":
    """Engine-portable deterministic shuffle order shared by every sampler:
    md5 of the row key (identical bytes on any engine), doc_id tiebreak.
    One definition so a change to the determinism scheme cannot silently
    diverge the samplers from each other."""
    return (F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))


def shingle_hash_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): hashed word 5-grams, one row per occurrence.

    Hashing to 64-bit happens BEFORE any join so posting lists shuffle as
    longs, not 5-word strings — same trick as ``jaccard_pairs``. ONE
    definition shared by the batch path (which adds distinct + tracked
    persist) and the streaming flagger (streaming/curation.py) — the
    stream-static join keys match the batch flag set only while both sides
    hash identically.
    """
    return (
        docs.withColumn("toks", F.split("text", " "))
        .select("doc_id", F.explode(shingle_expr(DECONTAM_NGRAM)).alias("s"))
        .select("doc_id", F.xxhash64("s").alias("shingle"))
    )


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """Batch form of :func:`shingle_hash_frame`: distinct, tracked persist —
    both the eval and train sides of the contamination join slice this one
    frame, and the identical plan recurs across corpus_decontaminate /
    corpus_decontam_stats, so one materialization serves all four reads
    (released via cache.clear_tracked_caches)."""
    return track(shingle_hash_frame(docs).distinct())


def contamination_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle, eval_id): every train-doc 5-gram also present in
    some eval doc. The decontamination primitive.

    No broadcast hint (ADVICE r3): under this fixture's ``doc_id % 10``
    eval split, the eval side is ~10% of the corpus's shingles — O(corpus),
    NOT the thousands-of-docs eval suite of a production run — so a forced
    broadcast would OOM at scale. AQE sizes the join at runtime: a genuinely
    small eval-suite table broadcasts (map-side check, the 100 TB train side
    never shuffles); a large one degrades to sort-merge with the identical
    result."""
    sh = _doc_shingles(docs)
    ev = sh.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    tr = sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return tr.join(ev, "shingle")


@register(
    "corpus_decontaminate",
    oracle=f"""
    with {_DECONTAM_CTE}
    select tr.doc_id,
           count(distinct tr.shingle) as n_shared_ngrams,
           count(distinct ev.eval_id) as n_eval_docs
    from tr join ev on tr.shingle = ev.shingle
    group by tr.doc_id
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per contaminated train doc: how many 5-grams it shares with the eval
    split and with how many eval docs. Rows = docs a decontamination pass
    would drop (or flag) before training."""
    docs = load(spark, sf_dir, "documents")
    return (
        contamination_pairs(docs)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_ngrams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


@register(
    "corpus_decontam_stats",
    oracle=f"""
    with {_DECONTAM_CTE},
    contaminated as (select distinct tr.doc_id
                     from tr join ev on tr.shingle = ev.shingle)
    select d.source,
           count(*) as n_train,
           count(c.doc_id) as n_contaminated,
           {sql_round_div("count(c.doc_id)", "count(*)", 4)} as contam_rate
    from documents d
    left join contaminated c on c.doc_id = d.doc_id
    where d.doc_id % {_EVAL_MOD} <> 0
    group by d.source
    order by d.source
    """,
)
def corpus_decontam_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination report: train size, contaminated count,
    rate — the data-card table a curation run publishes. The flagged-id set
    joins back onto the train table for the rollup (sizing left to AQE —
    see the inline note)."""
    docs = load(spark, sf_dir, "documents")
    contaminated = (
        contamination_pairs(docs).select("doc_id").distinct()
        .withColumn("is_contam", F.lit(1))
    )
    train = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    # no broadcast hint: the flagged-id set is data-dependent (a boilerplate-
    # heavy corpus can flag a large fraction of train docs), so AQE decides —
    # it broadcasts below the threshold and degrades to sort-merge above it.
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("is_contam").alias("n_contaminated"),
            # all-integer half-up round (exactmath.py, r15 tie rework)
            round_div(
                F.count("is_contam"), F.count(F.lit(1)), 4
            ).alias("contam_rate"),
        )
        .orderBy("source")
    )


#: docs kept per stratum by the stratified sampler (exact-size sample).
STRATUM_K = 5


@register(
    "sample_stratified",
    oracle=f"""
    select doc_id, source, lang, n_chars from (
      select *, row_number() over (
        partition by source
        order by md5(cast(doc_id as varchar)), doc_id) as rn
      from documents)
    where rn <= {STRATUM_K}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sample: the first ``STRATUM_K`` docs of
    each source in md5(doc_id) order.

    md5 of the key is an engine-portable shuffle: uniform, stateless, and
    identical bytes everywhere, so the sample is reproducible across runs,
    engines, and incremental reprocessing — the property ``rand()``-based
    samplers lack. One shuffle on the stratum key; rank-k selection within
    a stratum is per-task. (For FRACTION sampling at 100 TB, skip the window
    entirely and filter on a hash threshold map-side — sample_hash_split
    shows that shape; this operator is the exact-size variant.)
    """
    docs = load(spark, sf_dir, "documents")
    return salted_topk(
        docs,
        list(_md5_order()),
        STRATUM_K,
        salt_col="doc_id",
        group_cols=("source",),
        rank_col="rn",
    ).select("doc_id", "source", "lang", "n_chars")


@register(
    "sample_weighted_mix",
    oracle="""
    with ranked as (
      select lang, n_chars, row_number() over (
        partition by lang
        order by md5(cast(doc_id as varchar)), doc_id) as rn
      from documents)
    select lang,
           count(*) as n_docs,
           cast(sum(n_chars) as bigint) as total_chars
    from ranked
    where rn <= case when lang = 'en' then 40 else 10 end
    group by lang
    order by lang
    """,
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture composition: draw 40 English / 10 per other language
    (deterministic md5 order) and report the resulting mix — the "data
    mixing" step that composes a training corpus from per-domain quotas.

    The quota is a pure expression of the stratum key, so the plan is the
    same single stratum-key shuffle as ``sample_stratified`` regardless of
    how many strata or what weights; changing the mixture never reshapes
    the plan.
    """
    docs = load(spark, sf_dir, "documents")
    quota = F.when(F.col("lang") == "en", 40).otherwise(10)
    # two-stage top-k at the LARGEST quota, then the per-stratum quota filter
    return (
        salted_topk(
            docs,
            list(_md5_order()),
            40,
            salt_col="doc_id",
            group_cols=("lang",),
            rank_col="rn",
        )
        .filter(F.col("rn") <= quota)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


#: per-source character budget for the budget-constrained selector.
SOURCE_CHAR_BUDGET = 2000


@register(
    "sample_token_budget",
    oracle=f"""
    with ranked as (
      select source, n_chars,
             sum(n_chars) over (
               partition by source
               order by md5(cast(doc_id as varchar)), doc_id
               rows unbounded preceding) as cum_chars
      from documents)
    select source,
           count(*) as n_docs,
           cast(sum(n_chars) as bigint) as chars_used
    from ranked
    where cum_chars <= {SOURCE_CHAR_BUDGET}
    group by source
    order by source
    """,
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained selection: take docs per source (deterministic md5
    order) while the running character total stays within the budget —
    "fill N tokens from each source", the quota step of a mixture build.

    The prefix sum is the chunked distributed scan
    (``plans.chunked_running_sum``): with a handful of sources, a plain
    per-source running-sum window sorts a full corpus slice per task — the
    2-hex-digit md5 prefix is monotone along the md5 order, so the
    within-chunk windows see ~1/256th of a stratum and the offsets window
    sees 256 metadata rows. Row-identical to the naive window; the oracle
    keeps the single-window form. n_chars stands in for a token count;
    swapping in ``text_token_count``'s tokenizer output changes only the
    summed column.
    """
    docs = load(spark, sf_dir, "documents")
    md5c, _tie = _md5_order()
    return (
        chunked_running_sum(
            docs,
            "n_chars",
            list(_md5_order()),
            F.substring(md5c, 1, 2),
            group_cols=("source",),
            out_col="cum_chars",
        )
        .filter(F.col("cum_chars") <= SOURCE_CHAR_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_used"),
        )
        .orderBy("source")
    )


#: target sequence length (tokens) for the packing report.
PACK_SEQ_TOKENS = 512


@register(
    "pipeline_sequence_pack",
    oracle=f"""
    with toks as (
      select doc_id, source,
             len(list_filter(string_split(text, ' '), w -> w <> '')) as n_tok
      from documents),
    ranked as (
      select source, n_tok,
             coalesce(sum(n_tok) over (
               partition by source
               order by md5(cast(doc_id as varchar)), doc_id
               rows between unbounded preceding and 1 preceding), 0)
               as cum_before
      from toks),
    binned as (
      select source, n_tok,
             cast(floor(cum_before / {PACK_SEQ_TOKENS}) as bigint) as seq_id
      from ranked)
    select source,
           count(*) as n_docs,
           count(distinct seq_id) as n_sequences,
           cast(sum(n_tok) as bigint) as total_tokens,
           {sql_round_div("count(*)", "count(distinct seq_id)", 2)}
             as docs_per_seq
    from binned
    group by source
    order by source
    """,
)
def pipeline_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence-packing report: docs (in deterministic md5 order) are
    assigned to PACK_SEQ_TOKENS-token training sequences by the running token total
    before each doc — the packing step that turns a curated corpus into
    fixed-length training examples. A doc starts in the sequence its prefix
    sum lands in (boundary docs spill into the next, the standard greedy
    concat-and-split layout); the report is sequences/docs/tokens per
    source.

    The prefix sum is the chunked distributed scan (the same
    ``plans.chunked_running_sum`` as sample_token_budget — a handful of
    sources means the naive stratum window sorts a corpus slice per task),
    then the rollup — a plan that never materializes the packed sequences
    themselves. The exclusive "before" total is the inclusive scan minus
    the row's own count (exact integer arithmetic).
    """
    docs = load(spark, sf_dir, "documents")
    n_tok = F.expr(
        "size(filter(split(text, ' '), w -> w != ''))"
    ).cast("bigint")
    md5c, _tie = _md5_order()
    binned = (
        chunked_running_sum(
            docs.select("doc_id", "source", n_tok.alias("n_tok")),
            "n_tok",
            list(_md5_order()),
            F.substring(md5c, 1, 2),
            group_cols=("source",),
            out_col="cum_incl",
        )
        .withColumn("cum_before", F.col("cum_incl") - F.col("n_tok"))
        .withColumn(
            "seq_id",
            F.floor(F.col("cum_before") / PACK_SEQ_TOKENS).cast("bigint"),
        )
    )
    return (
        binned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("seq_id").alias("n_sequences"),
            F.sum("n_tok").alias("total_tokens"),
            # all-integer half-up round (exactmath.py, r15 tie rework)
            round_div(
                F.count(F.lit(1)), F.countDistinct("seq_id"), 2
            ).alias("docs_per_seq"),
        )
        .orderBy("source")
    )


#: epoch-shuffle parameters: the seed folds into the hash input so each
#: training epoch gets an independent permutation from the same one-line
#: change; shard count is the write-parallelism knob (a real run sets it
#: to the target file count — hundreds at 100 TB; 16 keeps the fixture
#: non-degenerate).
EPOCH_SHUFFLE_SEED = 17
EPOCH_SHUFFLE_SHARDS = 16


@register(
    "pipeline_epoch_shuffle",
    oracle=f"""
    with keyed as (
      select doc_id,
             cast('0x' || substr(md5(cast(doc_id as varchar) ||
                                     ':{EPOCH_SHUFFLE_SEED}'), 1, 15)
                  as bigint) as skey
      from documents)
    select cast(skey % {EPOCH_SHUFFLE_SHARDS} as bigint) as shard_id,
           cast(row_number() over (
             partition by skey % {EPOCH_SHUFFLE_SHARDS}
             order by skey, doc_id) as bigint) as pos,
           doc_id
    from keyed
    order by shard_id, pos
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: the seeded pseudo-random permutation
    that turns a curated corpus into training-order shards — change
    EPOCH_SHUFFLE_SEED and every epoch reads a fresh, reproducible order
    with zero data movement beyond this one pass.

    Scale shape: a GLOBAL row_number would funnel the corpus through one
    partition, so the permutation is sharded — shard = hash % SHARDS is
    one hash-partition shuffle, positions are per-shard window sorts that
    run in parallel, and a training job reads shard files in (shard, pos)
    order. The shuffle key is the md5→BIGINT parity pair (identical
    bytes on any engine — same scheme as ``_md5_order``), seed folded
    into the hash input, doc_id tiebreak; the oracle mirrors it exactly,
    so the entire permutation — not just its multiset — is hash-checked.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    skey = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(f":{EPOCH_SHUFFLE_SEED}"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    keyed = docs.select("doc_id", skey.alias("skey")).withColumn(
        "shard_id", F.pmod(F.col("skey"), F.lit(EPOCH_SHUFFLE_SHARDS))
    )
    w = Window.partitionBy("shard_id").orderBy("skey", "doc_id")
    return (
        keyed.select(
            "shard_id",
            F.row_number().over(w).cast("bigint").alias("pos"),
            "doc_id",
        )
        .orderBy("shard_id", "pos")
    )


def _train_corpus_oracle() -> str:
    """Full-pipeline oracle: funnel CTEs (quality → exact → jaccard → CC)
    from operators.dedup, a name-prefixed decontamination block (the shared
    _DECONTAM_CTE uses names that collide with the jaccard CTEs), and the
    packing prefix-sum — composed exactly like the Spark side."""
    from .dedup import (
        CLUSTER_THRESHOLD,
        FUNNEL_MAX_STOP_RATIO,
        FUNNEL_MAX_TOKENS,
        FUNNEL_MIN_TOKENS,
        _cc_labels_cte,
        _jaccard_pairs_cte,
    )
    from ..functions.text import STOPWORDS

    return f"""
    with recursive scored as (
      select doc_id, text, source,
             len(string_split(text, ' ')) as n_tokens,
             len(list_filter(string_split(text, ' '),
                             x -> x in {STOPWORDS!r}))
               / len(string_split(text, ' ')) as stop_ratio
      from documents),
    quality as (
      select doc_id, text, source, n_tokens from scored
      where n_tokens between {FUNNEL_MIN_TOKENS} and {FUNNEL_MAX_TOKENS}
        and stop_ratio < {FUNNEL_MAX_STOP_RATIO}),
    exact as (
      select doc_id, text, source, n_tokens from (
        select *, row_number() over (partition by text order by doc_id) as rn
        from quality)
      where rn = 1),
    {_jaccard_pairs_cte("exact")},
    {_cc_labels_cte(CLUSTER_THRESHOLD)},
    deduped as (
      select e.doc_id, e.source, e.text from exact e
      where e.doc_id not in (select id from labels where label <> id)),
    train as (
      select * from deduped where doc_id % {_EVAL_MOD} <> 0),
    dtok as (select doc_id, string_split(text, ' ') as t from documents),
    dsh as (
      select distinct doc_id, shingle from (
        select doc_id,
               unnest(list_transform(
                 list_zip(t[1:len(t)-4], t[2:len(t)-3], t[3:len(t)-2],
                          t[4:len(t)-1], t[5:len(t)]),
                 x -> x[1] || ' ' || x[2] || ' ' || x[3] || ' ' ||
                      x[4] || ' ' || x[5])) as shingle
        from dtok where len(t) >= {DECONTAM_NGRAM})),
    flagged as (
      select distinct tr.doc_id
      from (select doc_id, shingle from dsh
            where doc_id % {_EVAL_MOD} <> 0) tr
      join (select doc_id, shingle from dsh
            where doc_id % {_EVAL_MOD} = 0) ev
        on tr.shingle = ev.shingle),
    clean as (
      select doc_id, source,
             len(list_filter(string_split(text, ' '), w -> w <> ''))
               as n_tok
      from train
      where doc_id not in (select doc_id from flagged)),
    binned as (
      select source,
             cast(floor(coalesce(sum(n_tok) over (
               partition by source
               order by md5(cast(doc_id as varchar)), doc_id
               rows between unbounded preceding and 1 preceding), 0)
               / {PACK_SEQ_TOKENS}) as bigint) as seq_id
      from clean)
    select (select count(*) from documents) as n_input,
           (select count(*) from quality) as n_quality,
           (select count(*) from exact) as n_exact,
           (select count(*) from deduped) as n_dedup,
           (select count(*) from train) as n_train,
           (select count(*) from clean) as n_clean,
           (select cast(coalesce(sum(n_tok), 0) as bigint) from clean)
             as kept_tokens,
           (select count(distinct (source, seq_id)) from binned)
             as n_sequences
    """


@register("pipeline_train_corpus", oracle=_train_corpus_oracle())
def pipeline_train_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-corpus pipeline in one declarative query:
    quality gate → exact dedup → near-dup connected components → eval
    holdout exclusion → 5-gram decontamination → sequence packing →
    one data-card row (n_input, n_quality, n_exact, n_dedup, n_train,
    n_clean, kept_tokens, n_sequences).

    Every stage is the SAME builder its standalone query uses
    (funnel_stages / funnel_cc_labels / contamination_pairs / the packing
    prefix-sum), so the session-level memo and tracked caches are shared:
    running this after pipeline_dedup_corpus reuses the funnel labels, and
    running the decontam queries reuses the shingle table. Each stage count
    is a 1-row aggregate crossJoined into the summary — nothing wider than
    one row reaches the driver.
    """
    from ..cache import checkpoint_generation
    from .dedup import funnel_cc_labels, funnel_counts, funnel_stages

    docs = load(spark, sf_dir, "documents")
    _, exact = funnel_stages(docs)
    labels = funnel_cc_labels(spark, sf_dir, exact)
    drop = labels.filter(F.col("label") != F.col("id")).select("id")
    # r16 optimization round (guide §7.2 duplicated subtrees; the BFS/
    # sketch diamond class): the five crossJoined 1-row count branches each
    # re-executed the funnel tail — the CC-drop anti-join and text
    # tokenization up to four times and the corpus-sized contamination join
    # twice. Materialize the two narrow per-doc frames each fan-out reads
    # — `deduped` and `clean`, both just (doc_id, n_tok) longs — under
    # single-generation checkpoint slots (cache.checkpoint_generation:
    # run-scoped, released next run / at cache clear; nothing persists
    # across runs). The token count moves from `clean` to `deduped` —
    # computed on the identical surviving text rows, so every downstream
    # value is unchanged — which lets the checkpoints drop `text` entirely:
    # at 100 TB the materialized frames hold two longs per surviving doc,
    # never the corpus bytes.
    deduped = checkpoint_generation(
        "train_corpus_deduped",
        exact.join(drop, exact.doc_id == drop.id, "left_anti").select(
            "doc_id",
            # kept_tokens / packing use the NON-EMPTY token count — the
            # SAME metric pipeline_sequence_pack reports, so the composed
            # pipeline and the standalone packer agree on any corpus (the
            # funnel's own n_tokens stays the raw split count its
            # thresholds are defined on).
            F.expr("size(filter(split(text, ' '), w -> w != ''))")
            .cast("bigint")
            .alias("n_tok"),
        ),
    )
    train = deduped.filter(F.col("doc_id") % _EVAL_MOD != 0)
    flagged = contamination_pairs(docs).select("doc_id").distinct()
    clean = checkpoint_generation(
        "train_corpus_clean", train.join(flagged, "doc_id", "left_anti")
    )
    # packing needs the source column: rejoin the scan (cheap projection).
    # Same chunked distributed prefix sum as the standalone packer.
    md5c, _tie = _md5_order()
    packed = chunked_running_sum(
        clean.join(docs.select("doc_id", "source"), "doc_id"),
        "n_tok",
        list(_md5_order()),
        F.substring(md5c, 1, 2),
        group_cols=("source",),
        out_col="cum_incl",
    ).select(
        "source",
        F.floor((F.col("cum_incl") - F.col("n_tok")) / PACK_SEQ_TOKENS)
        .cast("bigint")
        .alias("seq_id"),
    )
    counts = [
        # n_input/n_quality/n_exact fused into ONE conditional aggregation
        # over a single scored scan (VERDICT r3 "Next round" #2).
        funnel_counts(docs),
        deduped.agg(F.count(F.lit(1)).alias("n_dedup")),
        train.agg(F.count(F.lit(1)).alias("n_train")),
        clean.agg(
            F.count(F.lit(1)).alias("n_clean"),
            F.coalesce(F.sum("n_tok"), F.lit(0))
            .cast("bigint")
            .alias("kept_tokens"),
        ),
        packed.agg(
            F.countDistinct("source", "seq_id").alias("n_sequences")
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


@register(
    "corpus_dup_rate_by_source",
    oracle=f"""
    select source,
           count(*) as n_docs,
           count(distinct text) as n_unique,
           {sql_round_div("count(*) - count(distinct text)", "count(*)", 4)}
             as dup_rate,
           {sql_round_div("sum(n_chars)", "count(*)", 2)} as avg_chars
    from documents
    group by source
    order by source
    """,
)
def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card slice: exact-duplicate rate and size profile per source —
    the per-provenance quality table a corpus report leads with (which
    crawls/dumps are dirty, which are clean).

    One partial-agg shuffle; the distinct-text count per source is the one
    expensive aggregate (count(distinct) over a long string column), and
    at 100 TB it runs over xxhash64(text) instead — same grouping shape,
    64-bit keys (the engine's dedup family already establishes hashing
    equivalence); exact text kept here so the oracle can mirror it.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("text").alias("n_unique"),
            # all-integer half-up rounds (exactmath.py, r15 tie rework):
            # 1 - d/n rewritten as (n-d)/n so the numerator stays integer
            round_div(
                F.count(F.lit(1)) - F.count_distinct("text"),
                F.count(F.lit(1)),
                4,
            ).alias("dup_rate"),
            round_div(F.sum("n_chars"), F.count(F.lit(1)), 2).alias(
                "avg_chars"
            ),
        )
        .orderBy("source")
    )


#: weighted reservoir: keep K docs per source, probability proportional to
#: document length (the "sample long documents more" mixture knob).
RESERVOIR_K = 8

#: 2^60: the md5->BIGINT parity pair keeps 15 hex chars, so skey is uniform
#: on [0, 2^60) and (skey+1)/2^60 is uniform on (0, 1] — never 0, so ln()
#: is always defined.
_U_DENOM = 1 << 60


@register(
    "sample_weighted_reservoir",
    oracle=f"""
    with keyed as (
      select source, doc_id, n_chars,
             case when n_chars > 0 then
               round(ln((cast('0x' || substr(md5(cast(doc_id as varchar)),
                                             1, 15)
                              as bigint) + 1) / {_U_DENOM}.0)
                     / n_chars, 12)
             end as es_key
      from documents),
    ranked as (
      select *, cast(row_number() over (
        partition by source
        order by es_key desc nulls last, doc_id) as int) as rank
      from keyed)
    select source, cast(rank as int) as rank, doc_id,
           cast(n_chars as bigint) as n_chars
    from ranked where rank <= {RESERVOIR_K}
    order by source, rank
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample without replacement: K documents per
    source with inclusion probability proportional to length — the
    Efraimidis-Spirakis (IPL 2006) one-pass algorithm, derandomized.

    E-S draws u_i ~ U(0,1] per item and keeps the top-K by u_i^(1/w_i);
    equivalently by ln(u_i)/w_i, which avoids pow() entirely. Here u_i is
    not a PRNG draw but the md5→BIGINT hash of the row key mapped onto
    (0, 1] — uniform, engine-portable, and reproducible, so the "random"
    sample is a pure function of the data (same armor as ``_md5_order``:
    no sampler state, any re-run or backfill selects identical rows). The
    E-S key is rounded to 12 dp BEFORE ranking with a doc_id tiebreak
    (SURVEY §7.3.1 round-before-rank), making the selection stable across
    engines and partitionings.

    Scale shape: one shuffle on the stratum key, per-stratum top-K window
    — identical to ``sample_stratified``; the weights add one projection.
    A true streaming reservoir (applyInPandasWithState keeping a K-heap
    per source) would emit the same set, because the E-S key is
    order-independent.
    """
    docs = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    skey = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    u = (skey + F.lit(1)).cast("double") / F.lit(float(_U_DENOM))
    # zero-length docs have E-S weight 0 => inclusion probability 0: the
    # key is NULL (sorted last on both engines), never ln(u)/0 — ANSI
    # double division by zero raises where a real corpus' empty documents
    # would otherwise crash the sampler (the ADVICE r13 totality class)
    es_key = F.when(
        F.col("n_chars") > 0,
        F.round(F.log(u) / F.col("n_chars"), 12),
    )
    return (
        salted_topk(
            docs.withColumn("es_key", es_key),
            [F.desc_nulls_last("es_key"), F.asc("doc_id")],
            RESERVOIR_K,
            salt_col="doc_id",
            group_cols=("source",),
            rank_col="rank",
        )
        .select("source", F.col("rank").cast("int").alias("rank"), "doc_id", "n_chars")
        .orderBy("source", "rank")
    )


#: Contrastive negative sampling: anchors and negatives-per-anchor.
NEG_ANCHORS = 20
NEG_PER_ANCHOR = 5


@register(
    "sample_negative_pairs",
    oracle=f"""
    with anchors as (
      select vec_id as anchor_id, label as a_label from embeddings
      where vec_id < {NEG_ANCHORS}),
    cand as (
      select a.anchor_id, e.vec_id as neg_id,
             md5(cast(a.anchor_id as varchar) || '-'
                 || cast(e.vec_id as varchar)) as h
      from anchors a
      join embeddings e on e.label <> a.a_label),
    ranked as (
      select anchor_id, neg_id,
             row_number() over (partition by anchor_id
                                order by h, neg_id) as rnk
      from cand)
    select anchor_id, cast(rnk as int) as rnk, neg_id
    from ranked where rnk <= {NEG_PER_ANCHOR}
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive-learning negative sampling: for each
    anchor vector, the first NEG_PER_ANCHOR different-label candidates
    under an md5 ordering of the (anchor, candidate) pair — the
    rerunnable "random" negatives a contrastive trainer needs (re-sampling
    must be reproducible across retries and engines, so hash order stands
    in for a seeded RNG; the same md5-as-portable-randomness trick as
    corpus_shard_stats).

    Scale: anchors broadcast against the corpus (linear grid, one row per
    anchor x candidate before the rank filter); per-anchor selection is
    the salted two-stage top-k (``plans.salted_topk``) — with ~20 anchors
    a plain anchor-partitioned rank window would sort a full corpus slice
    in one task per anchor, so the grid salts on neg_id first and only the
    anchors*buckets*k survivors see the final rank. At training scale
    anchors number in the millions — then the grid shards by anchor batch,
    and per-anchor hash ordering keeps every shard independently
    rerunnable.
    """
    emb = load(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < NEG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("a_label")
    )
    cand = (
        emb.select("vec_id", "label")
        .join(F.broadcast(anchors), F.col("label") != F.col("a_label"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("anchor_id").cast("string"),
                    F.col("vec_id").cast("string"),
                )
            ).alias("h"),
        )
    )
    return salted_topk(
        cand,
        [F.asc("h"), F.asc("neg_id")],
        NEG_PER_ANCHOR,
        salt_col="neg_id",
        group_cols=("anchor_id",),
        rank_col="rnk",
    ).select("anchor_id", F.col("rnk").cast("int").alias("rnk"), "neg_id")


@register(
    "corpus_length_histogram",
    oracle="""
    select source,
           cast(floor(log2(n_chars)) as int) as len_bin,
           count(*) as n_docs,
           cast(sum(n_chars) as bigint) as total_chars
    from documents
    where n_chars > 0
    group by source, len_bin
    """,
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card length distribution: documents per (source, log2 length
    bin) with total characters — the skew-at-a-glance rollup every corpus
    report leads with.

    One map-side-combining groupBy; output is sources x ~20 bins at any
    corpus size. The bin key is floor(log2(int)) — exact on both engines
    (no float rounding in a key position).
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars") > 0)
        .groupBy(
            "source",
            F.floor(F.log2("n_chars")).cast("int").alias("len_bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


#: per-doc shared-shingle coverage above which a document counts as
#: "mostly duplicated" in the overlap report.
OVERLAP_HIGH = 0.5


@register(
    "corpus_ngram_overlap",
    oracle=f"""
    with tok as (select doc_id, string_split(text, ' ') as t from documents),
    sh as (
      select distinct doc_id, shingle from (
        select doc_id,
               unnest(list_transform(
                 list_zip(t[1:len(t)-4], t[2:len(t)-3], t[3:len(t)-2],
                          t[4:len(t)-1], t[5:len(t)]),
                 x -> x[1] || ' ' || x[2] || ' ' || x[3] || ' ' ||
                      x[4] || ' ' || x[5])) as shingle
        from tok where len(t) >= {DECONTAM_NGRAM})),
    dfreq as (select shingle, count(*) as df from sh group by shingle),
    perdoc as (
      select doc_id,
             count(*) as n_shingles,
             sum(case when df >= 2 then 1 else 0 end) as n_shared
      from sh join dfreq using (shingle)
      group by doc_id),
    cov as (
      select d.source,
             cast({sql_round_div('p.n_shared', 'p.n_shingles', 9)}
                  as decimal(18,9)) as c
      from perdoc p join documents d using (doc_id))
    select source,
           count(*) as n_docs,
           {sql_round_div("sum(c)", "count(*)", 6, 9)} as avg_coverage,
           cast(sum(case when c >= {OVERLAP_HIGH} then 1 else 0 end)
                as bigint) as n_docs_high
    from cov
    group by source
    order by source
    """,
)
def corpus_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram overlap report: for each document, the fraction of
    its distinct word 5-grams that also appear in ANOTHER document (shingle
    document-frequency >= 2), rolled up to (avg coverage, count of
    mostly-duplicated docs) per source — the memorization-risk audit a
    pre-training data card pairs with the exact-dup rate
    (``corpus_dup_rate_by_source`` sees only whole-text copies; this sees
    partial/boilerplate overlap).

    Plan: the tracked distinct shingle table (shared with the whole
    decontamination family via ``_doc_shingles``) feeds a posting-list
    rollup (one shuffle to shingle keys, map-side combined), joins back to
    per-doc counts (second shuffle, doc keys), then a sources-sized rollup.
    Per-doc coverage rounds to 9 dp into decimal(18,9) before the source
    average so the reduction is partition-order-independent. Shingles are
    64-bit hashes on the Spark side, full strings in the oracle —
    value-identical for df counting (the jaccard-family convention).
    """
    docs = load(spark, sf_dir, "documents")
    sh = _doc_shingles(docs)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    perdoc = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") >= 2).cast("int")).alias("n_shared"),
        )
    )
    cov = perdoc.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        round_div(F.col("n_shared"), F.col("n_shingles"), 9)
        .cast("decimal(18,9)")
        .alias("c"),
    )
    return (
        cov.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # all-integer half-up round over the 9-dp decimal sum
            # (exactmath.py, r15 tie rework)
            round_div(F.sum("c"), F.count(F.lit(1)), 6, 9).alias(
                "avg_coverage"
            ),
            F.sum((F.col("c") >= OVERLAP_HIGH).cast("int"))
            .cast("bigint")
            .alias("n_docs_high"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_curriculum_order",
    oracle="""
    with scored as (
      select doc_id, n_chars,
             len(string_split(text, ' ')) as n_tokens,
             len(list_filter(string_split(text, ' '),
                             x -> x in ('the', 'a', 'data')))
               * 1.0 / len(string_split(text, ' ')) as stop_ratio
      from documents),
    banded as (
      select cast(floor((1 - stop_ratio) * ln(1 + n_tokens)) as int) as band,
             n_chars
      from scored),
    per_band as (
      select band, count(*) as n_docs,
             cast(sum(n_chars) as bigint) as total_chars
      from banded group by band)
    select band, n_docs, total_chars,
           cast(1 + coalesce(sum(n_docs) over (order by band desc
                  rows between unbounded preceding and 1 preceding), 0)
                as bigint) as start_pos,
           cast(sum(n_docs) over (order by band desc
                  rows between unbounded preceding and current row)
                as bigint) as end_pos
    from per_band
    order by band desc
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-training schedule manifest: documents banded by integer
    quality score (the text_quality_score signal), scheduled clean-first —
    each band's global [start_pos, end_pos] position range in the training
    order. Within a band the order is the deterministic md5 shuffle every
    sampler here uses; the manifest is what a data loader consumes to
    stream the curriculum WITHOUT any global sort.

    This is the scale-correct shape for "order 100 TB by quality": a global
    row_number over the corpus is a single-task sort, but band positions
    need only the per-band counts — one map-side-combining groupBy to
    ~10 band rows, then a prefix sum over that band-cardinality rollup
    (same trick as pipeline_sequence_pack's shard-local packing and
    pipeline_epoch_shuffle's per-shard windows). Quality uses the same
    doubles on both engines; floor of an identical double is exact
    (eval_auc's key armor), so band membership is engine-stable.
    """
    from ..functions.text import STOPWORDS

    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(f"size(filter(split(text, ' '), x -> x in ({stop_list})))")
    quality = (F.lit(1) - n_stop / n_tok) * F.log(F.lit(1) + n_tok)
    per_band = (
        docs.select(
            F.floor(quality).cast("int").alias("band"), "n_chars"
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
    w_prev = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_incl = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_band.select(
        "band",
        "n_docs",
        "total_chars",
        (F.lit(1) + F.coalesce(F.sum("n_docs").over(w_prev), F.lit(0)))
        .cast("bigint")
        .alias("start_pos"),
        F.sum("n_docs").over(w_incl).cast("bigint").alias("end_pos"),
    ).orderBy(F.desc("band"))


#: corpus_lang_mix_kl: the target language mix the curation pipeline aims
#: for — uniform over the fixture's five languages. A real pipeline loads
#: this from its mix config; the KL machinery is identical.
LANG_MIX_TARGET = 0.2
#: Exact-rational reading of the target (1/5) for the tie-exact rebalance
#: math: keep_rate/tokens_after are computed on integers with this
#: denominator, never through the double 0.2 (VERDICT r15 #3).
_MIX_TARGET_DEN = 5
assert abs(1.0 / _MIX_TARGET_DEN - LANG_MIX_TARGET) < 1e-15


@register(
    "corpus_lang_mix_kl",
    oracle=f"""
    with tok as (
      select lang,
             cast(sum(len(string_split(text, ' '))) as bigint) as n_tokens
      from documents group by lang),
    tot as (select sum(n_tokens) as t from tok)
    select lang, n_tokens,
           {sql_round_div('n_tokens', '(select t from tot)', 6)} as share,
           cast({LANG_MIX_TARGET} as double) as target_share,
           round((n_tokens * 1.0 / (select t from tot))
                 * ln((n_tokens * 1.0 / (select t from tot))
                      / {LANG_MIX_TARGET}), 6) as kl_term
    from tok
    """,
)
def corpus_lang_mix_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix audit: each language's observed token share vs the
    target mix, with its KL-divergence contribution (sum of kl_term =
    KL(observed ‖ target)) — the drift report a multilingual curation
    pipeline checks before committing a training mix (positive terms =
    over-represented languages).

    One map-side token count (size(split), no explode) into a
    languages-sized rollup; the total joins back as a broadcast scalar
    combine. Shares and KL terms round identically on both engines; a
    language present in the data is never 0-share, so ln is total.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("n_tokens")
    )
    tot = tok.agg(F.sum("n_tokens").alias("t"))
    share = F.col("n_tokens") / F.col("t")
    return (
        tok.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_tokens",
            # integer-ratio share: all-integer half-up (exactmath) — a
            # double round of n_tokens/t can land on an engine-divergent
            # tie; the kl_term stays on the double path (ln is irrational
            # off a measure-zero set, so its 6-dp ties are unreachable)
            round_div(F.col("n_tokens"), F.col("t"), 6).alias("share"),
            F.lit(float(LANG_MIX_TARGET)).alias("target_share"),
            F.round(
                share * F.log(share / F.lit(float(LANG_MIX_TARGET))), 6
            ).alias("kl_term"),
        )
    )


@register(
    "pipeline_mix_rebalance",
    oracle=f"""
    with tok as (
      select lang,
             cast(sum(len(string_split(text, ' '))) as bigint) as n_tokens
      from documents group by lang),
    tot as (select sum(n_tokens) as t from tok),
    rates as (
      select lang, n_tokens, (select t from tot) as t from tok)
    select lang, n_tokens,
           {sql_round_div('n_tokens', 't', 6)} as share,
           case when t >= {_MIX_TARGET_DEN} * n_tokens then 1.0
                else {sql_round_div('t', f'({_MIX_TARGET_DEN} * n_tokens)', 6)}
           end as keep_rate,
           cast(case when t >= {_MIX_TARGET_DEN} * n_tokens then n_tokens
                     else t // {_MIX_TARGET_DEN} end as bigint)
             as tokens_after
    from rates
    """,
)
def pipeline_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sampling rates that move the corpus toward the target language
    mix: keep_rate = min(1, target_share / observed_share) per language —
    the rebalancing manifest a curation pipeline feeds into its
    per-language Bernoulli samplers (over-represented languages are
    down-sampled, under-represented ones kept whole; the mix can only be
    hit exactly by also up-weighting, which training-data pipelines do at
    the loader, not by duplicating rows).

    Same one-pass token rollup + broadcast scalar combine as
    corpus_lang_mix_kl (the audit this manifest acts on). All three
    outputs are EXACT rational/integer algebra (r16, VERDICT r15 #3): the
    target is interpreted as the exact rational 1/_MIX_TARGET_DEN (not
    the double 0.2), so keep_rate = min(1, t/(5·n_tokens)) rounds via the
    all-integer half-up, and tokens_after = floor(n_tokens·keep)
    collapses to exactly n_tokens or t div 5 — a double floor sits ON an
    integer whenever t divides evenly, the same engine-divergence class
    as a rational round tie.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("n_tokens")
    )
    tot = tok.agg(F.sum("n_tokens").alias("t"))
    den = F.lit(_MIX_TARGET_DEN) * F.col("n_tokens")
    whole = F.col("t") >= den
    return tok.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        round_div(F.col("n_tokens"), F.col("t"), 6).alias("share"),
        F.when(whole, F.lit(1.0))
        .otherwise(round_div(F.col("t"), den, 6))
        .alias("keep_rate"),
        F.when(whole, F.col("n_tokens"))
        .otherwise(
            # exact integer floor(t / DEN): (t - t mod DEN) is exactly
            # divisible, so the double division introduces no rounding
            (
                (F.col("t") - F.pmod(F.col("t"), F.lit(_MIX_TARGET_DEN)))
                / F.lit(_MIX_TARGET_DEN)
            ).cast("long")
        )
        .cast("bigint")
        .alias("tokens_after"),
    )


#: sample_class_balanced: per-label sample size.
BALANCED_PER_CLASS = 30


@register(
    "sample_class_balanced",
    oracle=f"""
    with ranked as (
      select vec_id, label,
             row_number() over (partition by label
                                order by md5(cast(vec_id as varchar)),
                                         vec_id) as rn
      from embeddings)
    select label,
           cast(count(*) as bigint) as n_sampled,
           cast(min(vec_id) as bigint) as min_id,
           cast(max(vec_id) as bigint) as max_id,
           cast(sum(vec_id) as bigint) as id_checksum
    from ranked where rn <= {BALANCED_PER_CLASS}
    group by label
    """,
)
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced sample: exactly {BALANCED_PER_CLASS} vectors per
    label, chosen by the hash order — the equal-representation draw a
    fine-tuning set builder runs when the raw label distribution is
    skewed (sample_stratified keeps proportions; this equalizes them).

    Same deterministic md5-order contract as every sampler here (identical
    bytes on any engine, vec_id tiebreak). The per-label rank routes
    through ``plans.salted_topk`` — labels are few, so a naive per-label
    window is one corpus/k-sized task per label at scale; the salted
    two-stage form keeps stage-1 partitions bucket-sized. The output
    reports per-label membership checksums, not the rows, so the result
    frame is label-cardinality.
    """
    from ..plans.topk import salted_topk

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    picked = salted_topk(
        emb.withColumn("h", F.md5(F.col("vec_id").cast("string"))),
        [F.asc("h"), F.asc("vec_id")],
        BALANCED_PER_CLASS,
        salt_col="vec_id",
        group_cols=("label",),
        rank_col="rn",
    )
    return picked.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("vec_id").alias("min_id"),
        F.max("vec_id").alias("max_id"),
        F.sum("vec_id").alias("id_checksum"),
    )


@register(
    "pipeline_dataset_card",
    oracle=f"""
    with d as (
      select count(*) as n_docs,
             count(distinct text) as n_unique_texts,
             cast(sum(len(string_split(text, ' '))) as bigint) as n_tokens,
             {sql_round_div("sum(n_chars)", "count(*)", 2)} as avg_chars,
             {sql_round_div("count(*) - count(distinct text)", "count(*)", 4)}
               as exact_dup_rate
      from documents),
    v as (
      select count(distinct word) as vocab
      from (select unnest(string_split(text, ' ')) as word from documents)
      where word <> ''),
    lc as (select lang, count(*) as n from documents group by lang),
    lt as (select sum(n) as t from lc),
    l as (
      select round(-sum((n * 1.0 / (select t from lt))
                        * ln(n * 1.0 / (select t from lt))), 4)
               as lang_entropy_nats,
             cast(count(*) as int) as n_langs
      from lc)
    select cast(n_docs as bigint) as n_docs,
           cast(n_unique_texts as bigint) as n_unique_texts,
           exact_dup_rate,
           n_tokens,
           avg_chars,
           cast(vocab as bigint) as vocab,
           n_langs,
           lang_entropy_nats
    from d, v, l
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card: the corpus summary a training-data release
    publishes — document and unique-text counts, exact-dup rate, token
    total, mean length, vocabulary size, language count and entropy. The
    composed "front page" whose per-metric drill-downs are the dedicated
    queries (dedup_exact, text_tokens_stats, corpus_lang_mix_kl,
    text_zipf_fit).

    Three corpus passes (doc stats incl. distinct-text, distinct-word
    vocabulary, language counts) — each a partial-agg/distinct shuffle —
    combined as one-row broadcast scalar joins. Language entropy folds
    over the languages-sized rollup with its total attached by another
    scalar combine, so no unpartitioned window anywhere.
    """
    docs = load(spark, sf_dir, "documents")
    from ..operators.relational import tokens

    d = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("n_tokens"),
        round_div(F.sum("n_chars"), F.count(F.lit(1)), 2).alias("avg_chars"),
    )
    v = tokens(docs).agg(F.countDistinct("word").alias("vocab"))
    lc = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    lt = lc.agg(F.sum("n").alias("t"))
    p = F.col("n") / F.col("t")
    l_ = (
        lc.crossJoin(F.broadcast(lt))
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("lang_entropy_nats"),
            F.count(F.lit(1)).cast("int").alias("n_langs"),
        )
    )
    return (
        d.crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(l_))
        .select(
            "n_docs",
            "n_unique_texts",
            # empty-corpus guard: dup rate of zero docs is 0, not 0/0;
            # otherwise the all-integer half-up round (exactmath.py, r15)
            F.when(F.col("n_docs") == 0, F.lit(0.0))
            .otherwise(
                round_div(
                    F.col("n_docs") - F.col("n_unique_texts"),
                    F.col("n_docs"),
                    4,
                )
            )
            .alias("exact_dup_rate"),
            "n_tokens",
            "avg_chars",
            "vocab",
            "n_langs",
            "lang_entropy_nats",
        )
    )


#: RAG / embedding chunker geometry: CHUNK_TOKENS-token windows advancing
#: by CHUNK_STRIDE (8-token overlap carries context across boundaries).
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def chunk_windows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode documents into overlapping token-window chunks — the
    retrieval/embedding chunker every RAG ingestion pipeline runs (one row
    per chunk: doc_id, chunk_id, chunk_tokens, chunk text).

    Scale shape: tokenization, window arithmetic, and the slice all happen
    map-side in one nested higher-order expression (no shuffle — the 1→N
    expansion is a generator inside the scan stage, like posexplode);
    chunk k of an n-token doc covers tokens [k·STRIDE, k·STRIDE + TOKENS),
    the last window starting at the smallest k·STRIDE reaching the tail.
    Empty-token docs produce no chunks.
    """
    w, s = CHUNK_TOKENS, CHUNK_STRIDE
    return (
        docs.select(
            "doc_id",
            "source",
            F.expr(
                f"filter(split({text_col}, ' '), x -> x != '')"
            ).alias("toks"),
        )
        .withColumn("n_tok", F.size("toks"))
        .filter(F.col("n_tok") > 0)
        .select(
            "doc_id",
            "source",
            "n_tok",
            F.posexplode(
                F.expr(
                    f"""
                    transform(
                      sequence(0, greatest(cast(ceil((n_tok - {w}) / cast({s} as double)) as int), 0)),
                      k -> slice(toks, k * {s} + 1, {w}))
                    """
                )
            ).alias("chunk_id", "chunk"),
        )
        .select(
            "doc_id",
            "source",
            "chunk_id",
            F.size("chunk").alias("chunk_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


@register(
    "pipeline_chunk_windows",
    oracle=f"""
    with toks as (
      select doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') as t
      from documents),
    sized as (
      select doc_id, source, t, len(t) as n_tok from toks where len(t) > 0),
    starts as (
      select source, t,
             unnest(generate_series(0,
               greatest(cast(ceil((n_tok - {CHUNK_TOKENS})
                 / cast({CHUNK_STRIDE} as double)) as int), 0))) as i
      from sized),
    chunks as (
      select source,
             len(list_slice(t, i * {CHUNK_STRIDE} + 1,
                            i * {CHUNK_STRIDE} + {CHUNK_TOKENS}))
               as chunk_tokens,
             array_to_string(
               list_slice(t, i * {CHUNK_STRIDE} + 1,
                          i * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')
               as chunk_text
      from starts)
    select source,
           cast(count(*) as bigint) as n_chunks,
           cast(sum(chunk_tokens) as bigint) as chunk_tokens,
           cast(sum(case when chunk_tokens = {CHUNK_TOKENS} then 1 else 0
                    end) as bigint) as full_chunks,
           cast(sum(octet_length(encode(chunk_text))) as bigint)
             as chunk_bytes
    from chunks
    group by source
    order by source
    """,
)
def pipeline_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking manifest: per source, how many overlapping
    {CHUNK_TOKENS}-token / stride-{CHUNK_STRIDE} retrieval chunks the
    corpus explodes into, total chunk tokens (the overlap-inflated count an
    embedding budget is priced on), full-width chunks, and chunk bytes
    (new r13 — the RAG-ingestion stage the pipeline family lacked).

    The engine runs the REAL chunker (:func:`chunk_windows`: map-side
    higher-order slice generator, no shuffle before the rollup); the
    oracle re-derives every chunk from the same geometry in DuckDB list
    algebra — a boundary bug (off-by-one window start, unclamped tail,
    dropped short chunk) changes counts/bytes on one side only and
    hash-mismatches.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        chunk_windows(docs)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_tokens").cast("bigint").alias("chunk_tokens"),
            F.sum((F.col("chunk_tokens") == CHUNK_TOKENS).cast("int"))
            .cast("bigint")
            .alias("full_chunks"),
            F.sum(F.octet_length("chunk_text"))
            .cast("bigint")
            .alias("chunk_bytes"),
        )
        .orderBy("source")
    )


#: Temperature-sampling exponent (mT5 / XLM-R convention: alpha = 0.3
#: flattens the language distribution so low-resource languages are
#: up-sampled relative to their natural share).
MIX_TEMPERATURE_ALPHA = 0.3

#: tokens drawn per training epoch in the manifest (arbitrary fixed budget;
#: the per-language expectation scales linearly with it).
MIX_EPOCH_TOKENS = 1_000_000


@register(
    "sample_temperature_mix",
    oracle=f"""
    with per_lang as (
      select lang,
             cast(count(*) as bigint) as n_docs,
             cast(sum(len(list_filter(string_split(text, ' '),
                                      x -> x <> ''))) as bigint) as tokens
      from documents group by lang),
    tot as (select sum(tokens) as n from per_lang),
    scored as (
      select lang, n_docs, tokens, n,
             tokens * 1.0 / n as p,
             pow(tokens * 1.0 / n, {MIX_TEMPERATURE_ALPHA}) as w
      from per_lang cross join tot
      where tokens > 0),
    z as (select sum(w) as z from scored)
    select lang, n_docs, tokens,
           {sql_round_div('tokens', 'n', 6)} as nat_share,
           round(w / z, 6) as temp_share,
           round((w / z) / p, 4) as boost,
           cast(floor((w / z) * {MIX_EPOCH_TOKENS}) as bigint)
             as epoch_tokens
    from scored cross join z
    order by lang
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling manifest (new r13): per
    language the natural token share p, the temperature share
    q ∝ p^{MIX_TEMPERATURE_ALPHA} (the mT5/XLM-R low-resource up-sampling
    rule), the boost factor q/p the loader applies, and the expected
    tokens drawn per {MIX_EPOCH_TOKENS}-token epoch — the mixing step
    between pipeline_mix_rebalance's hard-target down-sampling and the
    quota draw of sample_weighted_mix.

    Plan shape: ONE map-side-combining rollup to (lang, n_docs, tokens) —
    language-cardinality sized — then two scalar one-row combines (total
    tokens, normalizer Z); nothing wider than the language table ever
    shuffles, so the manifest costs one pass at any corpus size. Shares
    round at 6 dp and boosts at 4 dp on both engines before hashing.
    """
    docs = load(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.expr("size(filter(split(text, ' '), x -> x != ''))").cast(
                "bigint"
            )
        ).alias("tokens"),
    )
    tot = per_lang.agg(F.sum("tokens").alias("n"))
    # a zero-token language cannot be sampled from a TOKEN mixture (p = 0,
    # and on an all-empty corpus n = 0 makes p ANSI-divide-by-zero); it is
    # excluded on both engines — the r14 totality-audit class (an
    # all-empty-text slice crashed the manifest). n sums over ALL
    # languages, so the filter changes no surviving row's share.
    scored = per_lang.filter(F.col("tokens") > 0).crossJoin(tot).select(
        "lang",
        "n_docs",
        "tokens",
        "n",
        (F.col("tokens") / F.col("n")).alias("p"),
        F.pow(F.col("tokens") / F.col("n"), MIX_TEMPERATURE_ALPHA).alias(
            "w"
        ),
    )
    z = scored.agg(F.sum("w").alias("z"))
    return (
        scored.crossJoin(z)
        .select(
            "lang",
            "n_docs",
            "tokens",
            # tokens/n is an integer ratio — tie-exact half-up; the
            # pow-derived temp_share/boost stay on the double path
            # (irrational off a measure-zero set)
            round_div(F.col("tokens"), F.col("n"), 6).alias("nat_share"),
            F.round(F.col("w") / F.col("z"), 6).alias("temp_share"),
            F.round((F.col("w") / F.col("z")) / F.col("p"), 4).alias(
                "boost"
            ),
            F.floor(F.col("w") / F.col("z") * MIX_EPOCH_TOKENS)
            .cast("bigint")
            .alias("epoch_tokens"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------- in-engine training

#: pipeline_quality_logreg hyperparameters: full-batch gradient-descent
#: steps, learning rate, and the per-step quantization of both the
#: gradient terms (9 dp, summed as decimal(18,9)) and the updated weights
#: (9 dp) — the same determinism armor as the Lloyd/PCA loops, so every
#: step's model compares identical quantized scalars on both engines.
LOGREG_STEPS = 12
LOGREG_LR = 8.0
#: classification target: docs with at least this many chars are the
#: positive class. The synthetic fixture is deliberately
#: feature-degenerate for every NATURAL label (language, source, and the
#: embedding labels are all independent of the content features — see the
#: LANG_MARKERS degeneracy note in functions/text.py), so the training
#: target is a held-out threshold on raw length: the GD loop then has
#: real signal to descend, and the operator shape — distributed
#: full-batch training — is what's under test.
LOGREG_POS_CHARS = 300

#: Session-scoped memo of the trained weights (3 doubles) — the
#: kmeans-centroid contract: repeat callers skip the LOGREG_STEPS
#: one-row collects and rebuild only the scoring plan.
_LOGREG_MEMO: dict[tuple, list] = {}


def _clear_logreg_memo() -> int:
    n = len(_LOGREG_MEMO)
    _LOGREG_MEMO.clear()
    return n


from ..cache import register_memo_clearer  # noqa: E402

register_memo_clearer(_clear_logreg_memo)


def _logreg_sigma(z: Column) -> Column:
    """Rational 'fast sigmoid' 0.5 + z / (2 * (1 + |z|)) — the squashing
    link used INSTEAD of 1/(1+exp(-z)) deliberately: the training loop is
    hash-compared against DuckDB, and libm exp() is only ~1-ulp accurate
    (JVM vs C runtimes can disagree in the last bit, which a 9 dp
    quantization boundary can amplify into a flipped gradient digit).
    Every operation here (+, -, *, /, abs) is IEEE-754 correctly rounded,
    so both engines produce bit-identical per-row terms. Same range
    ((0, 1), 0.5 at z=0, monotone), same decision boundary z > 0."""
    return 0.5 + z / (2 * (1 + F.abs(z)))


def _logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(x1, x2, y): scaled length features + the is-English label —
    exact-integer ratios, so the feature doubles are engine-identical."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        (F.col("n_chars").cast("double") / 1000.0).alias("x1"),
        (F.size(F.split("text", " ")).cast("double") / 100.0).alias("x2"),
        (F.col("n_chars") >= LOGREG_POS_CHARS).cast("int").alias("y"),
    )


def logreg_weights(spark: SparkSession, sf_dir: str) -> list:
    """[b0, b1, b2] after LOGREG_STEPS full-batch GD steps from zero init.

    Each step is ONE map-side-combining aggregation over the corpus
    (three gradient components, each a decimal(18,9) sum of per-row
    9 dp-quantized terms) collected to the driver — the MLlib
    driver-holds-the-model shape; the model is 3 scalars at any corpus
    size. Weights re-quantize to 9 dp between steps.
    """
    key = (spark.sparkContext.applicationId, sf_dir,
           LOGREG_STEPS, LOGREG_LR)
    got = _LOGREG_MEMO.get(key)
    if got is not None:
        return got
    feat = _logreg_features(spark, sf_dir)
    beta = [0.0, 0.0, 0.0]
    for _ in range(LOGREG_STEPS):
        z = F.lit(beta[0]) + F.lit(beta[1]) * F.col("x1") + F.lit(
            beta[2]
        ) * F.col("x2")
        resid = _logreg_sigma(z) - F.col("y")
        row = feat.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.round(resid * xj, 9).cast("decimal(18,9)")
                ).alias(f"g{j}")
                for j, xj in enumerate(
                    [F.lit(1.0), F.col("x1"), F.col("x2")]
                )
            ],
        ).collect()[0]
        n = row["n"]
        if n == 0:
            # same loud-guard class as embed_kmeans' min-vector check:
            # training on an empty corpus has no gradient to descend
            raise ValueError(
                "pipeline_quality_logreg needs >= 1 document, got 0"
            )
        beta = [
            round(beta[j] - LOGREG_LR * (float(row[f"g{j}"]) / n), 9)
            for j in range(3)
        ]
    _LOGREG_MEMO[key] = beta
    return beta


def _logreg_oracle() -> str:
    # each b{k} CTE is referenced twice (by g{k+1} and b{k+1}); without
    # MATERIALIZED DuckDB inlines the chain and re-evaluates it 2^steps
    # times (measured: 91 s at 12 steps -> sub-second materialized)
    sig = "(0.5 + {z} / (2 * (1 + abs({z}))))"
    parts = [
        f"""
    feat as (
      select cast(n_chars as double) / 1000.0 as x1,
             cast(len(string_split(text, ' ')) as double) / 100.0 as x2,
             cast(n_chars >= {LOGREG_POS_CHARS} as int) as y
      from documents),
    b0 as materialized (select 0.0 as w0, 0.0 as w1, 0.0 as w2)"""
    ]
    for k in range(1, LOGREG_STEPS + 1):
        z = f"(b.w0 + b.w1 * f.x1 + b.w2 * f.x2)"
        s = sig.format(z=z)
        parts.append(f"""
    g{k} as materialized (
      select count(*) as n,
             sum(cast(round(({s} - f.y) * 1.0, 9) as decimal(18,9))) as g0,
             sum(cast(round(({s} - f.y) * f.x1, 9) as decimal(18,9))) as g1,
             sum(cast(round(({s} - f.y) * f.x2, 9) as decimal(18,9))) as g2
      from feat f cross join b{k - 1} b),
    b{k} as materialized (
      select round(b.w0 - {LOGREG_LR} * (cast(g.g0 as double) / g.n), 9) as w0,
             round(b.w1 - {LOGREG_LR} * (cast(g.g1 as double) / g.n), 9) as w1,
             round(b.w2 - {LOGREG_LR} * (cast(g.g2 as double) / g.n), 9) as w2
      from b{k - 1} b cross join g{k} g)""")
    last = f"b{LOGREG_STEPS}"
    return f"""
    with {",".join(parts)}
    select round(b.w0, 6) as beta0,
           round(b.w1, 6) as beta1,
           round(b.w2, 6) as beta2,
           count(*) as n,
           cast(sum(case when ((b.w0 + b.w1 * f.x1 + b.w2 * f.x2) > 0)
                              = (f.y = 1)
                         then 1 else 0 end) as bigint) as n_correct,
           {sql_round_div(
               "sum(case when ((b.w0 + b.w1 * f.x1 + b.w2 * f.x2) > 0)"
               " = (f.y = 1) then 1 else 0 end)",
               "count(*)", 6)} as accuracy
    from feat f cross join {last} b
    group by b.w0, b.w1, b.w2
    """


@register("pipeline_quality_logreg", oracle=_logreg_oracle())
def pipeline_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a binary quality/language classifier INSIDE the engine —
    full-batch gradient descent on a squashed-linear model (rational
    sigmoid, see :func:`_logreg_sigma`) predicting the long-document
    class (n_chars >= LOGREG_POS_CHARS — see the constant's fixture-
    degeneracy note) from scaled length features, then report the weights and training
    accuracy. This is the quality-classifier step of an LLM curation
    pipeline (fastText-style filtering; in production the label is a
    human/LLM quality rating and the features are quality signals)
    expressed as the same
    driver-holds-the-model / one-aggregation-per-step loop as
    embed_kmeans, with the oracle unrolled CTE-per-step like PageRank.

    Scale shape: each GD step shuffles exactly three partial-aggregated
    decimal sums; the model is 3 scalars on the driver regardless of
    corpus size; scoring is one map-side expression. Gradient terms
    quantize to 9 dp and sum as decimal(18,9) (order-independent), and
    weights re-quantize to 9 dp between steps, so both engines iterate
    identical models.
    """
    beta = logreg_weights(spark, sf_dir)
    feat = _logreg_features(spark, sf_dir)
    z = (
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("x1")
        + F.lit(beta[2]) * F.col("x2")
    )
    correct = ((z > 0) == (F.col("y") == 1)).cast("int")
    return feat.agg(
        F.lit(round(beta[0], 6)).alias("beta0"),
        F.lit(round(beta[1], 6)).alias("beta1"),
        F.lit(round(beta[2], 6)).alias("beta2"),
        F.count(F.lit(1)).alias("n"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        round_div(F.sum(correct), F.count(F.lit(1)), 6).alias("accuracy"),
    )


#: Similarity thresholds swept by the dup-rate curve — the candidate
#: operating points for the near-dup pipeline's CLUSTER_THRESHOLD.
DUP_CURVE_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def _dup_curve_oracle() -> str:
    from .dedup import _JACCARD_PAIRS_CTE

    ts = ", ".join(str(t) for t in DUP_CURVE_THRESHOLDS)
    return f"""
    with {_JACCARD_PAIRS_CTE},
    docmax as (
      select doc_id, max(jacc) as mj from (
        select a_id as doc_id, jacc from jpairs
        union all
        select b_id as doc_id, jacc from jpairs)
      group by doc_id),
    tot as (select count(*) as n from documents),
    grid as (select unnest([{ts}]) as threshold)
    select threshold,
           cast((select count(*) from jpairs where jacc >= threshold)
                as bigint) as n_pairs,
           cast((select count(*) from docmax where mj >= threshold)
                as bigint) as n_docs_affected,
           case when (select n from tot) = 0 then null
                else {sql_round_div(
                    "(select count(*) from docmax where mj >= threshold)",
                    "(select n from tot)", 6)}
           end as affected_share
    from grid
    order by threshold
    """


@register("corpus_dup_threshold_curve", oracle=_dup_curve_oracle())
def corpus_dup_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup exposure as a function of the similarity threshold: for
    each candidate operating point, how many candidate pairs clear it,
    how many documents are touched by at least one such pair, and what
    share of the corpus that is — the data-card curve a pipeline owner
    reads BEFORE freezing CLUSTER_THRESHOLD, instead of discovering
    after a 100 TB dedup run that 0.7 drops a third of the corpus.

    Scale plan: the whole sweep reads the session-shared tracked
    candidate-pair table (dedup.jaccard_pairs — bucketed inverted-index
    join, hot-shingle capped, never all-pairs) exactly once per arm:
    pair counts are ONE conditional rollup over it, doc exposure is ONE
    per-doc max-jacc rollup followed by a conditional rollup, and the
    corpus size is a scalar combine — three 1-row aggregates stacked
    into the |thresholds|-row curve (bounded output, whitelisted scalar
    BNLJ class). Thresholds compare against the 4 dp-rounded jacc, so
    the cut is engine-exact.
    """
    from .dedup import jaccard_pairs
    from ..functions.vectors import spread

    docs = load(spark, sf_dir, "documents")
    pairs = jaccard_pairs(spread(docs))
    doc_max = (
        pairs.select(
            F.explode(F.array("a_id", "b_id")).alias("doc_id"), "jacc"
        )
        .groupBy("doc_id")
        .agg(F.max("jacc").alias("mj"))
    )
    pair_agg = pairs.agg(
        *[
            F.coalesce(
                F.sum((F.col("jacc") >= t).cast("long")), F.lit(0)
            ).alias(f"p{i}")
            for i, t in enumerate(DUP_CURVE_THRESHOLDS)
        ]
    )
    doc_agg = doc_max.agg(
        *[
            F.coalesce(
                F.sum((F.col("mj") >= t).cast("long")), F.lit(0)
            ).alias(f"d{i}")
            for i, t in enumerate(DUP_CURVE_THRESHOLDS)
        ]
    )
    tot = docs.agg(F.count(F.lit(1)).alias("ntot"))
    stack_args = ", ".join(
        f"{t}d, p{i}, d{i}" for i, t in enumerate(DUP_CURVE_THRESHOLDS)
    )
    one = (
        pair_agg.crossJoin(F.broadcast(doc_agg))
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                f"stack({len(DUP_CURVE_THRESHOLDS)}, {stack_args}) "
                "as (threshold, n_pairs, n_docs_affected)"
            ),
            "ntot",
        )
    )
    return one.select(
        "threshold",
        "n_pairs",
        "n_docs_affected",
        F.when(F.col("ntot") == 0, F.lit(None))
        .otherwise(round_div(F.col("n_docs_affected"), F.col("ntot"), 6))
        .alias("affected_share"),
    ).orderBy("threshold")
