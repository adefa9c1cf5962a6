"""End-to-end corpus preparation: the composition a training-data run
actually executes, as one lazy DataFrame plan.

Stages (each individually oracle-tested elsewhere; this module wires them):

-1. html front door — optional in-place boilerplate-removing extraction
                     when the input is raw HTML (``web.html_text_exprs``)
0. normalization   — optional unicode NFC + control-char/whitespace
                     cleanup (``text.normalize_text``) BEFORE any
                     hashing, so byte-variant renderings of identical
                     text cannot defeat the dedup stages
1. quality gate    — Column-algebra features, pushed-down filter
2. language gate   — stopword-vote lang-id, keep an allowlist
2b. blocklist gate — optional C4-style term filter (``text.term_filter``):
                     any blocklisted phrase drops the document
2c. domain cap     — optional RefinedWeb-style per-domain keep cap
                     (``web.domain_frequency_cap``, salted two-level)
2d. seen gate      — optional cross-RUN dedup: Bloom probe of text md5s
                     against prior runs' carried filter
                     (``corpus_seen_filter`` / ``sketches.bloom_*``)
3. exact dedup     — md5 canonical-form groupBy, keep lowest id
3b. paragraph dedup— optional corpus-wide duplicate-paragraph removal
                     with text reconstruction (``dedup.dedup_paragraphs``);
                     docs emptied by it are dropped
3c. substring dedup— optional exact repeat removal at token-span
                     granularity, keep-one semantics
                     (``dedup.substring_dedup``); emptied docs dropped
3d. decontamination— optional eval-set span removal: every benchmark
                     n-gram collision cut from every occurrence
                     (``dedup.decontaminate``); emptied docs dropped
4. near dedup      — MinHash/LSH candidates → Jaccard verify → exact
                     connected components → drop non-representatives
4b. LM gate        — optional bigram-LM cross-entropy cutoff
                     (``operators.lm``; reference-corpus or self-fit)
5. sampling        — deterministic per-language hash-gated fractions
6. PII scrub       — optional in-place redaction (RE2-safe patterns)
7. chunking        — optional fixed-token chunks with overlap
                     (Arrow-batched; output rows are chunks, not docs)
8. shard export    — ``export_training_shards``: deterministic
                     hash-assigned fixed-token-budget parquet shards
9. packing         — ``pack_sequences``: bucket-parallel greedy packing
                     of documents into fixed-token training sequences

Laziness matters at 100 TB: stages 1-2 are pure filters that reach the
parquet scan, 3 is one partial-agg shuffle, 4 is bucket-bounded, 5 is a
filter again — Catalyst sees the whole pipeline and prunes columns/rows
once, instead of materializing between stages. The one deliberate
materialization is the gated corpus after stage 2 (persist,
MEMORY_AND_DISK): four dedup branches re-read it, and pinning it
guarantees the source is scanned exactly once regardless of whether
exchange reuse fires.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtstore_spark.operators import dedup, text
from rtstore_spark.operators.quality_classifier import DEFAULT_KEEP_THRESHOLD
from rtstore_spark.operators.sampling import stratified_sample


@dataclass
class CorpusPrepConfig:
    min_tokens: int = 10
    max_tokens: int = 100_000
    max_digit_ratio: float = 0.3
    langs: list[str] = field(default_factory=lambda: ["en", "fr", "de", "es"])
    near_dup_threshold: float = 0.8
    sample_fractions: dict[str, float] | float = 1.0
    sample_seed: str = "corpus"
    # stage -1: the input's text_col holds raw HTML — extract boilerplate-
    # free text in place (web.html_text_exprs kernel, pure projection);
    # docs with no surviving block are dropped
    html_input: bool = False
    html_max_link_density: float = 0.5
    # stage 2c: RefinedWeb-style anti-domination — keep at most this many
    # gated docs per domain_col value (web.domain_frequency_cap, salted)
    domain_cap: int | None = None
    domain_col: str = "source"
    # stage 2c input (optional): DERIVE domain_col from this URL
    # column's registrable (eTLD+1) domain before capping — the
    # RefinedWeb-faithful grouping key. domain_psl picks the rule
    # source for web.with_registrable_domain: "system" = the complete
    # OS-vendored publicsuffix.org list, "builtin" = the curated
    # no-dependency subset, None = the two-level heuristic. Either
    # source takes an ":icann" suffix ("system:icann") to drop the
    # PSL's private section — the OWNERSHIP grouping; the default full
    # list is the anti-domination grouping, which is what a domain CAP
    # wants (github.io pages are independent sites)
    domain_from_url: str | None = None
    domain_psl: str | None = None
    normalize: bool = False       # stage 0: NFC + whitespace cleanup
    dedup_paragraphs: bool = False  # stage 3b: drop repeated paragraphs
    # stage 3c: exact substring dedup — cut every corpus-wide repeat of at
    # least this many tokens from all but its canonical occurrence
    # (dedup.substring_dedup); None = off
    substring_dedup_tokens: int | None = None
    # stage 3d: benchmark decontamination — cut every span whose
    # decontaminate_tokens-token windows appear verbatim in this eval-set
    # DataFrame (dedup.decontaminate; text col named by
    # decontaminate_text_col, default = the corpus text_col); None = off
    decontaminate_against: DataFrame | None = None
    decontaminate_tokens: int = 13
    decontaminate_text_col: str | None = None
    blocklist: list[str] | None = None  # stage 2b: C4-style term gate
    scrub_pii: bool = False
    chunk_max_tokens: int | None = None  # None = no chunking
    chunk_overlap: int = 128
    # LM quality gate (None = off). An explicit lm_model (from lm.lm_fit,
    # typically on a trusted reference corpus — the CCNet setup) is used
    # as-is; with lm_model=None the LM is fit on the gated corpus itself,
    # which turns the cutoff into a self-surprisal outlier filter.
    lm_max_cross_entropy: float | None = None
    lm_model: dict | None = None
    # stage 4b: TRAINED quality-classifier gate (None = off). Pass a
    # fitted model from quality_classifier.quality_fit — its tokenizer
    # must have been fit on the SAME text column name this pipeline uses.
    # Hard threshold by default; quality_pareto_alpha switches to the
    # GPT-3 stochastic keep policy (deterministic per document).
    quality_model: object | None = None
    quality_threshold: float = DEFAULT_KEEP_THRESHOLD
    quality_pareto_alpha: float | None = None
    # stage 2d: cross-RUN dedup gate — a Bloom rollup of previously-kept
    # corpora's text md5s (build with ``corpus_seen_filter``, OR-merge
    # shards with ``sketches.bloom_merge``). Docs whose fingerprint
    # probes True are dropped before this run's own dedup: no false
    # negatives (every true repeat of history goes), ≈fpp false drops of
    # genuinely-new docs (the documented Bloom trade). This is how run
    # N+1 dedups against runs 1..N without their text: the carried state
    # is nbits/8 bytes, not a corpus.
    seen_filter: DataFrame | None = None


@dataclass
class PrepAudit:
    """Per-stage yield accounting for one ``prepare_corpus`` run, built on
    Spark's ``Observation`` (a ``CollectMetrics`` node at each stage
    boundary): the counts ride along with whatever action the caller runs
    — where a naive ``.count()`` per stage would re-execute the pipeline
    prefix once per stage. At 100 TB that is the difference between "the
    write also produced the yield report" and "the report cost five more
    corpus scans".

    Usage::

        audit = PrepAudit()
        out = prepare_corpus(df, "text", "doc_id", cfg, audit=audit)
        out.write.parquet(...)        # any action
        audit.counts()                # {"input": ..., "gated": ..., ...}

    Execution notes:

    - An ``Observation`` keeps the FIRST action that traverses its node,
      and the near-dup stage's component propagation runs internal
      ``localCheckpoint`` actions that traverse the early taps without
      producing metrics (an empty row would permanently poison them).
      Audit mode therefore runs ONE eager count right after the
      exact-dedup stage: a real action that fires ``input``/``gated``/
      ``exact_dedup`` correctly before any internal action can. It
      doubles as the cache materialization the first downstream action
      would have paid anyway, so the true extra cost is one md5-groupBy
      pass over the CACHED gated set — never a second raw-corpus scan.
      The later taps (``near_dedup``, ``lm_gate``, ``final``) ride the
      caller's own action for free.
    - ``counts()`` BLOCKS until an action has executed each observed
      stage — call it after the caller's action, never before.

    Stage keys (in pipeline order): ``input``, ``gated`` (post quality/
    lang/blocklist/cap, the persisted set), ``exact_dedup``,
    ``near_dedup``, ``lm_gate`` (only if enabled), ``final`` (rows
    returned — chunks, not docs, when chunking is on). Counts are
    observed once per run; use a fresh PrepAudit per prepare_corpus call.
    """

    observations: dict = field(default_factory=dict)

    # Observation names must be unique among concurrently-active queries
    # on one session — two audited runs in flight with fixed names could
    # cross-capture each other's first-completed metrics. A process-wide
    # counter keeps names unique per PrepAudit instance.
    _seq = itertools.count()

    def __post_init__(self):
        self._nonce = next(PrepAudit._seq)

    def tap(self, df: DataFrame, name: str) -> DataFrame:
        from pyspark.sql import Observation

        obs = Observation(f"prep_{name}_{self._nonce}")
        self.observations[name] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    def counts(self) -> dict[str, int]:
        return {
            name: int(obs.get["rows"]) for name, obs in self.observations.items()
        }


@dataclass
class SeenState:
    """Cross-run dedup state captured BY ``prepare_corpus`` itself — the
    safe way to build the next run's ``seen_filter``.

    The seen-gate (stage 2d) probes md5s of the STAGE-2d TEXT FORM
    (post-normalize, pre paragraph-dedup / PII-scrub / chunking).
    Fingerprinting a run's *output* with ``corpus_seen_filter`` only
    matches that form when none of those rewriting stages ran; with any
    of them on, every stored fingerprint is of rewritten text (or chunk
    rows) and the next run's gate silently never fires. Passing a
    ``SeenState`` makes prepare_corpus capture fingerprints at exactly
    the probe point instead::

        state = SeenState()
        out = prepare_corpus(df, "text", "id", cfg, seen_state=state)
        out.write.parquet(...)
        state.filter_df().write.parquet(".../seen_bloom")   # next run's gate

    The captured set is the GATED corpus (every doc that passed stages
    1-2d), deliberately a superset of the final output: docs this run
    discarded as duplicates or sampled out are still *seen* content a
    future run should not re-admit. Reads the stage's persisted cache —
    no extra corpus scan.
    """

    nbits: int = 1 << 20
    k: int = 5
    fingerprints: DataFrame | None = None  # set by prepare_corpus

    def filter_df(self) -> DataFrame:
        """One-row Bloom filter frame (``sketches.bloom_rollup`` layout),
        OR-mergeable across runs with ``sketches.bloom_merge``."""
        if self.fingerprints is None:
            raise ValueError(
                "SeenState not populated — pass it to prepare_corpus first"
            )
        from rtstore_spark.operators.sketches import bloom_rollup

        return bloom_rollup(
            self.fingerprints, "fp", by=[], nbits=self.nbits, k=self.k
        )


_SPAN_STATS = ("n_tokens", "n_tokens_removed", "n_spans_removed")


def _strip_span_stats(df: DataFrame, op) -> DataFrame:
    """Apply a span-removal operator and return the ORIGINAL columns only —
    shielding any same-named corpus annotation (``n_tokens`` is a common
    one) from the operator's appended stat columns, which would otherwise
    either be dropped together with the user's column or collide
    ambiguously (the kernel refuses collisions up front)."""
    clash = [c for c in df.columns if c in _SPAN_STATS]
    renamed = df
    for c in clash:
        renamed = renamed.withColumnRenamed(c, f"__prep_{c}")
    out = op(renamed).drop(*_SPAN_STATS)
    for c in clash:
        out = out.withColumnRenamed(f"__prep_{c}", c)
    return out


def prepare_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    cfg: CorpusPrepConfig | None = None,
    audit: PrepAudit | None = None,
    seen_state: SeenState | None = None,
) -> DataFrame:
    """Full prep pipeline → the kept rows of ``df`` (original columns),
    annotated with ``lang``. Deterministic end to end: same input, same
    config ⇒ byte-identical corpus, on any cluster size.

    Pass a fresh ``PrepAudit`` as ``audit`` to get per-stage survivor
    counts piggybacked on the caller's action (see PrepAudit); with
    ``audit=None`` (default) no metrics nodes enter the plan.
    """
    cfg = cfg or CorpusPrepConfig()

    def _tap(d: DataFrame, name: str) -> DataFrame:
        return audit.tap(d, name) if audit is not None else d

    df = _tap(df, "input")

    # -1. optional html front door: replace raw HTML with extracted text
    # IN PLACE (projection — no join, no shuffle; the kernel is shared
    # with web.extract_html_text so the block rules cannot drift). Docs
    # whose every block was boilerplate extract to "" and are dropped.
    if cfg.html_input:
        from rtstore_spark.operators import web

        _, extracted, _, _ = web.html_text_exprs(
            F.col(text_col), max_link_density=cfg.html_max_link_density
        )
        df = df.withColumn(text_col, extracted).filter(
            F.length(F.col(text_col)) > 0
        )

    # 0. optional stage-zero cleanup: must precede every md5/minhash so
    # composed-vs-decomposed unicode and CRLF noise can't split dup groups
    if cfg.normalize:
        df = text.normalize_text(df, text_col)

    # 1. quality gate (pure Column algebra — no shuffle)
    q = text.quality_features(df, text_col, id_col)
    ok_q = q.filter(
        (F.col("n_tokens") >= cfg.min_tokens)
        & (F.col("n_tokens") <= cfg.max_tokens)
        & (F.col("digit_ratio") <= cfg.max_digit_ratio)
    ).select("id")

    # 2. language gate
    lang = text.lang_id(df, text_col, id_col).select(
        "id", F.col("pred_lang").alias("lang")
    )
    ok_l = lang.filter(F.col("lang").isin(cfg.langs))

    kept = (
        df.join(ok_q.withColumnRenamed("id", id_col), id_col, "leftsemi")
        .join(ok_l.withColumnRenamed("id", id_col).select(id_col), id_col, "leftsemi")
    )
    # The gated corpus feeds FOUR downstream branches (exact-dedup groupBy,
    # its hash anti-join, the minhash pipeline, the final anti-joins).
    # Catalyst's ReusedExchange usually dedups the scans, but when reuse
    # doesn't fire each branch would re-run the quality/lang gates against
    # the source — persist pins the single-pass guarantee the module
    # docstring makes. MEMORY_AND_DISK: at corpus scale the gated set
    # spills to executor-local disk rather than evicting mid-job; still
    # lazy (first action populates), so plan-only callers pay nothing.
    # Lifetime: the cache entry lives until the session ends (the caller
    # can't unpersist what it can't see) — a long-lived driver preparing
    # MANY corpora should spark.catalog.clearCache() between runs.
    # 2b. optional blocklist gate (C4 semantics: any hit drops the doc) —
    # before the persist so the cached corpus is already clean, and
    # before dedup so a blocked canonical can't shadow a clean near-dup.
    # The hit stream reads the RAW source (blocking is per-doc, indifferent
    # to the other gates) and anti-joins ids, so the quality/lang join
    # subtree above is NOT replicated into a self-join — term_filter's
    # zero-restoration pass would triple the pre-persist plan
    if cfg.blocklist:
        bad = (
            text._term_hit_stream(df, text_col, id_col, cfg.blocklist)
            .select("id")
            .distinct()
        )
        kept = kept.join(
            bad.withColumnRenamed("id", id_col), id_col, "left_anti"
        )

    # 2c. optional per-domain cap — on the GATED corpus (cap slots are not
    # wasted on junk the earlier stages drop) and before the persist so
    # the cached set is already capped. Deterministic md5-ordered keep;
    # the salted two-level window never funnels a hot domain into one task
    if cfg.domain_cap is not None:
        from rtstore_spark.operators import web

        if cfg.domain_from_url is not None:
            # derive the cap's grouping key as the URL's registrable
            # domain (exact PSL when domain_psl names a rule source) —
            # so every subdomain of one registrant shares one cap slot
            kept = web.with_registrable_domain(
                kept, cfg.domain_from_url,
                rules=cfg.domain_psl, out_col=cfg.domain_col,
            )
        kept = web.domain_frequency_cap(
            kept, cfg.domain_col, id_col, cfg.domain_cap
        ).drop("domain_rank")

    # 2d. optional cross-run seen-gate: Bloom probe of each doc's text md5
    # against prior runs' filter (cfg.seen_filter). Before the persist so
    # the cached set is already history-clean, and before this run's own
    # dedup so a historical repeat can't become a duplicate group's
    # canonical. The same md5 key as stage 3, so "same document" means
    # the same thing within a run and across runs.
    if cfg.seen_filter is not None:
        from rtstore_spark.operators.sketches import bloom_contains

        # probe md5s from the RAW (post-normalize) source, not from
        # ``kept``: deriving the probe set from kept would replicate the
        # un-persisted quality/lang/blocklist/cap subtree into a self-join
        # (executing it twice before the persist). Probing a superset of
        # ids is harmless — the left_anti join only ever removes rows.
        seen_fp = (
            bloom_contains(
                cfg.seen_filter,
                df.select(F.md5(F.col(text_col)).alias("_fp")),
                "_fp",
            )
            .filter(F.col("might_contain"))
            .select(F.col("item").alias("_fp"))
        )
        kept = (
            kept.withColumn("_fp", F.md5(F.col(text_col)))
            .join(seen_fp, "_fp", "left_anti")
            .drop("_fp")
        )

    from pyspark import StorageLevel

    # the tap sits UNDER the persist: the cached plan includes the metrics
    # node, so the count fires exactly once (at cache materialization) and
    # later re-reads of the cache don't re-observe
    kept = _tap(kept, "gated").persist(StorageLevel.MEMORY_AND_DISK)
    if seen_state is not None:
        # fingerprints of the stage-2d text form, off the persisted cache
        seen_state.fingerprints = kept.select(
            F.md5(F.col(text_col)).alias("fp")
        )

    # 3. exact dedup: keep the lowest id per canonical text (the full text
    # never shuffles — the md5 is the groupBy key)
    keeps = dedup.exact_dedup(kept, text_col, id_col)
    hashes = kept.select(
        F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col)
    )
    drop_exact = (
        hashes.join(keeps, "text_hash")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(id_col)
    )
    kept = _tap(kept.join(drop_exact, id_col, "left_anti"), "exact_dedup")
    if audit is not None:
        # fire the three early taps with a real action BEFORE the near-dup
        # stage's internal localCheckpoints traverse them metric-less (see
        # PrepAudit); also materializes the persisted gated cache
        kept.count()

    # 3b. optional paragraph-granular dedup: rewrites text in place, so it
    # runs after exact dedup (whole-doc dups are gone — cheaper) and
    # before near-dup (minhash sees boilerplate-free text). Docs whose
    # every paragraph was boilerplate end up empty and are dropped.
    if cfg.dedup_paragraphs:
        kept = dedup.dedup_paragraphs(kept, text_col, id_col).drop(
            "n_paragraphs", "n_dropped"
        )
        kept = kept.filter(F.length(F.trim(F.col(text_col))) > 0)

    # 3c. optional exact substring dedup (Lee et al. 2022 keep-one
    # removal): cuts every corpus-wide repeat >= substring_dedup_tokens
    # tokens from all but its canonical occurrence. After paragraph dedup
    # (coarser structure first) and before near-dup for the same reason
    # as 3b: minhash signatures see repeat-free text. Docs whose every
    # token sat in removed spans come back empty and are dropped.
    if cfg.substring_dedup_tokens is not None:
        kept = _strip_span_stats(
            kept,
            lambda d: dedup.substring_dedup(
                d, text_col, id_col, span_tokens=cfg.substring_dedup_tokens
            ),
        )
        kept = kept.filter(F.length(F.trim(F.col(text_col))) > 0)

    # 3d. optional benchmark decontamination: cut eval-set collisions
    # before near-dup/sampling so no contaminated text can become a
    # cluster survivor. Wholly-contaminated docs end up empty → dropped.
    if cfg.decontaminate_against is not None:
        kept = _strip_span_stats(
            kept,
            lambda d: dedup.decontaminate(
                d,
                cfg.decontaminate_against,
                text_col,
                id_col,
                bench_text_col=cfg.decontaminate_text_col,
                span_tokens=cfg.decontaminate_tokens,
            ),
        )
        kept = kept.filter(F.length(F.trim(F.col(text_col))) > 0)

    # 4. near dedup on the survivors
    drop_near = dedup.minhash_dedup(
        kept, text_col, id_col, threshold=cfg.near_dup_threshold
    ).select(F.col("drop_id").alias(id_col))
    kept = _tap(kept.join(drop_near, id_col, "left_anti"), "near_dedup")

    # 4.5 optional LM perplexity gate (CCNet-style): drop documents whose
    # bigram-LM cross-entropy exceeds the cutoff. Runs after dedup so the
    # LM join scores each surviving doc once; with no explicit model the
    # fit sees the deduped corpus, so boilerplate mass can't drag the
    # probability estimates toward itself. NOTE: a self-fit (lm_model=None)
    # is necessarily EAGER — lm_fit's vocabulary total is an action, so
    # the gate+dedup stages execute here, not at the caller's action; pass
    # a pre-fit lm_model to keep plan construction fully lazy.
    if cfg.lm_max_cross_entropy is not None:
        from rtstore_spark.operators import lm as lm_ops

        model = cfg.lm_model or lm_ops.lm_fit(kept, text_col)
        kept = _tap(
            lm_ops.lm_filter(
                kept, model, text_col, id_col,
                max_cross_entropy=cfg.lm_max_cross_entropy,
            ),
            "lm_gate",
        )

    # 4b. trained quality-classifier gate — the fastText-style filter
    # (operators/quality_classifier.py): JVM-side scoring, so the gate is
    # one more map-side transform on the already-gated subset
    if cfg.quality_model is not None:
        from rtstore_spark.operators.quality_classifier import quality_filter

        # NOTE: the model must carry no training summary (quality_fit
        # clears it) — a summary pins the training SparkSession inside
        # the serialized prediction UDF, which breaks any plan carrying
        # the audit's Observation nodes
        kept = _tap(
            quality_filter(
                cfg.quality_model, kept,
                threshold=cfg.quality_threshold,
                pareto_alpha=cfg.quality_pareto_alpha,
                text_col=text_col,
            ).drop("quality_prob"),
            "quality_model_gate",
        )

    # 5. deterministic sampling (uniform or per-language). The pipeline's
    # own lang-id prediction is the authoritative annotation: a
    # pre-existing `lang` column on the input (common in crawled corpora)
    # is dropped rather than colliding with the join below.
    if "lang" in kept.columns:
        kept = kept.drop("lang")
    if isinstance(cfg.sample_fractions, dict):
        kept = kept.join(
            ok_l.withColumnRenamed("id", id_col), id_col
        )  # need lang col
        kept = stratified_sample(
            kept, id_col, cfg.sample_fractions,
            strata_col="lang", seed=cfg.sample_seed,
        )
    elif cfg.sample_fractions < 1.0:
        kept = stratified_sample(
            kept, id_col, cfg.sample_fractions, seed=cfg.sample_seed
        )
        kept = kept.join(ok_l.withColumnRenamed("id", id_col), id_col)
    else:
        kept = kept.join(ok_l.withColumnRenamed("id", id_col), id_col)

    # 6. optional PII scrub — in place, so downstream stages (chunking,
    # writes) only ever see redacted text; the ordering/placeholder
    # convention is text._pii_scrub_chain's, shared with pii_scrub
    if cfg.scrub_pii:
        kept = kept.withColumn(text_col, text.pii_scrub_expr(F.col(text_col)))

    # 7. optional chunking — output rows become (id, chunk_idx,
    # chunk_text, n_tokens); doc-level columns end here by design
    if cfg.chunk_max_tokens:
        kept = text.chunk_documents(
            kept, text_col, id_col,
            max_tokens=cfg.chunk_max_tokens, overlap=cfg.chunk_overlap,
        )
    return _tap(kept, "final")


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    token_col: str | None = None,
    text_col: str | None = None,
    shard_tokens: int = 100_000_000,
    n_shards: int | None = None,
    seed: str = "shards",
    audit: PrepAudit | None = None,
) -> dict:
    """Stage 8 — write the prepared corpus as fixed-budget training shards.

    Each document is assigned to shard ``md5(seed, id) mod n_shards`` —
    deterministic (same corpus + seed ⇒ byte-identical sharding on any
    cluster), and a pure projection: no global sort, no sequential
    packing. ``n_shards`` defaults to ``ceil(total_tokens /
    shard_tokens)`` from one tiny aggregate; hash placement concentrates
    per-shard token mass around the target (CLT over doc lengths — the
    same trade ``mixture_sample`` documents) instead of exact-packing,
    which would need a single-task running sum over the corpus.

    Token counts come from ``token_col`` if given, else a whitespace
    token count of ``text_col``. Output layout: ``shard=N/`` partition
    directories, ONE file per shard (each shard is repartition-owned by
    exactly one task — the file count is the shard count, not
    tasks × shards). The hash also serves as a reproducible global
    shuffle: shard membership and within-shard order are independent of
    the input's arrival order, which is what "shuffle the corpus before
    training" actually requires.

    Returns ``{"n_shards", "total_tokens", "mean_tokens_per_shard"}`` —
    plus ``"audit"`` (the per-stage yield counts) when the ``PrepAudit``
    that observed the upstream ``prepare_corpus`` is passed in: the
    export's own actions fire the remaining observation taps, so the
    operational report a 100-TB prep run reads comes out of the SAME
    write, with no extra corpus scans.
    """
    if (token_col is None) == (text_col is None):
        raise ValueError("pass exactly one of token_col / text_col")
    tokens = (
        F.col(token_col).cast("long")
        if token_col
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    )
    total = df.select(tokens.alias("t")).agg(F.sum("t").alias("s")).collect()[0]["s"] or 0
    if n_shards is None:
        n_shards = max(1, -(-int(total) // shard_tokens))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hcol = "__shard_h"  # collision-safe: a caller's '_h' must survive
    (
        df.withColumn(hcol, h)
        .withColumn("shard", F.col(hcol) % n_shards)
        .repartition(n_shards, "shard")
        # WITHIN-shard order sorts on the hash (id tiebreak for the
        # astronomically-unlikely collision): sorting on shard alone would
        # leave row order at the mercy of input partitioning — not the
        # byte-identical reproducibility promised — and sorting on the id
        # would undo the shuffle the hash placement provides
        .sortWithinPartitions("shard", hcol, id_col)
        .drop(hcol)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    out = {
        "n_shards": int(n_shards),
        "total_tokens": int(total),
        "mean_tokens_per_shard": int(total // n_shards),
    }
    if audit is not None:
        out["audit"] = audit.counts()
    return out


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_tokens: int = 2048,
    n_buckets: int = 256,
    seed: str = "pack",
    sep: str = "\n\n",
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences.

    The step between a prepared corpus and a tokenizer: concatenate
    documents into sequences of at most ``seq_tokens`` whitespace tokens,
    preserving document boundaries as metadata, so downstream
    tokenization sees dense near-budget examples instead of one padded
    example per (mostly short) document.

    Packing is inherently sequential — a running token total decides
    where each sequence ends — so a *global* pack would be one task over
    the corpus. Instead documents are hash-assigned to ``n_buckets``
    independent streams (same ``md5(seed, id)`` idiom as
    ``export_training_shards``) and each bucket packs greedily in id
    order. Buckets run in parallel and the whole layout is a pure
    function of (corpus, seed, n_buckets, seq_tokens): Spark's input
    partitioning never leaks into the result, because the single
    repartition keys on the bucket and the in-bucket order is a sort.
    Packing state per bucket is O(seq_tokens) strings — executors never
    hold more than one open sequence per bucket.

    Documents longer than ``seq_tokens`` are split: full-budget pieces
    become their own sequences and the tail joins the bucket's open
    accumulation (run ``chunk_documents`` first if you need overlap or
    smarter boundaries). Token totals are conserved exactly — ``sep``
    (default blank line) is whitespace, so joining never adds tokens.

    Returns (seq_id, bucket, n_docs, n_tokens, doc_ids, text) with
    ``seq_id = "<bucket>-<index within bucket>"`` and ``doc_ids`` keeping
    the caller's id type (split docs appear once per piece).
    """
    import pandas as pd
    from pyspark.sql import types as T

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    src = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("text"),
            bucket.cast("int").alias("bucket"),
        )
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", "id")
    )
    schema = T.StructType(
        [
            T.StructField("seq_id", T.StringType()),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("n_docs", T.IntegerType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("doc_ids", T.ArrayType(df.schema[id_col].dataType)),
            T.StructField("text", T.StringType()),
        ]
    )

    def packer(batches):
        # Per-bucket open-sequence state. A partition holds whole buckets
        # (repartition hashes on bucket alone) but may see several, and a
        # bucket's rows may span Arrow batches — state lives outside the
        # batch loop, keyed by bucket, flushed once at iterator end.
        state: dict[int, dict] = {}
        out_rows: list[tuple] = []

        def flush(b):
            st = state[b]
            if not st["ids"]:
                return
            out_rows.append(
                (
                    f"{b}-{st['n_seq']}",
                    b,
                    len(st["ids"]),
                    st["ntok"],
                    list(st["ids"]),
                    sep.join(st["texts"]),
                )
            )
            st["n_seq"] += 1
            st["ids"], st["texts"], st["ntok"] = [], [], 0

        def emit(b, ids, texts, ntok):
            st = state[b]
            out_rows.append(
                (f"{b}-{st['n_seq']}", b, len(ids), ntok, ids, sep.join(texts))
            )
            st["n_seq"] += 1

        def to_pdf(rows):
            return pd.DataFrame(
                rows,
                columns=["seq_id", "bucket", "n_docs", "n_tokens", "doc_ids", "text"],
            )

        for pdf in batches:
            for i, t, b in zip(pdf["id"], pdf["text"], pdf["bucket"]):
                b = int(b)
                st = state.setdefault(
                    b, {"n_seq": 0, "ids": [], "texts": [], "ntok": 0}
                )
                toks = (t or "").split()
                if not toks:
                    continue
                # oversize doc: flush the open sequence, emit full-budget
                # pieces alone, keep the tail as the next accumulation seed
                while len(toks) > seq_tokens:
                    flush(b)
                    piece, toks = toks[:seq_tokens], toks[seq_tokens:]
                    emit(b, [i], [" ".join(piece)], seq_tokens)
                if st["ntok"] + len(toks) > seq_tokens:
                    flush(b)
                    st = state[b]
                st["ids"].append(i)
                st["texts"].append(t if len(toks) == len((t or "").split()) else " ".join(toks))
                st["ntok"] += len(toks)
            if out_rows:
                yield to_pdf(out_rows)
                out_rows = []
        for b in sorted(state):
            flush(b)
        if out_rows:
            yield to_pdf(out_rows)

    return src.mapInPandas(packer, schema=schema)


def corpus_seen_filter(
    df: DataFrame, text_col: str, nbits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """The carry-forward dedup state of a prepared corpus: a Bloom rollup
    of text md5s, sized nbits (~10 bits per expected document across ALL
    runs for ~1% false-positive rate). Persist it next to the corpus;
    feed it to the next run as ``CorpusPrepConfig.seen_filter`` —
    OR-merging several runs' filters (``sketches.bloom_merge``) is
    byte-identical to building one over their union, so shards compose.

    CONTRACT: the next run's seen-gate probes md5s of the STAGE-2d text
    form. Fingerprinting a prepare_corpus OUTPUT here is only correct
    when no text-rewriting stage ran (``dedup_paragraphs``, ``scrub_pii``
    and ``chunk_max_tokens`` all off) — otherwise the stored fingerprints
    are of rewritten text and every cross-run repeat probes False. With
    any of those stages on, capture the state with ``SeenState`` (which
    prepare_corpus populates at the probe point) instead of this
    function."""
    from rtstore_spark.operators.sketches import bloom_rollup

    return bloom_rollup(
        df.select(F.md5(F.col(text_col)).alias("fp")),
        "fp",
        by=[],
        nbits=nbits,
        k=k,
    )


def save_seen_filter(filter_df: DataFrame, path: str) -> int:
    """Durably advance the cross-run seen state — the storage plane's
    manifest-pointer protocol, because this file is MUTATED by every prep
    run and a torn write would silently disable (or corrupt) the dedup
    gate for all future runs.

    Protocol: merge the given filter with the currently-committed
    generation (Bloom OR — byte-identical to building one filter over the
    union of runs), write the result to a fresh uniquely-named
    ``<path>/gen-N-<nonce>`` directory, then atomically overwrite the
    tiny ``<path>/_current`` pointer with the directory name. A crash
    between the data write and the flip leaves an orphan generation
    ``load_seen_filter`` never reads — the previous state stays live, the
    run is simply re-run, and the orphan is swept by the next successful
    save. After the flip, all generations except the new one and its
    immediate predecessor are swept (grace-of-one, so a lazily-held
    reader of the previous state still evaluates).
    Returns the committed generation number.

    SINGLE WRITER: like every manifest-pointer mutation in this engine
    (store rewrites, ``write_pq_index``), concurrent saves against one
    ``path`` are a lost-update hazard — two runs that both read gen N
    would each OR their own fingerprints into a gen N+1 and the last flip
    would discard the other's. Two backstops make the race loud instead
    of silent: every attempt writes into its OWN uniquely-suffixed
    generation directory (``gen-<N+1>-<nonce>`` — racers can never
    clobber each other's files), and the pointer is re-read immediately
    before the flip so a conflicting advance raises ``RuntimeError``
    (the run that lost re-runs its save against the new state). A
    flip-vs-flip photo finish can still lose the slower writer's rows —
    serialize prep runs per seen-state path rather than relying on the
    backstops.
    """
    from rtstore_spark.operators.sketches import bloom_merge
    from rtstore_spark.store.fs import (
        begin_generation,
        commit_generation,
        fs_for,
    )

    spark = filter_df.sparkSession
    fs = fs_for(path, spark)
    gen, prev_dir, new_dir = begin_generation(fs, path)
    if gen:
        prev = spark.read.parquet(f"{path}/{prev_dir}")
        both = prev.unionByName(filter_df)
        # ORing two filters is only meaningful at ONE (nbits, k): a
        # mismatched config would interleave word rows of two different
        # geometries into state that probes wrong positions forever after
        cfgs = both.select("nbits", "k").distinct().collect()
        if len(cfgs) > 1:
            raise ValueError(
                f"save_seen_filter: committed state at {path} uses "
                f"(nbits, k) = {(int(cfgs[0]['nbits']), int(cfgs[0]['k']))}-style "
                f"configs {sorted((int(r['nbits']), int(r['k'])) for r in cfgs)}; "
                "Bloom state is only valid at one config — rebuild with "
                "matching nbits/k"
            )
        filter_df = bloom_merge(both, by=[])
    # long-form rollup: ≤ nbits/64 rows (~16k at the 1M-bit default).
    # The directory name (from begin_generation) carries a per-attempt
    # nonce so a concurrent save that picked the same generation number
    # writes somewhere ELSE — the loser's files are never clobbered.
    filter_df.coalesce(1).write.mode("overwrite").parquet(f"{path}/{new_dir}")
    # conflict backstop + flip + grace-of-one sweep (the shared manifest
    # protocol, store.fs.commit_generation): the predecessor survives one
    # save so a reader that loaded the seen state just before this save
    # (lazy plans hold file references) still evaluates.
    commit_generation(
        fs, path, gen, new_dir, op="save_seen_filter", keep=(prev_dir,)
    )
    return gen + 1


def load_seen_filter(spark, path: str) -> DataFrame | None:
    """The committed seen state from ``save_seen_filter`` (None before the
    first commit) — pass as ``CorpusPrepConfig.seen_filter``. Orphan
    ``gen-*`` directories a crashed save left behind are ignored: only
    the generation the ``_current`` pointer names is live."""
    from rtstore_spark.store.fs import fs_for, parse_gen_pointer

    cur = fs_for(path, spark).read_text(f"{path}/_current")
    _, live_dir = parse_gen_pointer(cur)
    if live_dir is None:
        return None
    return spark.read.parquet(f"{path}/{live_dir}")
