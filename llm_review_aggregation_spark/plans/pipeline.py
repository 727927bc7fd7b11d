"""End-to-end KG-construction pipeline: pages -> triples.

Stage graph (SURVEY §7.1); every stage checkpoints through plans/lineage.py
when a work_dir is given, and a re-run resumes from the last complete stage.

    E1 extract      docs(url, group_id, text)
    E2 segment      sentences(url, group_id, sent_id, sentence, tokens)
    E3 mine         phrase vocab artifact + candidates(term, count)
    E4 detect       aspects(term, count, prob)
    E5 link         synsets(concept, member, count)  [driver-exact <=512 terms,
                                                      label propagation above]
    E6 relate       meronym_scores + ontology_edges(subj, pred, obj, score)
    E7 opine        arguments(group_id, aspect, polarity, strength, ...)
    materialize     triples = ontology_edges  UNION  per-group opinion edges
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_review_aggregation_spark.config import DEFAULT_CONFIG, PipelineConfig
from llm_review_aggregation_spark.functions import cleaning, embeddings, mining, scoring, tokenize
from llm_review_aggregation_spark.operators import argumentation, aspects as aspects_ops
from llm_review_aggregation_spark.operators import concepts as concepts_ops
from llm_review_aggregation_spark.operators import relations as relations_ops
from llm_review_aggregation_spark.plans.lineage import EphemeralStore, StageStore


@dataclass
class PipelineResult:
    docs: DataFrame
    sentences: DataFrame
    candidates: DataFrame
    aspects: DataFrame
    synsets: DataFrame
    ontology_edges: DataFrame
    arguments: DataFrame
    triples: DataFrame
    root_name: str
    tree_edges: dict[str, str]
    synset_map: dict[str, list[str]]

    def release(self) -> None:
        """Unpersist the pipeline's cached intermediates (`sentences` feeds
        7 downstream passes and is cached for the run's duration). Callers
        that run pipelines repeatedly in one long-lived session — exactly
        what `__spark_entry__.queries()` and bench.py do — must call this
        (or use the result as a context manager) once they've materialized
        what they need, or cached blocks accumulate across runs. Idempotent;
        the result's DataFrames stay valid afterwards, they just recompute
        instead of hitting the cache."""
        lvl = self.sentences.storageLevel
        if lvl.useMemory or lvl.useDisk:
            self.sentences.unpersist()

    def __enter__(self) -> "PipelineResult":
        return self

    def __exit__(self, *exc) -> bool:
        self.release()
        return False


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    work_dir: str | None = None,
    resume: bool = True,
    bucket_triples: int | None = None,
    auto_salt: bool = False,
) -> PipelineResult:
    """``bucket_triples=N`` writes the triples checkpoint hash-bucketed (and
    sorted) on `subj` into N buckets (requires work_dir, parquet format):
    the graph table's hot consumers — per-subject rollups, subj-keyed
    self-joins, triples x entity-attribute joins — then plan WITHOUT an
    Exchange on the triples side (asserted in tests/test_bucketing.py).
    One shuffle at materialize time buys shuffle-free repeated reads; the
    reference's analog is the Postgres index its join queries lean on
    (db/manager.py:321-326).

    ``auto_salt=True`` (requires work_dir) turns the lineage skew metric
    into an automatic action on resume: stages a PREVIOUS run's lineage
    flags via plans/lineage.skew_advice re-run with a remediation instead
    of being skipped-as-complete —

    - ``candidates`` (the one aggregate stage with a salted twin) re-runs
      through functions/mining.count_noun_terms_salted, the two-stage
      salted count from operators/skew;
    - any other flagged stage re-runs with an explicit balanced
      repartition before its checkpoint write, evening out the partition
      layout downstream scans read.

    Both remediations are row-identical to the plain stage (tested in
    tests/test_auto_salt.py), so downstream completed checkpoints stay
    valid and are still resumed."""
    bucket_spec = {"triples": ("subj", bucket_triples)} if bucket_triples else None
    store = (
        StageStore(spark, work_dir, table_format=cfg.table_format, bucket_spec=bucket_spec)
        if work_dir
        else EphemeralStore(spark)
    )
    flagged: set[str] = set()
    if auto_salt and work_dir:
        from llm_review_aggregation_spark.plans.lineage import skew_advice

        try:
            flagged = {a["stage"] for a in skew_advice(store.metrics())}
        except Exception:
            flagged = set()  # first run: no lineage to consult yet

    def run_stage(name, fn, salted_fn=None, resume_stage: bool | None = None):
        """StageStore.run_table with the auto-salt remediation wired in:
        a flagged stage ignores its complete checkpoint and re-runs via its
        salted twin (if registered) or a balanced-repartition rewrite."""
        if name in flagged:
            remedied = salted_fn or (
                lambda: fn().repartition(spark.sparkContext.defaultParallelism)
            )
            return store.run_table(name, remedied, resume=False)
        return store.run_table(name, fn, resume if resume_stage is None else resume_stage)

    entity_scorer, relation_scorer, sentiment_scorer = scoring.make_scorers(cfg.scorer, cfg.scorer_params)

    # E1/E2 ---------------------------------------------------------------
    docs = run_stage("docs", lambda: cleaning.extract_docs(pages))
    # Ephemeral (no work_dir): E1+E2 run FUSED straight from pages — the
    # cleaned text crosses the Arrow boundary once instead of chaining two
    # Python runners (tokenize.segment_pages; byte-identical semantics,
    # differential-tested). With a work_dir the docs checkpoint already
    # holds the cleaned text, so segmenting reads it instead of re-cleaning.
    if work_dir:
        sentences = run_stage("sentences", lambda: tokenize.segment_sentences(docs))
    else:
        sentences = run_stage("sentences", lambda: tokenize.segment_pages(pages))
    sentences.cache()

    # E3 --------------------------------------------------------------------
    pairs = store.run_artifact(
        "phrase_vocab",
        lambda: sorted(mining.build_phrase_vocab(sentences, cfg.phrase_min_count, cfg.phrase_threshold)),
        resume,
    )
    pair_set = {tuple(p) for p in pairs}
    candidates = run_stage(
        "candidates",
        lambda: mining.top_candidates(
            mining.count_noun_terms(sentences, pair_set), cfg.n_candidate_aspects
        ),
        salted_fn=lambda: mining.top_candidates(
            mining.count_noun_terms_salted(sentences, pair_set), cfg.n_candidate_aspects
        ),
    )

    # E4 --------------------------------------------------------------------
    aspects_df = run_stage(
        "aspects",
        lambda: aspects_ops.extract_aspects(sentences, candidates, entity_scorer, cfg.entity_prob_threshold),
    )

    # E5 --------------------------------------------------------------------
    def _cluster():
        rows = aspects_df.orderBy(F.desc("count"), F.asc("term")).limit(cfg.top_k_aspects_to_keep).collect()
        counts = {r["term"]: r["count"] for r in rows}
        if not counts:
            return {"root": None, "synset_counts": {}, "synsets": {}}
        root_name = cfg.root_name or next(iter(counts))
        if root_name not in counts:
            counts = {root_name: 0, **counts}
        if len(counts) > cfg.max_driver_cluster_terms:
            # scale path: distributed PPMI + sparse-cosine edges +
            # label-propagation connected components (no driver n^2)
            from llm_review_aggregation_spark.operators import canonicalize

            synset_counts, synsets = canonicalize.cluster_synsets_scale(
                spark,
                sentences,
                counts,
                root_name,
                cfg.similarity_threshold,
                num_levels=cfg.num_clustering_levels,
                window=cfg.embedding_window,
            )
        else:
            builders = {
                "ppmi": embeddings.build_similarity_model,
                "word2vec": embeddings.build_word2vec_similarity_model,
                "fasttext": embeddings.build_fasttext_similarity_model,
            }
            if cfg.embedding_backend not in builders:
                raise ValueError(f"unknown embedding_backend {cfg.embedding_backend!r}")
            kwargs = dict(cfg.embedding_params)
            kwargs.setdefault("window", cfg.embedding_window)
            sim = builders[cfg.embedding_backend](
                sentences, list(counts), topn=cfg.rcs_topn, **kwargs
            )
            synset_counts, synsets = concepts_ops.cluster_synsets(
                root_name, counts, sim, cfg.similarity_threshold, cfg.num_clustering_levels
            )
        return {"root": root_name, "synset_counts": synset_counts, "synsets": synsets}

    concept_art = store.run_artifact("concepts", _cluster, resume)
    root_name = concept_art["root"]
    if root_name is None:
        # degenerate corpus (no aspects survived): emit empty, well-typed outputs
        empty = {
            "synsets": spark.createDataFrame([], "concept string, member string, count long"),
            "edges": spark.createDataFrame([], "subj string, pred string, obj string, score double"),
            "arguments": spark.createDataFrame(
                [],
                "group_id string, aspect string, polarity boolean, strength double, "
                "strongest_support_phrase string, strongest_attack_phrase string, "
                "strongest_support_feature string, strongest_attack_feature string",
            ),
        }
        return PipelineResult(
            docs=docs,
            sentences=sentences,
            candidates=candidates,
            aspects=aspects_df,
            synsets=empty["synsets"],
            ontology_edges=empty["edges"],
            arguments=empty["arguments"],
            triples=empty["edges"],
            root_name="",
            tree_edges={},
            synset_map={},
        )
    synset_counts = {k: int(v) for k, v in concept_art["synset_counts"].items()}
    synset_map = {k: list(v) for k, v in concept_art["synsets"].items()}

    synsets_rows = [(c, m, synset_counts[c]) for c, ms in synset_map.items() for m in ms]
    synsets_df = run_stage(
        "synsets",
        lambda: spark.createDataFrame(synsets_rows, "concept string, member string, count long"),
    )

    # E6 --------------------------------------------------------------------
    concepts_list = list(synset_counts)
    meronym_scores = run_stage(
        "meronym_scores",
        lambda: relations_ops.accumulate_meronym_scores(sentences, concepts_list, synset_map, relation_scorer),
    )
    ontology_edges = run_stage(
        "ontology_edges",
        lambda: relations_ops.build_ontology_edges(
            spark, meronym_scores, concepts_list, synset_counts, root_name
        ),
    )
    tree_edges = {r["subj"]: r["obj"] for r in ontology_edges.collect()}

    # E7 --------------------------------------------------------------------
    tree_nodes = set(tree_edges) | set(tree_edges.values()) | {root_name}
    glossary = {n: synset_map.get(n, [n]) for n in tree_nodes}
    # E7's cogroup needs one (group_id) row per document, nothing else —
    # derive it straight from pages (url regex, no clean_text UDF) so the
    # lazy/ephemeral path never recomputes E1 text extraction for it
    doc_groups = cleaning.extract_doc_groups(pages)
    arguments = run_stage(
        "arguments",
        lambda: argumentation.extract_arguments(
            spark,
            sentences,
            doc_groups,
            tree_edges,
            root_name,
            glossary,
            sentiment_scorer,
            cfg.sentiment_threshold,
            cfg.phrase_max_words,
        ),
    )

    # materialize graph ------------------------------------------------------
    def _triples():
        opinion = arguments.select(
            F.col("group_id").alias("subj"),
            F.lit("hasAspectOpinion").alias("pred"),
            F.col("aspect").alias("obj"),
            F.when(F.col("polarity"), F.col("strength")).otherwise(-F.col("strength")).alias("score"),
        )
        return ontology_edges.select("subj", "pred", "obj", "score").unionByName(opinion)

    triples = run_stage("triples", _triples)

    return PipelineResult(
        docs=docs,
        sentences=sentences,
        candidates=candidates,
        aspects=aspects_df,
        synsets=synsets_df,
        ontology_edges=ontology_edges,
        arguments=arguments,
        triples=triples,
        root_name=root_name,
        tree_edges=tree_edges,
        synset_map=synset_map,
    )
