"""E7 — argumentation: sentences + ontology tree -> per-(group, aspect)
scored opinion rows (the `arguments` table).

The reference builds one Python Framework per product and re-runs BERT per
group (arg_framework/run.py:120-122 — its main scalability cliff). This
engine scores every phrase once, then expresses the whole QBAF/DF-QuAD
computation as grouped aggregations + per-tree-depth joins:

    sentences --T6--> phrases --T9 glossary match--> (phrase, node) spans
      --M3 scorer--> sentiments
      --A8: per-(phrase,node) max-abs vote > 0.95-->  phrase_votes
      --per-(review,node) max-abs -> sign-->          review_votes
      --A9: depth-iterated ancestor augmentation-->   augmented votes
      --A10-A12: per-(group,node) sums, polarity, supporter/attacker-->
      --A13-A14: DF-QuAD bottom-up by depth, product in log-space-->
      --A16/A17: windowed top-k strongest phrases / features-->
    arguments(group_id, aspect, polarity, strength, ...)

Semantics follow arg_framework/review.py:68-98 (votes), framework.py:137-240
(QBAF + DF-QuAD), framework.py:312-345 (best phrases), run.py:37-93 (output
shape). Reference list-order ties are pinned with explicit orderings
(SURVEY §7 R1).

Scale: everything is keyed by (group_id, node); the tree is global and tiny
(<=100 nodes), so depth iteration is O(height) joins over pre-aggregated
per-(group,node) rows — no per-group Python, no driver loops over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from llm_review_aggregation_spark.functions import mining, scoring, tokenize

_WELL_FORMATTED_SQL = r"""^[-a-zA-Z0-9();,./!?'" ]*$"""


def _depths(edges: dict[str, str], root: str) -> dict[str, int]:
    d = {root: 0}
    pending = dict(edges)
    while pending:
        progressed = False
        for c, p in list(pending.items()):
            if p in d:
                d[c] = d[p] + 1
                del pending[c]
                progressed = True
        if not progressed:  # orphaned edges (shouldn't happen in a tree)
            for c in pending:
                d[c] = 1
            break
    return d


def _postorder(edges: dict[str, str], root: str) -> list[str]:
    children: dict[str, list[str]] = {}
    for c, p in sorted(edges.items()):
        children.setdefault(p, []).append(c)
    out: list[str] = []

    def walk(n: str):
        for k in children.get(n, []):
            walk(k)
        out.append(n)

    walk(root)
    return out


def extract_arguments(
    spark,
    sentences: DataFrame,
    docs: DataFrame,
    edges: dict[str, str],
    root: str,
    glossary: dict[str, list[str]],
    sentiment_scorer,
    sentiment_threshold: float = 0.95,
    phrase_max_words: float = 38.4,
) -> DataFrame:
    parents: dict[str, str | None] = {root: None, **edges}
    nodes_post = _postorder(edges, root)
    depths = _depths(edges, root)
    max_depth = max(depths.values()) if depths else 0

    nodes_df = spark.createDataFrame([(n, depths[n]) for n in nodes_post], "node string, depth int")
    edges_df = spark.createDataFrame(
        [(c, p, depths[c]) for c, p in sorted(edges.items())], "child string, parent string, child_depth int"
    )

    # ---- T6 + T9 + M3 ----------------------------------------------------
    phrases = tokenize.segment_phrases(sentences, phrase_max_words)
    matches = mining.match_glossary(phrases, nodes_post, parents, glossary)
    scored = scoring.score_sentiment_instances(matches, sentiment_scorer).cache()

    # number of arg matches per phrase (framework.py: phrase.n_args())
    arg_counts = scored.groupBy("phrase_id").agg(F.count(F.lit(1)).alias("n_args"))

    # ---- A8: phrase-level votes ------------------------------------------
    phrase_votes = (
        scored.filter(F.abs("sentiment") > sentiment_threshold)
        .groupBy("group_id", "url", "phrase_id", "phrase_ord", "phrase", "node")
        .agg(F.expr("max_by(sentiment, struct(abs(sentiment), -start))").alias("vote"))
        .cache()
    )

    # review-level votes: max-abs across phrases, then sign (+/-1)
    review_votes = (
        phrase_votes.groupBy("group_id", "url", "node")
        .agg(F.expr("max_by(vote, struct(abs(vote), -phrase_ord))").alias("raw"))
        .withColumn("vote", F.when(F.col("raw") > 0, F.lit(1.0)).otherwise(F.lit(-1.0)))
        .drop("raw")
    )

    # ---- A9: augment missing ancestors bottom-up --------------------------
    votes = review_votes.localCheckpoint(eager=True)
    for d in range(max_depth - 1, -1, -1):
        level_edges = edges_df.filter(F.col("child_depth") == d + 1)
        child_votes = votes.join(
            F.broadcast(level_edges), votes["node"] == level_edges["child"]
        ).select("group_id", "url", F.col("parent").alias("node"), "vote")
        sums = (
            child_votes.groupBy("group_id", "url", "node")
            .agg(F.sum("vote").alias("s"))
            .filter(F.col("s") != 0)
            .withColumn("vote", F.when(F.col("s") > 0, F.lit(1.0)).otherwise(F.lit(-1.0)))
            .drop("s")
        )
        new = sums.join(votes, ["group_id", "url", "node"], "left_anti")
        votes = votes.union(new).localCheckpoint(eager=True)

    # ---- A10-A12: per-(group,node) sums, polarity, relations --------------
    n_reviews = docs.groupBy("group_id").agg(F.count(F.lit(1)).alias("n_reviews"))
    grid = n_reviews.crossJoin(F.broadcast(nodes_df))
    sums = votes.groupBy("group_id", "node").agg(F.sum("vote").alias("vote_sum"))
    asums = (
        grid.join(sums, ["group_id", "node"], "left")
        .fillna({"vote_sum": 0.0})
        .withColumn("polarity", F.col("vote_sum") >= 0)
        .withColumn(
            "base",
            F.when(
                F.col("node") == root, 0.5 + 0.5 * F.col("vote_sum") / F.col("n_reviews")
            ).otherwise(F.abs(F.col("vote_sum")) / F.col("n_reviews")),
        )
        .cache()
    )

    child_side = asums.select(
        "group_id", F.col("node").alias("child"), F.col("vote_sum").alias("child_sum")
    )
    parent_side = asums.select(
        "group_id", F.col("node").alias("parent"), F.col("vote_sum").alias("parent_sum")
    )
    rels = (
        child_side.join(F.broadcast(edges_df), "child")
        .join(parent_side, ["group_id", "parent"])
        .withColumn(
            "rel",
            F.when(
                ((F.col("parent_sum") >= 0) & (F.col("child_sum") >= 0))
                | ((F.col("parent_sum") < 0) & (F.col("child_sum") < 0)),
                F.lit("sup"),
            ).otherwise(F.lit("att")),
        )
        .select("group_id", "child", "parent", "child_depth", "rel")
        .cache()
    )

    # ---- A13/A14: DF-QuAD strengths, bottom-up by depth --------------------
    eps = 1e-15
    strengths = (
        asums.join(F.broadcast(nodes_df.filter(F.col("depth") == max_depth)), "node")
        .select("group_id", "node", F.col("base").alias("strength"))
        .localCheckpoint(eager=True)
    )
    for d in range(max_depth - 1, -1, -1):
        level = rels.filter(F.col("child_depth") == d + 1)
        contrib = level.join(
            strengths.select("group_id", F.col("node").alias("child"), "strength"),
            ["group_id", "child"],
        )
        combined = contrib.groupBy("group_id", "parent", "rel").agg(
            F.when(F.max("strength") >= 1.0, F.lit(1.0))
            .otherwise(1.0 - F.exp(F.sum(F.log1p(-F.least(F.col("strength"), F.lit(1.0 - eps))))))
            .alias("combined")
        )
        pivoted = (
            combined.groupBy("group_id", "parent")
            .pivot("rel", ["sup", "att"])
            .agg(F.first("combined"))
            .fillna({"sup": 0.0, "att": 0.0})
        )
        level_nodes = nodes_df.filter(F.col("depth") == d)
        base_d = asums.join(F.broadcast(level_nodes), "node").select("group_id", "node", "base")
        stepped = (
            base_d.join(
                pivoted.select("group_id", F.col("parent").alias("node"), "sup", "att"),
                ["group_id", "node"],
                "left",
            )
            .fillna({"sup": 0.0, "att": 0.0})
            .withColumn("delta", F.abs(F.col("att") - F.col("sup")))
            .withColumn(
                "strength",
                F.when(F.col("att") > F.col("sup"), F.col("base") - F.col("base") * F.col("delta"))
                .when(F.col("att") < F.col("sup"), F.col("base") + (1.0 - F.col("base")) * F.col("delta"))
                .otherwise(F.col("base")),
            )
            .select("group_id", "node", "strength")
        )
        strengths = strengths.union(stepped).localCheckpoint(eager=True)

    # ---- A17: strongest supporting/attacking subfeature --------------------
    feat = rels.join(
        strengths.select("group_id", F.col("node").alias("child"), "strength"),
        ["group_id", "child"],
    )
    best_feats = (
        feat.groupBy("group_id", "parent")
        .agg(
            F.expr("max_by(child, struct(strength, child)) FILTER (WHERE rel = 'sup')").alias(
                "strongest_support_feature"
            ),
            F.expr("max_by(child, struct(strength, child)) FILTER (WHERE rel = 'att')").alias(
                "strongest_attack_feature"
            ),
        )
        .withColumnRenamed("parent", "node")
    )

    # ---- A16: strongest phrases (n_args == 1, well-formatted, top-5) -------
    pool = (
        phrase_votes.join(arg_counts, "phrase_id")
        .filter((F.col("n_args") == 1) & F.col("phrase").rlike(_WELL_FORMATTED_SQL))
        .select("group_id", "node", "phrase", "phrase_ord", "vote")
    )
    w_sup = Window.partitionBy("group_id", "node").orderBy(F.desc("vote"), F.asc("phrase_ord"))
    best_sup = (
        pool.filter(F.col("vote") > 0)
        .withColumn("rn", F.row_number().over(w_sup))
        .filter(F.col("rn") <= 5)
        .groupBy("group_id", "node")
        .agg(F.expr("max_by(phrase, struct(length(phrase), -rn))").alias("strongest_support_phrase"))
    )
    w_att = Window.partitionBy("group_id", "node").orderBy(F.asc("vote"), F.asc("phrase_ord"))
    best_att = (
        pool.filter(F.col("vote") < 0)
        .withColumn("rn", F.row_number().over(w_att))
        .filter(F.col("rn") <= 5)
        .groupBy("group_id", "node")
        .agg(F.expr("max_by(phrase, struct(length(phrase), -rn))").alias("strongest_attack_phrase"))
    )

    # ---- assemble ----------------------------------------------------------
    out = (
        asums.select("group_id", "node", "polarity")
        .join(strengths, ["group_id", "node"])
        .join(best_sup, ["group_id", "node"], "left")
        .join(best_att, ["group_id", "node"], "left")
        .join(best_feats, ["group_id", "node"], "left")
        .select(
            "group_id",
            F.col("node").alias("aspect"),
            "polarity",
            "strength",
            "strongest_support_phrase",
            "strongest_attack_phrase",
            "strongest_support_feature",
            "strongest_attack_feature",
        )
    )
    return out
