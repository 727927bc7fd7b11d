"""E7 — argumentation: sentences + ontology tree -> per-(group, aspect)
scored opinion rows (the `arguments` table).

The reference builds one Python Framework per product and re-runs BERT per
group (arg_framework/run.py:120-122 — its main scalability cliff). This
engine scores every phrase once in a single Arrow-batched pass, then runs
the whole QBAF/DF-QuAD computation per group in ONE cogrouped
`applyInPandas` — one shuffle on group_id total:

    sentences --T6--> phrases --T9 glossary match--> (phrase, node) spans
      --M3 scorer--> sentiments                      [distributed, 1 pass]
      --cogroup(docs, scored) by group_id-->         [the only shuffle]
        per group (vectorized pandas):
          A8 phrase/review votes -> A9 ancestor augmentation ->
          A10-A12 sums/polarity/supporter-attacker ->
          A13-A14 DF-QuAD strengths (post-order) ->
          A16/A17 strongest phrases + features
    arguments(group_id, aspect, polarity, strength, ...)

Semantics follow arg_framework/review.py:68-98 (votes), framework.py:137-240
(QBAF + DF-QuAD), framework.py:312-345 (best phrases), run.py:37-93 (output
shape). Reference list-order ties are pinned with explicit orderings
(SURVEY §7 R1).

Scale: the per-group state is bounded — <=100 tree nodes and one product's
matched phrases — so each pandas group is small; AQE skew-join/partition
handling covers pathological groups. The previous implementation expressed
A9/A14 as per-tree-depth DataFrame self-joins; correct, but each depth level
cost a full scheduling round-trip + checkpoint barrier, which dominated wall
time (fixed cost ~x10 the actual compute). The cogroup form has identical
semantics and one shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_review_aggregation_spark import textproc as tp
from llm_review_aggregation_spark.functions import mining, scoring, tokenize  # noqa: F401 (unfused building blocks kept public)

_OUT_SCHEMA = (
    "group_id string, aspect string, polarity boolean, strength double, "
    "strongest_support_phrase string, strongest_attack_phrase string, "
    "strongest_support_feature string, strongest_attack_feature string"
)


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


def _combine(strengths: list[float]) -> float:
    """DF-QuAD combined strength: 1 - prod(1 - s_i) (framework.py:181-194)."""
    prod = 1.0
    for s in strengths:
        prod *= 1.0 - s
    return 1.0 - prod if strengths else 0.0


def _make_per_group(root: str, nodes_post: list[str], children: dict[str, list[str]],
                    edges: dict[str, str], sentiment_threshold: float):
    """Build the cogrouped per-group kernel. Vectorized pandas throughout —
    sorts + drop_duplicates for the max-by votes, a pivot + <=|nodes| column
    ops for ancestor augmentation; only the <=100-node tree walk is scalar."""

    def per_group(key, docs_pdf: pd.DataFrame, scored: pd.DataFrame) -> pd.DataFrame:
        g = key[0]
        n_reviews = len(docs_pdf)
        if n_reviews == 0:
            return pd.DataFrame(
                columns=[
                    "group_id", "aspect", "polarity", "strength",
                    "strongest_support_phrase", "strongest_attack_phrase",
                    "strongest_support_feature", "strongest_attack_feature",
                ]
            )

        n_args = scored.groupby("phrase_id").size() if len(scored) else pd.Series(dtype=int)

        # A8a: per-(url, phrase, node) vote = max-abs sentiment; tie -> min start
        v = scored[scored["sentiment"].abs() > sentiment_threshold]
        if len(v):
            v = v.assign(absv=v["sentiment"].abs()).sort_values(
                ["absv", "start"], ascending=[False, True], kind="mergesort"
            )
            pv = v.drop_duplicates(["url", "phrase_id", "node"]).rename(
                columns={"sentiment": "vote"}
            )[["url", "phrase_id", "phrase_ord", "phrase", "node", "vote"]]
        else:
            pv = pd.DataFrame(columns=["url", "phrase_id", "phrase_ord", "phrase", "node", "vote"])

        # A8b: per-(url, node) review vote = sign of max-abs; tie -> min phrase_ord
        if len(pv):
            rv = pv.assign(absv=pv["vote"].abs()).sort_values(
                ["absv", "phrase_ord"], ascending=[False, True], kind="mergesort"
            ).drop_duplicates(["url", "node"])
            rv = rv.assign(rvote=np.where(rv["vote"] > 0, 1.0, -1.0))[["url", "node", "rvote"]]
        else:
            rv = pd.DataFrame(columns=["url", "node", "rvote"])

        # A9: per-url ancestor augmentation, children-before-parents
        if len(rv):
            piv = rv.pivot(index="url", columns="node", values="rvote").reindex(
                columns=nodes_post
            )
            for n in nodes_post:
                kids = children.get(n, [])
                if not kids:
                    continue
                s = piv[kids].sum(axis=1)
                fill = piv[n].isna() & (s != 0)
                if fill.any():
                    piv.loc[fill, n] = np.sign(s[fill])
            asum = piv.sum(axis=0).reindex(nodes_post).fillna(0.0)
        else:
            asum = pd.Series(0.0, index=nodes_post)

        # A10-A12: polarity, base strengths, supporter/attacker partition
        polar = {n: bool(asum[n] >= 0) for n in nodes_post}
        base = {
            n: (0.5 + 0.5 * asum[n] / n_reviews) if n == root else abs(asum[n]) / n_reviews
            for n in nodes_post
        }
        sup: dict[str, list[str]] = {n: [] for n in nodes_post}
        att: dict[str, list[str]] = {n: [] for n in nodes_post}
        for c, p in edges.items():
            (sup if polar[p] == polar[c] else att)[p].append(c)

        # A13-A14: DF-QuAD, post-order (children precede parents)
        strength: dict[str, float] = {}
        for n in nodes_post:
            a = _combine([strength[c] for c in att[n]])
            s_ = _combine([strength[c] for c in sup[n]])
            b = base[n]
            if a > s_:
                strength[n] = b - b * abs(a - s_)
            elif a < s_:
                strength[n] = b + (1.0 - b) * abs(a - s_)
            else:
                strength[n] = b

        # A17: strongest sub-feature = argmax (strength, name)
        def best_feat(cands: list[str]) -> str | None:
            return max(cands, key=lambda c: (strength[c], c)) if cands else None

        # A16: strongest phrases — single-arg, well-formatted, top-5 by vote,
        # then longest (tie -> earliest of the top-5 ordering)
        best_sup: dict[str, str] = {}
        best_att: dict[str, str] = {}
        if len(pv):
            pool = pv[
                pv["phrase_id"].map(n_args).eq(1)
                & pv["phrase"].map(tp.is_well_formatted)
            ]
            for node, sub in pool.groupby("node"):
                for positive, dest in ((True, best_sup), (False, best_att)):
                    side = sub[sub["vote"] > 0] if positive else sub[sub["vote"] < 0]
                    if not len(side):
                        continue
                    side = side.sort_values(
                        ["vote", "phrase_ord"], ascending=[not positive, True], kind="mergesort"
                    ).head(5)
                    lens = side["phrase"].str.len().to_numpy()
                    dest[node] = side["phrase"].iloc[int(np.argmax(lens))]

        return pd.DataFrame(
            {
                "group_id": g,
                "aspect": nodes_post,
                "polarity": [polar[n] for n in nodes_post],
                "strength": [strength[n] for n in nodes_post],
                "strongest_support_phrase": [best_sup.get(n) for n in nodes_post],
                "strongest_attack_phrase": [best_att.get(n) for n in nodes_post],
                "strongest_support_feature": [best_feat(sup[n]) for n in nodes_post],
                "strongest_attack_feature": [best_feat(att[n]) for n in nodes_post],
            }
        )

    return per_group


_SCORED_SCHEMA = (
    "group_id string, url string, phrase_id string, phrase_ord long, "
    "phrase string, node string, start int, sentiment double"
)


def _fused_phrase_scores(
    sentences: DataFrame,
    nodes_post: list[str],
    parents: dict[str, str | None],
    glossary: dict[str, list[str]],
    scorer,
    max_words: float,
) -> DataFrame:
    """T6 + T9 + M3 in ONE mapInPandas: phrase split, glossary match and
    sentiment scoring chained inside a single Python pass, so the phrase
    table crosses the Arrow boundary once instead of three times (the
    unfused segment_phrases -> match_glossary -> score_sentiment_instances
    chain pays a serialize/deserialize round trip per operator). Identical
    row semantics — the scorer still sees one pandas batch of matched
    (phrase, form, start, end) rows."""
    import pandas as pd

    backend = tp.current_backend()
    gloss_tokens = {n: [s.split(" ") for s in syns] for n, syns in glossary.items()}
    cols = ["group_id", "url", "phrase_id", "phrase_ord", "phrase", "node", "form", "start", "end"]

    def gen(batches):
        tp.install_backend(backend)
        for pdf in batches:
            rows = []
            for url, gid, sid, sentence in zip(
                pdf["url"], pdf["group_id"], pdf["sent_id"], pdf["sentence"]
            ):
                for pos, phrase in enumerate(tp.split_phrases(sentence or "", max_words)):
                    toks = tp.word_tokenize(phrase)
                    for node, form, s, e in tp.match_glossary(
                        toks, nodes_post, parents, gloss_tokens
                    ):
                        rows.append(
                            (gid, url, f"{url}#{sid}#{pos}", int(sid) * 100000 + pos,
                             phrase, node, form, s, e)
                        )
            mdf = pd.DataFrame(rows, columns=cols)
            mdf["sentiment"] = (
                scorer.score_sentiments(mdf) if len(mdf) else pd.Series(dtype="float64")
            )
            yield mdf[
                ["group_id", "url", "phrase_id", "phrase_ord", "phrase", "node", "start", "sentiment"]
            ]

    return sentences.select("url", "group_id", "sent_id", "sentence").mapInPandas(
        gen, _SCORED_SCHEMA
    )


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
    children: dict[str, list[str]] = {}
    for c, p in sorted(edges.items()):
        children.setdefault(p, []).append(c)

    # ---- T6 + T9 + M3: distributed, one fused pass over cached sentences --
    scored = _fused_phrase_scores(
        sentences, nodes_post, parents, glossary, sentiment_scorer, phrase_max_words
    )

    per_group = _make_per_group(root, nodes_post, children, dict(edges), sentiment_threshold)
    return (
        docs.select("group_id")
        .groupBy("group_id")
        .cogroup(scored.groupBy("group_id"))
        .applyInPandas(per_group, _OUT_SCHEMA)
    )
