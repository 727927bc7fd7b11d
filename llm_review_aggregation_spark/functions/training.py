"""Model training for the three scorer heads — the fit side of M1/M2/M3.

The reference fine-tunes each BERT head single-node from labeled instance
files (ontology_bert/base/bert_extractor_base.py:72-133: Adam lr=2e-5,
3 epochs, 5% linear warmup, grad-norm clip 1.0, CrossEntropyLoss;
src/constants.py:55-59) and the pipeline then consumes the weights
(bert_scorers._load). At 100 TB the division of labor is:

1. TRAINING-SET CONSTRUCTION IS DISTRIBUTED (this module, torch-free):
   instance mining over the full corpus reuses the same mapInPandas miners
   the inference path uses (functions/mining.py), labels come from a seed
   lexicon (distant supervision) or labeled files, negatives are
   down-sampled to a target ratio with a deterministic hash — one pass,
   no collect until the final bounded sample.
2. THE FIT IS SINGLE-NODE BY DESIGN: the reference's training sets are
   10^4-10^5 instances (term_extraction_datasets); after sampling, ours are
   too. `fit_entity_head` runs the reference's exact schedule on the
   driver (or any one GPU box) over the sampled pandas frame — torch-gated,
   absent in this sandbox.
3. WEIGHTS DISTRIBUTION: the saved state dict uses the `bert.`/`head.`
   prefixes `bert_scorers._load` accepts; ship with
   ``spark-submit --files entity.pt`` and pass
   ``SparkFiles.get("entity.pt")`` as the scorer's weights_path — loaded
   once per Python worker (bert_scorers module cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference hyperparameters (src/constants.py:55-59)
LEARNING_RATE = 2e-5
N_EPOCHS = 3
WARM_UP_FRAC = 0.05
MAX_GRAD_NORM = 1.0


def _hash_frac(col, salt: str):
    """Deterministic [0,1) per row — portable, repartition-stable."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10).cast("double")
        / F.lit(float(16**8))
    )


def build_entity_training_set(
    sentences: DataFrame,
    candidate_terms: list[str],
    positive_terms: frozenset[str] | set[str],
    negative_ratio: float = 1.0,
    seed_salt: str = "enttrain",
) -> DataFrame:
    """Distant-supervision training set for the entity head:
    (masked_tokens, entity_idx, entity, label).

    Mines mention instances over the WHOLE corpus with the same distributed
    miner inference uses (one mapInPandas pass), labels 1/0 by seed-lexicon
    membership, then down-samples negatives to ``negative_ratio`` x the
    positive count with a deterministic hash filter — the sample decision is
    per-row and shuffle-free; only the tiny positive count crosses to the
    driver."""
    from llm_review_aggregation_spark.functions import mining

    inst = mining.mine_entity_instances(sentences, list(candidate_terms))
    labeled = inst.withColumn(
        "label", F.col("entity").isin(*sorted(positive_terms)).cast("int")
    )
    counts = {r["label"]: r["n"] for r in labeled.groupBy("label").agg(F.count("*").alias("n")).collect()}
    n_pos, n_neg = counts.get(1, 0), counts.get(0, 0)
    if n_neg == 0 or n_pos == 0:
        return labeled
    keep_frac = min(1.0, negative_ratio * n_pos / n_neg)
    key = F.concat_ws("#", "url", F.col("sent_id").cast("string"), "entity")
    return labeled.filter(
        (F.col("label") == 1) | (_hash_frac(key, seed_salt) < F.lit(keep_frac))
    )


def train_val_split(df: DataFrame, val_frac: float = 0.1, key_cols: tuple[str, ...] = ("url",)) -> tuple[DataFrame, DataFrame]:
    """Deterministic split on a hash of the key columns (grouping by url so
    sentences of one document never straddle the split)."""
    h = _hash_frac(F.concat_ws("#", *key_cols), "valsplit")
    return df.filter(h >= val_frac), df.filter(h < val_frac)


def _require_torch():  # pragma: no cover - heavy deps absent in CI
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "training needs torch + transformers (single fit node); the "
            "distributed training-set construction above runs without them"
        ) from exc


def fit_entity_head(
    train_pdf,
    out_path: str,
    batch_size: int = 32,
    n_epochs: int = N_EPOCHS,
    lr: float = LEARNING_RATE,
):  # pragma: no cover - torch absent in sandbox
    """Single-node fine-tune of BERT + linear(768->2) on a sampled pandas
    frame (columns masked_tokens, entity_idx, label), with the reference's
    exact schedule: Adam, linear warmup over WARM_UP_FRAC of steps,
    grad-norm clip MAX_GRAD_NORM, CrossEntropyLoss
    (bert_extractor_base.py:72-133). Saves {bert.*, head.*} state dict at
    `out_path` — directly loadable by bert_scorers.BertEntityScorer."""
    _require_torch()
    import torch
    from torch.nn.utils import clip_grad_norm_
    from transformers import AutoModel, AutoTokenizer, get_linear_schedule_with_warmup

    from llm_review_aggregation_spark.functions import bert_scorers as bs

    tokenizer = AutoTokenizer.from_pretrained("bert-base-uncased")
    bert = AutoModel.from_pretrained("bert-base-uncased")
    head = torch.nn.Linear(768, 2)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    bert.to(device)
    head.to(device)
    params = list(bert.parameters()) + list(head.parameters())
    optimiser = torch.optim.Adam(params, lr=lr)
    n_steps = max(1, (len(train_pdf) // batch_size) * n_epochs)
    scheduler = get_linear_schedule_with_warmup(
        optimiser, int(WARM_UP_FRAC * n_steps), n_steps
    )
    loss_fn = torch.nn.CrossEntropyLoss()

    for _epoch in range(n_epochs):
        shuffled = train_pdf.sample(frac=1.0, random_state=_epoch)
        for lo in range(0, len(shuffled), batch_size):
            chunk = shuffled.iloc[lo : lo + batch_size]
            inputs, enc = bs._encode(tokenizer, list(chunk["masked_tokens"]), device)
            pos = [bs._word_to_token_idx(enc, i, int(w)) for i, w in enumerate(chunk["entity_idx"])]
            target = torch.tensor(list(chunk["label"]), dtype=torch.long, device=device)
            optimiser.zero_grad()
            hidden = bert(**inputs).last_hidden_state
            logits = head(hidden[torch.arange(len(chunk)), pos])
            loss = loss_fn(logits, target)
            loss.backward()
            clip_grad_norm_(params, MAX_GRAD_NORM)
            optimiser.step()
            scheduler.step()

    state = {f"bert.{k}": v for k, v in bert.state_dict().items()}
    state.update({f"head.{k}": v for k, v in head.state_dict().items()})
    torch.save(state, out_path)
    return out_path
