"""Real BERT scorer backends (M1/M2/M3) behind the Scorer protocol.

Heavy deps (torch, transformers) are imported lazily and are absent in the
CI sandbox — these classes are exercised there only for construction and
argument plumbing; the deterministic scorers in functions/scoring.py carry
the test suite. The architectures and scoring math mirror the reference:

- EntityBertNet   = BERT-base + linear(768 -> 2) over the hidden state of the
  token at ``entity_idx``; score = softmax class-1 prob
  (reference src/ontology/ontology_bert/aspects/entity_bert_net.py:10-27,
  bert_entity_extractor.py:40-60).
- RelBertNet      = BERT-base + linear(1536 -> 3) over the concat of the two
  masked-mention hidden states; classes (none, fst-hasFeature-snd,
  snd-hasFeature-fst) (relations/rel_bert_net.py:12-34, constants.py:46).
- TDBertNet       = BERT-base + linear(768 -> 4) with max-pool over the
  target-token span; polarity value +p(pos) / -p(neg) / 0
  (src/argumentation/sentiment/tdbertnet.py:10-30, bert_analyzer.py:144-190).

Execution model (the north-star "batched BERT ... as pandas UDFs with Arrow
batching"): each scorer is a small picklable shell holding only the weight
PATH and hyperparameters. The torch model is materialized at most once per
Python worker process via a module-level cache — the iterator-UDF pattern in
functions/scoring.py keeps the worker (and therefore the loaded weights)
alive across Arrow batches. Ship weights to executors with
``spark-submit --files model.pt`` and pass ``SparkFiles.get("model.pt")``,
or a shared filesystem path.

Tokenization follows the reference: ``bert-base-uncased`` wordpiece,
max_len 128, dynamic padding per sub-batch (bert_dataset_base.py:121-144).
Instances whose mention index lands past max_len are dropped upstream by the
miners (P12, entity_dataset.py:25-36).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

MAX_SEQ_LEN = 128  # reference src/constants.py:52
_MODEL_CACHE: dict[tuple, object] = {}


def _require_torch():
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as exc:  # pragma: no cover - heavy deps absent in CI
        raise NotImplementedError(
            "BERT scorer backends need torch + transformers on driver and "
            "executors (pip install torch transformers); CI uses the "
            "deterministic scorers instead"
        ) from exc


def _load(kind: str, weights_path: str, out_dim: int):  # pragma: no cover
    """Memoized per-process model + tokenizer load (once per python worker)."""
    key = (kind, weights_path)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained("bert-base-uncased")
    bert = AutoModel.from_pretrained("bert-base-uncased")
    in_dim = 1536 if kind == "relation" else 768
    head = torch.nn.Linear(in_dim, out_dim)
    state = torch.load(weights_path, map_location="cpu")
    # Accept this engine's {bert.*, head.*} layout AND the reference's
    # net.state_dict() attribute names {bert_base.*, fc.*}
    # (entity_bert_net.py:15-16, tdbertnet.py, bert_analyzer.py:85).
    def _strip(prefixes: tuple[str, ...]) -> dict:
        out = {}
        for k, v in state.items():
            for p in prefixes:
                if k.startswith(p):
                    out[k[len(p):]] = v
                    break
        return out

    head_state = _strip(("head.", "fc."))
    bert_state = _strip(("bert.", "bert_base."))
    if not head_state and not bert_state:
        raise ValueError(
            f"checkpoint {weights_path!r} matched no known parameter prefixes "
            "(expected bert./head. or the reference's bert_base./fc.); refusing "
            "to score with randomly initialized weights"
        )
    if bert_state:
        bert.load_state_dict(bert_state, strict=False)
    if head_state:
        head.load_state_dict(head_state)
    bert.eval()
    head.eval()
    device = "cuda" if torch.cuda.is_available() else "cpu"
    bert.to(device)
    head.to(device)
    _MODEL_CACHE[key] = (tokenizer, bert, head, device)
    return _MODEL_CACHE[key]


def _encode(tokenizer, token_lists: list[list[str]], device):  # pragma: no cover
    import torch

    enc = tokenizer(
        [list(t) for t in token_lists],
        is_split_into_words=True,
        truncation=True,
        max_length=MAX_SEQ_LEN,
        padding=True,
        return_tensors="pt",
    )
    return {k: v.to(device) for k, v in enc.items()}, enc


def _word_to_token_idx(enc, row: int, word_idx: int) -> int:  # pragma: no cover
    """First wordpiece position of word `word_idx` (mention tokens are single
    '[MASK]' words upstream, so first == only)."""
    span = enc.word_to_tokens(row, word_idx)
    return span.start if span is not None else 0


@dataclass
class BertEntityScorer:
    """M1: P(mention is a real aspect) per instance row
    (masked_tokens array<string>, entity_idx int)."""

    weights_path: str
    batch_size: int = 32  # reference bert_entity_extractor.py:17

    def score_entities(self, pdf: pd.DataFrame) -> pd.Series:  # pragma: no cover
        _require_torch()
        import torch

        tokenizer, bert, head, device = _load("entity", self.weights_path, 2)
        out: list[float] = []
        for lo in range(0, len(pdf), self.batch_size):
            chunk = pdf.iloc[lo : lo + self.batch_size]
            inputs, enc = _encode(tokenizer, list(chunk["masked_tokens"]), device)
            with torch.no_grad():
                hidden = bert(**inputs).last_hidden_state
                pos = [
                    _word_to_token_idx(enc, i, int(w))
                    for i, w in enumerate(chunk["entity_idx"])
                ]
                vecs = hidden[torch.arange(len(chunk)), pos]
                probs = torch.softmax(head(vecs), dim=-1)[:, 1]
            out.extend(probs.cpu().tolist())
        return pd.Series(out, index=pdf.index, dtype="float64")


@dataclass
class BertRelationScorer:
    """M2: meronym-direction probs per instance row
    (masked_tokens, fst_idx, snd_idx). Returns a DataFrame with
    forward_score = P(snd hasFeature fst accrues to (fst<-snd)) and
    backward_score, matching the accumulation in operators/relations.py
    (reference bert_rel_extractor.py:46-68)."""

    weights_path: str
    batch_size: int = 16  # reference bert_rel_extractor.py:16

    def score_relations(self, pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
        _require_torch()
        import torch

        tokenizer, bert, head, device = _load("relation", self.weights_path, 3)
        fwd: list[float] = []
        bwd: list[float] = []
        for lo in range(0, len(pdf), self.batch_size):
            chunk = pdf.iloc[lo : lo + self.batch_size]
            inputs, enc = _encode(tokenizer, list(chunk["masked_tokens"]), device)
            with torch.no_grad():
                hidden = bert(**inputs).last_hidden_state
                p1 = [_word_to_token_idx(enc, i, int(w)) for i, w in enumerate(chunk["fst_idx"])]
                p2 = [_word_to_token_idx(enc, i, int(w)) for i, w in enumerate(chunk["snd_idx"])]
                rng = torch.arange(len(chunk))
                vecs = torch.cat([hidden[rng, p1], hidden[rng, p2]], dim=-1)
                probs = torch.softmax(head(vecs), dim=-1)  # (none, fst-hasFeat-snd, snd-hasFeat-fst)
            fwd.extend(probs[:, 1].cpu().tolist())
            bwd.extend(probs[:, 2].cpu().tolist())
        return pd.DataFrame({"forward_score": fwd, "backward_score": bwd}, index=pdf.index)


@dataclass
class BertSentimentScorer:
    """M3: targeted sentiment per (phrase, start, end) row: +p if argmax is
    positive, -p if negative, 0 otherwise (bert_analyzer.py:144-190)."""

    weights_path: str
    batch_size: int = 32

    def score_sentiments(self, pdf: pd.DataFrame) -> pd.Series:  # pragma: no cover
        _require_torch()
        import torch

        tokenizer, bert, head, device = _load("sentiment", self.weights_path, 4)
        out: list[float] = []
        for lo in range(0, len(pdf), self.batch_size):
            chunk = pdf.iloc[lo : lo + self.batch_size]
            enc = tokenizer(
                list(chunk["phrase"]),
                truncation=True,
                max_length=MAX_SEQ_LEN,
                padding=True,
                return_tensors="pt",
                return_offsets_mapping=True,
            )
            offsets = enc.pop("offset_mapping")
            inputs = {k: v.to(device) for k, v in enc.items()}
            with torch.no_grad():
                hidden = bert(**inputs).last_hidden_state
                scores = []
                for i, (s, e) in enumerate(zip(chunk["start"], chunk["end"])):
                    # token positions whose char span overlaps [s, e)
                    om = offsets[i]
                    mask = (om[:, 1] > int(s)) & (om[:, 0] < int(e)) & (om[:, 1] > om[:, 0])
                    span = hidden[i][mask]
                    if span.shape[0] == 0:
                        span = hidden[i][:1]
                    pooled, _ = span.max(dim=0)  # max-pool over target span (tdbertnet.py:10-30)
                    scores.append(head(pooled))
                probs = torch.softmax(torch.stack(scores), dim=-1)
                # classes: (positive, negative, neutral, conflict) — the
                # reference's polarity_indices (bert_dataset.py:9); get_polarity
                # maps pred==0 -> +p(pos), pred==1 -> -p(neg), else 0
                # (bert_analyzer.py:181-190).
                pred = probs.argmax(dim=-1)
                zeros = torch.zeros_like(probs[:, 0])
                val = torch.where(
                    pred == 0, probs[:, 0], torch.where(pred == 1, -probs[:, 1], zeros)
                )
            out.extend(val.cpu().tolist())
        return pd.Series(out, index=pdf.index, dtype="float64")
