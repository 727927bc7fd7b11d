"""M7 — LLM extraction backend behind the Scorer protocol.

The reference's ``BERT_OR_LLM`` switch (run.sh:36-39) routes extraction
through prompted generation instead of BERT heads: batch prompts ->
grammar-constrained ``generate`` -> regex-parse the JSON-ish output
(src/ontology/ontology_llm/base/manager_base.py:41-63,
aspects/prompt_manager.py:32-58, relations/prompt_manager.py:25-47).
This module restates that shape Spark-first:

- ``LLMClient`` protocol: ``generate(prompts, grammar) -> list[str]`` —
  the only thing a real model must implement.
- ``HFLLMClient``: torch/transformers-gated causal-LM backend with the
  reference's sampling knobs (max_new_tokens, temperature, top_p,
  repetition_penalty — manager_base.py:13-20). Loaded at most once per
  Python worker via a module cache, same pattern as bert_scorers.
- ``FakeLLMClient``: a deterministic template "model" for CI — it reads the
  payload back out of the prompt and EMITS GENERATED TEXT (JSON fragments),
  so the production parsers and batch plumbing are exercised end-to-end
  without weights. Its decisions come from a lexicon, mirroring how the
  reference's unit tests stub generation
  (tests/unit/src/ontology/ontology_llm/*).
- ``LLMEntityScorer`` / ``LLMRelationScorer`` / ``LLMSentimentScorer``:
  adapters that make prompted extraction satisfy the same ``score_*``
  protocol the BERT/lexicon backends use (functions/scoring.py), so
  ``PipelineConfig(scorer="llm")`` runs E4/E6/E7 unchanged. Each scorer is
  a picklable shell; generation happens inside the Arrow batch on the
  executor, batch_size prompts at a time.

Prompt -> score mapping (aspects/manager.py:32-49, relations/manager.py):
entity prob = 1.0 iff the candidate term is among the parsed aspects of its
sentence (the reference keeps extracted aspects and counts frequencies —
a frequency count over 0/1 probs is exactly that); relation scores are 1.0
votes on the parsed (part, whole) direction, reference's constant-score
convention (relations/prompt_manager.py:41-47); sentiment is the parsed
polarity label mapped to a signed value.
"""

from __future__ import annotations

import json
import re
import time
import warnings
from dataclasses import dataclass, field
from typing import Callable, Protocol, Sequence

import pandas as pd

# ---------------------------------------------------------------------------
# prompts + parsers (the stable text API between engine and model)
# ---------------------------------------------------------------------------

_REVIEW_OPEN, _REVIEW_CLOSE = "[Start of Review]", "[End of Review]"

ASPECT_INSTRUCTION = (
    "Extract the product aspects mentioned in the review below and label "
    "each with its sentiment (positive, negative or neutral). Use only "
    "words that appear verbatim in the review. Answer as a JSON list of "
    '{"aspect": ..., "polarity": ...} objects.'
)

RELATION_INSTRUCTION = (
    "Given a sentence and two aspects from it, decide whether one aspect "
    "is a part of the other (a meronym relationship). Answer as a JSON "
    'object {"part": ..., "whole": ...} using the exact aspect strings, '
    "or an empty JSON object if neither is a part of the other."
)

# EBNF (GBNF-dialect) grammars for constrained decoding, written from first
# principles for this engine's two output shapes; the reference ships the
# same mechanism as src/data/json_grammar/*.ebnf files fed to
# transformers-cfg. Clients that cannot enforce a grammar fall back to the
# tolerant regex parsers below (grammar_logits_processors warns once).
ASPECT_GRAMMAR = r"""
root ::= "[" ws (aspect ("," ws aspect)*)? ws "]"
aspect ::= "{" ws "\"aspect\"" ws ":" ws string ws "," ws "\"polarity\"" ws ":" ws polarity ws "}"
polarity ::= "\"positive\"" | "\"neutral\"" | "\"negative\""
string ::= "\"" [ \t!#-\[\]-~]* "\""
ws ::= [ ]*
"""

RELATION_GRAMMAR = r"""
root ::= "{" ws (pair)? ws "}"
pair ::= "\"part\"" ws ":" ws string ws "," ws "\"whole\"" ws ":" ws string
string ::= "\"" [ \t!#-\[\]-~]* "\""
ws ::= [ ]*
"""

_ASPECT_RE = re.compile(r'"aspect":\s*"(.*?)",\s*"polarity":\s*"(.*?)"')
_RELATION_RE = re.compile(r'"part":\s*"(.*?)",\s*"whole":\s*"(.*?)"')

# (input, output) exemplars prepended to prompts — the reference's n-shot
# prompting (src/data/n_shot_examples.py, fed by the prompt managers).
Exemplars = Sequence[tuple[str, str]]


def _with_examples(instruction: str, examples: Exemplars | None, body: str) -> str:
    if not examples:
        return f"{instruction}\n{body}"
    shots = "\n\n".join(f"{inp}\nOutput: {out}" for inp, out in examples)
    return f"{instruction}\n\nExamples:\n{shots}\n\n{body}"


def aspect_prompt(review_text: str, examples: Exemplars | None = None) -> str:
    """Aspect+sentiment extraction prompt (aspects/prompt_manager.py:61-69);
    optional few-shot exemplars ride ahead of the review."""
    return _with_examples(
        ASPECT_INSTRUCTION, examples, f"{_REVIEW_OPEN}\n{review_text}\n{_REVIEW_CLOSE}"
    )


def relation_prompt(
    sentence: str, aspect1: str, aspect2: str, examples: Exemplars | None = None
) -> str:
    """Meronym-direction prompt (relations/prompt_manager.py:49-66)."""
    return _with_examples(
        RELATION_INSTRUCTION,
        examples,
        f'Sentence: "{sentence}"\nAspect1: "{aspect1}"\nAspect2: "{aspect2}"',
    )


def parse_aspects(generated_text: str) -> list[tuple[str, str]]:
    """Generated text -> [(aspect, polarity)], tolerant of trailing prose —
    the reference's regex extraction (aspects/prompt_manager.py:35-38)."""
    return _ASPECT_RE.findall(generated_text or "")


def parse_relation(
    generated_text: str, aspect1: str, aspect2: str
) -> tuple[bool, float] | None:
    """Generated text -> (is_first_aspect_child, score) or None, matching
    the reference's exact-string check (relations/prompt_manager.py:36-47)."""
    m = _RELATION_RE.findall(generated_text or "")
    if not m:
        return None
    part, whole = m[0]
    if (part, whole) == (aspect1, aspect2):
        return True, 1.0
    if (part, whole) == (aspect2, aspect1):
        return False, 1.0
    return None


# ---------------------------------------------------------------------------
# clients
# ---------------------------------------------------------------------------


class LLMClient(Protocol):
    batch_size: int

    def generate(self, prompts: list[str], grammar: str | None = None) -> list[str]: ...


_HF_CACHE: dict[tuple, object] = {}
_GRAMMAR_FALLBACK_WARNED = False


def grammar_logits_processors(grammar: str | None, tokenizer):
    """EBNF grammar -> transformers-cfg constrained-decoding logits
    processors — the reference's enforcement mechanism
    (src/base/hf_llm_wrapper.py:100-125). Returns None when no grammar is
    requested, or — with a ONE-TIME RuntimeWarning — when transformers_cfg
    is not importable, so a caller can never silently believe constrained
    decode is happening when it isn't; unconstrained output then relies on
    the tolerant regex parsers."""
    global _GRAMMAR_FALLBACK_WARNED
    if grammar is None:
        return None
    try:
        from transformers_cfg.generation.logits_process import (
            GrammarConstrainedLogitsProcessor,
        )
        from transformers_cfg.grammar_utils import IncrementalGrammarConstraint
    except ImportError:
        if not _GRAMMAR_FALLBACK_WARNED:
            warnings.warn(
                "transformers_cfg is not importable: generation is NOT "
                "grammar-constrained; relying on tolerant regex parsing "
                "of free-form output",
                RuntimeWarning,
                stacklevel=2,
            )
            _GRAMMAR_FALLBACK_WARNED = True
        return None
    constraint = IncrementalGrammarConstraint(grammar, "root", tokenizer)
    return [GrammarConstrainedLogitsProcessor(constraint)]


@dataclass
class HFLLMClient:
    """Causal-LM generation via transformers (absent in this sandbox; gated).

    Picklable shell holding only the model name and sampling knobs; the
    model materializes once per Python worker (module cache), so the
    iterator-UDF pattern keeps it warm across Arrow batches. Grammar
    enforcement goes through grammar_logits_processors (transformers-cfg
    when importable, one-time-warned regex fallback otherwise), reaching
    model.generate as logits_processor — the reference's mechanism
    (hf_llm_wrapper.py:100-125).
    """

    model_name: str
    batch_size: int = 32  # manager_base.py:16
    max_new_tokens: int = 200
    temperature: float = 0.3
    top_p: float = 0.95
    repetition_penalty: float = 1.0

    def _load(self):  # pragma: no cover - heavy deps absent in CI
        key = ("hf", self.model_name)
        if key not in _HF_CACHE:
            try:
                import torch  # noqa: F401
                from transformers import AutoModelForCausalLM, AutoTokenizer
            except ImportError as exc:
                raise NotImplementedError(
                    "HFLLMClient needs torch + transformers on driver and "
                    "executors; CI uses FakeLLMClient instead"
                ) from exc
            tok = AutoTokenizer.from_pretrained(self.model_name)
            model = AutoModelForCausalLM.from_pretrained(self.model_name)
            model.eval()
            _HF_CACHE[key] = (tok, model)
        return _HF_CACHE[key]

    def generate(self, prompts: list[str], grammar: str | None = None) -> list[str]:
        import torch

        tok, model = self._load()
        out: list[str] = []
        for lo in range(0, len(prompts), self.batch_size):
            # fresh constraint processor per generate() call: transformers-cfg
            # processors carry per-batch parser state, so reusing one across
            # chunks decodes later chunks against stale constraint state (the
            # reference's hf_llm_wrapper builds it per single generate too)
            processors = grammar_logits_processors(grammar, tok)
            chunk = prompts[lo : lo + self.batch_size]
            enc = tok(chunk, return_tensors="pt", padding=True, truncation=True)
            with torch.no_grad():
                gen = model.generate(
                    **enc,
                    max_new_tokens=self.max_new_tokens,
                    do_sample=self.temperature > 0,
                    temperature=self.temperature,
                    top_p=self.top_p,
                    repetition_penalty=self.repetition_penalty,
                    logits_processor=processors,
                )
            new_tokens = gen[:, enc["input_ids"].shape[1] :]
            out.extend(tok.batch_decode(new_tokens, skip_special_tokens=True))
        return out


@dataclass
class FakeLLMClient:
    """Deterministic template 'LLM' for CI: parses the task payload back out
    of the prompt and emits generated JSON text, so parsers, batching and
    the Scorer adapters run exactly as they would with a real model.

    Decision rules (all deterministic):
    - aspect prompts: every lexicon term appearing verbatim in the review is
      an aspect; polarity = positive/negative iff a cue word co-occurs.
    - relation prompts: emits {"part": p, "whole": w} iff the meronym dict
      relates the two aspects (in either direction), else {}.
    """

    aspect_terms: frozenset[str] = frozenset()
    meronyms: dict[str, str] = field(default_factory=dict)  # part -> whole (canonical)
    positive: frozenset[str] = frozenset()
    negative: frozenset[str] = frozenset()
    # synonym surface -> canonical concept (a "model" knows synonymy; synset
    # representatives arriving in prompts may be synonym surfaces)
    canon: dict[str, str] = field(default_factory=dict)
    batch_size: int = 32
    calls: int = 0  # generation-call counter (test observability)

    def _answer_aspects(self, prompt: str) -> str:
        # rindex: the review under test is the LAST marker pair — few-shot
        # exemplars prepended by _with_examples may themselves carry markers
        lo = prompt.rindex(_REVIEW_OPEN) + len(_REVIEW_OPEN)
        hi = prompt.rindex(_REVIEW_CLOSE)
        review = prompt[lo:hi].strip()
        words = review.lower().split()
        wordset = set(words)
        pos = bool(wordset & self.positive)
        neg = bool(wordset & self.negative)
        polarity = "positive" if pos and not neg else "negative" if neg and not pos else "neutral"
        items = []
        seen = set()
        for term in words:
            if term in self.aspect_terms and term not in seen:
                seen.add(term)
                items.append({"aspect": term, "polarity": polarity})
        # multi-word lexicon terms match as substrings of the review
        for term in sorted(self.aspect_terms):
            if " " in term and term in review.lower() and term not in seen:
                seen.add(term)
                items.append({"aspect": term, "polarity": polarity})
        return json.dumps(items)

    def _answer_relation(self, prompt: str) -> str:
        m = re.search(r'Aspect1: "(.*?)"\nAspect2: "(.*?)"$', prompt, re.S)
        if not m:
            return "{}"
        a1, a2 = m.group(1), m.group(2)
        c1, c2 = self.canon.get(a1, a1), self.canon.get(a2, a2)
        if self.meronyms.get(c1) == c2:
            return json.dumps({"part": a1, "whole": a2})
        if self.meronyms.get(c2) == c1:
            return json.dumps({"part": a2, "whole": a1})
        return "{}"

    def generate(self, prompts: list[str], grammar: str | None = None) -> list[str]:
        self.calls += 1
        out = []
        for p in prompts:
            if _REVIEW_OPEN in p:
                out.append(self._answer_aspects(p))
            else:
                out.append(self._answer_relation(p))
        return out


@dataclass
class RetryingClient:
    """Operational wrapper for external extraction/judge clients: bounded
    retry with (optionally exponential) backoff on transient errors, plus a
    minimum interval between generate calls for rate limiting. Restates the
    reference's driver-side sleep-and-retry loop
    (src/llm_judge/llm_manager.py:36-78 — retry on ResourceExhausted, raise
    immediately on InvalidArgument) as a reusable wrapper any ``LLMClient``
    can wear; errors in ``fatal`` propagate without retry. ``sleep`` and
    ``clock`` are injectable for tests."""

    inner: LLMClient
    max_attempts: int = 5
    backoff_s: float = 10.0
    backoff_multiplier: float = 1.0
    min_interval_s: float = 0.0
    retryable: tuple[type[BaseException], ...] = (Exception,)
    fatal: tuple[type[BaseException], ...] = ()
    sleep: Callable[[float], None] = time.sleep
    clock: Callable[[], float] = time.monotonic
    _last_call: float | None = field(default=None, repr=False, compare=False)

    @property
    def batch_size(self) -> int:
        return self.inner.batch_size

    def generate(self, prompts: list[str], grammar: str | None = None) -> list[str]:
        delay = self.backoff_s
        for attempt in range(1, self.max_attempts + 1):
            if self.min_interval_s and self._last_call is not None:
                wait = self.min_interval_s - (self.clock() - self._last_call)
                if wait > 0:
                    self.sleep(wait)
            self._last_call = self.clock()
            try:
                return self.inner.generate(prompts, grammar)
            except self.fatal:
                raise
            except self.retryable as exc:
                if attempt == self.max_attempts:
                    raise
                warnings.warn(
                    f"generate failed (attempt {attempt}/{self.max_attempts}): "
                    f"{exc!r}; retrying in {delay:g}s",
                    RuntimeWarning,
                    stacklevel=2,
                )
                self.sleep(delay)
                delay *= self.backoff_multiplier
        raise AssertionError("unreachable")  # pragma: no cover


# ---------------------------------------------------------------------------
# Scorer adapters (plug into functions/scoring.py's mapInPandas kernels)
# ---------------------------------------------------------------------------


def _unmask(tokens, idx_to_term: dict[int, str]) -> str:
    toks = list(tokens)
    for i, term in idx_to_term.items():
        if 0 <= int(i) < len(toks):
            toks[int(i)] = term
    return " ".join(toks)


@dataclass
class LLMEntityScorer:
    """M1 via prompting: candidate prob = 1.0 iff the LLM lists the term as
    an aspect of its sentence. One generation per distinct sentence per
    batch (aspects are extracted per review, then matched — the reference's
    extract-then-count flow, aspects/manager.py:32-49)."""

    client: LLMClient
    examples: tuple = ()  # few-shot (input, output) exemplars

    def score_entities(self, pdf: pd.DataFrame) -> pd.Series:
        sents = [
            _unmask(t, {i: e})
            for t, i, e in zip(pdf["masked_tokens"], pdf["entity_idx"], pdf["entity"])
        ]
        uniq = sorted(set(sents))
        responses = self.client.generate(
            [aspect_prompt(s, self.examples) for s in uniq], ASPECT_GRAMMAR
        )
        aspects_of = {s: {a for a, _ in parse_aspects(r)} for s, r in zip(uniq, responses)}
        return pd.Series(
            [1.0 if e in aspects_of[s] else 0.0 for s, e in zip(sents, pdf["entity"])],
            index=pdf.index,
            dtype="float64",
        )


@dataclass
class LLMRelationScorer:
    """M2 via prompting: (forward, backward) = (1,0)/(0,1)/(0,0) votes from
    the parsed part/whole direction. forward = P(fst hasFeature snd), i.e.
    snd is the part (relations/prompt_manager.py:36-47)."""

    client: LLMClient
    examples: tuple = ()

    def score_relations(self, pdf: pd.DataFrame) -> pd.DataFrame:
        sents = [
            _unmask(t, {i1: c1, i2: c2})
            for t, i1, i2, c1, c2 in zip(
                pdf["masked_tokens"], pdf["fst_idx"], pdf["snd_idx"],
                pdf["fst_concept"], pdf["snd_concept"],
            )
        ]
        prompts = [
            relation_prompt(s, c1, c2, self.examples)
            for s, c1, c2 in zip(sents, pdf["fst_concept"], pdf["snd_concept"])
        ]
        responses = self.client.generate(prompts, RELATION_GRAMMAR)
        fwd, bwd = [], []
        for r, c1, c2 in zip(responses, pdf["fst_concept"], pdf["snd_concept"]):
            parsed = parse_relation(r, c1, c2)
            if parsed is None:
                fwd.append(0.0)
                bwd.append(0.0)
            else:
                first_is_child, score = parsed
                # fst is the part => snd hasFeature fst => backward vote
                fwd.append(0.0 if first_is_child else score)
                bwd.append(score if first_is_child else 0.0)
        return pd.DataFrame({"forward_score": fwd, "backward_score": bwd}, index=pdf.index)


@dataclass
class LLMSentimentScorer:
    """M3 via prompting: signed value from the polarity label the LLM
    attached to the aspect occurrence in its phrase. Magnitude 1.0 clears
    the QBAF vote threshold, matching the reference's constant-confidence
    LLM votes."""

    client: LLMClient
    examples: tuple = ()

    def score_sentiments(self, pdf: pd.DataFrame) -> pd.Series:
        phrases = [p or "" for p in pdf["phrase"]]
        uniq = sorted(set(phrases))
        responses = self.client.generate(
            [aspect_prompt(p, self.examples) for p in uniq], ASPECT_GRAMMAR
        )
        polarity_of: dict[str, dict[str, str]] = {
            p: {a: pol for a, pol in parse_aspects(r)} for p, r in zip(uniq, responses)
        }
        out = []
        for phrase, form in zip(phrases, pdf["form"]):
            pol = polarity_of[phrase].get(form)
            if pol is None:
                # fall back to any aspect's polarity in the phrase (targeted
                # form may be a synonym surface not listed verbatim)
                pols = set(polarity_of[phrase].values())
                pol = pols.pop() if len(pols) == 1 else None
            out.append(1.0 if pol == "positive" else -1.0 if pol == "negative" else 0.0)
        return pd.Series(out, index=pdf.index, dtype="float64")


def make_llm_scorers(params: dict):
    """Build the (entity, relation, sentiment) triple for scorer="llm".

    params["llm_client"] supplies a ready client (e.g. HFLLMClient);
    otherwise a FakeLLMClient is built from the same lexicon params the
    deterministic scorers use, so CI exercises the full prompt->generate->
    parse path with no model deps."""
    client = params.get("llm_client")
    if client is None:
        from llm_review_aggregation_spark import synth

        canon = params.get("canon")
        if canon is None:
            canon = {s: c for c, syns in synth.SYNONYMS.items() for s in syns}
        client = FakeLLMClient(
            aspect_terms=frozenset(params.get("aspect_terms", synth.ASPECT_TERMS)),
            meronyms=dict(params.get("meronyms", synth.MERONYMS)),
            positive=frozenset(params.get("positive", synth.POSITIVE)),
            negative=frozenset(params.get("negative", synth.NEGATIVE)),
            canon=dict(canon),
        )
    return LLMEntityScorer(client), LLMRelationScorer(client), LLMSentimentScorer(client)
