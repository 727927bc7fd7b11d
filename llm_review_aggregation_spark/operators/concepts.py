"""E5 — concept extraction: cluster candidate aspects into synsets
(entity canonicalization).

Exact restatement of the reference clustering (src/ontology/synset_extractor.py:71-117)
for dictionaries small enough to collect (n <= config.max_driver_cluster_terms;
the reference caps at 100): bounded-k connectivity "cliques", ranked by
avg_rel * density, greedily selected non-overlapping, singletons for
leftovers, representative = highest-count member, root forced to be a
representative.

Nondeterminism in the reference (set iteration order in the greedy loop,
dict-order ties in the representative pick — SURVEY §7 R1) is pinned here
with total lexicographic orderings; the test oracle pins identically.

For large dictionaries use operators/canonicalize.py (distributed label
propagation) instead — same edge relation (`are_syns`), component-per-synset.
"""

from __future__ import annotations

from collections import deque


def _bounded_reachable(adj: list[list[int]], start: int, k: int) -> set[int]:
    """Nodes reachable from `start` within <= k edges (BFS; equivalent to the
    reference's recursive _connected check, synset_extractor.py:27-49)."""
    seen = {start}
    frontier = deque([(start, 0)])
    out = {start}
    while frontier:
        node, d = frontier.popleft()
        if d == k:
            continue
        for nxt in adj[node]:
            if nxt not in seen:
                seen.add(nxt)
                out.add(nxt)
                frontier.append((nxt, d + 1))
    return out


def _clique_similarity(c: frozenset[int], m: list[list[float]]) -> float:
    """avg pairwise similarity * edge density (synset_extractor.py:51-69)."""
    if len(c) == 1:
        return 1.0
    idxs = sorted(c)
    pairs = [(i, j) for ii, i in enumerate(idxs) for j in idxs[ii + 1 :]]
    avg_rel = sum(m[i][j] for i, j in pairs) / len(pairs)
    density = sum(1 for i, j in pairs if m[i][j] != 0) / len(pairs)
    return avg_rel * density


def cluster_synsets(
    root_aspect: str,
    counts: dict[str, int],
    sim_model,
    similarity_threshold: float = 0.20,
    num_clustering_levels: int = 3,
) -> tuple[dict[str, int], dict[str, list[str]]]:
    """Returns (synset_counts, synsets) — synsets maps representative ->
    sorted member list. `counts` must be in candidate rank order
    (count desc, term asc)."""
    aspects = list(counts.keys())
    n = len(aspects)
    m = [[0.0] * n for _ in range(n)]
    for i, a1 in enumerate(aspects):
        for j, a2 in enumerate(aspects):
            if sim_model.are_syns(a1, a2, similarity_threshold):
                m[i][j] = sim_model.similarity(a1, a2)
    adj = [[j for j in range(n) if j != i and m[i][j] != 0] for i in range(n)]

    cliques = {frozenset(_bounded_reachable(adj, i, num_clustering_levels)) for i in range(n)}
    # rank by similarity desc; ties pinned by sorted member tuple
    ranked = sorted(cliques, key=lambda c: (-_clique_similarity(c, m), tuple(sorted(c))))
    non_overlapping: list[frozenset[int]] = []
    taken: set[int] = set()
    for c in ranked:
        if not (c & taken):
            non_overlapping.append(c)
            taken |= c
    all_groups = non_overlapping + [frozenset({i}) for i in range(n) if i not in taken]

    synsets: dict[str, list[str]] = {}
    for group in all_groups:
        members = sorted({aspects[i] for i in group})
        # representative: max count, lexicographically-smallest tiebreak
        rep = min(members, key=lambda t: (-counts[t], t))
        synsets[rep] = members

    if root_aspect not in synsets:
        for rep in list(synsets.keys()):
            if root_aspect in synsets[rep]:
                synsets[root_aspect] = synsets.pop(rep)
                break

    ordered_reps = [a for a in aspects if a in synsets]
    synset_counts = {rep: sum(counts[s] for s in synsets[rep]) for rep in ordered_reps}
    return synset_counts, {rep: synsets[rep] for rep in ordered_reps}
