"""G2 — ontology tree assembly from the normalized meronym matrix.

Exact restatement of src/ontology/tree_builder.py:14-94: normalize scored
sums by parent synset counts, keep the root row alive, drop all-zero rows,
zero the diagonal, then greedily attach nodes in descending
parent-relatedness order; attaching that would create a cycle re-parents
under the root (the reference's anytree LoopError handling).

The matrix is tiny (n <= 100 concepts) — the heavy part (accumulating
scores over billions of instances) happened distributively in
operators/relations.py; this is the driver-side tail.
"""

from __future__ import annotations


def normalize_relatedness(
    concepts: list[str],
    concept_counts: dict[str, int],
    score_sums: dict[tuple[str, str], float],
    root_name: str,
) -> tuple[list[list[float]], list[str]]:
    """normalized[child][parent] = sum / count(parent); root diag pinned to 1
    so the root survives the zero-row filter; all-zero child rows dropped."""
    n = len(concepts)
    idx = {c: i for i, c in enumerate(concepts)}
    m = [[0.0] * n for _ in range(n)]
    for (child, parent), s in score_sums.items():
        if child in idx and parent in idx and concept_counts.get(parent, 0) > 0:
            m[idx[child]][idx[parent]] = s / concept_counts[parent]
    ri = idx[root_name]
    m[ri][ri] = 1.0
    keep = [i for i in range(n) if any(v != 0 for v in m[i])]
    kept_concepts = [concepts[i] for i in keep]
    filtered = [[m[i][j] for j in keep] for i in keep]
    return filtered, kept_concepts


def build_tree_edges(matrix: list[list[float]], concepts: list[str], root_name: str) -> dict[str, str]:
    """Returns child -> parent for every non-root concept."""
    n = len(concepts)
    m = [row[:] for row in matrix]
    for i in range(n):
        m[i][i] = 0.0
    root_idx = concepts.index(root_name)

    def best_parent(i: int) -> tuple[int, float]:
        row = m[i]
        # argmax with first-index tiebreak (numpy argmax semantics)
        best = max(range(n), key=lambda j: (row[j], -j))
        return best, row[best]

    order = sorted(
        (i for i in range(n) if i != root_idx),
        key=lambda i: (-best_parent(i)[1], i),  # relatedness desc, stable by index
    )

    parent: dict[int, int] = {}

    def creates_cycle(child: int, cand: int) -> bool:
        node = cand
        while node in parent:
            if node == child:
                return True
            node = parent[node]
        return node == child

    for i in order:
        cand, _ = best_parent(i)
        parent[i] = root_idx if (cand == i or creates_cycle(i, cand)) else cand

    return {concepts[c]: concepts[p] for c, p in parent.items()}


def tree_to_nested_dict(edges: dict[str, str], root_name: str) -> dict:
    """Serialization boundary (tree_builder.py:96-116): edges -> nested dict.
    Children ordered by attach-order-free lexicographic name (pinned)."""
    children: dict[str, list[str]] = {}
    for c, p in edges.items():
        children.setdefault(p, []).append(c)

    def build(node: str):
        kids = sorted(children.get(node, []))
        if not kids:
            return None
        return {k: build(k) for k in kids}

    return {root_name: build(root_name)}


def nested_dict_to_edges(tree_dict: dict) -> tuple[dict[str, str], str]:
    """Inverse (arg_framework/run.py:11-34)."""
    root = next(iter(tree_dict))
    edges: dict[str, str] = {}

    def walk(node: str, kids):
        if not kids:
            return
        for k, sub in kids.items():
            edges[k] = node
            walk(k, sub)

    walk(root, tree_dict[root])
    return edges, root
