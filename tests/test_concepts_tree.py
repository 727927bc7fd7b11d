"""Behavioral specs for G1 (synset clustering) and G2 (tree building),
mirroring the reference unit suites (tests/unit/src/ontology/
test_synset_extractor.py and test_tree_builder.py) with a stub similarity
model — same cases, same expected outputs, plus this engine's pinned
tie-breaking."""

from llm_review_aggregation_spark.operators import concepts, tree


class StubSim:
    """Similarity defined by an explicit symmetric pair table."""

    def __init__(self, pairs: dict[frozenset, float]):
        self.pairs = pairs

    def similarity(self, a, b):
        if a == b:
            return 1.0
        return self.pairs.get(frozenset((a, b)), 0.0)

    def are_syns(self, a, b, threshold):
        return a == b or self.similarity(a, b) >= threshold


class TestClusterSynsets:
    def test_two_clusters(self):
        counts = {"camera": 10, "screen": 5, "display": 3}
        sim = StubSim({frozenset(("screen", "display")): 0.9})
        sc, syn = concepts.cluster_synsets("camera", counts, sim, 0.5, 1)
        assert syn == {"camera": ["camera"], "screen": ["display", "screen"]}
        assert sc == {"camera": 10, "screen": 8}

    def test_root_becomes_representative(self):
        # root clustered under a higher-count member still ends up the key
        counts = {"cam": 10, "camera": 5}
        sim = StubSim({frozenset(("cam", "camera")): 0.9})
        sc, syn = concepts.cluster_synsets("camera", counts, sim, 0.5, 1)
        assert list(syn) == ["camera"]
        assert sorted(syn["camera"]) == ["cam", "camera"]
        assert sc["camera"] == 15

    def test_bounded_connectivity_chains(self):
        # a-b and b-c connected, a-c not directly. At k=1 the dense pair
        # {a,b} outranks the sparse {a,b,c} (avg*density: 0.8 vs 0.36), so
        # greedy picks {a,b} and c stays a singleton.
        counts = {"a": 3, "b": 2, "c": 1}
        sim = StubSim({frozenset(("a", "b")): 0.8, frozenset(("b", "c")): 0.8})
        _, syn1 = concepts.cluster_synsets("a", counts, sim, 0.5, 1)
        assert {tuple(sorted(v)) for v in syn1.values()} == {("a", "b"), ("c",)}
        # at k=2 every start reaches all three -> the only clique is {a,b,c}
        _, syn2 = concepts.cluster_synsets("a", counts, sim, 0.5, 2)
        assert {tuple(sorted(v)) for v in syn2.values()} == {("a", "b", "c")}

    def test_singletons_for_leftovers(self):
        counts = {"a": 3, "b": 2, "z": 1}
        sim = StubSim({frozenset(("a", "b")): 0.9})
        _, syn = concepts.cluster_synsets("a", counts, sim, 0.5, 1)
        assert syn["z"] == ["z"]

    def test_representative_is_max_count(self):
        counts = {"big": 9, "small": 1}
        sim = StubSim({frozenset(("big", "small")): 0.9})
        _, syn = concepts.cluster_synsets("big", counts, sim, 0.5, 1)
        assert list(syn) == ["big"]

    def test_lemma_equal_terms_cluster(self):
        from llm_review_aggregation_spark.functions.embeddings import SimilarityModel
        import numpy as np

        m = SimilarityModel(["picture", "pictures"], np.zeros((2, 4)))
        assert m.similarity("picture", "pictures") == 1.0
        counts = {"picture": 5, "pictures": 2}
        _, syn = concepts.cluster_synsets("picture", counts, m, 0.5, 1)
        assert sorted(syn["picture"]) == ["picture", "pictures"]


class TestTreeBuilder:
    def test_root_only(self):
        m, kept = tree.normalize_relatedness(["root"], {"root": 4}, {}, "root")
        assert kept == ["root"]
        edges = tree.build_tree_edges(m, kept, "root")
        assert edges == {}

    def test_simple_parentage(self):
        concepts_ = ["root", "a", "b"]
        counts = {"root": 10, "a": 4, "b": 2}
        sums = {("a", "root"): 8.0, ("b", "a"): 3.0}
        m, kept = tree.normalize_relatedness(concepts_, counts, sums, "root")
        edges = tree.build_tree_edges(m, kept, "root")
        assert edges == {"a": "root", "b": "a"}

    def test_zero_row_dropped(self):
        concepts_ = ["root", "a", "ghost"]
        counts = {"root": 10, "a": 4, "ghost": 1}
        sums = {("a", "root"): 8.0}
        m, kept = tree.normalize_relatedness(concepts_, counts, sums, "root")
        assert kept == ["root", "a"]

    def test_loop_reparented_under_root(self):
        # a's best parent is b, b's best parent is a -> the second attach
        # would loop and lands under root instead
        concepts_ = ["root", "a", "b"]
        counts = {"root": 10, "a": 2, "b": 2}
        sums = {("a", "b"): 9.0, ("b", "a"): 8.0, ("a", "root"): 0.1}
        m, kept = tree.normalize_relatedness(concepts_, counts, sums, "root")
        edges = tree.build_tree_edges(m, kept, "root")
        assert edges["a"] == "b"
        assert edges["b"] == "root"

    def test_self_loop_never_emitted(self):
        concepts_ = ["root", "a"]
        counts = {"root": 5, "a": 5}
        sums = {("a", "a"): 9.0, ("a", "root"): 1.0}
        m, kept = tree.normalize_relatedness(concepts_, counts, sums, "root")
        edges = tree.build_tree_edges(m, kept, "root")
        assert edges == {"a": "root"}

    def test_roundtrip_nested_dict(self):
        edges = {"a": "root", "b": "a", "c": "root"}
        d = tree.tree_to_nested_dict(edges, "root")
        assert d == {"root": {"a": {"b": None}, "c": None}}
        back, root = tree.nested_dict_to_edges(d)
        assert back == edges and root == "root"
