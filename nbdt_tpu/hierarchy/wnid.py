"""WordNet ID codecs and synset adapter.

TPU-native rebuild of reference ``nbdt/thirdparty/wn.py`` (wn.py:44-94).
WordNet IDs are strings ``<pos><offset:08d>`` (e.g. ``n02691156``). Real
synset lookups require the NLTK WordNet corpus; in offline environments we
degrade gracefully to :class:`FakeSynset` placeholders (pos ``f``), exactly
as the reference does for generated inner nodes (wn.py:74-94).
"""

from __future__ import annotations

import os

from ..utils import get_directory, makeparentdirs

_WORDNET_CHECKED = False
_WORDNET_AVAILABLE = False
_MINI_CORPUS = None  # {wnid: {"name": str, "hypernyms": [wnid, ...]}}


def install_mini_corpus(table) -> None:
    """Install a vendored mini WordNet: a dict (or JSON path) of
    ``{wnid: {"name": ..., "hypernyms": [wnid, ...]}}``.

    Zero-egress environments cannot fetch the NLTK corpus (reference
    wn.py:16-21 downloads it unconditionally), so the wordnet-dependent
    flows — ``build_minimal_wordnet_graph``, hypernym naming of induced
    parents, ``Superclass.build_mapping`` — degrade to FakeSynsets. A
    mini-corpus runs their REAL code paths on vendored hypernym chains;
    :func:`mini_corpus_from_graph_json` derives one from any shipped
    wordnet hierarchy. Takes precedence over NLTK while installed."""
    global _MINI_CORPUS
    if isinstance(table, (str, os.PathLike)):
        import json

        with open(table) as f:
            table = json.load(f)
    if isinstance(table, dict) and "nodes" in table and "links" in table:
        # a shipped wordnet hierarchy JSON: derive the chains from it
        table = _mini_corpus_from_node_link(table)
    _MINI_CORPUS = dict(table)


def clear_mini_corpus() -> None:
    global _MINI_CORPUS
    _MINI_CORPUS = None


def mini_corpus_from_graph_json(path) -> dict:
    """Derive a mini-corpus from a shipped wordnet hierarchy JSON.

    Pruning (reference graph.py:597-602) contracts every single-successor
    chain into its surviving child, recording the removed ancestors in the
    node's ``contraction`` dict in nearest-first order — so each node's
    original hypernym chain is ``node -> contraction keys... -> parent``.
    Inverting that reconstructs the exact WordNet relations the builder saw,
    letting ``build_minimal_wordnet_graph`` + prune reproduce the shipped
    graph byte-for-byte offline (tested in tests/test_hierarchy.py)."""
    import json

    with open(str(path)) as f:
        data = json.load(f)
    return _mini_corpus_from_node_link(data)


def _mini_corpus_from_node_link(data: dict) -> dict:
    table: dict = {}

    def ensure(wnid, name):
        table.setdefault(wnid, {"name": name, "hypernyms": []})

    for node in data["nodes"]:
        ensure(node["id"], node.get("label", node["id"]))
        for cw, cd in (node.get("contraction") or {}).items():
            ensure(cw, cd.get("label", cw))

    chains = {}
    for node in data["nodes"]:
        chain = [node["id"]] + list((node.get("contraction") or {}).keys())
        for lower, upper in zip(chain, chain[1:]):
            table[lower]["hypernyms"] = [upper]
        chains[node["id"]] = chain

    for link in data["links"]:
        top = chains[link["target"]][-1]
        # APPEND: a multi-path (DAG) hierarchy gives a node several
        # parents; overwriting would keep only the last-seen one and
        # silently drop ancestor superclasses from hypernym closures
        hyp = table[top].setdefault("hypernyms", [])
        if link["source"] not in hyp:
            hyp.append(link["source"])
    return table


class MiniSynset:
    """Synset backed by a mini-corpus table.

    Implements the exact NLTK synset surface the hierarchy builders and
    analyzers touch: ``pos/offset/name/definition/hypernyms`` plus
    ``common_hypernyms`` (includes self, like NLTK) and ``max_depth``
    (longest hypernym path length)."""

    def __init__(self, wnid: str, table: dict):
        self.wnid = wnid
        self._table = table

    def pos(self) -> str:
        return self.wnid[0]

    def offset(self) -> int:
        return int(self.wnid[1:])

    def name(self) -> str:
        return self._table[self.wnid]["name"]

    def definition(self) -> str:
        return self._table[self.wnid].get("definition", "(mini-corpus)")

    def hypernyms(self):
        return [MiniSynset(w, self._table)
                for w in self._table[self.wnid]["hypernyms"]]

    def _closure(self):
        seen, frontier = [], [self]
        while frontier:
            cur = frontier.pop(0)
            if cur.wnid in [s.wnid for s in seen]:
                continue
            seen.append(cur)
            frontier.extend(cur.hypernyms())
        return seen

    def common_hypernyms(self, other):
        mine = {s.wnid: s for s in self._closure()}
        return [s for s in other._closure() if s.wnid in mine]

    def max_depth(self) -> int:
        hyps = self.hypernyms()
        if not hyps:
            return 0
        return 1 + max(h.max_depth() for h in hyps)

    def __eq__(self, other):
        return isinstance(other, MiniSynset) and other.wnid == self.wnid

    def __hash__(self):
        return hash(self.wnid)

    def __repr__(self):
        return f"MiniSynset({self.wnid!r})"


def wordnet_available() -> bool:
    """True if a WordNet corpus can serve synset lookups: the full NLTK
    corpus, or an installed mini-corpus (see :func:`install_mini_corpus`)."""
    global _WORDNET_CHECKED, _WORDNET_AVAILABLE
    if _MINI_CORPUS is not None:
        return True
    if not _WORDNET_CHECKED:
        _WORDNET_CHECKED = True
        try:
            from nltk.corpus import wordnet as wn

            wn.synset_from_pos_and_offset("n", 2691156)  # 'airplane'
            _WORDNET_AVAILABLE = True
        except Exception:
            _WORDNET_AVAILABLE = False
    return _WORDNET_AVAILABLE


def maybe_install_wordnet() -> bool:
    """Attempt to fetch the WordNet corpus; returns availability.

    Mirrors reference wn.py:16-21 but never raises on network failure
    (offline TPU pods have no egress).
    """
    global _WORDNET_CHECKED
    if wordnet_available():
        return True
    try:
        import nltk

        nltk.download("wordnet", quiet=True)
        _WORDNET_CHECKED = False  # re-probe
    except Exception:
        pass
    return wordnet_available()


class FakeSynset:
    """Placeholder synset for generated (non-WordNet) nodes.

    Reference wn.py:74-94. Generated nodes get wnid ``f<offset>``, and
    ``pos() == 'f'`` marks them. Unlike the reference, FakeSynset also
    stands in for *real* wnids when the corpus is offline — in that case
    ``pos()`` preserves the wnid's own prefix so ``synset_to_wnid``
    round-trips exactly (an offline-created FakeSynset('n02691156') must
    map back to 'n02691156', not 'f02691156').
    """

    def __init__(self, wnid: str):
        assert isinstance(wnid, str)
        self.wnid = wnid

    @staticmethod
    def create_from_offset(offset: int) -> "FakeSynset":
        return FakeSynset("f{:08d}".format(offset))

    def offset(self) -> int:
        return int(self.wnid[1:])

    def pos(self) -> str:
        return self.wnid[0]

    def name(self) -> str:
        return "(generated)"

    def definition(self) -> str:
        return "(generated)"

    def hypernyms(self):
        return []

    def __repr__(self):
        return f"FakeSynset({self.wnid!r})"


def synset_to_wnid(synset) -> str:
    """synset -> wnid codec: pos letter + zero-padded 8-digit offset
    (reference wn.py:44-65).

    >>> synset_to_wnid(FakeSynset.create_from_offset(3))
    'f00000003'
    >>> wnid_to_synset("f00000042").wnid
    'f00000042'
    """
    return f"{synset.pos()}{synset.offset():08d}"


def wnid_to_synset(wnid: str):
    """wnid -> synset; MiniSynset under an installed mini-corpus, FakeSynset
    if no corpus can resolve it."""
    if wnid.startswith("f"):
        return FakeSynset(wnid)
    if _MINI_CORPUS is not None:
        if wnid in _MINI_CORPUS:
            return MiniSynset(wnid, _MINI_CORPUS)
        return FakeSynset(wnid)
    if not wordnet_available():
        return FakeSynset(wnid)
    from nltk.corpus import wordnet as wn

    try:
        return wn.synset_from_pos_and_offset(wnid[0], int(wnid[1:]))
    except Exception:
        return FakeSynset(wnid)


def synset_to_name(synset) -> str:
    return synset.name().split(".")[0]


def wnid_to_name(wnid: str) -> str:
    return synset_to_name(wnid_to_synset(wnid))


# ---------------------------------------------------------------------------
# wnid list file IO (reference wn.py:24-36, 68-71)
# ---------------------------------------------------------------------------


def get_wnids(path_wnids) -> list:
    path_wnids = str(path_wnids)
    if not os.path.exists(path_wnids):
        from ..utils import fwd

        fallback = fwd().parent / path_wnids
        if os.path.exists(fallback):
            path_wnids = str(fallback)
    with open(path_wnids) as f:
        return [wnid.strip() for wnid in f.readlines() if wnid.strip()]


def get_wnids_from_dataset(dataset: str, root: str = "./nbdt_tpu/wnids") -> list:
    directory = get_directory(dataset, root)
    return get_wnids(f"{directory}.txt")


def write_wnids(wnids, path) -> None:
    makeparentdirs(path)
    with open(str(path), "w") as f:
        f.write("\n".join(wnids))
