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


def wordnet_available() -> bool:
    """True if the NLTK WordNet corpus can be loaded (cached check)."""
    global _WORDNET_CHECKED, _WORDNET_AVAILABLE
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
    """wnid -> synset; FakeSynset if the corpus is absent or lookup fails."""
    if wnid.startswith("f") or not wordnet_available():
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
