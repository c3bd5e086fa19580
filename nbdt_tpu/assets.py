"""Built-in dataset class metadata.

The reference ships per-dataset wnid lists (``nbdt/wnids/*.txt``, one wnid
per line in dataset class order) and pre-generated hierarchy JSONs. In this
rebuild, small metadata is embedded as Python constants; larger assets are
either regenerated (``nbdt-hierarchy`` / ``nbdt-wnids`` CLIs) or imported
from an existing reference checkout via ``tools/import_assets.py``.

WNIDs are WordNet identities of the dataset classes — e.g. CIFAR10's class 0
("airplane") is synset n02691156. Class order is the dataset's label order.
"""

from __future__ import annotations

import os
from typing import List, Optional

from .utils import DATASET_TO_NUM_CLASSES, dataset_to_default_path_wnids

# CIFAR10 class -> wnid, in label order (parity fixture for the flagship
# config; see reference nbdt/wnids/CIFAR10.txt and utils.py:41-54).
CIFAR10_WNIDS = [
    "n02691156",  # airplane
    "n02958343",  # automobile (car)
    "n01503061",  # bird
    "n02121620",  # cat
    "n02430045",  # deer
    "n02084071",  # dog
    "n01639765",  # frog
    "n02374451",  # horse
    "n04194289",  # ship
    "n04490091",  # truck
]


# CIFAR100 / TinyImagenet200 class -> wnid, label order (dataset facts;
# reference nbdt/wnids/{CIFAR100,TinyImagenet200}.txt). Required for
# WordNet-named hierarchies and released-checkpoint parity.
CIFAR100_WNIDS = [
    "n07739125", "n02512752", "n09827683", "n02131653", "n02363005", "n02818832",
    "n02206856", "n02164464", "n02834778", "n02876657", "n02881193", "n10285313",
    "n02898711", "n02924116", "n02274259", "n02437136", "n02946921", "n02980441",
    "n02309337", "n02402425", "n03001627", "n02481823", "n03046257", "n11439690",
    "n02233338", "n04256520", "n01976957", "n01697178", "n03147509", "n01699831",
    "n02581957", "n02503517", "n02657368", "n08438533", "n02118333", "n10129825",
    "n02342885", "n03544360", "n01877134", "n03614007", "n03636248", "n03649909",
    "n02128385", "n02129165", "n01674464", "n01982650", "n10287213", "n12752205",
    "n03790512", "n09359803", "n02330245", "n13001041", "n12268246", "n07747607",
    "n12041446", "n02444819", "n12582231", "n07767847", "n03930630", "n11608250",
    "n09393605", "n03959485", "n11900569", "n02346627", "n01874928", "n02324045",
    "n02508021", "n01495701", "n04096066", "n04099429", "n12620196", "n09426788",
    "n02076196", "n01482330", "n01891633", "n07476495", "n04233124", "n01944390",
    "n01726692", "n01772222", "n02355227", "n04335435", "n11978233", "n12901264",
    "n04379243", "n04389033", "n04401088", "n06277280", "n02129604", "n04465501",
    "n04468005", "n07794452", "n12454159", "n01662784", "n04550184", "n02062744",
    "n12724942", "n02114100", "n10787470", "n01922303",
]

TINYIMAGENET200_WNIDS = [
    "n02124075", "n04067472", "n04540053", "n04099969", "n07749582", "n01641577",
    "n02802426", "n09246464", "n07920052", "n03970156", "n03891332", "n02106662",
    "n03201208", "n02279972", "n02132136", "n04146614", "n07873807", "n02364673",
    "n04507155", "n03854065", "n03838899", "n03733131", "n01443537", "n07875152",
    "n03544143", "n09428293", "n03085013", "n02437312", "n07614500", "n03804744",
    "n04265275", "n02963159", "n02486410", "n01944390", "n09256479", "n02058221",
    "n04275548", "n02321529", "n02769748", "n02099712", "n07695742", "n02056570",
    "n02281406", "n01774750", "n02509815", "n03983396", "n07753592", "n04254777",
    "n02233338", "n04008634", "n02823428", "n02236044", "n03393912", "n07583066",
    "n04074963", "n01629819", "n09332890", "n02481823", "n03902125", "n03404251",
    "n09193705", "n03637318", "n04456115", "n02666196", "n03796401", "n02795169",
    "n02123045", "n01855672", "n01882714", "n02917067", "n02988304", "n04398044",
    "n02843684", "n02423022", "n02669723", "n04465501", "n02165456", "n03770439",
    "n02099601", "n04486054", "n02950826", "n03814639", "n04259630", "n03424325",
    "n02948072", "n03179701", "n03400231", "n02206856", "n03160309", "n01984695",
    "n03977966", "n03584254", "n04023962", "n02814860", "n01910747", "n04596742",
    "n03992509", "n04133789", "n03937543", "n02927161", "n01945685", "n02395406",
    "n02125311", "n03126707", "n04532106", "n02268443", "n02977058", "n07734744",
    "n03599486", "n04562935", "n03014705", "n04251144", "n04356056", "n02190166",
    "n03670208", "n02002724", "n02074367", "n04285008", "n04560804", "n04366367",
    "n02403003", "n07615774", "n04501370", "n03026506", "n02906734", "n01770393",
    "n04597913", "n03930313", "n04118538", "n04179913", "n04311004", "n02123394",
    "n04070727", "n02793495", "n02730930", "n02094433", "n04371430", "n04328186",
    "n03649909", "n04417672", "n03388043", "n01774384", "n02837789", "n07579787",
    "n04399382", "n02791270", "n03089624", "n02814533", "n04149813", "n07747607",
    "n03355925", "n01983481", "n04487081", "n03250847", "n03255030", "n02892201",
    "n02883205", "n03100240", "n02415577", "n02480495", "n01698640", "n01784675",
    "n04376876", "n03444034", "n01917289", "n01950731", "n03042490", "n07711569",
    "n04532670", "n03763968", "n07768694", "n02999410", "n03617480", "n06596364",
    "n01768244", "n02410509", "n03976657", "n01742172", "n03980874", "n02808440",
    "n02226429", "n02231487", "n02085620", "n01644900", "n02129165", "n02699494",
    "n03837869", "n02815834", "n07720875", "n02788148", "n02909870", "n03706229",
    "n07871810", "n03447447", "n02113799", "n12267677", "n03662601", "n02841315",
    "n07715103", "n02504458",
]

DATASET_TO_WNIDS = {
    "CIFAR10": CIFAR10_WNIDS,
    "CIFAR100": CIFAR100_WNIDS,
    "TinyImagenet200": TINYIMAGENET200_WNIDS,
}


def dataset_to_dummy_wnids(dataset: str) -> List[str]:
    """FakeSynset wnids (f########) in class order (reference tree.py:20-23)."""
    num_classes = DATASET_TO_NUM_CLASSES[dataset]
    return ["f{:08d}".format(i) for i in range(num_classes)]


def get_dataset_wnids(dataset: str, path_wnids: Optional[str] = None) -> List[str]:
    """Resolve a dataset's wnid list: explicit file > packaged file >
    embedded constants > FakeSynset dummies."""
    from .hierarchy.wnid import get_wnids

    if path_wnids and os.path.exists(str(path_wnids)):
        return get_wnids(path_wnids)
    default = dataset_to_default_path_wnids(dataset)
    if os.path.exists(default):
        return get_wnids(default)
    if dataset in DATASET_TO_WNIDS:
        return list(DATASET_TO_WNIDS[dataset])
    return dataset_to_dummy_wnids(dataset)
