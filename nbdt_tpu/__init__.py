"""nbdt-tpu: Neural-Backed Decision Trees, rebuilt TPU-native.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
alvinwan/neural-backed-decision-trees (ICLR 2021): convert any image
classifier into an interpretable decision tree via class-hierarchy
traversal over the final layer's class embeddings, without changing the
network. Hierarchies are induced from trained weights (ward clustering),
taken from WordNet, or random; training adds a tree-supervision loss.

Architecture (TPU-first, not a port):
  hierarchy/  host-side graph construction and codecs
  tree        host Tree + compilation to static device arrays
  rules       decision rules as jitted tensor programs (Pallas-fusable)
  losses      pure-function tree-supervision losses
  models      Flax backbones + torch .pth checkpoint converter
  model       NBDT / SoftNBDT / HardNBDT / SegNBDT wrappers
  data        input pipelines
  parallel    device-mesh sharding for data-parallel training
  serving     AOT compile + self-contained StableHLO export (jax.export)
"""

__version__ = "0.1.0"

from .tree import Node, Tree, TreeArrays, dataset_to_dummy_classes
from .rules import (
    EmbeddedDecisionRules,
    HardEmbeddedDecisionRules,
    JTreeArrays,
    SoftEmbeddedDecisionRules,
    to_device_tree,
)
from .model import (
    HardNBDT,
    HardSegNBDT,
    NBDT,
    SegNBDT,
    SoftNBDT,
    SoftSegNBDT,
    model_urls,
)
from .losses import (
    CrossEntropyLoss,
    HardTreeSupLoss,
    SoftSegTreeSupLoss,
    SoftTreeLoss,
    SoftTreeSupLoss,
    TreeSupLoss,
    cross_entropy,
    hard_tree_sup_loss,
    soft_tree_sup_loss,
)
