"""NBDT model wrappers: backbone -> decision rules.

Rebuild of reference ``nbdt/model.py:281-399``. A wrapper composes any
backbone returning logits with embedded decision rules. The backbone here is
any callable ``x -> logits`` — typically a jitted Flax apply closing over
params — so the whole forward (conv stack + rules) stays inside one XLA
program.

Pretrained loading reproduces the reference contract (model.py:27-57,
337-341): released torch ``.pth`` checkpoints keyed by (arch, dataset[,
hierarchy]) are fetched (or read from a local cache), converted to Flax
params, and loaded into the registered backbone.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .rules import HardEmbeddedDecisionRules, SoftEmbeddedDecisionRules
from .tree import Tree
from .utils import coerce_tensor, uncoerce_tensor

# Released reference checkpoints (reference model.py:27-57). Downloads are
# attempted lazily and fail gracefully offline; a local path may be supplied
# instead via ``checkpoint_path``.
model_urls = {
    ("ResNet18", "CIFAR10"): "https://github.com/alvinwan/neural-backed-decision-trees/releases/download/0.0.1/ckpt-CIFAR10-ResNet18-induced-ResNet18-SoftTreeSupLoss.pth",
    ("wrn28_10_cifar10", "CIFAR10"): "https://github.com/alvinwan/neural-backed-decision-trees/releases/download/0.0.1/ckpt-CIFAR10-wrn28_10_cifar10-induced-wrn28_10_cifar10-SoftTreeSupLoss.pth",
    ("wrn28_10_cifar10", "CIFAR10", "wordnet"): "https://github.com/alvinwan/neural-backed-decision-trees/releases/download/0.0.1/ckpt-CIFAR10-wrn28_10_cifar10-wordnet-SoftTreeSupLoss.pth",
    ("ResNet18", "CIFAR100"): "https://github.com/alvinwan/neural-backed-decision-trees/releases/download/0.0.1/ckpt-CIFAR100-ResNet18-induced-ResNet18-SoftTreeSupLoss.pth",
    ("wrn28_10_cifar100", "CIFAR100"): "https://github.com/alvinwan/neural-backed-decision-trees/releases/download/0.0.1/ckpt-CIFAR100-wrn28_10_cifar100-induced-wrn28_10_cifar100-SoftTreeSupLoss.pth",
    ("ResNet18", "TinyImagenet200"): "https://github.com/alvinwan/neural-backed-decision-trees/releases/download/0.0.1/ckpt-TinyImagenet200-ResNet18-induced-ResNet18-SoftTreeSupLoss-tsw10.0.pth",
    ("wrn28_10", "TinyImagenet200"): "https://github.com/alvinwan/neural-backed-decision-trees/releases/download/0.0.1/ckpt-TinyImagenet200-wrn28_10-induced-wrn28_10-SoftTreeSupLoss-tsw10.0.pth",
}


class TaggedOutput(np.ndarray):
    """Array tagged as NBDT output to poison accidental reuse in losses
    (reference model.py:198, 272 sets ``_nbdt_output_flag``)."""

    def __new__(cls, array):
        obj = np.asarray(array).view(cls)
        obj._nbdt_output_flag = True
        return obj

    def __array_finalize__(self, obj):
        self._nbdt_output_flag = True


class NBDT:
    """Backbone + decision rules (reference model.py:281-361).

    ``model`` is a callable ``x -> logits``. For Flax modules, pass
    ``model=module`` together with ``params=...`` and the wrapper builds the
    apply function (eval mode: BatchNorm uses running averages).
    """

    Rules = HardEmbeddedDecisionRules

    def __init__(
        self,
        dataset: Optional[str],
        model: Callable,
        arch: Optional[str] = None,
        path_graph: Optional[str] = None,
        path_wnids: Optional[str] = None,
        classes=None,
        hierarchy: Optional[str] = None,
        pretrained: bool = False,
        tree: Optional[Tree] = None,
        params=None,
        checkpoint_path: Optional[str] = None,
        Rules=None,
        fused: bool = False,
        fold_bn: bool = False,
    ):
        if dataset and not hierarchy and not path_graph and tree is None:
            assert arch, "Must specify `arch` if no `hierarchy` or `path_graph`"
            hierarchy = f"induced-{arch}"
        if pretrained and not arch:
            raise UserWarning(
                "To load a pretrained NBDT, specify the `arch` (e.g. ResNet18)."
            )

        if pretrained:
            params = self._load_pretrained_params(
                model, arch, dataset, hierarchy, checkpoint_path
            )

        if classes is None and dataset and tree is None:
            # Human-readable class names from the registry when known
            # (reference bin/nbdt passes DATASET_TO_CLASSES; plain wnid
            # dummies otherwise). Skipped entirely when a tree is supplied —
            # it already carries its classes, and an unregistered dataset
            # name must not be forced through the registry.
            from .tree import dataset_to_dummy_classes
            from .utils import DATASET_TO_CLASSES, DATASET_TO_NUM_CLASSES

            classes = DATASET_TO_CLASSES.get(dataset)
            if classes is None and dataset in DATASET_TO_NUM_CLASSES:
                classes = dataset_to_dummy_classes(dataset)
        if tree is None:
            try:
                tree = Tree(
                    dataset, path_graph, path_wnids, classes, hierarchy=hierarchy
                )
            except FileNotFoundError:
                # No packaged graph for this hierarchy. For induced-*, the
                # hierarchy is a pure function of the classifier weights —
                # induce it from the loaded params right here (offline path;
                # reference requires the pre-generated JSON instead).
                if not (hierarchy or "").startswith("induced") or params is None:
                    raise
                from .assets import get_dataset_wnids
                from .hierarchy.build import build_induced_graph
                from .hierarchy.generate import get_centers_from_flax_params

                centers = get_centers_from_flax_params(params)
                assert centers is not None, "no classifier kernel in params"
                wnids = get_dataset_wnids(dataset, path_wnids)
                G = build_induced_graph(wnids, centers)
                tree = Tree.from_graph(G, wnids, classes=classes, dataset=dataset)
        self.tree = tree
        self.dataset = dataset
        self.arch = arch
        self.hierarchy = hierarchy
        self.rules = (Rules or self.Rules)(tree=tree)

        self.params = params
        assert not (fused and fold_bn), (
            "fused=True and fold_bn=True are separate serving paths; the "
            "fused kernel consumes pre-pool features from the unfolded "
            "module — pick one"
        )
        if fold_bn:
            # Serving optimization (models/fold.py): BN affine baked into
            # the conv weights, same predictions (exact argmax parity
            # tested), one fewer op chain per conv. The UNFOLDED params stay
            # on self.params — they remain the checkpoint/induction source
            # of truth; only the forward callable uses the folded pair.
            from .models.fold import fold_batchnorm

            assert params is not None and hasattr(model, "apply"), (
                "fold_bn=True needs a Flax module + params"
            )
            variables = params if "params" in params else {"params": params}
            model, folded_vars = fold_batchnorm(model, variables)
            self.model = self._as_callable(model, folded_vars)
        else:
            self.model = self._as_callable(model, params)
        # Opt-in fused serving path: backbone features + the Pallas
        # classifier-and-traversal kernel in one jitted program (soft rules
        # only; decisions/analyzers keep the jnp path).
        self._fused_forward = (
            self._build_fused(model, params, tree) if fused else None
        )

    def _build_fused(self, model, params, tree):
        import jax

        from .hierarchy.generate import get_classifier_from_flax_params
        from .ops.soft_traversal import fused_soft_head, prepare_head_constants

        assert isinstance(self, SoftNBDT), (
            "fused=True is the soft-rules serving path (hard rules and "
            "segmentation keep the jnp formulation)"
        )
        assert params is not None and hasattr(model, "apply"), (
            "fused=True needs a Flax module + params"
        )
        kernel, bias = get_classifier_from_flax_params(params)
        assert kernel is not None, "no classifier kernel found in params"
        hc = prepare_head_constants(tree.arrays, kernel, bias)
        variables = params if "params" in params else {"params": params}

        @jax.jit
        def fwd(x):
            feats = model.apply(variables, x, train=False, features_only=True)
            (leaf,) = fused_soft_head(feats, hc, want_aux=False)
            return leaf

        return fwd

    # -- backbone plumbing ---------------------------------------------------

    @staticmethod
    def _as_callable(model, params) -> Callable:
        if callable(model) and params is None:
            return model
        # Flax module + params: eval-mode apply.
        import flax.linen as nn  # noqa: F401

        variables = params if "params" in params else {"params": params}

        def apply_fn(x):
            return model.apply(variables, x, train=False)

        return apply_fn

    def _load_pretrained_params(self, model, arch, dataset, hierarchy, checkpoint_path):
        from .models.utils import load_state_dict_from_key
        from .models.convert import torch_state_dict_to_flax

        if checkpoint_path and str(checkpoint_path).endswith(".msgpack"):
            # This repo's own checkpoint format (Trainer.save / the convert
            # CLI): already a flax variables tree, no torch key mapping.
            import flax.serialization

            with open(checkpoint_path, "rb") as f:
                return flax.serialization.msgpack_restore(f.read())

        keys = [(arch, dataset), (arch, dataset, hierarchy)]
        state_dict = load_state_dict_from_key(
            keys, model_urls, pretrained=True, checkpoint_path=checkpoint_path
        )
        return torch_state_dict_to_flax(state_dict, arch=arch)

    # -- forward -------------------------------------------------------------

    def forward(self, x):
        if self._fused_forward is not None:
            leaf_logp = self._fused_forward(jnp.asarray(x))
            # exp(leaf log-probs) == the rules' raw probability product
            return TaggedOutput(np.exp(np.asarray(leaf_logp)))
        outputs = self.model(jnp.asarray(x))
        outputs = self.rules(outputs)
        return TaggedOutput(np.asarray(outputs))

    __call__ = forward

    def forward_with_decisions(self, x):
        outputs = self.model(jnp.asarray(x))
        outputs, decisions = self.rules.forward_with_decisions(outputs)
        return TaggedOutput(np.asarray(outputs)), decisions


class HardNBDT(NBDT):
    Rules = HardEmbeddedDecisionRules


class SoftNBDT(NBDT):
    Rules = SoftEmbeddedDecisionRules


class SegNBDT(NBDT):
    """Per-pixel decision rules for segmentation (reference model.py:376-387).

    Backbone outputs NHWC class maps (TPU-native layout; the reference is
    NCHW). Pixels flatten into the batch axis, rules run once, unflatten.
    """

    def forward(self, x):
        x = jnp.asarray(x)
        assert x.ndim == 4, "Input must be (N, H, W, C) for segmentation"
        out = self.model(x)
        original_shape = out.shape
        flat = coerce_tensor(out)
        flat = self.rules(flat)
        return TaggedOutput(np.asarray(uncoerce_tensor(flat, original_shape)))

    __call__ = forward


class HardSegNBDT(SegNBDT):
    Rules = HardEmbeddedDecisionRules


class SoftSegNBDT(SegNBDT):
    Rules = SoftEmbeddedDecisionRules
