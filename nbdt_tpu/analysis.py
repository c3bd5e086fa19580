"""Analyzer plugins: epoch-lifecycle eval instrumentation.

Rebuild of reference ``nbdt/analysis.py``: every analyzer derives from
``Noop`` with start/end_{epoch,train,test} hooks plus a per-batch
``update_batch(outputs, targets, images)``. Analyzers consume host numpy
arrays produced by the jitted eval step — the per-node probabilities and
entropies they need come from the same fused rules computation, so no extra
device passes are required.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from pathlib import Path
from typing import List, Optional

import numpy as np

from . import metrics
from .hierarchy.wnid import synset_to_wnid, wnid_to_synset
from .rules import HardEmbeddedDecisionRules as HardRules
from .rules import SoftEmbeddedDecisionRules as SoftRules
from .utils import Colors

__all__ = names = (
    "Noop",
    "ConfusionMatrix",
    "IgnoredSamples",
    "HardEmbeddedDecisionRules",
    "SoftEmbeddedDecisionRules",
    "Entropy",
    "Superclass",
    "SuperclassNBDT",
    "VisualizeDecisionNode",
    "NBDTEntropyMaxMin",
    "NBDTEntropyBottom",
    "TopEntropy",
    "TopDifference",
    "VisualizeHierarchyInference",
)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _entropy(probs, axis=-1):
    p = np.clip(probs, 1e-30, 1.0)
    return -(p * np.log(p)).sum(axis=axis)


class StartEndContext:
    def __init__(self, obj, name, epoch=0):
        self.obj = obj
        self.name = name
        self.epoch = epoch

    def __call__(self, epoch):
        self.epoch = epoch
        return self

    def __enter__(self):
        return getattr(self.obj, f"start_{self.name}")(self.epoch)

    def __exit__(self, type, value, traceback):
        getattr(self.obj, f"end_{self.name}")(self.epoch)


class Noop:
    """Base lifecycle plugin (reference analysis.py:82-127)."""

    def __init__(self, classes=()):
        self.classes = list(classes)
        self.num_classes = len(self.classes)
        self.epoch = None

    @property
    def epoch_context(self):
        return StartEndContext(self, "epoch")

    def start_epoch(self, epoch):
        self.epoch = epoch

    def start_train(self, epoch):
        pass

    def update_batch(self, outputs, targets, images=None):
        self._update_batch(outputs, targets)

    def _update_batch(self, outputs, targets):
        pass

    def end_train(self, epoch):
        pass

    def start_test(self, epoch):
        pass

    def end_test(self, epoch):
        pass

    def end_epoch(self, epoch):
        pass


class ConfusionMatrix(Noop):
    """Per-class recall/precision (reference analysis.py:133-180)."""

    def __init__(self, classes):
        super().__init__(classes)
        self.k = len(classes)
        self.m = None

    def start_test(self, epoch):
        self.m = np.zeros((self.k, self.k))

    def _update_batch(self, outputs, targets):
        predicted = np.asarray(outputs).argmax(1).ravel()
        targets = np.asarray(targets).ravel()
        np.add.at(self.m, (targets, predicted), 1)

    def end_test(self, epoch):
        recall = self.recall()
        for row, cls in zip(recall, self.classes):
            print(row, cls)
        print(recall.diagonal(), "(diagonal)")

    @staticmethod
    def normalize(m, axis):
        total = m.astype(np.float64).sum(axis=axis)
        total = total[:, None] if axis == 1 else total[None]
        return m / np.maximum(total, 1e-12)

    def recall(self):
        return ConfusionMatrix.normalize(self.m, 1)

    def precision(self):
        return ConfusionMatrix.normalize(self.m, 0)


class IgnoredSamples(Noop):
    """Counter for ignored (-1-marked) samples (reference analysis.py:183-202)."""

    def __init__(self, classes=()):
        super().__init__(classes)
        self.ignored = None

    def start_test(self, epoch):
        self.ignored = 0

    def _update_batch(self, outputs, targets):
        self.ignored += int((np.asarray(outputs)[:, 0] == -1).sum())
        return self.ignored

    def end_test(self, epoch):
        print("Ignored Samples: {}".format(self.ignored))


class DecisionRules(Noop):
    """Re-run NBDT rules over backbone logits, tracking NBDT accuracy
    separately from backbone accuracy (reference analysis.py:205-237)."""

    name = "NBDT"
    Rules = HardRules

    def __init__(self, *args, Rules=None, tree=None, metric="top1", **kwargs):
        self.rules = (Rules or self.Rules)(*args, tree=tree, **kwargs)
        super().__init__(self.rules.tree.classes)
        self.metric = getattr(metrics, metric)()
        self.best_accuracy = 0.0

    def start_test(self, epoch):
        self.metric.clear()

    def _update_batch(self, outputs, targets):
        outputs = np.asarray(self.rules.forward(outputs))
        self.metric.forward(outputs, targets)
        return self.accuracy

    def device_eval(self):
        """``(pure_fn, k)`` for device-side top-k counting of this
        analyzer's score, or None when unsupported.

        Lets the trainer's sync-free eval loop extend to analyzer runs: the
        NBDT re-scoring happens inside the same jitted count step as the
        backbone metric, so no per-batch logits are pulled to the host (on
        high-RTT transports the per-batch pull is 10x+ slower than the
        compute). Only the plain DecisionRules behavior qualifies —
        subclasses that customize per-batch host work (Superclass's
        mapping, ScoreSave's image capture) return None and keep the
        host loop."""
        cls = type(self)
        if (cls._update_batch is not DecisionRules._update_batch
                or cls.update_batch is not Noop.update_batch
                or not isinstance(self.metric, metrics.TopK)):
            return None
        if getattr(self, "_device_fwd", None) is None:
            from functools import partial

            from .rules import hard_forward, soft_forward
            from .rules import SoftEmbeddedDecisionRules as _SoftRules

            fwd = (soft_forward if isinstance(self.rules, _SoftRules)
                   else hard_forward)
            self._device_fwd = partial(fwd, jt=self.rules.jt)
        return self._device_fwd, self.metric.k

    @property
    def accuracy(self) -> float:
        """Analyzer-defined accuracy in percent (drives the reported score
        for zero-shot runs, where the standard test metric is disabled)."""
        return round(self.metric.report() * 100.0, 2)

    def end_test(self, epoch):
        accuracy = self.accuracy
        self.best_accuracy = max(accuracy, self.best_accuracy)
        print(
            f"[{self.name}] Accuracy: {accuracy}%, {self.metric.correct}/"
            f"{self.metric.total} | {self.name} Best Accuracy: "
            f"{self.best_accuracy}%"
        )


class HardEmbeddedDecisionRules(DecisionRules):
    name = "NBDT-Hard"
    Rules = HardRules


class SoftEmbeddedDecisionRules(DecisionRules):
    name = "NBDT-Soft"
    Rules = SoftRules


class ScoreSave(Noop):
    """Keep top-k/bottom-k scored images; write JPEGs at end of test
    (reference analysis.py:255-321). Images arrive as float NHWC in [0,1]
    or normalized space — pass an inverse transform for correct dumps."""

    def __init__(
        self,
        classes=(),
        save_k: int = 20,
        path: str = "out/score-{epoch}-{time}/image-{suffix}-{i}-{score:.2e}.jpg",
        inverse_transform=None,
        **kwargs,
    ):
        super().__init__(classes)
        self.k = save_k
        self.path = Path(path)
        self.time = int(time.time())
        self.inverse_transform = inverse_transform
        self.reset()

    def start_test(self, epoch):
        self.reset()

    def reset(self):
        self.max: List = []
        self.min: List = []

    def score(self, outputs, targets, images):
        raise NotImplementedError()

    def update_batch(self, outputs, targets, images=None):
        self._update_batch(outputs, targets)
        scores = self.score(outputs, targets, images)
        if images is None:
            images = [None] * len(scores)
        ois = list(zip(list(np.asarray(outputs)), list(images), scores))
        key = lambda t: t[-1]
        self.max = sorted(self.max + ois, reverse=True, key=key)[: self.k]
        self.min = sorted(self.min + ois, key=key)[: self.k]

    def end_test(self, epoch):
        directory = str(self.path.parent).format(time=self.time, epoch=self.epoch)
        os.makedirs(directory, exist_ok=True)
        try:
            from PIL import Image
        except ImportError:
            return
        for name, suffix, lst in (
            ("highest", "max", self.max),
            ("lowest", "min", self.min),
        ):
            print(f"==> Saving {len(lst)} {name} scored images in {directory}")
            for i, (_, image, score) in enumerate(lst):
                if image is None:
                    continue
                img = np.asarray(image)
                if self.inverse_transform is not None:
                    img = self.inverse_transform(img)
                # Explicit pixel contract (no range-sniffing): uint8 is
                # written as-is; float must be un-normalized [0,1] — the
                # Trainer guarantees that via _analyzer_images, and a
                # normalized image slipping through would silently write
                # garbage JPEGs otherwise.
                if img.dtype != np.uint8:
                    lo, hi = float(img.min()), float(img.max())
                    if lo < -0.01 or hi > 1.01:
                        raise ValueError(
                            f"{type(self).__name__} received float images "
                            f"outside [0,1] (range [{lo:.3g}, {hi:.3g}]): "
                            "pass the dataset's transform_val_inverse() as "
                            "inverse_transform= so dumps are un-normalized "
                            "(reference applies it in main.py:276-277)."
                        )
                    img = np.clip(img * 255.0, 0, 255)
                Image.fromarray(img.astype(np.uint8)).save(
                    str(self.path).format(
                        epoch=self.epoch, i=i, suffix=suffix, score=score,
                        time=self.time,
                    )
                )


class Entropy(ScoreSave):
    """Output-entropy statistics + extreme samples (reference
    analysis.py:324-361, Welford running mean/variance)."""

    def __init__(self, classes=(), path="out/entropy-{epoch}-{time}/image-{suffix}-{i}-{score:.2e}.jpg", **kwargs):
        super().__init__(classes, path=path, **kwargs)

    def reset(self):
        super().reset()
        self.avg = 0.0
        self.std = 0.0
        self.i = 0

    def score(self, outputs, targets, images):
        return list(_entropy(_softmax(np.asarray(outputs))))

    def update_batch(self, outputs, targets, images=None):
        super().update_batch(outputs, targets, images)
        for e_i in _entropy(_softmax(np.asarray(outputs))):
            self.i += 1
            prev = self.avg
            self.avg = prev + ((e_i - prev) / self.i)
            self.std = self.std + (e_i - prev) * (e_i - self.avg)

    def end_test(self, epoch):
        super().end_test(epoch)
        mx = float(self.max[0][-1]) if self.max else float("nan")
        mn = float(self.min[0][-1]) if self.min else float("nan")
        print(f"[Entropy] avg {self.avg:.2e}, std {self.std:.2e}, max {mx:.2e}, min {mn:.2e}")


class NBDTEntropyMaxMin(Entropy):
    """Score = spread of decision-path entropies (reference analysis.py:364-387)."""

    def __init__(self, *args, Rules=HardRules, path_graph=None, path_wnids=None,
                 dataset=None, tree=None,
                 path="out/entropy-nbdt-{epoch}-{time}/image-{suffix}-{i}-{score:.2e}.jpg",
                 **kwargs):
        super().__init__(*args, path=path, **kwargs)
        self.rules = Rules(
            path_graph=path_graph, path_wnids=path_wnids, dataset=dataset, tree=tree
        )

    def score(self, outputs, targets, images):
        _, decisions = self.rules.forward_with_decisions(outputs)
        entropies = [[node["entropy"] for node in path] for path in decisions]
        return [max(ent) - min(ent) for ent in entropies]


class NBDTEntropyBottom(NBDTEntropyMaxMin):
    """Score = gap between the two smallest path entropies.

    The reference scores only the final sample due to an indentation bug
    (analysis.py:396-402); fixed here to score every sample (SURVEY §7
    deliberate-quirk decision).
    """

    def score(self, outputs, targets, images):
        _, decisions = self.rules.forward_with_decisions(outputs)
        scores = []
        for path in decisions:
            entropies = sorted(node["entropy"] for node in path)
            bot1, bot2 = entropies[:2] if len(entropies) >= 2 else (0.0, 0.0)
            scores.append(bot2 - bot1)
        return scores


class TopEntropy(Entropy):
    """Entropy of the two smallest probs vs the rest (reference analysis.py:405-419)."""

    def score(self, outputs, targets, images):
        probs = _softmax(np.asarray(outputs))
        sorted_probs = np.sort(probs, axis=1)
        top2 = _entropy(sorted_probs[:, :2])
        rest = np.concatenate(
            [sorted_probs[:, :2].mean(axis=1, keepdims=True), sorted_probs[:, 2:]],
            axis=1,
        )
        return list(top2 - _entropy(rest))


class TopDifference(ScoreSave):
    """Top-2 probability margin (reference analysis.py:422-427)."""

    def score(self, outputs, targets, images):
        probs = _softmax(np.asarray(outputs))
        sorted_probs = np.sort(probs, axis=1)
        return list(sorted_probs[:, -1] - sorted_probs[:, -2])


class Superclass(DecisionRules):
    """Zero-shot superclass eval (reference analysis.py:430-535): map both
    train-classes and test-classes onto user-provided hypernym wnids via
    WordNet hypernym closure, mask unmapped logits, compare in superclass
    space. Requires the WordNet corpus unless ``mapping`` (a dict
    ``leaf wnid -> superclass index``, applied to both class spaces) is
    given. ``mapping_test`` optionally overrides the mapping for the TEST
    label space only — the offline analog of the reference's
    ``--dataset-test`` flow, where unseen test categories map to a
    superclass without existing in the prediction space at all (e.g.
    exclude a trained-but-unseen class's wnid from ``mapping`` while its
    samples' targets resolve through ``mapping_test``)."""

    name = "Superclass"
    Rules = SoftRules

    def __init__(self, *args, superclass_wnids, dataset_test=None, Rules=None,
                 tree=None, tree_test=None, metric=None, mapping=None,
                 mapping_test=None, **kwargs):
        super().__init__(*args, tree=tree, Rules=Rules or self.Rules, **kwargs)
        rules_cls = Rules or self.Rules
        if tree_test is not None or dataset_test is not None:
            self.rules_test = rules_cls(dataset=dataset_test, tree=tree_test)
        else:
            self.rules_test = self.rules
        self.superclass_wnids = list(superclass_wnids)
        self.total = self.correct = 0

        def resolve(wnids_leaves, mapping):
            if mapping is not None:
                new_to_old = defaultdict(list)
                arr = []
                for old_index, w in enumerate(wnids_leaves):
                    value = int(mapping.get(w, -1))
                    arr.append(value)
                    new_to_old[value].append(old_index)
                return np.array(arr), new_to_old
            return self.build_mapping(wnids_leaves, self.superclass_wnids)

        self.mapping_target, self.new_to_old_classes_target = resolve(
            self.rules_test.tree.wnids_leaves,
            mapping if mapping_test is None else mapping_test,
        )
        self.mapping_pred, self.new_to_old_classes_pred = resolve(
            self.rules.tree.wnids_leaves, mapping
        )
        mapped = [
            self.classes[i] for i in np.flatnonzero(self.mapping_pred >= 0)
            if i < len(self.classes)
        ]
        if not mapped:
            Colors.red(
                "WARNING: 0 classes mapped to your superclasses — every "
                "sample will be skipped and accuracy will read 0%. Offline "
                "(no WordNet corpus), pass mapping= explicitly or use leaf "
                "wnids as superclass wnids."
            )
        else:
            Colors.cyan(
                f"==> Mapped {len(mapped)} classes to your superclasses: "
                f"{mapped}"
            )

    @staticmethod
    def build_mapping(dataset_wnids, superclass_wnids):
        new_to_old_classes = defaultdict(list)
        mapping = []
        for old_index, dataset_wnid in enumerate(dataset_wnids):
            synset = wnid_to_synset(dataset_wnid)
            hypernym_wnids = [
                synset_to_wnid(s) for s in Superclass.all_hypernyms(synset)
            ]
            value = -1
            for new_index, superclass_wnid in enumerate(superclass_wnids):
                if superclass_wnid in hypernym_wnids:
                    value = new_index
                    break
            mapping.append(value)
            new_to_old_classes[value].append(old_index)
        return np.array(mapping), new_to_old_classes

    @staticmethod
    def all_hypernyms(synset):
        hypernyms = []
        frontier = [synset]
        while frontier:
            current = frontier.pop(0)
            hypernyms.append(current)
            frontier.extend(current.hypernyms())
        return hypernyms

    def forward(self, outputs, targets):
        outputs = np.array(np.asarray(outputs), copy=True)
        targets = self.mapping_target[np.asarray(targets)]
        outputs = outputs[targets >= 0]
        targets = targets[targets >= 0]
        outputs[:, self.mapping_pred < 0] = -100
        if outputs.shape[0] == 0:
            return np.array([]), np.array([])
        predicted = self.mapping_pred[outputs.argmax(1)]
        return predicted, targets

    def start_test(self, epoch):
        self.total = self.correct = 0

    @property
    def accuracy(self) -> float:
        return round(self.correct / (float(self.total) or 1) * 100.0, 2)

    def _update_batch(self, outputs, targets):
        predicted, targets = self.forward(outputs, targets)
        self.total += len(predicted)
        self.correct += int((predicted == targets).sum())
        return f"{self.name}: {self.accuracy}%"

    def end_test(self, epoch):
        print(f"[{self.name}] Accuracy: {self.accuracy}%, {self.correct}/{self.total}")


class SuperclassNBDT(Superclass):
    """Score superclass *node* logits directly (reference analysis.py:538-559)."""

    name = "Superclass-NBDT"
    Rules = SoftRules

    def forward(self, outputs, targets):
        outputs = np.asarray(outputs)
        # mean logits over each superclass's member classes
        num_super = max(
            (k for k in self.new_to_old_classes_pred if k >= 0), default=-1
        ) + 1
        if num_super == 0:
            # no class mapped to any superclass (the constructor already
            # warned): behave like the parent — zero predictions, 0% acc
            return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        cols = []
        for k in range(num_super):
            old = self.new_to_old_classes_pred.get(k, [])
            cols.append(
                outputs[:, old].mean(axis=1) if old else np.full(len(outputs), -1e30)
            )
        super_logits = np.stack(cols, axis=1)
        predicted = super_logits.argmax(1)
        targets = self.mapping_target[np.asarray(targets)]
        predicted = predicted[targets >= 0]
        targets = targets[targets >= 0]
        return predicted, targets


class VisualizeDecisionNode(ScoreSave):
    """Save samples most similar to a chosen decision node
    (reference analysis.py:562-589): score = the node's RAW child logit
    toward the chosen wnid (the reference ranks by logit, not softmax
    probability — per-sample softmax re-normalization would reorder the
    cross-sample ranking). When ``superclass_wnids`` is given, samples whose
    label maps to no superclass score 0 (the reference inherits this zeroing
    from Superclass)."""

    def __init__(self, *args, visualize_decision_node_wnid, tree=None,
                 Rules=SoftRules, dataset=None, path_graph=None, path_wnids=None,
                 superclass_wnids=None,
                 path="out/vdn-{epoch}-{time}/image-{suffix}-{i}-{score:.2e}.jpg",
                 **kwargs):
        super().__init__(*args, path=path, **kwargs)
        self.rules = Rules(
            tree=tree, dataset=dataset, path_graph=path_graph, path_wnids=path_wnids
        )
        self.wnid = visualize_decision_node_wnid
        self.mapping_target = None
        if superclass_wnids:
            self.mapping_target, _ = Superclass.build_mapping(
                self.rules.tree.wnids_leaves, list(superclass_wnids)
            )

    def score(self, outputs, targets, images):
        tree = self.rules.tree
        node = tree.wnid_to_node[self.wnid]
        parent = node.parent
        assert parent is not None, f"{self.wnid} has no parent"
        wnid_to_outputs = self.rules.forward_nodes(outputs)
        out = wnid_to_outputs[parent.wnid]
        child_index = parent.wnid_to_child_index(self.wnid)
        similarity = np.asarray(out["logits"][:, child_index], dtype=float)
        if self.mapping_target is not None and targets is not None:
            mapped = self.mapping_target[np.asarray(targets)]
            similarity = np.where(mapped >= 0, similarity, 0.0)
        return list(similarity)


class VisualizeHierarchyInference(Noop):
    """Write a per-sample hierarchy-inference HTML with per-edge traversal
    probabilities (reference analysis.py:592-628)."""

    def __init__(self, classes=(), tree=None, Rules=SoftRules, dataset=None,
                 path_graph=None, path_wnids=None, out_dir="out/vis-inference",
                 limit: int = 8, **kwargs):
        self.rules = Rules(
            tree=tree, dataset=dataset, path_graph=path_graph, path_wnids=path_wnids
        )
        super().__init__(self.rules.tree.classes)
        self.out_dir = out_dir
        self.limit = limit
        self._written = 0

    def start_test(self, epoch):
        self._written = 0

    def update_batch(self, outputs, targets, images=None):
        if self._written >= self.limit:
            return
        from .hierarchy.vis import generate_hierarchy_vis_from

        _, decisions = self.rules.forward_with_decisions(outputs)
        os.makedirs(self.out_dir, exist_ok=True)
        for b, decision in enumerate(decisions):
            if self._written >= self.limit:
                break
            path_html = os.path.join(
                self.out_dir, f"sample-{self.epoch}-{self._written}.html"
            )
            path_wnids = [step["node"].wnid for step in decision]
            probs = {step["node"].wnid: step["prob"] for step in decision}
            generate_hierarchy_vis_from(
                self.rules.tree.G,
                dataset=self.rules.tree.dataset,
                path_html=path_html,
                color_path_to=path_wnids[-1],
                edge_probs=probs,
            )
            self._written += 1
