"""Training loop: jitted SGD steps with tree-supervision losses.

Rebuild of reference ``main.py`` (argparse trainer): SGD momentum 0.9,
weight decay 5e-4, MultiStepLR at 3/7 and 5/7 of total epochs with gamma
0.1 (main.py:207-210), batch 512, best-accuracy checkpointing
(main.py:299-307), dual backbone/NBDT accuracy reporting via analyzers
(main.py:261-308).

TPU-native structure: the whole step — forward, loss (including the tree
term), backward, update — is one jitted function; schedule weights enter as
scalar args so epoch changes don't retrigger compilation; the tree constants
are closed-over jit constants. Data parallelism = sharding the batch over a
mesh (see nbdt_tpu.parallel); the same step function runs on 1 chip or many.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .losses import cross_entropy, hard_tree_sup_loss, soft_tree_sup_loss
from .rules import JTreeArrays
from .utils import Colors, generate_checkpoint_fname


@dataclass
class TrainConfig:
    dataset: str = "CIFAR10"
    arch: str = "ResNet18"
    batch_size: int = 512
    epochs: int = 200
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 5e-4
    loss: str = "SoftTreeSupLoss"  # CrossEntropyLoss | SoftTreeSupLoss | HardTreeSupLoss | SoftTreeLoss
    tree_supervision_weight: float = 1.0
    tree_supervision_weight_end: Optional[float] = None
    tree_supervision_weight_power: float = 1.0
    xent_weight: float = 1.0
    xent_weight_end: Optional[float] = None
    xent_weight_power: float = 1.0
    hierarchy: Optional[str] = None
    path_graph: Optional[str] = None
    path_wnids: Optional[str] = None
    checkpoint_dir: str = "./checkpoint"
    name: str = ""
    metric: str = "top1"  # top1|top2|top5|top10 (reference main.py:221)
    # Zero-shot flow (reference main.py:62-72, 272-275): skip the standard
    # test-set metric when the test dataset's label space differs from the
    # train classes — the analyzer (e.g. Superclass) defines the metric.
    disable_test_eval: bool = False
    seed: int = 0
    remat: bool = False  # jax.checkpoint the forward (trade FLOPs for HBM)
    # Device-resident dataset mode: upload the whole uint8 train store to
    # HBM once and gather + augment + normalize inside the jitted step —
    # per-step host->device traffic drops to scalars, so low-bandwidth
    # transports train at the device step rate (CIFAR10 = 150 MB resident).
    cache_dataset: bool = False
    # Label-subset flags, recorded so the checkpoint fname codec encodes
    # them (reference utils.py:268-335) — without them a subset run and a
    # full-dataset run collide on the same checkpoint path.
    include_labels: tuple = ()
    exclude_labels: tuple = ()
    include_classes: tuple = ()
    cache_crop_pad: int = 4  # RandomCrop padding of the in-jit augment
    cache_flip: bool = True  # RandomHorizontalFlip of the in-jit augment
    # Optimizer steps per dispatch in cached mode (lax.scan): amortizes the
    # per-call transport overhead, which rivals the step time itself on
    # high-RTT links. 1 = one dispatch per step.
    cache_steps_per_call: int = 16
    checkpoint_backend: str = "msgpack"  # msgpack | orbax (sharding-aware)
    # Preemption safety: write a rolling "<fname>-last" checkpoint every
    # epoch so an interrupted run resumes from its latest state, not just
    # the best-accuracy one (beyond the reference, which keeps only best).
    save_last: bool = True
    # SoftTreeLoss schedule (reference loss.py:278-292)
    tree_start_epochs: int = 67
    tree_update_every_epochs: int = 10
    tree_update_end_epochs: int = 120


def lr_boundaries(epochs: int, steps_per_epoch: int) -> dict:
    """Step boundaries for the MultiStepLR drops, epoch-aligned: the drop
    lands at the first step of epoch int(3/7*E) / int(5/7*E) (reference
    milestones, main.py:207-210), not at int(3/7 * total_steps)."""
    steps_per_epoch = max(1, steps_per_epoch)
    boundaries: dict = {}
    for milestone_epoch in (int(epochs * 3 / 7), int(epochs * 5 / 7)):
        step = milestone_epoch * steps_per_epoch
        boundaries[step] = boundaries.get(step, 1.0) * 0.1
    return boundaries


def _fast_forward_schedule(opt_state, step: int):
    """Set every schedule step-count in the optimizer state to ``step``.

    make_optimizer's LR schedule rides on optax.ScaleByScheduleState.count;
    after a resume re-inits the state, the count must jump to the resumed
    step or the MultiStepLR drops replay from scratch."""
    import jax.numpy as jnp

    def bump(s):
        if isinstance(s, optax.ScaleByScheduleState):
            # Uncommitted scalar (like optax.init's own zeros): jit places
            # it freely; a committed copy would clash with mesh-placed
            # params in the donated step.
            return optax.ScaleByScheduleState(
                count=jnp.asarray(step, dtype=s.count.dtype)
            )
        return s

    return jax.tree_util.tree_map(
        bump, opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState),
    )


def make_optimizer(config: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """torch SGD(momentum, weight_decay) + MultiStepLR(3/7E, 5/7E, gamma=.1).

    MultiStepLR milestones are *epoch*-aligned (reference main.py:207-210):
    the drop lands at the first step of epoch int(3/7*E) / int(5/7*E), not at
    int(3/7 * total_steps) — those differ by up to ~1 epoch when 3E is not
    divisible by 7.
    """
    schedule = optax.piecewise_constant_schedule(
        config.lr, lr_boundaries(config.epochs, steps_per_epoch)
    )
    return optax.chain(
        optax.add_decayed_weights(config.weight_decay),
        optax.trace(decay=config.momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )


def tree_term_fn(
    loss_name: str,
    jt: Optional[JTreeArrays],
    tsw: float,
    criterion_fn: Optional[Callable] = None,
    pre_start: bool = False,
) -> Callable:
    """The tree component of the total loss, by loss name.

    For HardTreeSupLoss the reference's double-tsw quirk is preserved: tsw
    is applied inside the tree term AND via the scheduled tree weight
    (see losses.py HardTreeSupLoss note).

    ``pre_start`` (SoftTreeLoss only): before ``tree_start_epochs`` the
    reference's SoftTreeLoss.forward_tree returns the plain base criterion
    (loss.py:297-299), so the total is criterion*(xw + tw) — the tree term IS
    the criterion, not zero.

    ``criterion_fn``: base criterion applied to the soft-rules leaf
    distribution (reference loss.py:264-266 applies self.criterion, not a
    hardcoded CE). Defaults to cross-entropy.
    """
    criterion = criterion_fn or cross_entropy
    if loss_name in ("CrossEntropyLoss", None, ""):
        return lambda logits, targets: 0.0
    assert jt is not None, f"{loss_name} requires a tree"
    if loss_name == "SoftTreeLoss" and pre_start:
        return criterion
    if loss_name in ("SoftTreeSupLoss", "SoftTreeLoss"):
        return lambda logits, targets: soft_tree_sup_loss(
            logits, targets, jt, criterion=criterion
        )
    if loss_name == "HardTreeSupLoss":
        if criterion is cross_entropy:
            return lambda logits, targets: hard_tree_sup_loss(
                logits, targets, jt, tree_supervision_weight=tsw
            )
        # Custom criterion: the reference routes self.criterion into every
        # bucketed sub-problem (loss.py:247-251); the jittable general form
        # vmaps it per (sample, node) pair — exact for mean-decomposable
        # criteria (see losses.hard_tree_sup_loss_custom).
        from .losses import hard_tree_sup_loss_custom

        return lambda logits, targets: hard_tree_sup_loss_custom(
            logits, targets, jt, criterion=criterion,
            tree_supervision_weight=tsw,
        )
    raise KeyError(f"Unknown loss {loss_name!r}")


def _normalize_prologue(normalize):
    """Device-side normalization for uint8 batches (identity when None).

    Same rounding as the host path: f32 affine first, any backbone bf16
    cast happens inside module.apply (mirrors serving.make_serving_fn's
    uint8_input handling)."""
    if normalize is None:
        return lambda x: x
    mean = jnp.asarray(np.asarray(normalize[0], np.float32) * 255.0)
    inv = jnp.asarray(1.0 / (np.asarray(normalize[1], np.float32) * 255.0))

    def prologue(x):
        return (x.astype(jnp.float32) - mean) * inv

    return prologue


def _unwrap_loader(loader):
    """Peel prefetch/decorator wrappers down to the underlying DataLoader
    (PrefetchLoader forwards iteration but not the flat-array attrs the
    cache-dataset fast path reads — main.py always wraps the train loader)."""
    while hasattr(loader, "loader"):
        loader = loader.loader
    return loader


def _device_augment(x: jnp.ndarray, key, crop_pad: int, flip: bool) -> jnp.ndarray:
    """Random pad+crop+flip inside jit (uint8 in, uint8 out) — the
    torchvision RandomCrop(pad)/RandomHorizontalFlip pair as vectorized
    device ops.

    The per-image crop is two single-axis take_along_axis gathers, NOT
    vmap(dynamic_slice): the batched 3-D gather that lowers to costs
    ~9 ms per 512-batch on a v5e — half the whole train step (measured
    25 -> 16 ms/step when replaced). Also measured and NOT kept: fusing
    crop+flip into one flattened H*W-index gather (flip = reversed column
    indices) is 0.81x in the full step (tools/probe_augment.py) — the flat
    1-D gather de-tiles worse than the two small axis-wise gathers.
    """
    B, H, W, C = x.shape
    kc, kf = jax.random.split(key)
    if crop_pad:
        xp = jnp.pad(x, ((0, 0), (crop_pad, crop_pad),
                         (crop_pad, crop_pad), (0, 0)))
        offs = jax.random.randint(kc, (B, 2), 0, 2 * crop_pad + 1)
        rows = offs[:, :1] + jnp.arange(H)[None]  # [B, H]
        cols = offs[:, 1:] + jnp.arange(W)[None]  # [B, W]
        x = jnp.take_along_axis(xp, rows[:, :, None, None], axis=1)
        x = jnp.take_along_axis(x, cols[:, None, :, None], axis=2)
    if flip:
        f = jax.random.bernoulli(kf, 0.5, (B,))
        x = jnp.where(f[:, None, None, None], x[:, :, ::-1, :], x)
    return x


def make_train_step(module, optimizer, loss_name: str, jt: Optional[JTreeArrays],
                    tsw: float = 1.0, remat: bool = False,
                    criterion_fn: Optional[Callable] = None,
                    pre_start: bool = False, opt_sharding=None,
                    param_sharding=None, normalize=None,
                    cached: bool = False, batch_size: Optional[int] = None,
                    crop_pad: int = 4, flip: bool = True,
                    batch_sharding=None, steps_per_call: int = 1):
    """Build the jitted train step.

    step(params, batch_stats, opt_state, x, y, tree_weight, xent_weight)
      -> (params, batch_stats, opt_state, metrics-dict)

    params/batch_stats/opt_state buffers are donated — they are consumed and
    rewritten every step, so XLA updates them in place (halves peak HBM for
    the optimizer state). ``remat=True`` wraps the forward in
    ``jax.checkpoint``: activations are recomputed during backward instead of
    stored — the standard FLOPs-for-HBM trade for big backbones
    (EfficientNet-B7 @ 224) or large per-chip batches.

    ``criterion_fn(logits, targets)`` is the base criterion the tree loss
    wraps (reference TreeSupLoss wraps *any* criterion, loss.py:97-111);
    defaults to cross-entropy. ``pre_start`` selects the SoftTreeLoss
    warm-up semantics (tree term = base criterion) — the Trainer rebuilds
    the step once when the tree kicks in at ``tree_start_epochs``.

    ``opt_sharding``: optional pytree of NamedShardings (congruent with the
    optimizer state) pinning the updated optimizer state's placement — the
    ZeRO-1 path (parallel.zero): momentum buffers stay sharded over dp
    across donated steps instead of being re-replicated by layout
    propagation. ``param_sharding`` (same idea, congruent with params) pins
    the updated params; without it XLA's propagation pushes the momentum's
    dp-sharding into the params too (de-facto ZeRO-3), inserting an
    all-gather into every forward.

    ``normalize``: optional ``(mean, std)`` in [0,1] units. When set, the
    step takes RAW UINT8 batches and normalizes on device — 4x fewer
    host->device bytes, the bound on PCIe/tunnel-attached training (pair
    with ``transform_train(device_normalize=True)`` loaders).

    ``cached=True``: device-resident dataset mode. The returned step's
    signature becomes ``step(params, batch_stats, opt_state, images,
    labels, perm, step_i, rng, tree_weight, xent_weight)`` — the caller
    passes the (already device-resident) uint8 store and labels every call;
    the step slices ``batch_size`` indices from the on-device permutation,
    gathers, augments (``crop_pad``/``flip``) and normalizes in-jit.
    Requires ``normalize``; ``batch_sharding`` pins the gathered batch's
    mesh placement.
    """
    criterion = criterion_fn or cross_entropy
    tree_term = tree_term_fn(loss_name, jt, tsw, criterion_fn=criterion,
                             pre_start=pre_start)
    prologue = _normalize_prologue(normalize)

    apply_fn = module.apply
    if remat:
        apply_fn = jax.checkpoint(
            lambda variables, x: module.apply(
                variables, x, train=True, mutable=["batch_stats"]
            ),
            static_argnums=(),
        )

    def forward(p, batch_stats, x):
        if remat:
            return apply_fn({"params": p, "batch_stats": batch_stats}, x)
        return module.apply(
            {"params": p, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
        )

    def core(params, batch_stats, opt_state, x, y, tree_weight, xent_weight):
        def loss_fn(p):
            logits, mutated = forward(p, batch_stats, x)
            loss_x = criterion(logits, y)
            loss_t = tree_term(logits, y)
            total = loss_x * xent_weight + loss_t * tree_weight
            return total, (logits, mutated["batch_stats"], loss_x, loss_t)

        (total, (logits, new_stats, loss_x, loss_t)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        if opt_sharding is not None:
            new_opt_state = jax.lax.with_sharding_constraint(
                new_opt_state, opt_sharding
            )
        new_params = optax.apply_updates(params, updates)
        if param_sharding is not None:
            new_params = jax.lax.with_sharding_constraint(
                new_params, param_sharding
            )
        acc = (jnp.argmax(logits, -1) == y).mean()
        metrics = {
            "loss": total, "loss_xent": loss_x, "loss_tree": loss_t, "acc": acc,
            # Raw backbone logits ride along (device-resident, ~B*C floats)
            # so analyzers can observe training batches like the reference's
            # train loop does (main.py:244); Trainer pops them from the
            # scalar metrics.
            "logits": logits,
        }
        return new_params, new_stats, new_opt_state, metrics

    if not cached:
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, batch_stats, opt_state, x, y, tree_weight,
                 xent_weight):
            return core(params, batch_stats, opt_state, prologue(x), y,
                        tree_weight, xent_weight)

        return step

    # Device-resident dataset mode: the full uint8 store lives in HBM and
    # is passed as an ARGUMENT every step (device-resident arrays are
    # passed by reference — NOT closed over as jit constants, which would
    # embed ~150 MB into the lowered program and stall compilation through
    # a remote tunnel; measured the hard way). Each step slices its batch
    # indices from the on-device epoch permutation and augments
    # (pad/crop/flip) + normalizes in-jit. Per-step host->device traffic
    # is a few scalars — on a high-RTT or low-bandwidth transport (the
    # axon tunnel, which caps host-fed training at the upload rate) this
    # removes the transfer bound entirely and trains at the device step
    # rate. The Trainer uploads the store once and threads it through.
    assert normalize is not None, (
        "cached_data requires normalize=(mean, std) — the store is raw "
        "uint8 and must be normalized in the step"
    )
    assert batch_size is not None

    def one_step(params, batch_stats, opt_state, images, labels, perm,
                 step_i, rng, tree_weight, xent_weight):
        idx = jax.lax.dynamic_slice(perm, (step_i * batch_size,),
                                    (batch_size,))
        x = jnp.take(images, idx, axis=0)
        y = jnp.take(labels, idx, axis=0)
        x = _device_augment(x, jax.random.fold_in(rng, step_i),
                            crop_pad, flip)
        x = prologue(x)
        if batch_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, batch_sharding)
            y = jax.lax.with_sharding_constraint(y, batch_sharding)
        return core(params, batch_stats, opt_state, x, y, tree_weight,
                    xent_weight)

    if steps_per_call == 1:
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def cached_step(params, batch_stats, opt_state, images, labels,
                        perm, step_i, rng, tree_weight, xent_weight):
            new_p, new_s, new_o, m = one_step(
                params, batch_stats, opt_state, images, labels, perm,
                step_i, rng, tree_weight, xent_weight,
            )
            m.pop("logits")  # uniform with the scan variant
            return new_p, new_s, new_o, m

        return cached_step

    # Multi-step: lax.scan runs steps_per_call optimizer steps per
    # dispatch, so the per-call transport overhead (one RTT + arg
    # marshalling — ~15 ms/step measured through the axon tunnel, nearly
    # the step time itself) amortizes away. Identical math to K separate
    # calls: the carry threads params/stats/opt through sequentially.
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def cached_multi_step(params, batch_stats, opt_state, images, labels,
                          perm, step0, rng, tree_weight, xent_weight):
        def body(carry, i):
            p, s, o = carry
            new_p, new_s, new_o, m = one_step(
                p, s, o, images, labels, perm, step0 + i, rng,
                tree_weight, xent_weight,
            )
            m.pop("logits")  # [B, C] per step would be K x B x C of HBM
            return (new_p, new_s, new_o), m

        (p, s, o), ms = jax.lax.scan(
            body, (params, batch_stats, opt_state),
            jnp.arange(steps_per_call),
        )
        return p, s, o, {k: v[-1] for k, v in ms.items()}

    return cached_multi_step


def _batch_hit_counts(module, prologue, params, batch_stats, x, y, valid,
                      k, analyzer_fwd, analyzer_k):
    """One batch's masked top-k hit counts — the SINGLE definition shared
    by the host-fed and cached eval step builders, so the two paths (whose
    numbers the benchmarks compare against each other) cannot silently
    diverge. Returns (hits, analyzer_hits_or_None, count)."""
    logits = module.apply(
        {"params": params, "batch_stats": batch_stats}, prologue(x),
        train=False,
    )

    def topk_hits(scores, kk):
        kk = min(kk, scores.shape[-1])
        _, topk = jax.lax.top_k(scores, kk)
        return ((topk == y[:, None]).any(-1) & valid).sum()

    ahits = None
    if analyzer_fwd is not None:
        ahits = topk_hits(analyzer_fwd(logits.astype(jnp.float32)),
                          analyzer_k)
    return topk_hits(logits, k), ahits, valid.sum()


def make_cached_eval_count_step(module, k: int, batch_size: int,
                                n_batches: int, normalize=None,
                                analyzer_fwd=None, analyzer_k: int = 1):
    """Whole-eval-in-one-dispatch: scan over the device-resident test store
    counting top-k hits (and optionally an analyzer's) — the cached-mode
    companion of make_eval_count_step. The store arrives pre-padded to
    ``n_batches * batch_size`` with a validity mask."""
    prologue = _normalize_prologue(normalize)

    @jax.jit
    def step(params, batch_stats, images, labels, valid):
        def body(carry, i):
            x = jax.lax.dynamic_slice_in_dim(images, i * batch_size,
                                             batch_size)
            y = jax.lax.dynamic_slice_in_dim(labels, i * batch_size,
                                             batch_size)
            v = jax.lax.dynamic_slice_in_dim(valid, i * batch_size,
                                             batch_size)
            hits, ahits, total = carry
            h, a, c = _batch_hit_counts(module, prologue, params,
                                        batch_stats, x, y, v, k,
                                        analyzer_fwd, analyzer_k)
            if a is not None:
                ahits = ahits + a
            return (hits + h, ahits, total + c), None

        zero = jnp.int32(0)
        (hits, ahits, total), _ = jax.lax.scan(
            body, (zero, zero, zero), jnp.arange(n_batches)
        )
        return hits, ahits, total

    return step


def make_eval_step(module, normalize=None):
    prologue = _normalize_prologue(normalize)

    @jax.jit
    def step(params, batch_stats, x):
        return module.apply(
            {"params": params, "batch_stats": batch_stats}, prologue(x),
            train=False,
        )

    return step


def make_eval_count_step(module, k: int, normalize=None, analyzer_fwd=None,
                         analyzer_k: int = 1):
    """Jitted top-k hit counting: returns device scalars (hits[, analyzer
    hits], count) so the eval loop never syncs per batch (the host pulls a
    few ints once per eval). Padded samples are masked by ``valid``.

    ``analyzer_fwd`` (from DecisionRules.device_eval): a pure logits ->
    scores fn re-scored inside the SAME step, sharing the backbone forward
    — the NBDT analyzer accuracy comes out as one more device scalar
    instead of a per-batch host pull. Under a mesh, the sums reduce over
    the global (sharded) batch, so the returned scalars are already
    global — no host-side all-reduce needed, even multi-host."""
    prologue = _normalize_prologue(normalize)

    @jax.jit
    def step(params, batch_stats, x, y, valid):
        hits, ahits, total = _batch_hit_counts(
            module, prologue, params, batch_stats, x, y, valid, k,
            analyzer_fwd, analyzer_k,
        )
        if ahits is None:
            return hits, total
        return hits, ahits, total

    return step


class Trainer:
    """End-to-end trainer (reference main.py semantics)."""

    def __init__(
        self,
        config: TrainConfig,
        module,
        variables,
        trainloader,
        testloader,
        tree=None,
        analyzer=None,
        criterion_state=None,
        show_progress: bool = False,
        mesh=None,
        criterion_fn: Optional[Callable] = None,
        inverse_transform: Optional[Callable] = None,
        zero: bool = False,
        device_normalize=None,
        device_normalize_eval=None,
    ):
        """``mesh``: optional jax.sharding.Mesh with a "dp" axis. When given,
        the trainer replicates params over the mesh and shards every batch's
        leading axis over dp — the same jitted step then runs data-parallel
        on any number of chips, with XLA emitting the gradient all-reduces
        (replaces the reference's DataParallel wrap, main.py:160-161).

        ``zero``: ZeRO-1 — shard optimizer momentum buffers 1/|dp| per
        device (parallel.zero); params stay replicated. Requires ``mesh``.

        ``device_normalize``: ``(mean, std)`` in [0,1] units — loaders ship
        RAW UINT8 batches (transform_*(device_normalize=True)) and both
        jitted steps normalize on device (4x fewer host->device bytes).
        ``device_normalize_eval`` overrides the eval-side constants (the
        test set's own — they differ in zero-shot --dataset-test runs);
        defaults to ``device_normalize``."""
        self.show_progress = show_progress
        self.config = config
        self.module = module
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from .parallel import batch_sharding, host_array, replicate

            repl = replicate(mesh)
            copy = lambda t: jax.tree_util.tree_map(
                lambda a: host_array(np.asarray(a), repl), t
            )
            self._batch_sharding = batch_sharding(mesh)
        else:
            # Private copies either way: the train step donates these buffers
            # (in-place update), which would otherwise delete the caller's
            # arrays out from under it.
            copy = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.array(a, copy=True), t
            )
        self._copy = copy  # reused by load() to re-place restored arrays
        self.params = copy(variables["params"])
        self.batch_stats = copy(variables.get("batch_stats", {}))
        self.trainloader = trainloader
        self.testloader = testloader
        self.tree = tree
        self.analyzer = analyzer
        # Images handed to analyzers are un-normalized first (reference
        # main.py:276-277 applies transform_val_inverse) so image-writing
        # analyzers (ScoreSave family) dump real pixels, not normalized ones.
        self.inverse_transform = inverse_transform
        # criterion_state (e.g. the SoftTreeLoss wrapper, for tree refresh)
        # is a property: assigning it also records its current device tree,
        # so a refresh that happens on the very first set_epoch (offset 0 on
        # resume) is seen as a change and rebuilds the step.
        self.criterion_state = criterion_state

        if tree is None and config.loss != "CrossEntropyLoss":
            # Resolve the hierarchy from the config, like the reference's
            # TreeSupLoss does from dataset/hierarchy (loss.py:135-142) —
            # callers shouldn't have to pre-build a Tree the config already
            # describes. Class names come from the train set when it carries
            # them (matches main.py's construction).
            if config.path_graph or config.hierarchy:
                from .tree import Tree

                dataset = _unwrap_loader(trainloader).dataset
                tree = Tree(
                    config.dataset,
                    path_graph=config.path_graph,
                    path_wnids=config.path_wnids,
                    classes=list(getattr(dataset, "classes", []) or []) or None,
                    hierarchy=config.hierarchy,
                )
            else:
                raise ValueError(
                    f"{config.loss} needs a hierarchy: pass tree=, or set "
                    f"TrainConfig.path_graph / TrainConfig.hierarchy"
                )
            self.tree = tree
        jt = None
        if tree is not None and config.loss != "CrossEntropyLoss":
            from .rules import to_device_tree

            jt = to_device_tree(tree.arrays)
        self.jt = jt

        self.criterion_fn = criterion_fn
        self.device_normalize = device_normalize
        self.device_normalize_eval = (
            device_normalize_eval if device_normalize_eval is not None
            else device_normalize
        )
        # Cache eligibility up-front (the cached branch below reuses it):
        # plain DecisionRules analyzers score on device (analysis.
        # device_eval), anything with custom host behavior forces the host
        # loader path.
        self._use_cache = config.cache_dataset and (
            analyzer is None or (hasattr(analyzer, "device_eval")
                                 and analyzer.device_eval() is not None)
        )
        # LR milestones must count the steps that actually run: the cached
        # epoch executes floor(n/B) whole batches (no partial tail), while
        # len(loader) counts ceil — one mismatched step per epoch drifts
        # the MultiStepLR boundaries and the resume fast-forward.
        self._steps_per_epoch = max(1, len(trainloader))
        if self._use_cache:
            n_train = len(_unwrap_loader(trainloader).dataset)
            self._steps_per_epoch = max(1, n_train // config.batch_size)
        self.optimizer = make_optimizer(config, self._steps_per_epoch)
        self.opt_state = self.optimizer.init(self.params)
        self._opt_sharding = None
        self._param_sharding = None
        if zero:
            assert mesh is not None, "zero=True requires a mesh"
            from .parallel import replicate
            from .parallel.zero import shard_opt_state, zero_sharding

            self._opt_sharding = zero_sharding(mesh, self.opt_state)
            self.opt_state = shard_opt_state(
                mesh, self.opt_state, shardings=self._opt_sharding
            )
            self._zero_mesh = mesh
            # Params stay replicated (ZeRO-1, not ZeRO-3): pin them, or
            # XLA's propagation shards them like the momentum.
            repl_m = replicate(mesh)
            self._param_sharding = jax.tree_util.tree_map(
                lambda _: repl_m, self.params
            )
        self._pre_start = (
            config.loss == "SoftTreeLoss" and config.tree_start_epochs > 0
        )
        self._cached_train = None
        self._cached_test = None
        self._cached_n = 0
        self._store_normalize = None
        self._store_normalize_eval = None
        if config.cache_dataset:
            if not self._use_cache:
                Colors.red(
                    "==> cache_dataset disabled: analyzer "
                    f"{type(analyzer).__name__} needs per-batch host "
                    "images/logits (no device_eval)"
                )
            else:
                if analyzer is not None:
                    Colors.cyan(
                        "==> cache_dataset + device analyzer: NBDT "
                        "accuracy is device-counted at eval; train-batch "
                        "analyzer updates (display only) are skipped"
                    )
                images, labels = self._materialize_uint8(trainloader)
                # Normalize constants for the RESIDENT uint8 stores ONLY.
                # When device_normalize is unset the HOST loaders already
                # normalize, so writing derived constants back into
                # device_normalize_eval would double-normalize the host
                # eval path (eval_step) that analyzer/disable_test_eval
                # runs still use.
                if self.device_normalize is not None:
                    self._store_normalize = self.device_normalize
                else:
                    ds = _unwrap_loader(trainloader).dataset
                    self._store_normalize = (ds.mean, ds.std)
                if self.device_normalize_eval is not None:
                    self._store_normalize_eval = self.device_normalize_eval
                else:
                    tds = _unwrap_loader(testloader).dataset
                    self._store_normalize_eval = (
                        (tds.mean, tds.std) if hasattr(tds, "mean")
                        else self._store_normalize
                    )
                # One upload; replicated on a mesh. The arrays are then
                # passed BY REFERENCE into every step (never as jit
                # constants — see make_train_step).
                if mesh is not None:
                    from .parallel import replicate

                    place = lambda a: jax.device_put(a, replicate(mesh))
                else:
                    place = jax.device_put
                self._cached_train = (
                    place(images), place(labels.astype(np.int32))
                )
                self._cached_n = len(labels)
                # Test store too: evaluate() then runs as ONE dispatch
                # (scan over resident batches), padded to a whole number
                # of batches with a validity mask.
                ti, tl_ = self._materialize_uint8(testloader)
                B = config.batch_size
                nb = (len(tl_) + B - 1) // B
                pad = nb * B - len(tl_)
                tv = np.ones(len(tl_), bool)
                if pad:
                    ti = np.concatenate(
                        [ti, np.zeros((pad,) + ti.shape[1:], np.uint8)]
                    )
                    tl_ = np.concatenate([tl_, np.zeros(pad, tl_.dtype)])
                    tv = np.concatenate([tv, np.zeros(pad, bool)])
                self._cached_test = (
                    place(ti), place(tl_.astype(np.int32)), place(tv), nb
                )
        self.train_step = self._make_step(jt)
        self.eval_step = make_eval_step(
            module, normalize=self.device_normalize_eval
        )
        self.best_acc = 0.0
        self.start_epoch = 0

    @property
    def criterion_state(self):
        return self._criterion_state

    @criterion_state.setter
    def criterion_state(self, cs):
        """Record the criterion's current device tree at assignment time so
        train_epoch can detect regeneration by identity — including one that
        happens on the criterion's very first set_epoch call (e.g. a resume
        landing exactly on a refresh epoch)."""
        self._criterion_state = cs
        self._criterion_jt = getattr(cs, "jt", None)

    def _make_step(self, jt, steps_per_call: int = 1):
        if self._cached_train is not None:
            steps = self._cached_n // self.config.batch_size
            K = max(1, min(self.config.cache_steps_per_call, steps))
            self._cached_K = K
            rest = steps % K
            build = lambda k: make_train_step(
                self.module, self.optimizer, self.config.loss, jt,
                tsw=self.config.tree_supervision_weight,
                remat=self.config.remat,
                criterion_fn=self.criterion_fn, pre_start=self._pre_start,
                opt_sharding=self._opt_sharding,
                param_sharding=self._param_sharding,
                normalize=self._store_normalize,
                cached=True, batch_size=self.config.batch_size,
                crop_pad=self.config.cache_crop_pad,
                flip=self.config.cache_flip,
                batch_sharding=self._batch_sharding,
                steps_per_call=k,
            )
            # leftover steps (epoch length not divisible by K) get their
            # own smaller scan — one extra compile, not a dropped tail
            self._train_step_rest = build(rest) if rest else None
            return build(K)
        return make_train_step(
            self.module, self.optimizer, self.config.loss, jt,
            tsw=self.config.tree_supervision_weight, remat=self.config.remat,
            criterion_fn=self.criterion_fn, pre_start=self._pre_start,
            opt_sharding=self._opt_sharding,
            param_sharding=self._param_sharding,
            normalize=self.device_normalize,
        )

    @staticmethod
    def _materialize_uint8(trainloader):
        """Full (images uint8 [N,H,W,C], labels) arrays for device caching.

        Prefetch wrappers are unwrapped first. The DataLoader's flat-array
        fast path exposes the store directly — its ``images`` is the FULL
        base store with ``_index`` as the subset-wrapper remap, while its
        ``labels`` were ALREADY remapped at construction (data/loader.py),
        so only the images are indexed here. Otherwise the dataset streams
        once through ``dataset[i]``."""
        trainloader = _unwrap_loader(trainloader)
        if getattr(trainloader, "images", None) is not None:
            images = trainloader.images
            labels = trainloader.labels
            index = getattr(trainloader, "_index", None)
            if index is not None:
                images = images[index]
            return np.ascontiguousarray(images), np.asarray(labels)
        ds = trainloader.dataset
        samples = [ds[i] for i in range(len(ds))]
        images = np.stack([s[0] for s in samples])
        assert images.dtype == np.uint8, (
            f"cache_dataset needs raw uint8 samples, got {images.dtype}"
        )
        return images, np.asarray([s[1] for s in samples])

    def _put(self, a):
        """Host batch -> device array, sharded over dp when a mesh is set.

        Multi-host: the local batch is this process's slice of the global
        batch (loaders yield batch_size/process_count per host)."""
        if self._batch_sharding is not None:
            from .parallel import process_local_batch

            return process_local_batch(np.asarray(a), self._batch_sharding)
        return jnp.asarray(a)

    # -- weight schedules (reference loss.py:184-209) ------------------------

    def _weights(self, epoch: int) -> Tuple[float, float]:
        from .losses import scheduled_weight

        c = self.config
        progress = epoch / c.epochs if c.epochs else 1.0

        def sched(start, end, power):
            return scheduled_weight(start, end if end is not None else start,
                                    progress, power)

        tw = sched(
            c.tree_supervision_weight,
            c.tree_supervision_weight_end,
            c.tree_supervision_weight_power,
        )
        xw = sched(c.xent_weight, c.xent_weight_end, c.xent_weight_power)
        # SoftTreeLoss pre-start: tw stays scheduled — the reference's
        # forward_tree returns the base criterion before tree_start_epochs
        # (loss.py:297-299), so the total is criterion*(xw + tw). The step's
        # tree term handles the switch (pre_start in make_train_step).
        return tw, xw

    # -- epochs --------------------------------------------------------------

    def train_epoch(self, epoch: int) -> dict:
        tw, xw = self._weights(epoch)
        want_pre = (
            self.config.loss == "SoftTreeLoss"
            and epoch < self.config.tree_start_epochs
        )
        if want_pre != self._pre_start:
            # SoftTreeLoss warm-up ends: swap the step's tree term from the
            # base criterion to the soft tree loss (one recompile, once).
            self._pre_start = want_pre
            self.train_step = self._make_step(self.jt)
        if self.criterion_state is not None:
            self.criterion_state.set_epoch(epoch, self.config.epochs)
            # SoftTreeLoss may have regenerated the induced hierarchy from
            # live params (reference loss.py:303-315). The tree constants are
            # closed-over jit constants, so the step must be rebuilt (one
            # recompile per refresh epoch, not per step). The criterion holds
            # its own device copy of the initial tree, so track the last jt
            # we saw from it rather than comparing against our own.
            new_jt = getattr(self.criterion_state, "jt", None)
            if new_jt is not None and new_jt is not self._criterion_jt:
                # The criterion's device tree changed identity since it was
                # assigned — a regeneration, even if it happened on its very
                # first set_epoch call (resume onto a refresh epoch).
                self._criterion_jt = new_jt
                self.jt = new_jt
                self.train_step = self._make_step(new_jt)
        if self._cached_train is not None:
            return self._train_epoch_cached(epoch, tw, xw)
        t0 = time.time()
        last = {}
        n_batches = len(self.trainloader)
        if self.analyzer is not None:
            # Reference lifecycle: the analyzer wraps the train loop too
            # (start_end_decorator on the train fn, main.py:224) and sees
            # every training batch (update_batch, main.py:244-245).
            self.analyzer.start_train(epoch)
        # The hot loop is SYNC-FREE by default: metrics stay device arrays
        # and the host never blocks, so step dispatches pipeline and the
        # device runs back-to-back (XLA's runtime bounds the queue). A
        # per-step host sync is only paid where something actually consumes
        # host values each step — the progress bar (UI opt-in) or an
        # attached analyzer (its update_batch contract is numpy). Through a
        # high-RTT transport (the axon tunnel) per-step syncing is the
        # difference between ~1.4k and ~25k imgs/s end-to-end.
        for i, (x, y, valid) in enumerate(self.trainloader):
            self.params, self.batch_stats, self.opt_state, m = self.train_step(
                self.params, self.batch_stats, self.opt_state,
                self._put(x), self._put(y),
                jnp.float32(tw), jnp.float32(xw),
            )
            m = dict(m)
            logits = m.pop("logits")
            last = m
            if self.analyzer is not None:
                from .parallel import local_data

                imgs = self._analyzer_images(x)
                # multi-host: the logits are globally sharded and not fully
                # addressable (np.asarray would raise); this host's rows
                # pair with its local x/y slice. Single-process this is
                # just np.asarray.
                self.analyzer.update_batch(local_data(logits),
                                           np.asarray(y), imgs)
            if self.show_progress:
                from .utils import progress_bar

                progress_bar(
                    i, n_batches,
                    f"Loss: {float(m['loss']):.3f} | "
                    f"Acc: {float(m['acc']) * 100:.2f}%",
                )
        if self.analyzer is not None:
            self.analyzer.end_train(epoch)
        last = {k: float(v) for k, v in last.items()}  # one sync per epoch
        last["time"] = time.time() - t0
        return last

    def _train_epoch_cached(self, epoch: int, tw: float, xw: float) -> dict:
        """Device-resident epoch: the uint8 store stays in HBM and is
        passed to the step BY REFERENCE as an argument (never a jit
        constant — CLAUDE.md invariant); only a step index, an rng key,
        and the weights cross the host->device boundary. Sync-free like
        the host loop (metrics convert once at the end); the permutation
        is generated on device.
        """
        import jax.random as jrandom

        t0 = time.time()
        B = self.config.batch_size
        steps = self._cached_n // B
        assert steps > 0, (
            f"cache_dataset: batch {B} exceeds dataset size {self._cached_n}"
        )
        key = jrandom.fold_in(jrandom.PRNGKey(self.config.seed), epoch)
        kperm, kaug = jrandom.split(key)
        perm = jrandom.permutation(kperm, self._cached_n).astype(jnp.int32)
        last = {}
        images, labels = self._cached_train
        K = self._cached_K
        n_calls = steps // K
        tw, xw = jnp.float32(tw), jnp.float32(xw)
        for c in range(n_calls):
            self.params, self.batch_stats, self.opt_state, m = self.train_step(
                self.params, self.batch_stats, self.opt_state,
                images, labels, perm, c * K, kaug, tw, xw,
            )
            last = dict(m)
            if self.show_progress:
                from .utils import progress_bar

                progress_bar(
                    c, n_calls,
                    f"Loss: {float(last['loss']):.3f} | "
                    f"Acc: {float(last['acc']) * 100:.2f}%",
                )
        if self._train_step_rest is not None:
            self.params, self.batch_stats, self.opt_state, m = (
                self._train_step_rest(
                    self.params, self.batch_stats, self.opt_state,
                    images, labels, perm, n_calls * K, kaug, tw, xw,
                )
            )
            last = dict(m)
        last = {k: float(v) for k, v in last.items()}  # one sync per epoch
        last["time"] = time.time() - t0
        return last

    def _analyzer_images(self, x) -> np.ndarray:
        """Un-normalized [0,1] pixels for analyzer hooks (reference
        main.py:276-277 applies transform_val_inverse). Device-normalize
        batches are raw uint8 — already un-normalized, just rescale."""
        imgs = np.asarray(x)
        if imgs.dtype == np.uint8:
            return imgs.astype(np.float32) / 255.0
        if self.inverse_transform is not None:
            imgs = np.asarray(self.inverse_transform(imgs))
        return imgs

    @staticmethod
    def _allreduce_counts(holder) -> None:
        """Sum a counter object's (correct, total) across hosts in place."""
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.array([holder.correct, holder.total], np.int64)
        )
        holder.correct = int(counts[:, 0].sum())
        holder.total = int(counts[:, 1].sum())

    def evaluate(self, epoch: int = 0, checkpoint: bool = True) -> float:
        from . import metrics

        metric = getattr(metrics, self.config.metric)()
        # Eval-only runs (--eval) never pass through fit()'s epoch loop, so
        # the analyzer's epoch would stay None and "{epoch}" output paths
        # (ScoreSave, VisualizeHierarchyInference) would render as "None"
        # — the reference wraps its eval in epoch_context(0)
        # (main.py:317-324), so seed the epoch here if unset.
        start_ep = getattr(self.analyzer, "start_epoch", None)
        if (start_ep is not None
                and getattr(self.analyzer, "epoch", None) is None):
            start_ep(epoch)
        # Device-countable analyzer (plain DecisionRules): its NBDT score
        # rides the same jitted count step — see analysis.device_eval.
        analyzer_dev = None
        if (self.analyzer is not None
                and hasattr(self.analyzer, "device_eval")):
            analyzer_dev = self.analyzer.device_eval()
        fast = ((self.analyzer is None or analyzer_dev is not None)
                and not self.config.disable_test_eval
                and isinstance(metric, metrics.TopK))
        if fast:
            # Sync-free fast path: nothing consumes per-batch host values,
            # so count top-k hits on device and pull a few ints at the end —
            # per-batch logits transfers cost one transport RTT each, which
            # dominates eval on high-RTT links (see train_epoch). Works
            # under a mesh too: the jitted sums reduce over the global
            # batch, so the scalars are already global on every host. Falls
            # through to the shared report/checkpoint tail below.
            key = (metric.k, analyzer_dev[0] if analyzer_dev else None)
            if getattr(self, "_count_key", None) != key:
                self._count_key = key
                self._count_step = make_eval_count_step(
                    self.module, metric.k,
                    normalize=self.device_normalize_eval,
                    analyzer_fwd=analyzer_dev[0] if analyzer_dev else None,
                    analyzer_k=analyzer_dev[1] if analyzer_dev else 1,
                )
            if self.analyzer is not None:
                self.analyzer.start_test(epoch)
            if self._cached_test is not None:
                # One dispatch for the whole eval over the resident store.
                imgs, lbls, valid, nb = self._cached_test
                ckey = (metric.k,
                        analyzer_dev[0] if analyzer_dev else None, nb)
                if getattr(self, "_ccount_key", None) != ckey:
                    self._ccount_key = ckey
                    self._ccount_step = make_cached_eval_count_step(
                        self.module, metric.k, self.config.batch_size, nb,
                        normalize=self._store_normalize_eval,
                        analyzer_fwd=analyzer_dev[0] if analyzer_dev
                        else None,
                        analyzer_k=analyzer_dev[1] if analyzer_dev else 1,
                    )
                h, a, t = self._ccount_step(
                    self.params, self.batch_stats, imgs, lbls, valid
                )
                metric.correct, metric.total = int(h), int(t)
                if self.analyzer is not None:
                    if analyzer_dev is not None:
                        self.analyzer.metric.correct = int(a)
                        self.analyzer.metric.total = metric.total
                    self.analyzer.end_test(epoch)
                return self._finish_eval(metric, epoch, checkpoint)
            hits = ahits = total = None
            for x, y, valid in self.testloader:
                res = self._count_step(
                    self.params, self.batch_stats, self._put(x),
                    self._put(np.asarray(y)), self._put(np.asarray(valid)),
                )
                h, t = res[0], res[-1]
                hits = h if hits is None else hits + h
                total = t if total is None else total + t
                if analyzer_dev is not None:
                    a = res[1]
                    ahits = a if ahits is None else ahits + a
            metric.correct = int(hits) if hits is not None else 0
            metric.total = int(total) if total is not None else 0
            if self.analyzer is not None:
                if analyzer_dev is not None:
                    self.analyzer.metric.correct = (
                        int(ahits) if ahits is not None else 0
                    )
                    self.analyzer.metric.total = metric.total
                self.analyzer.end_test(epoch)
            return self._finish_eval(metric, epoch, checkpoint)
        if self.analyzer is not None:
            self.analyzer.start_test(epoch)
        for x, y, valid in self.testloader:
            logits = self.eval_step(self.params, self.batch_stats, self._put(x))
            if self.mesh is not None:
                from .parallel import local_data

                # Multi-host: score this host's slice (x/y/valid are local).
                logits_np = local_data(logits)[valid]
            else:
                logits_np = np.asarray(logits)[valid]
            y_np = np.asarray(y)[valid]
            if not self.config.disable_test_eval:
                # Zero-shot runs skip the standard metric — test labels live
                # in a different space; the analyzer scores instead
                # (reference main.py:272-275).
                metric.forward(logits_np, y_np)
            if self.analyzer is not None:
                imgs = self._analyzer_images(np.asarray(x)[valid])
                self.analyzer.update_batch(logits_np, y_np, imgs)
        if self.mesh is not None and jax.process_count() > 1:
            # All-reduce metrics across hosts: each process scored only its
            # local shard, and the acc > best_acc checkpoint decision must
            # be identical everywhere (a per-host decision would save at
            # different epochs — and deadlock orbax, whose save is a
            # cross-process collective). Analyzer counters get the same
            # treatment — they ARE the metric in zero-shot runs.
            self._allreduce_counts(metric)
            an = self.analyzer
            if an is not None:
                # Own counters first (Superclass scores via self.correct/
                # total and leaves its inherited .metric untouched), else
                # the analyzer's TopK metric (DecisionRules family).
                if hasattr(an, "correct") and hasattr(an, "total"):
                    self._allreduce_counts(an)
                elif hasattr(getattr(an, "metric", None), "correct"):
                    self._allreduce_counts(an.metric)
        if self.analyzer is not None:
            self.analyzer.end_test(epoch)
        return self._finish_eval(metric, epoch, checkpoint)

    def _finish_eval(self, metric, epoch: int, checkpoint: bool) -> float:
        """Shared eval tail: report + best-accuracy checkpoint policy (one
        copy, whichever batch loop filled the metric)."""
        acc = metric.report() * 100.0
        if checkpoint and acc > self.best_acc:
            self.best_acc = acc
            self.save(epoch, acc)
        return acc

    def fit(self, log_every: int = 1) -> float:
        for epoch in range(self.start_epoch, self.config.epochs):
            if self.analyzer is not None:
                self.analyzer.start_epoch(epoch)
            stats = self.train_epoch(epoch)
            acc = self.evaluate(epoch)
            if self.config.save_last:
                # epoch+1: resuming from "-last" restarts AFTER this epoch.
                self.save(epoch + 1, acc, suffix="-last")
            if self.analyzer is not None:
                self.analyzer.end_epoch(epoch)
            if epoch % log_every == 0:
                Colors.cyan(
                    f"[epoch {epoch}] loss={stats.get('loss', 0):.4f} "
                    f"train_acc={stats.get('acc', 0) * 100:.2f}% "
                    f"test_acc={acc:.2f}% best={self.best_acc:.2f}% "
                    f"({stats.get('time', 0):.1f}s)"
                )
        return self.best_acc

    @property
    def variables(self):
        """Current model variables in Flax ``apply`` form — the dict
        ``NBDT(..., params=...)`` and ``module.apply`` expect. The values are
        the live (donated-into) training buffers; copy before mutating."""
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    # -- checkpointing (reference main.py:299-307 + utils codec) -------------

    def checkpoint_fname(self) -> str:
        c = self.config
        return generate_checkpoint_fname(
            dataset=c.dataset,
            arch=c.arch,
            path_graph=c.path_graph,
            loss=[c.loss],
            lr=c.lr,
            name=c.name,
            tree_supervision_weight=c.tree_supervision_weight,
            tree_supervision_weight_end=c.tree_supervision_weight_end,
            tree_supervision_weight_power=c.tree_supervision_weight_power,
            xent_weight=c.xent_weight,
            xent_weight_end=c.xent_weight_end,
            xent_weight_power=c.xent_weight_power,
            include_labels=tuple(c.include_labels or ()),
            exclude_labels=tuple(c.exclude_labels or ()),
            include_classes=tuple(c.include_classes or ()),
        )

    def save(self, epoch: int, acc: float, suffix: str = "") -> str:
        """Write a checkpoint; ``suffix`` distinguishes the rolling
        last-epoch checkpoint ("-last", preemption resume) from the
        best-accuracy one (reference main.py:299-307 keeps only the best)."""
        os.makedirs(self.config.checkpoint_dir, exist_ok=True)
        path = os.path.join(
            self.config.checkpoint_dir, self.checkpoint_fname() + suffix
        )
        payload = {
            "params": jax.device_get(self.params),
            "batch_stats": jax.device_get(self.batch_stats),
        }
        if self.config.checkpoint_backend == "orbax":
            # Sharding-aware directory checkpoint: on a mesh, each host
            # writes its own shards (required for multi-host; msgpack would
            # gather everything to one host).
            import orbax.checkpoint as ocp

            ckpt_dir = os.path.abspath(path + ".orbax")
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(ckpt_dir, payload, force=True)
            saved = ckpt_dir
        else:
            import flax.serialization

            with open(path + ".msgpack", "wb") as f:
                f.write(flax.serialization.to_bytes(payload))
            saved = path + ".msgpack"
        with open(path + ".json", "w") as f:
            # best_acc is stored too: the rolling "-last" checkpoint holds
            # the CURRENT epoch's accuracy, and a resume restoring that as
            # best would let a worse-than-historical epoch overwrite the
            # best-accuracy checkpoint. max() keeps the direct-save contract
            # (save(acc=x) without touching best_acc restores best as x).
            json.dump({"acc": acc, "epoch": epoch, "arch": self.config.arch,
                       "best_acc": max(self.best_acc, acc)}, f)
        return saved

    def load(self, path: str) -> None:
        if path.endswith(".orbax") or os.path.isdir(path):
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                payload = ckptr.restore(os.path.abspath(path))
            meta_path = path[: -len(".orbax")] + ".json" \
                if path.endswith(".orbax") else path + ".json"
        else:
            import flax.serialization

            with open(path, "rb") as f:
                payload = flax.serialization.from_bytes(
                    {"params": self.params, "batch_stats": self.batch_stats},
                    f.read(),
                )
            meta_path = path.replace(".msgpack", ".json")
        # Re-apply the same placement as __init__ (mesh replication or
        # private device copies) — restored host arrays would otherwise feed
        # the donated jitted step unplaced, breaking mesh resume. Optimizer
        # state is re-initialized: the reference checkpoint stores only the
        # net state_dict (main.py:301-307), so resume restarts momentum too.
        self.params = self._copy(payload["params"])
        self.batch_stats = self._copy(payload["batch_stats"])
        self.opt_state = self.optimizer.init(self.params)
        if self._opt_sharding is not None:
            from .parallel.zero import shard_opt_state

            self.opt_state = shard_opt_state(
                self._zero_mesh, self.opt_state, shardings=self._opt_sharding
            )
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            # best_acc prefers the stored best (older checkpoints only have
            # "acc" — for the best-only checkpoint they coincide; for the
            # rolling "-last" it is the current epoch's acc and using it
            # would let a worse epoch overwrite the best checkpoint).
            self.best_acc = meta.get("best_acc", meta.get("acc", 0.0))
            self.start_epoch = meta.get("epoch", 0)
        # Fast-forward the LR schedule: optimizer.init reset its step count
        # to 0, but training resumes at start_epoch — without this, a run
        # resumed past the 3/7E / 5/7E milestones would train at the initial
        # LR (up to 100x too hot for a converged model).
        self.opt_state = _fast_forward_schedule(
            self.opt_state, self.start_epoch * self._steps_per_epoch
        )
