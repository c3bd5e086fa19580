"""Segmentation pipeline tests: datasets, SegNBDT per-pixel rules, seg loss
(reference nbdt/data/{pascal_context,lip,ade20k}.py, model.py:376-387,
loss.py:318-327)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbdt_tpu.data import SegDataLoader, SyntheticSegDataset
from nbdt_tpu.data.segmentation import ADE20K, LookIntoPerson, PascalContext


def test_synthetic_seg_dataset_shapes():
    ds = SyntheticSegDataset(num_classes=7, size=6, image_size=24)
    x, y = ds[0]
    assert x.shape == (24, 24, 3) and x.dtype == np.float32
    assert y.shape == (24, 24) and y.dtype == np.int32
    # labels are classes or void (scale-down pads with ignore_label)
    assert y.min() >= ds.ignore_label and y.max() < 7
    assert (y >= 0).any()


def test_seg_train_pipeline_is_static_shape():
    ds = SyntheticSegDataset(num_classes=5, size=10, image_size=32, crop_size=16)
    loader = SegDataLoader(ds, batch_size=4, shuffle=True)
    shapes = {(x.shape, y.shape) for x, y in loader}
    assert shapes == {((4, 16, 16, 3), (4, 16, 16))}
    assert len(loader) == 2  # drop_last


def test_seg_eval_pads_with_ignore():
    ds = SyntheticSegDataset(num_classes=5, size=5, image_size=8)
    ds.split = "val"
    loader = SegDataLoader(ds, batch_size=4, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    x, y = batches[1]
    assert x.shape == (4, 8, 8, 3)
    assert (y[1:] == ds.ignore_label).all()  # padded entries are void


def test_flip_pairs_swap_left_right():
    lip = LookIntoPerson.__new__(LookIntoPerson)
    mask = np.array([[14, 15], [18, 0]], dtype=np.int32)
    out = lip._on_hflip(mask)
    np.testing.assert_array_equal(out, [[15, 14], [19, 0]])


def test_missing_data_raises_cleanly(tmp_path):
    for cls in (PascalContext, LookIntoPerson, ADE20K):
        with pytest.raises(FileNotFoundError):
            cls(root=str(tmp_path))


def test_class_counts_match_reference():
    # reference utils.py:31-40 DATASET_TO_NUM_CLASSES
    assert PascalContext.NUM_CLASS == 59 and len(PascalContext.classes) == 59
    assert LookIntoPerson.NUM_CLASS == 20 and len(LookIntoPerson.classes) == 20
    assert ADE20K.NUM_CLASS == 150 and len(ADE20K.classes) == 150


@pytest.fixture(scope="module")
def seg_setup(synthetic_tree):
    """Tiny conv head emitting per-pixel class maps over the 7-class tree."""
    import flax.linen as nn

    class TinySeg(nn.Module):
        num_classes: int = 7

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3))(x)
            x = nn.relu(x)
            return nn.Conv(self.num_classes, (1, 1))(x)

    module = TinySeg()
    x = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    return module, variables, synthetic_tree, x


def test_seg_nbdt_forward(seg_setup):
    from nbdt_tpu.model import HardSegNBDT, SoftSegNBDT

    module, variables, tree, x = seg_setup
    for cls in (SoftSegNBDT, HardSegNBDT):
        model = cls(dataset=None, model=module, tree=tree, params=variables)
        out = model(x)
        assert out.shape == (2, 8, 8, 7)
        # per-pixel outputs are distributions/one-hot over leaves
        assert np.isfinite(np.asarray(out)).all()
    # hard output rows are one-hot
    hard_out = HardSegNBDT(dataset=None, model=module, tree=tree,
                           params=variables)(x)
    flat = np.asarray(hard_out).reshape(-1, 7)
    assert ((flat > 0).sum(axis=1) == 1).all()


def test_soft_seg_loss_grads_and_ignore(seg_setup):
    from nbdt_tpu.losses import SoftSegTreeSupLoss, masked_cross_entropy

    module, variables, tree, x = seg_setup
    crit = SoftSegTreeSupLoss(tree=tree, tree_supervision_weight=1.0)
    y = np.random.RandomState(1).randint(0, 7, (2, 8, 8)).astype(np.int32)
    y[0, :2] = -1  # void pixels

    def loss_fn(params):
        out = module.apply({"params": params}, x)
        return crit(out, y)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0

    # all-void targets contribute zero loss, not NaN
    logits = jnp.zeros((4, 7))
    all_void = jnp.full((4,), -1, dtype=jnp.int32)
    assert float(masked_cross_entropy(logits, all_void)) == 0.0


def test_cityscapes_label_mapping(tmp_path):
    """Cityscapes labelIds -> trainIds with void -> ignore; layout errors
    are clean."""
    from nbdt_tpu.data.segmentation import Cityscapes

    with pytest.raises(FileNotFoundError):
        Cityscapes(root=str(tmp_path))

    # fabricate a 1-sample dataset on disk
    from PIL import Image

    img_dir = tmp_path / "Cityscapes/leftImg8bit/train/cityA"
    gt_dir = tmp_path / "Cityscapes/gtFine/train/cityA"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        img_dir / "a_leftImg8bit.png")
    ids = np.zeros((64, 64), dtype=np.uint8)
    ids[:16] = 7    # road -> 0
    ids[16:32] = 26  # car -> 13
    ids[32:] = 3    # void
    Image.fromarray(ids).save(gt_dir / "a_gtFine_labelIds.png")

    ds = Cityscapes(root=str(tmp_path), split="train", crop_size=32,
                    base_size=64)
    assert len(ds) == 1 and ds.NUM_CLASS == 19
    img, mask = ds._load_pair(0)
    assert set(np.unique(mask)) <= {0, 13, ds.ignore_label}
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and y.shape == (32, 32)


def test_ade20k_accepts_both_split_namings(tmp_path):
    """ADE20K normalizes split names both ways: 'train'/'val' (sibling
    datasets' convention, used by the example trainer) and ADE20K's own
    'training'/'validation' odgt naming."""
    import json
    import os

    import numpy as np
    from PIL import Image

    from nbdt_tpu.data.segmentation import ADE20K

    root = tmp_path
    d = root / "ADE20K"
    d.mkdir()
    img = d / "img.jpg"
    seg = d / "seg.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)
    Image.fromarray(np.ones((8, 8), np.uint8)).save(seg)
    entry = {"fpath_img": "ADE20K/img.jpg", "fpath_segm": "ADE20K/seg.png"}
    for odgt in ("training.odgt", "validation.odgt"):
        (d / odgt).write_text(json.dumps(entry) + "\n")

    for split in ("train", "training", "val", "validation"):
        ds = ADE20K(root=str(root), split=split, base_size=8, crop_size=8)
        assert len(ds) == 1
        _, mask = ds._load_pair(0)
        assert mask.min() == 0  # 1-indexed labels shifted to 0-indexed
