"""Data pipeline tests: transforms, loader, subset wrappers."""

import numpy as np
import pytest

from nbdt_tpu.data import (
    DataLoader,
    ExcludeLabelsDataset,
    IncludeClassesDataset,
    IncludeLabelsDataset,
    InverseNormalize,
    ResampleLabelsDataset,
    SyntheticDataset,
    normalize,
    wrap_dataset,
)
from nbdt_tpu.data.transforms import (
    CIFAR_MEAN,
    CIFAR_STD,
    random_crop,
    random_hflip,
)


def test_normalize_inverse_roundtrip(rng):
    batch = rng.randint(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
    x = normalize(batch, CIFAR_MEAN, CIFAR_STD)
    back = InverseNormalize(CIFAR_MEAN, CIFAR_STD)(x)
    np.testing.assert_allclose(back, batch.astype(np.float32) / 255.0, atol=1e-5)


def test_random_crop_shapes(rng):
    r = np.random.RandomState(0)
    batch = rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8)
    out = random_crop(batch, pad=4, rng=r)
    assert out.shape == batch.shape
    # content preserved for zero-offset crops: every output row appears in
    # the padded input (weak check: dtype + range)
    assert out.dtype == np.uint8


def test_random_hflip(rng):
    r = np.random.RandomState(0)
    batch = rng.randint(0, 256, size=(8, 4, 4, 3), dtype=np.uint8)
    out = random_hflip(batch, r)
    for i in range(8):
        same = np.array_equal(out[i], batch[i])
        flipped = np.array_equal(out[i], batch[i, :, ::-1])
        assert same or flipped


def test_loader_static_shapes():
    ds = SyntheticDataset(num_classes=5, size=20, image_size=8)
    dl = DataLoader(ds, 8, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == 2  # 20 // 8, last dropped
    for x, y, valid in batches:
        assert x.shape == (8, 8, 8, 3)
        assert y.shape == (8,)
        assert valid.all()

    dl = DataLoader(ds, 8, pad_last=True, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3
    x, y, valid = batches[-1]
    assert x.shape == (8, 8, 8, 3)
    assert valid.sum() == 4  # 20 - 16 real samples


def test_include_exclude_wrappers():
    ds = SyntheticDataset(num_classes=5, size=100, image_size=8)
    inc = IncludeLabelsDataset(ds, [0, 1])
    labels = {inc[i][1] for i in range(len(inc))}
    assert labels <= {0, 1}

    exc = ExcludeLabelsDataset(ds, [0, 1])
    labels = {exc[i][1] for i in range(len(exc))}
    assert labels <= {2, 3, 4}
    assert len(inc) + len(exc) == len(ds)

    by_name = IncludeClassesDataset(ds, ["class2"])
    labels = {by_name[i][1] for i in range(len(by_name))}
    assert labels == {2}


def test_resample_wrapper():
    ds = SyntheticDataset(num_classes=2, size=200, image_size=8)
    half = ResampleLabelsDataset(ds, probability_labels=0.5, seed=0)
    assert 40 < len(half) < 160
    # per-class probabilities: drop class 0 entirely
    none0 = ResampleLabelsDataset(ds, probability_labels=[0.0, 1.0], seed=0)
    labels = {none0[i][1] for i in range(len(none0))}
    assert labels == {1}
    # deterministic
    again = ResampleLabelsDataset(ds, probability_labels=0.5, seed=0)
    assert len(again) == len(half)


def test_wrap_dataset_chain():
    ds = SyntheticDataset(num_classes=5, size=100, image_size=8)
    wrapped = wrap_dataset(ds, exclude_labels=[4], probability_labels=0.9)
    labels = {wrapped[i][1] for i in range(len(wrapped))}
    assert 4 not in labels


def test_loader_through_wrapper():
    ds = SyntheticDataset(num_classes=5, size=64, image_size=8)
    inc = IncludeLabelsDataset(ds, [1, 3])
    dl = DataLoader(inc, 4, shuffle=True)
    for x, y, valid in dl:
        assert set(np.unique(y)) <= {1, 3}


def test_prefetch_loader_matches_sync():
    """PrefetchLoader yields the same batches as iterating directly."""
    from nbdt_tpu.data import DataLoader, PrefetchLoader, SyntheticDataset

    ds = SyntheticDataset(num_classes=5, size=40, image_size=8)
    a = DataLoader(ds, 8, shuffle=True, seed=3)
    b = PrefetchLoader(DataLoader(ds, 8, shuffle=True, seed=3))
    batches_a = list(a)
    batches_b = list(b)
    assert len(batches_a) == len(batches_b) == len(b)
    for (xa, ya, va), (xb, yb, vb) in zip(batches_a, batches_b):
        import numpy as np

        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_prefetch_loader_propagates_errors():
    from nbdt_tpu.data import PrefetchLoader

    def bad_gen():
        yield 1
        raise ValueError("boom")

    class Bad:
        def __iter__(self):
            return bad_gen()

        def __len__(self):
            return 2

    import pytest

    with pytest.raises(ValueError, match="boom"):
        list(PrefetchLoader(Bad()))


class _StreamingDataset:
    """Per-sample dataset with no flat arrays: loader must stream it.

    Counts __getitem__ calls so tests can prove the loader never
    materializes the whole dataset (bounded-RSS ImageNet-scale path)."""

    def __init__(self, n, num_classes=5, image_size=8):
        self.n = n
        self.num_classes = num_classes
        self.image_size = image_size
        self.calls = 0
        self.classes = [f"c{i}" for i in range(num_classes)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.calls += 1
        rng = np.random.RandomState(i)
        img = rng.randint(0, 256, (self.image_size,) * 2 + (3,), dtype=np.uint8)
        return img, i % self.num_classes


def test_streaming_loader_matches_flat():
    """Streaming (per-sample) gather yields the same batches as a flat
    in-RAM loader over identical data."""
    stream = _StreamingDataset(20)
    flat = SyntheticDataset(num_classes=5, size=20, image_size=8)
    flat.images = np.stack([stream[i][0] for i in range(20)])
    flat.labels = np.array([stream[i][1] for i in range(20)])
    stream.calls = 0

    dl_stream = DataLoader(stream, 8, shuffle=False, drop_last=False,
                           pad_last=True)
    dl_flat = DataLoader(flat, 8, shuffle=False, drop_last=False,
                         pad_last=True)
    assert dl_stream.images is None  # streaming mode engaged
    for (xs, ys, vs), (xf, yf, vf) in zip(dl_stream, dl_flat):
        np.testing.assert_array_equal(xs, xf)
        np.testing.assert_array_equal(ys, yf)
        np.testing.assert_array_equal(vs, vf)


def test_streaming_loader_bounded_rss():
    """ImageNet-scale path: iterating k batches touches only k*batch_size
    samples — the loader must NOT materialize the dataset up front
    (the old path did `[dataset[i] for i in range(len(dataset))]`)."""
    ds = _StreamingDataset(100_000)
    dl = DataLoader(ds, 16, shuffle=True, drop_last=True)
    assert ds.calls == 0  # constructing the loader reads nothing
    it = iter(dl)
    for _ in range(3):
        next(it)
    assert ds.calls == 3 * 16


def test_flat_loader_no_full_copy_for_label_subset():
    """new_to_old remaps stay an index indirection — the loader must not
    copy the underlying image store (memmap-friendliness)."""
    ds = SyntheticDataset(num_classes=5, size=20, image_size=8)
    sub = IncludeLabelsDataset(ds, include_labels=[1, 3])
    dl = DataLoader(sub, 4, shuffle=False, drop_last=False, pad_last=True)
    assert dl.images is ds.images  # same object, no remapped copy
    for x, y, valid in dl:
        assert set(np.asarray(y)[valid]) <= {1, 3}


def test_chained_wrappers_compose_flat_maps():
    """Include -> Exclude chains keep the base image store and compose
    their index maps; batches match per-sample __getitem__ reads."""
    ds = SyntheticDataset(num_classes=5, size=40, image_size=8)
    chained = wrap_dataset(ds, include_labels=[1, 2, 3], exclude_labels=[2])
    assert chained.images is ds.images
    dl = DataLoader(chained, 4, shuffle=False, drop_last=False, pad_last=True)
    flat = [(x, y, v) for x, y, v in dl]
    want = [chained[i] for i in range(len(chained))]
    got_labels = np.concatenate([y[v] for _, y, v in flat])
    np.testing.assert_array_equal(got_labels, [w[1] for w in want])
    got_imgs = np.concatenate([x[v] for x, _, v in flat])
    np.testing.assert_allclose(
        got_imgs, np.stack([w[0] for w in want]).astype(np.float32)
    )
    assert set(got_labels) == {1, 3}


def test_sharded_loader_equal_batch_counts_uneven():
    """Uneven datasets: every shard is padded (sample-wrap) to the same
    length so all hosts run the same number of batches — unequal counts
    would deadlock the multihost SPMD step."""
    ds = _StreamingDataset(1023)
    loaders = [DataLoader(ds, 256, shuffle=False, drop_last=True,
                          num_shards=2, shard_id=i) for i in range(2)]
    assert len(loaders[0]) == len(loaders[1]) == 2
    assert [sum(1 for _ in dl) for dl in loaders] == [2, 2]

    pads = [DataLoader(ds, 256, shuffle=False, drop_last=False, pad_last=True,
                       num_shards=2, shard_id=i) for i in range(2)]
    assert len(pads[0]) == len(pads[1]) == 2
    counts = [sum(1 for _ in dl) for dl in pads]
    assert counts == [2, 2]
    # and together the shards cover every sample exactly once: the wrapped
    # duplicate is yielded (equal shapes) but masked invalid so all-reduced
    # eval metrics never double-count
    seen = []
    for dl in pads:
        for x, y, valid in dl:
            seen.extend(np.asarray(y)[valid].tolist())
    assert len(seen) == 1023


def test_sharded_loader_tiny_dataset_many_shards():
    """num_shards >= n+2: the wrap must TILE the order (np.resize), not
    concat a clamped slice — shards previously got unequal batch counts
    (the SPMD deadlock the padding exists to prevent) with a valid mask
    misaligned from the indices."""
    ds = _StreamingDataset(2)
    loaders = [DataLoader(ds, 1, shuffle=False, drop_last=False,
                          pad_last=True, num_shards=8, shard_id=i)
               for i in range(8)]
    counts = [sum(1 for _ in dl) for dl in loaders]
    assert counts == [1] * 8  # every shard yields the same batch count
    seen = []
    for dl in loaders:
        for x, y, valid in dl:
            seen.extend(np.asarray(y)[valid].tolist())
    # the real samples are counted exactly once across all shards
    assert sorted(seen) == [0, 1]


def test_prefetch_loader_early_exit_reaps_producer():
    """Abandoning the epoch mid-iteration (early stop / step exception)
    must not leak a producer thread blocked in q.put."""
    import gc
    import threading
    import time as _time

    from nbdt_tpu.data import DataLoader, PrefetchLoader, SyntheticDataset

    ds = SyntheticDataset(num_classes=5, size=80, image_size=8)
    before = set(threading.enumerate())
    for _ in range(3):
        it = iter(PrefetchLoader(DataLoader(ds, 4), depth=1))
        next(it)
        it.close()  # GeneratorExit -> finally must stop + reap the thread
    gc.collect()
    deadline = _time.time() + 5
    while _time.time() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before
                  if t.is_alive()]
        if not leaked:
            break
        _time.sleep(0.05)
    assert not leaked, f"leaked producer threads: {leaked}"


def test_local_data_dedupes_replicated_axis(monkeypatch):
    """local_data on a (dp, tp>1) mesh: addressable_shards repeats each dp
    row-slice once per tp device; the result must contain each local row
    exactly once."""
    import jax

    from nbdt_tpu.parallel.distributed import local_data

    class _Shard:
        def __init__(self, start, stop, rows):
            self.index = (slice(start, stop), slice(None))
            self.data = rows

    rows0 = np.arange(6).reshape(2, 3)
    rows1 = np.arange(6, 12).reshape(2, 3)
    class _Arr:
        # each slice appears twice, as under tp=2 replication
        addressable_shards = [
            _Shard(2, 4, rows1), _Shard(0, 2, rows0),
            _Shard(0, 2, rows0), _Shard(2, 4, rows1),
        ]

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    out = local_data(_Arr())
    np.testing.assert_array_equal(out, np.concatenate([rows0, rows1]))


def test_learnable_synthetic_groups_structure():
    """groups= gives classes superclass structure: sibling class means
    correlate more than cross-group ones (the offline stand-in for the
    zero-shot superclass flow, reference analysis.py:430-559), unseen-split
    samples included; groups=None stays seed-compatible with the original
    template draw."""
    from nbdt_tpu.data import LearnableSyntheticDataset

    groups = [0, 0, 0, 1, 1, 1]
    ds = LearnableSyntheticDataset(num_classes=6, size=600, image_size=8,
                                   groups=groups, group_blend=0.5, seed=3)
    means = np.stack([
        ds.images[np.asarray(ds.labels) == c].mean(0).ravel()
        for c in range(6)
    ])
    cc = np.corrcoef(means)
    within = np.mean([cc[a, b] for a in range(6) for b in range(6)
                      if a != b and groups[a] == groups[b]])
    across = np.mean([cc[a, b] for a in range(6) for b in range(6)
                      if groups[a] != groups[b]])
    assert within > across + 0.2, (within, across)

    # groups=None is byte-identical to the pre-groups draw (same rng order)
    a = LearnableSyntheticDataset(num_classes=3, size=32, image_size=8,
                                  seed=5)
    b = LearnableSyntheticDataset(num_classes=3, size=32, image_size=8,
                                  seed=5, groups=None)
    np.testing.assert_array_equal(a.images, b.images)

    with pytest.raises(ValueError, match="one group per class"):
        LearnableSyntheticDataset(num_classes=4, size=8, image_size=8,
                                  groups=[0, 1])
