"""DataFeed item-cache: identical batches across epochs, auto-disabled when
the dataset declares itself non-deterministic (box augmentation)."""

import numpy as np

from peneo_tpu.pipeline.loader import DataFeed


class _Ds:
    deterministic = True

    def __init__(self):
        self.calls = 0

    def __len__(self):
        return 6

    def __getitem__(self, i):
        self.calls += 1
        return {"x": np.full((2,), i)}


class _AugDs(_Ds):
    deterministic = False


def _collate(items):
    return {"x": np.stack([it["x"] for it in items])}


def test_cache_parses_each_item_once():
    ds = _Ds()
    feed = DataFeed(ds, _collate, batch_size=2, shuffle=False)
    e1 = [b["x"].copy() for b in feed]
    e2 = [b["x"].copy() for b in feed]
    assert ds.calls == len(ds)  # second epoch served from cache
    for a, b in zip(e1, e2):
        np.testing.assert_array_equal(a, b)


def test_augmentation_disables_cache():
    ds = _AugDs()
    feed = DataFeed(ds, _collate, batch_size=2, shuffle=False)
    list(feed)
    list(feed)
    assert ds.calls == 2 * len(ds)  # re-parsed every epoch


def test_cache_override():
    ds = _Ds()
    feed = DataFeed(ds, _collate, batch_size=2, shuffle=False,
                    cache_items=False)
    list(feed)
    list(feed)
    assert ds.calls == 2 * len(ds)
