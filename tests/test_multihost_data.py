"""Multi-host input-pipeline sharding (replaces DistributedSampler,
reference ``/root/reference/lib/dataset/build.py:72-76``).

Verifies with process_count = 2 and 4: shards are disjoint, cover a
deterministic prefix of the epoch permutation, and — critically for SPMD —
every host yields exactly the same number of batches even when the dataset
size is not divisible (unequal counts would deadlock the collective)."""

import numpy as np

from litepose_tpu.data.dataset import make_batch_iterator


class DummyPipeline:
    """Minimal pipeline: item i encodes its own index in the image."""

    seed = 1234

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get(self, i, epoch):
        img = np.full((4, 4, 3), i % 256, np.uint8)
        heatmaps = [np.full((2, 2, 2), i, np.float32)]
        masks = [np.ones((2, 2), np.float32)]
        joints = [np.zeros((3, 2, 2), np.int32)]
        return img, heatmaps, masks, joints


def _collect(n_items, batch_size, process_count, epoch=0, shuffle=True):
    """Returns per-process lists of the item indices actually yielded."""
    pipe = DummyPipeline(n_items)
    out = []
    for pi in range(process_count):
        ids = []
        for batch in make_batch_iterator(
            pipe, batch_size, epoch, shuffle=shuffle,
            process_index=pi, process_count=process_count,
            num_workers=2, prefetch=1,
        ):
            assert batch["images"].shape[0] == batch_size
            ids.extend(int(v) for v in batch["heatmaps"][0][:, 0, 0, 0])
        out.append(ids)
    return out


def test_shards_disjoint_and_equal_2_and_4():
    for pc in (2, 4):
        # 109 items, batch 4: not divisible by pc*bs on purpose
        shards = _collect(109, 4, pc)
        sizes = [len(s) for s in shards]
        assert len(set(sizes)) == 1, f"unequal shard sizes {sizes} (SPMD deadlock)"
        assert sizes[0] == 109 // pc // 4 * 4
        all_ids = [i for s in shards for i in s]
        assert len(all_ids) == len(set(all_ids)), "shards overlap"


def test_shards_cover_global_permutation_prefix():
    pc, bs, n = 4, 4, 109
    shards = _collect(n, bs, pc, epoch=3)
    order = np.arange(n)
    np.random.default_rng((DummyPipeline.seed, 3)).shuffle(order)
    per_shard = n // pc // bs * bs
    expected = set(order[: per_shard * pc].tolist())
    got = {i for s in shards for i in s}
    assert got == expected


def test_same_epoch_same_order_across_processes():
    # the permutation must be a pure function of (seed, epoch) so all hosts
    # agree without communication
    a = _collect(64, 8, 2, epoch=5)
    b = _collect(64, 8, 2, epoch=5)
    assert a == b
    c = _collect(64, 8, 2, epoch=6)
    assert a != c


def test_single_process_unchanged():
    (ids,) = _collect(32, 8, 1, shuffle=False)
    assert ids == list(range(32))
