"""Dataloader machinery: rank-strided sampler step parity, prefetch thread
hygiene, resume-helper ordering (reference data/sampler.py:42-57 +
round-2 core-path review findings)."""

import threading
import time

import numpy as np
import pytest

from slam_llm_tpu.data.loader import (
    DistributedLengthBasedBatchSampler,
    LengthBasedBatchSampler,
    PrefetchLoader,
)


def test_distributed_sampler_equal_counts_per_rank():
    """SPMD ranks must run the SAME number of steps: an extra batch on one
    rank enters collectives alone and hangs the job."""
    lengths = list(range(37))  # 10 batches of 4 (drop_last) -> not % 3
    counts, seen = [], []
    for rank in range(3):
        s = DistributedLengthBasedBatchSampler(
            lengths, batch_size=4, num_replicas=3, rank=rank, drop_last=True, seed=0
        )
        batches = list(s)
        assert len(batches) == len(s), rank  # iterator agrees with __len__
        counts.append(len(batches))
        seen.extend(i for b in batches for i in b)
    assert len(set(counts)) == 1  # identical step counts
    assert len(seen) == len(set(seen))  # disjoint coverage


def test_distributed_sampler_fewer_batches_than_ranks():
    for rank in range(4):
        s = DistributedLengthBasedBatchSampler(
            list(range(12)), batch_size=4, num_replicas=4, rank=rank, drop_last=True, seed=0
        )
        assert len(list(s)) == len(s) == 0  # 3 batches < 4 ranks: all skip


class _ListDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.int32)}

    def collator(self, samples):
        return {"x": np.stack([s["x"] for s in samples])}

    def sort_key(self, i):
        return i


def test_prefetch_abandoned_iterator_does_not_leak_thread():
    """`next(iter(loader))` (the pipeline's example-batch probe) must not
    leave the producer blocked in q.put forever."""
    ds = _ListDataset(64)
    sampler = [[i, i + 1] for i in range(0, 64, 2)]
    loader = PrefetchLoader(ds, sampler, num_workers=2, prefetch=2)
    before = threading.active_count()
    it = iter(loader)
    first = next(it)
    assert first["x"].shape == (2, 2)
    it.close()  # abandon: generator finally sets the stop event
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_prefetch_full_epoch_order_and_errors():
    ds = _ListDataset(8)
    sampler = [[i] for i in range(8)]
    loader = PrefetchLoader(ds, sampler, num_workers=2, prefetch=2)
    got = [int(b["x"][0, 0]) for b in loader]
    assert got == list(range(8))  # order preserved

    class _Boom(_ListDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    bad = PrefetchLoader(_Boom(4), [[0]], num_workers=1, prefetch=1)
    with pytest.raises(RuntimeError, match="boom"):
        list(bad)


def test_latest_checkpoint_orders_by_name_not_mtime(tmp_path):
    from slam_llm_tpu.utils.checkpoint import latest_checkpoint

    (tmp_path / "m_epoch_3_step_30").mkdir()
    time.sleep(0.02)
    # best-val policy can legitimately write an OLDER epoch later
    (tmp_path / "m_epoch_2_step_20").mkdir()
    (tmp_path / "m_epoch_2_step_20_notes.txt").write_text("not a dir")
    assert latest_checkpoint(str(tmp_path)).endswith("m_epoch_3_step_30")
    assert latest_checkpoint(str(tmp_path / "missing")) is None


def test_distributed_sampler_wrap_covers_all_batches():
    """Decode mode: equal per-rank counts AND full coverage (duplicates
    collapse by key in the kaldi-style scoring dicts)."""
    lengths = list(range(44))  # 11 batches of 4 -> ragged over 4 ranks
    all_idx, counts = set(), []
    for rank in range(4):
        s = DistributedLengthBasedBatchSampler(
            lengths, batch_size=4, num_replicas=4, rank=rank,
            ragged_tail="wrap", drop_last=True, shuffle=False, seed=0,
        )
        batches = list(s)
        assert len(batches) == len(s) == 3
        counts.append(len(batches))
        all_idx.update(i for b in batches for i in b)
    assert len(set(counts)) == 1
    assert all_idx == set(range(44))  # every utterance decoded by some rank


def test_prefetch_process_workers_match_thread_workers():
    """worker_type="process" must yield the same batches in the same order
    as the thread pool (fork workers, initializer-installed dataset)."""
    ds = _ListDataset(12)
    sampler = LengthBasedBatchSampler(
        [ds.sort_key(i) for i in range(len(ds))], 3,
        drop_last=False, shuffle=False, seed=0,
    )
    thread = list(PrefetchLoader(ds, sampler, num_workers=2, prefetch=2))
    proc = list(PrefetchLoader(ds, sampler, num_workers=2, prefetch=2,
                               worker_type="process"))
    assert len(thread) == len(proc) == 4
    for a, b in zip(thread, proc):
        np.testing.assert_array_equal(a["x"], b["x"])


def test_prefetch_process_shm_transport_matches_and_does_not_leak():
    """worker_type="process" (shared-memory transport) must yield batches
    identical to the thread pool — incl. non-array fields riding the result
    pickle — and leave NO /dev/shm segments behind."""
    import glob

    class _MixedDataset(_ListDataset):
        def collator(self, samples):
            out = super().collator(samples)
            out["keys"] = [f"k{int(s['x'][0])}" for s in samples]
            return out

    before = set(glob.glob("/dev/shm/psm_*"))
    ds = _MixedDataset(12)
    sampler = LengthBasedBatchSampler(
        [ds.sort_key(i) for i in range(len(ds))], 3,
        drop_last=False, shuffle=False, seed=0,
    )
    thread = list(PrefetchLoader(ds, sampler, num_workers=2, prefetch=2))
    shm = list(PrefetchLoader(ds, sampler, num_workers=2, prefetch=2,
                              worker_type="process"))
    pickle_t = list(PrefetchLoader(ds, sampler, num_workers=2, prefetch=2,
                                   worker_type="process_pickle"))
    assert len(thread) == len(shm) == len(pickle_t) == 4
    for a, b, c in zip(thread, shm, pickle_t):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["x"], c["x"])
        assert a["keys"] == b["keys"] == c["keys"]
        assert b["x"].flags.owndata  # copied out: ordinary owning arrays
    # abandoned-iterator path must also release worker-created segments
    it = iter(PrefetchLoader(ds, sampler, num_workers=2, prefetch=2,
                             worker_type="process"))
    next(it)
    del it
    import gc, time

    gc.collect()
    time.sleep(0.5)
    leaked = set(glob.glob("/dev/shm/psm_*")) - before
    assert not leaked, leaked


def test_prefetch_process_worker_error_surfaces():
    class _Boom(_ListDataset):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return super().__getitem__(i)

    ds = _Boom(8)
    sampler = LengthBasedBatchSampler(
        [i for i in range(8)], 4, drop_last=False, shuffle=False, seed=0
    )
    loader = PrefetchLoader(ds, sampler, num_workers=2, worker_type="process")
    with pytest.raises(Exception, match="boom"):
        list(loader)
