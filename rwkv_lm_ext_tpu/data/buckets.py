"""Length-bucketed datasets + rank-sharded bucket batch sampler.

The reference's TPU-perfect idea (data/custom_datasets.py:19-74): group
examples into fixed-length buckets {64,128,...,2048}, use a per-bucket
batch size, and round-robin buckets so each XLA program shape compiles
exactly once and memory stays flat. Re-implemented host-side with
deterministic rank sharding (offset-strided, matching MyBatchSampler) and
`skipped_batches` resume.
"""
from __future__ import annotations

import bisect
import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS = (64, 128, 256, 512, 1024, 2048)
# reference README.md:80 capacity table (1B6 on 24GB): len -> batch size
DEFAULT_BATCH_SIZES = {64: 32, 128: 16, 256: 8, 512: 4, 1024: 2, 2048: 1}


@dataclasses.dataclass
class Bucket:
    fixed_len: int
    examples: List  # opaque items; collator turns a list into arrays


class LengthBucketedDataset:
    """Examples partitioned by smallest bucket >= their length."""

    def __init__(
        self,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
    ):
        self.lens = sorted(buckets)
        self.buckets = [Bucket(l, []) for l in self.lens]

    def add(self, example, length: int) -> bool:
        """Place into the smallest bucket that fits; False if too long."""
        i = bisect.bisect_left(self.lens, length)
        if i >= len(self.lens):
            return False
        self.buckets[i].examples.append(example)
        return True

    def __len__(self) -> int:
        return sum(len(b.examples) for b in self.buckets)


class BucketBatchSampler:
    """Round-robin over buckets; yields (bucket_idx, example_indices).

    Rank sharding is offset-strided exactly like the reference's
    MyBatchSampler (data/custom_datasets.py:54): each global batch of
    world_size*bs consecutive examples is split by rank offset, so all
    ranks see the same bucket order — mandatory for SPMD lockstep.
    """

    def __init__(
        self,
        dataset: LengthBucketedDataset,
        batch_sizes: Optional[Dict[int, int]] = None,
        *,
        world_size: int = 1,
        rank: int = 0,
        skipped_batches: int = 0,
        seed: Optional[int] = None,
    ):
        self.ds = dataset
        self.batch_sizes = dict(batch_sizes or DEFAULT_BATCH_SIZES)
        self.world_size = world_size
        self.rank = rank
        self.skipped_batches = skipped_batches
        self.seed = seed

    def _bucket_bs(self, bucket: Bucket) -> int:
        return self.batch_sizes.get(bucket.fixed_len, 1)

    def __len__(self) -> int:
        total = 0
        for b in self.ds.buckets:
            bs = self._bucket_bs(b)
            total += len(b.examples) // (bs * self.world_size)
        return max(total - self.skipped_batches, 0)

    def __iter__(self) -> Iterator[Tuple[int, List[int]]]:
        order = []
        perms = {}
        for bi, b in enumerate(self.ds.buckets):
            bs = self._bucket_bs(b)
            n = len(b.examples) // (bs * self.world_size)
            order.append(n)
            if self.seed is not None:
                rng = np.random.default_rng(self.seed + bi)
                perms[bi] = rng.permutation(len(b.examples))
        remaining = list(order)
        consumed = [0] * len(self.ds.buckets)
        skipped = 0
        bi = 0
        while sum(remaining) > 0:
            while remaining[bi] == 0:
                bi = (bi + 1) % len(remaining)
            cur = bi
            bs = self._bucket_bs(self.ds.buckets[cur])
            start = consumed[cur] * bs * self.world_size + self.rank * bs
            idxs = list(range(start, start + bs))
            if cur in perms:
                idxs = [int(perms[cur][i]) for i in idxs]
            consumed[cur] += 1
            remaining[cur] -= 1
            bi = (cur + 1) % len(remaining)
            if skipped < self.skipped_batches:
                skipped += 1
                continue
            yield cur, idxs

    def batches(self):
        """Convenience: yield (fixed_len, [examples])."""
        for bi, idxs in self:
            b = self.ds.buckets[bi]
            yield b.fixed_len, [b.examples[i] for i in idxs]
