"""Prompt prefix cache: recurrent state keyed by token prefix.

RWKV's whole "KV cache" is an O(1) per-layer recurrent state, so prefix
caching is a dictionary of small pytrees instead of paged KV-block
machinery: after a prompt is prefilled, the state *is* the prefix — a
later prompt sharing that prefix (chat system prompts, few-shot headers,
multi-turn history) resumes from the cached state and prefills only the
remainder. The reference has a fixed-per-task version of this idea
(named state-tuning checkpoints, infer/states_generator.py:34-49); this
is the general, automatic variant.

Correctness: a cached state equals exactly the state full prefill
produces after consuming the prefix (the engine's cross-chunk state
contract), so cached-prefix generation matches uncached generation
(exactly in fp32; in bf16 the chunked kernels' intra-chunk split can
move near-tie logits by ~1e-3, same as any chunk-plan change).

Buffer safety: the engine's prefill/decode programs DONATE state
buffers, so the cache never shares buffers with callers — lookups hand
out a device-side copy and inserts store one (a ~13 MB HBM->HBM copy at
1B6, microseconds of bandwidth).
"""
from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _tree_copy(tree):
    """Device-side deep copy (fresh buffers, shardings preserved)."""
    return jax.tree.map(jnp.copy, tree)


class PrefixStateCache:
    """LRU map  (salt, token-prefix) -> recurrent state after consuming
    it. salt namespaces entries (per-adapter in multi-LoRA serving).

    lookup() returns the longest cached key that is a STRICT prefix of
    the prompt (strict so at least one token is always prefilled and
    yields last-token logits). Linear scan over entries — capacities are
    small (a handful of system prompts), each entry is ~13 MB of HBM at
    1B6, so capacity is the knob that matters, not lookup complexity.

    Thread-safe: serving handler threads and the batcher driver thread
    share one cache.
    """

    def __init__(self, capacity: int = 8, min_prefix: int = 8):
        self.capacity = int(capacity)
        self.min_prefix = int(min_prefix)
        self._entries: "OrderedDict[Tuple[int, ...], object]" = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def lookup(
        self, tokens: Sequence[int], *, salt=None
    ) -> Tuple[Optional[object], int]:
        """Longest strict-prefix hit: (state copy, consumed) or (None, 0).
        salt namespaces entries (e.g. per-adapter — a state produced
        under one adapter must never serve another)."""
        ids = tuple(tokens)
        best = None
        with self._lock:
            for skey, key in self._entries:
                if (
                    skey == salt
                    and len(key) < len(ids)
                    and (best is None or len(key) > len(best[1]))
                    and ids[: len(key)] == key
                ):
                    best = (skey, key)
            if best is None:
                self.misses += 1
                return None, 0
            self._entries.move_to_end(best)
            self.hits += 1
            state = self._entries[best]
        return _tree_copy(state), len(best[1])

    def insert(self, tokens: Sequence[int], state, *, salt=None) -> None:
        """Cache the state reached after consuming tokens (stores a
        private device copy; no-op below min_prefix or on repeats)."""
        key = (salt, tuple(tokens))
        if len(key[1]) < self.min_prefix:
            return
        with self._lock:
            if key in self._entries:
                self._entries.move_to_end(key)
                return
        copy = _tree_copy(state)
        with self._lock:
            self._entries[key] = copy
            while len(self._entries) > self.capacity:
                self._entries.popitem(last=False)

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()

    def stats(self) -> dict:
        with self._lock:
            return {
                "entries": len(self._entries),
                "capacity": self.capacity,
                "hits": self.hits,
                "misses": self.misses,
            }
