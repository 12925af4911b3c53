"""Diverse-group beam search over recurrent state.

Re-designs the reference's generate_beamsearch (src/model_run.py:1412-1518)
for TPU: instead of one forward + one deep-copied state per beam per step,
all beams ride the batch axis of a single jitted decode step, and state
"forking" is a gather along batch (models/state.gather_beams) — the
recurrent-state analogue of KV-cache forking.

Behavioral semantics preserved: beam groups (num_group), HF-style
length-penalty hypothesis scoring (BeamHypothesis, :1317-1404), eos-id
hypothesis completion, repetition penalty, sampled (Gumbel top-k) or
deterministic top-k expansion, early-stopping heuristic.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.models.state import gather_beams


@dataclasses.dataclass(frozen=True)
class BeamParams:
    num_beams: int = 10
    num_groups: int = 5
    return_num_sequences: int = 5
    max_tokens: int = 100
    eos_ids: Tuple[int, ...] = (0, 1)
    length_penalty: float = 0.5
    repetition_penalty: float = 1.5
    do_sample: bool = True
    top_p: float = 0.96
    top_k: int = 30
    is_sum_logprobs: bool = False
    early_stopping: bool = False


class _Hypotheses:
    """n-best list with length-penalty scores (reference BeamHypothesis)."""

    def __init__(self, num_beams: int, length_penalty: float):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.beams: List[Tuple[float, List[int]]] = []
        self.worst = math.inf

    def add(self, ids: List[int], sum_logprobs: float, gen_len: int):
        score = sum_logprobs / max(gen_len, 1) ** self.length_penalty
        if len(self.beams) < self.num_beams or score > -self.worst:
            self.beams.append((score, ids))
            self.beams.sort(key=lambda x: -x[0])
            self.beams = self.beams[: self.num_beams]
            self.worst = -self.beams[-1][0]

    def is_done(self, best_sum_logprobs: float, cur_len: int) -> bool:
        if len(self.beams) < self.num_beams:
            return False
        best_possible = best_sum_logprobs / max(cur_len, 1) ** self.length_penalty
        return -self.worst >= best_possible


def generate_beamsearch(
    engine,
    prompt,
    params: BeamParams = BeamParams(),
    *,
    state=None,
    seed: int = 0,
) -> List[Tuple[float, List[int]]]:
    """Returns up to return_num_sequences (score, token_ids), best first."""
    cfg = engine.cfg
    bp = params
    group_size = bp.num_beams // bp.num_groups
    assert group_size * bp.num_groups == bp.num_beams

    if isinstance(prompt, str):
        prompt_ids = engine.tokenizer.encode(prompt)
    else:
        prompt_ids = list(prompt)

    logits0, state = engine.prefill(prompt_ids, state)

    # broadcast state to the beam batch
    state = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, bp.num_beams, axis=1), state
    )

    @jax.jit
    def decode_step(model_params, tokens, st):
        lg, st = rwkv_forward(
            model_params, cfg, tokens[:, None], st,
            wkv_backend=engine.wkv_backend,
        )
        return jax.nn.log_softmax(lg[:, -1].astype(jnp.float32), axis=-1), st

    key = jax.random.PRNGKey(seed)
    V = cfg.vocab_size
    eos = np.array(bp.eos_ids, dtype=np.int64)

    # host bookkeeping
    seqs: List[List[int]] = [[] for _ in range(bp.num_beams)]
    scores = np.zeros(bp.num_beams, dtype=np.float64)
    live = np.ones(bp.num_beams, dtype=bool)
    hyps = [
        _Hypotheses(bp.num_beams, bp.length_penalty)
        for _ in range(bp.num_groups)
    ]
    group_done = [False] * bp.num_groups

    logp0 = np.asarray(jax.nn.log_softmax(logits0.astype(jnp.float32)))
    first = True
    last_tokens = np.zeros(bp.num_beams, dtype=np.int64)

    for step in range(bp.max_tokens):
        if first:
            logp = np.tile(logp0, (bp.num_beams, 1))
            first = False
        else:
            logp_dev, state = decode_step(
                engine.params, jnp.asarray(last_tokens, jnp.int32), state
            )
            logp = np.asarray(logp_dev, np.float64)

        # repetition penalty per beam over its generated ids
        if bp.repetition_penalty != 1.0:
            for b in range(bp.num_beams):
                if seqs[b]:
                    ids = np.unique(np.array(seqs[b]))
                    vals = logp[b, ids]
                    logp[b, ids] = np.where(
                        vals > 0,
                        vals / bp.repetition_penalty,
                        vals * bp.repetition_penalty,
                    )

        # standard beam accumulation; the reference's is_sum_logprobs flag
        # only changes what its warpers see — warping here always acts on
        # the per-step logp, so accumulation is unconditional
        cand_scores = logp + scores[:, None]

        if bp.do_sample:
            # Gumbel-top-k sampling without replacement on warped logits
            warped = logp.copy()
            if bp.top_k > 0:
                kth = np.sort(warped, axis=-1)[:, -bp.top_k][:, None]
                warped[warped < kth] = -np.inf
            if bp.top_p < 1.0:
                probs = np.exp(warped - warped.max(axis=-1, keepdims=True))
                probs /= probs.sum(axis=-1, keepdims=True)
                order = np.argsort(-probs, axis=-1)
                cs = np.cumsum(np.take_along_axis(probs, order, axis=-1), axis=-1)
                cutoff_idx = np.argmax(cs >= bp.top_p, axis=-1)
                cutoff = np.take_along_axis(
                    np.take_along_axis(probs, order, axis=-1),
                    cutoff_idx[:, None],
                    axis=-1,
                )
                warped[probs < cutoff] = -np.inf
            key, sub = jax.random.split(key)
            g = np.asarray(
                jax.random.gumbel(sub, shape=warped.shape), np.float64
            )
            pick_order = np.argsort(-(warped + g), axis=-1)
        else:
            pick_order = np.argsort(-cand_scores, axis=-1)

        reserve = max(2, 1 + len(bp.eos_ids)) * group_size
        next_seqs: List[List[int]] = [None] * bp.num_beams  # type: ignore
        next_scores = np.full(bp.num_beams, -np.inf)
        parents = np.zeros(bp.num_beams, dtype=np.int64)
        next_tokens = np.zeros(bp.num_beams, dtype=np.int64)

        for gidx in range(bp.num_groups):
            if group_done[gidx]:
                # keep beams frozen (scores -inf so they never win later)
                for b in range(gidx * group_size, (gidx + 1) * group_size):
                    next_seqs[b] = seqs[b]
                    parents[b] = b
                    next_tokens[b] = last_tokens[b]
                continue
            beams = range(gidx * group_size, (gidx + 1) * group_size)
            # candidate pool for the group
            pool = []  # (acc_score, parent, token)
            for b in beams:
                if not live[b]:
                    continue
                for tok in pick_order[b, :reserve]:
                    sc = cand_scores[b, tok]
                    if np.isneginf(sc):
                        continue
                    pool.append((float(sc), b, int(tok)))
            pool.sort(key=lambda x: -x[0])
            if step == 0:
                # all beams start from identical state: take distinct
                # tokens from one row to diversify the group
                seen_tok = set()
                dedup = []
                for sc, b, tok in pool:
                    if tok not in seen_tok:
                        dedup.append((sc, b, tok))
                        seen_tok.add(tok)
                pool = dedup

            filled = 0
            slot = gidx * group_size
            for sc, b, tok in pool:
                if filled >= group_size:
                    break
                if tok in eos:
                    hyps[gidx].add(seqs[b], sc, step + 1)
                    continue
                next_seqs[slot + filled] = seqs[b] + [tok]
                next_scores[slot + filled] = sc
                parents[slot + filled] = b
                next_tokens[slot + filled] = tok
                filled += 1
            while filled < group_size:  # degenerate: pad with frozen beam
                src = gidx * group_size
                next_seqs[slot + filled] = seqs[src]
                parents[slot + filled] = src
                next_tokens[slot + filled] = last_tokens[src]
                filled += 1
            best = pool[0][0] if pool else -np.inf
            if hyps[gidx].is_done(best, step + 1):
                group_done[gidx] = True

        seqs = next_seqs
        scores = next_scores
        last_tokens = next_tokens
        state = gather_beams(state, jnp.asarray(parents, jnp.int32))
        if all(group_done):
            break

    outputs: List[Tuple[float, List[int]]] = []
    for b in range(bp.num_beams):
        if np.isfinite(scores[b]) and seqs[b]:
            outputs.append(
                (
                    scores[b] / max(len(seqs[b]), 1) ** bp.length_penalty,
                    seqs[b],
                )
            )
    for h in hyps:
        outputs.extend(h.beams)
    outputs.sort(key=lambda x: -x[0])
    return outputs[: bp.return_num_sequences]
