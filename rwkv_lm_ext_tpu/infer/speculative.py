"""Speculative decoding: draft-model lookahead verified by the target.

Beyond the reference (whose serving decodes strictly one token per
target forward, src/model_run.py:1264-1315): a small draft RWKV
proposes `gamma` greedy tokens autoregressively (cheap weight reads),
then the target model scores ALL of them in ONE T=gamma+1 prefill —
a batched matmul pass that rides the MXU at prefill efficiency instead
of gamma weight-read-bound decode steps. Greedy acceptance (token ==
target argmax) makes the output provably identical to target-only
greedy decoding, so the speedup is pure latency, not a quality trade.

The RWKV twist vs transformer speculative decoding: there is no KV
cache to truncate on rejection. Round 3 recovered the post-accept state
by RE-PREFILLING the accepted prefix from a snapshot (a measured ~12 ms
extra target pass per rejected round). Now the verify pass itself emits
the state after EVERY fed position (models.collect.rwkv_forward_collect
— the WKV scan computes these anyway and previously discarded them),
and the draft's lookahead scan stacks its per-step states, so a partial
accept of j tokens is ONE dynamic-index select per model:
  full accept:    1 target pass (gamma+1 tokens)   -> gamma+1 tokens out
  partial accept: 1 target pass + state select      -> j+1 tokens out
Configs the collect forward can't express (v4, tiny-att, dropout) fall
back to the r3 re-prefill rollback.

Greedy only: occurrence/repetition penalties depend on the emitted
history token-by-token, which would invalidate the batched verification
logits.

Numerics caveat: "token-identical" holds under matched forward
numerics. In bf16 the verify pass (a T=gamma+1 prefill) and the plain
engine's T=1 decode path accumulate differently (~5e-3 relative state
agreement, scripts/tpu_smoke.py), so a near-tie argmax can resolve
differently — the same cross-path variability the engine itself has
across chunk_len choices (and that the reference's chunked prefill has
vs its token decode). In fp32 the match is exact (tests).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.infer.sampling import SamplingParams, penalize_and_filter
from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.models.state import init_model_state


def _filtered_probs(logits: jax.Array, sp: SamplingParams) -> jax.Array:
    """The engine's penalize->filter->temper pipeline as a probability
    distribution (penalties excluded — speculative mode rejects them).
    Works on (V,) or (T, V)."""
    occ = jnp.zeros_like(logits, jnp.float32)
    filtered = penalize_and_filter(logits, occ, sp)
    t = max(sp.temperature, 1e-6)
    return jax.nn.softmax(filtered / t, axis=-1)


def speculative_accept(p, qrows, cand, key):
    """The Leviathan et al. accept/resample rule, standalone so the
    distribution guarantee is unit-testable: accept draft token
    cand[i] ~ q_i w.p. min(1, p_i(cand[i])/q_i(cand[i])); at the first
    rejection j resample from norm(relu(p_j - q_j)); on full acceptance
    sample the bonus token from p[gamma]. Marginal of the emitted
    sequence == sampling from p directly.

    p: (gamma+1, V) target distributions; qrows: (gamma, V) draft
    distributions; cand: (gamma,) draft tokens. Returns (j, next)."""
    gm = cand.shape[0]
    idx = jnp.arange(gm)
    pr = p[idx, cand]
    qr = qrows[idx, cand]
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (gm,))
    acc = u * qr < pr                 # u < p/q without the division
    all_acc = jnp.all(acc)
    j = jnp.where(all_acc, gm, jnp.argmin(acc))
    jc = jnp.minimum(j, gm - 1)
    resid = jnp.maximum(p[jc] - qrows[jc], 0.0)
    # numerically-empty residual can only mean p == q: fall back to p
    resid = jnp.where(jnp.sum(resid) > 1e-12, resid, p[jc])
    dist = jnp.where(all_acc, p[gm], resid / jnp.sum(resid))
    nxt = jax.random.categorical(k2, jnp.log(dist + 1e-30)).astype(jnp.int32)
    return j, nxt


def truncated_draft(params, cfg, n_layer: int):
    """Early-exit self-draft: the target's first n_layer blocks with the
    shared emb/ln_out/head — a usable draft with ZERO extra weight memory
    (the arrays are the target's own buffers). Acceptance tracks how much
    of the target's prediction is already decided in its early layers."""
    dcfg = dataclasses.replace(cfg, n_layer=n_layer)
    dparams = dict(params)
    dparams["blocks"] = list(params["blocks"])[:n_layer]
    return dparams, dcfg


@dataclasses.dataclass
class SpecStats:
    rounds: int = 0
    proposed: int = 0
    accepted: int = 0
    target_passes: int = 0

    @property
    def acceptance(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0

    @property
    def tokens_per_target_pass(self) -> float:
        emitted = self.accepted + self.rounds  # +1 corrected/extended each
        return emitted / self.target_passes if self.target_passes else 0.0


class SpeculativeEngine:
    """Greedy speculative decoding over a (target, draft) RWKV pair.

    target/draft are (params, cfg) pairs; any RWKV-5/6 checkpoint works
    as the draft (typically 10-20x smaller than the target). gamma is
    the lookahead length: each round drafts gamma tokens and verifies
    them in one target prefill. Compiles at most gamma+1 tiny re-prefill
    shapes per model (lengths 1..gamma+1).
    """

    def __init__(
        self,
        target_params,
        target_cfg,
        draft_params,
        draft_cfg,
        tokenizer=None,
        *,
        gamma: int = 8,
        chunk_len: int = 256,
        wkv_backend: str = "auto",
        draft_wkv_backend: str = "auto",
    ):
        assert target_cfg.vocab_size == draft_cfg.vocab_size, (
            "draft and target must share a vocabulary"
        )
        self.tokenizer = tokenizer
        self.gamma = int(gamma)
        self.chunk_len = chunk_len
        self._tp, self._tc = target_params, target_cfg
        self._dp, self._dc = draft_params, draft_cfg
        self._t_be, self._d_be = wkv_backend, draft_wkv_backend

        def t_fwd(params, tokens, state):
            return rwkv_forward(
                params, target_cfg, tokens, state, wkv_backend=wkv_backend
            )

        def d_fwd(params, tokens, state):
            return rwkv_forward(
                params, draft_cfg, tokens, state,
                wkv_backend=draft_wkv_backend,
            )

        # no buffer donation anywhere: rejection rolls back to the
        # pre-round state snapshots, so they must stay live
        self._t_fwd = jax.jit(t_fwd)
        self._d_fwd = jax.jit(d_fwd)

        gm = self.gamma
        from rwkv_lm_ext_tpu.models.collect import (
            collect_supported,
            rwkv_forward_collect,
            select_state,
        )

        # state-select rollback (VERDICT r3 #5): target states come from
        # the collect verify pass; draft states from the lookahead scan
        self._target_collect = collect_supported(target_cfg)
        self._select = jax.jit(select_state)

        def draft_scan(params, cur, state):
            """Greedy-draft gamma tokens from `cur` (B=1); also emit the
            per-step state stack for select-rollback."""

            def body(carry, _):
                tok, st = carry
                logits, st = rwkv_forward(
                    params, draft_cfg, tok[None, None], st,
                    wkv_backend=draft_wkv_backend,
                )
                nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
                return (nxt, st), (nxt, st)

            (_, _), (toks, sts) = jax.lax.scan(
                body, (cur, state), None, length=gm
            )
            return toks, sts

        self._draft_scan = jax.jit(draft_scan)

        def verify(params, tokens, state):
            """Target pass over (1, gamma+1) tokens: per-position argmax
            plus either the per-position state stack (collect path) or
            the final state (fallback; valid only on full acceptance)."""
            if self._target_collect:
                logits, states = rwkv_forward_collect(
                    params, target_cfg, tokens, state
                )
            else:
                logits, states = rwkv_forward(
                    params, target_cfg, tokens, state,
                    wkv_backend=wkv_backend,
                )
            return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), states

        self._verify = jax.jit(verify)

        # Host-dispatch latency is a first-class cost on a remote-attached
        # TPU (measured ~5 ms/dispatch through the relay — comparable to
        # the verify pass itself), so the greedy round is TWO dispatches:
        # round (draft scan + verify fused) and rollback (both state
        # selects + the conditional full-accept draft step fused), with
        # ONE host fetch of (cand, argmaxes) in between.
        def greedy_round(tparams, dparams, cur, t_state, d_state):
            cand, d_states = draft_scan(dparams, cur, d_state)
            feed = jnp.concatenate([cur[None], cand])[None]
            argmaxes, t_states = verify(tparams, feed, t_state)
            return cand, argmaxes, t_states, d_states

        self._greedy_round = jax.jit(greedy_round)

        def rollback(dparams, cand, t_states, d_states, j):
            """(t_state, d_state) after accepting j of gamma tokens.
            Only valid on the collect path (t_states is a stack)."""
            j = jnp.asarray(j, jnp.int32)
            t_state = select_state(t_states, j)
            d_sel = select_state(d_states, jnp.minimum(j, gm - 1))

            def full_accept(st):
                _, st2 = rwkv_forward(
                    dparams, draft_cfg, cand[gm - 1][None, None], st,
                    wkv_backend=draft_wkv_backend,
                )
                return st2

            d_state = jax.lax.cond(
                j == gm, full_accept, lambda st: st, d_sel
            )
            return t_state, d_state

        self._rollback = jax.jit(rollback)
        self._sampled_jit = {}

    def _sampled_programs(self, sp: SamplingParams):
        """Jitted draft-sampling scan + verify/accept/resample program for
        one SamplingParams (cached per sp — it is a frozen dataclass)."""
        if sp in self._sampled_jit:
            return self._sampled_jit[sp]
        gm, d_cfg, t_cfg = self.gamma, self._dc, self._tc
        d_be, t_be = self._d_be, self._t_be

        def draft_scan(params, cur, state, key):
            """Sample gamma tokens x_i ~ q_i; return tokens, the FULL
            filtered draft rows q (gamma, V) for the rejection test, and
            the per-step state stack for select-rollback."""

            def body(carry, _):
                tok, st, k = carry
                logits, st = rwkv_forward(
                    params, d_cfg, tok[None, None], st, wkv_backend=d_be
                )
                q = _filtered_probs(logits[0, -1], sp)
                k, sub = jax.random.split(k)
                nxt = jax.random.categorical(
                    sub, jnp.log(q + 1e-30)
                ).astype(jnp.int32)
                return (nxt, st, k), (nxt, q, st)

            (_, _, key), (toks, qrows, sts) = jax.lax.scan(
                body, (cur, state, key), None, length=gm
            )
            return toks, qrows, sts, key

        def verify_accept(params, feed, state, qrows, cand, key):
            """Target pass + speculative_accept (the rejection-sampling
            rule): the emitted distribution provably equals target-only
            sampling with the same SamplingParams."""
            if self._target_collect:
                from rwkv_lm_ext_tpu.models.collect import (
                    rwkv_forward_collect,
                )

                logits, states = rwkv_forward_collect(
                    params, t_cfg, feed, state
                )
            else:
                logits, states = rwkv_forward(
                    params, t_cfg, feed, state, wkv_backend=t_be
                )
            p = _filtered_probs(logits[0].astype(jnp.float32), sp)  # (g+1,V)
            key, sub = jax.random.split(key)
            j, nxt = speculative_accept(p, qrows, cand, sub)
            return j, nxt, states, key

        progs = (jax.jit(draft_scan), jax.jit(verify_accept))
        self._sampled_jit[sp] = progs
        return progs

    # -- helpers -----------------------------------------------------------

    def _prefill(self, fwd, params, cfg, ids: List[int], state=None):
        from rwkv_lm_ext_tpu.infer.engine import _chunk_plan

        if state is None:
            state = init_model_state(cfg, 1)
        tok = jnp.asarray(ids, jnp.int32)
        logits = None
        # bucketed chunking: ~log2(chunk_len) compiled shapes per model,
        # not one per distinct prompt-length remainder
        off = 0
        for size in _chunk_plan(len(ids), self.chunk_len):
            piece = tok[off : off + size][None]
            logits, state = fwd(params, piece, state)
            off += size
        assert logits is not None, "empty prompt"
        return logits[0, -1], state

    # -- public API --------------------------------------------------------

    def generate(
        self,
        prompt,
        *,
        max_tokens: int = 128,
        token_stop: Tuple[int, ...] = (0,),
        sampling: Optional[SamplingParams] = None,
        seed: int = 0,
        return_stats: bool = False,
        callback=None,
    ):
        """Speculative generation.

        sampling=None (or temperature 0): greedy — token-identical to
        the target's own greedy decode (acceptance = exact argmax match).
        sampling with temperature > 0: rejection sampling (Leviathan et
        al.) over the filtered/tempered distributions — the emitted
        distribution provably equals target-only sampling with the same
        SamplingParams. Occurrence/repetition penalties are rejected
        (history-dependent; incompatible with batched verification)."""
        if isinstance(prompt, str):
            assert self.tokenizer is not None
            ids = self.tokenizer.encode(prompt)
        else:
            ids = list(prompt)

        sampled = sampling is not None and sampling.temperature > 0.0
        if sampling is not None:
            if (sampling.alpha_presence != 0.0
                    or sampling.alpha_frequency != 0.0
                    or sampling.repetition_penalty != 1.0):
                raise ValueError(
                    "speculative decoding cannot honor occurrence/"
                    "repetition penalties (history-dependent); set them "
                    "to 0/1 or use GenerationEngine.generate"
                )
            # one rule for BOTH modes: a provided SamplingParams is the
            # source of truth for token_stop
            token_stop = sampling.token_stop
            if not sampled and sampling.token_ban:
                raise ValueError(
                    "greedy speculative mode verifies by raw argmax and "
                    "cannot honor token_ban; use temperature > 0"
                )
        if sampled:
            d_scan_s, verify_accept = self._sampled_programs(sampling)
            key = jax.random.PRNGKey(seed)

        stats = SpecStats()
        t_logits, t_state = self._prefill(self._t_fwd, self._tp, self._tc, ids)
        stats.target_passes += 1
        _, d_state = self._prefill(self._d_fwd, self._dp, self._dc, ids)
        if sampled:
            key, sub = jax.random.split(key)
            p0 = _filtered_probs(t_logits.astype(jnp.float32), sampling)
            cur = jax.random.categorical(
                sub, jnp.log(p0 + 1e-30)
            ).astype(jnp.int32)
        else:
            cur = jnp.argmax(t_logits).astype(jnp.int32)

        out: List[int] = []
        stop = set(token_stop)
        while True:
            # cur is the next token to EMIT (engine semantics: the token
            # sampled from the prefill logits is out[0])
            c = int(cur)
            if c in stop or len(out) >= max_tokens:
                break
            out.append(c)
            if callback is not None:
                callback(c)
            if len(out) >= max_tokens:
                break
            # snapshots: the fallback (non-collect) target path rolls
            # back to here on rejection
            t_snap = t_state
            if sampled:
                cand, qrows, d_states, key = d_scan_s(
                    self._dp, cur, d_state, key
                )
                feed = jnp.concatenate([cur[None], cand])[None]
                j_d, nxt_d, t_states, key = verify_accept(
                    self._tp, feed, t_state, qrows, cand, key
                )
                # one host transfer for the round's scalars + tokens
                j_h, nxt_h, cand_h = jax.device_get((j_d, nxt_d, cand))
                j, nxt = int(j_h), int(nxt_h)
            else:
                cand, argmaxes, t_states, d_states = self._greedy_round(
                    self._tp, self._dp, cur, t_state, d_state
                )
                # one host transfer per round
                arg_h, cand_h = jax.device_get((argmaxes, cand))
                j = 0
                while j < self.gamma and cand_h[j] == arg_h[j]:
                    j += 1
                nxt = int(arg_h[j])
            stats.rounds += 1
            stats.target_passes += 1
            stats.proposed += self.gamma
            stats.accepted += j

            consumed = [c] + [int(x) for x in cand_h[:j]]
            if self._target_collect:
                # both rollback selects + the conditional full-accept
                # draft step: ONE dispatch (j is a traced argument —
                # one compile covers every j)
                t_state, d_state = self._rollback(
                    self._dp, cand, t_states, d_states, j
                )
            else:
                if j == self.gamma:
                    t_state = t_states  # fed exactly the consumed tokens
                else:
                    _, t_state = self._prefill(
                        self._t_fwd, self._tp, self._tc, consumed, t_snap
                    )
                    stats.target_passes += 1
                d_state = self._select(d_states, min(j, self.gamma - 1))
                if j == self.gamma:
                    _, d_state = self._d_fwd(
                        self._dp, cand[self.gamma - 1][None, None], d_state
                    )

            # emit the accepted draft tokens; the target's next token
            # (correction/resample on rejection, bonus on full accept)
            # becomes cur
            stopped = False
            for t in consumed[1:]:
                if t in stop or len(out) >= max_tokens:
                    stopped = True
                    break
                out.append(t)
                if callback is not None:
                    callback(t)
            if stopped:
                break
            cur = jnp.asarray(nxt, jnp.int32)

        text = self.tokenizer.decode(out) if self.tokenizer else out
        if return_stats:
            return text, stats
        return text
