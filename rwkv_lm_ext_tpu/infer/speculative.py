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
cache to truncate on rejection — the target's recurrent state after a
partial accept is recovered by RE-PREFILLING the accepted prefix from
the pre-round state snapshot (an O(accepted) matmul pass, still far
cheaper than per-token decode). The draft is re-advanced the same way.
Rounds therefore cost:
  full accept:    1 target pass (gamma+1 tokens)   -> gamma+1 tokens out
  partial accept: 2 target passes (gamma+1, j+1)   -> j+1 tokens out

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

from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward
from rwkv_lm_ext_tpu.models.state import init_model_state


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

        def draft_scan(params, cur, state):
            """Greedy-draft gamma tokens from `cur` (B=1)."""

            def body(carry, _):
                tok, st = carry
                logits, st = rwkv_forward(
                    params, draft_cfg, tok[None, None], st,
                    wkv_backend=draft_wkv_backend,
                )
                nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
                return (nxt, st), nxt

            (_, _), toks = jax.lax.scan(
                body, (cur, state), None, length=gm
            )
            return toks

        self._draft_scan = jax.jit(draft_scan)

        def verify(params, tokens, state):
            """Target pass over (1, gamma+1) tokens: per-position argmax
            and the final state (valid only on full acceptance)."""
            logits, new_state = rwkv_forward(
                params, target_cfg, tokens, state, wkv_backend=wkv_backend
            )
            return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), new_state

        self._verify = jax.jit(verify)

    # -- helpers -----------------------------------------------------------

    def _prefill(self, fwd, params, cfg, ids: List[int], state=None):
        if state is None:
            state = init_model_state(cfg, 1)
        tok = jnp.asarray(ids, jnp.int32)
        logits = None
        for off in range(0, len(ids), self.chunk_len):
            piece = tok[off : off + self.chunk_len][None]
            logits, state = fwd(params, piece, state)
        assert logits is not None, "empty prompt"
        return logits[0, -1], state

    # -- public API --------------------------------------------------------

    def generate(
        self,
        prompt,
        *,
        max_tokens: int = 128,
        token_stop: Tuple[int, ...] = (0,),
        return_stats: bool = False,
    ):
        """Greedy generation, token-identical to the target model's own
        greedy decode (the acceptance rule is exact argmax match)."""
        if isinstance(prompt, str):
            assert self.tokenizer is not None
            ids = self.tokenizer.encode(prompt)
        else:
            ids = list(prompt)

        stats = SpecStats()
        t_logits, t_state = self._prefill(self._t_fwd, self._tp, self._tc, ids)
        stats.target_passes += 1
        _, d_state = self._prefill(self._d_fwd, self._dp, self._dc, ids)
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
            if len(out) >= max_tokens:
                break
            # snapshots: rejection rolls both models back to here
            t_snap, d_snap = t_state, d_state
            cand = self._draft_scan(self._dp, cur, d_state)  # (gamma,)
            feed = jnp.concatenate([cur[None], cand])[None]  # (1, gamma+1)
            argmaxes, t_full = self._verify(self._tp, feed, t_state)
            stats.rounds += 1
            stats.target_passes += 1
            stats.proposed += self.gamma

            cand_h = np.asarray(cand)
            arg_h = np.asarray(argmaxes)
            j = 0
            while j < self.gamma and cand_h[j] == arg_h[j]:
                j += 1
            stats.accepted += j

            consumed = [c] + [int(x) for x in cand_h[:j]]
            if j == self.gamma:
                t_state = t_full  # fed exactly the consumed tokens
            else:
                _, t_state = self._prefill(
                    self._t_fwd, self._tp, self._tc, consumed, t_snap
                )
                stats.target_passes += 1
            # draft consumed gamma lookahead tokens; re-advance it over
            # what was actually accepted (a tiny draft prefill)
            _, d_state = self._prefill(
                self._d_fwd, self._dp, self._dc, consumed, d_snap
            )

            # emit the accepted draft tokens; the target's next token
            # (correction on mismatch / bonus on full accept) becomes cur
            stopped = False
            for t in consumed[1:]:
                if t in stop or len(out) >= max_tokens:
                    stopped = True
                    break
                out.append(t)
            if stopped:
                break
            cur = jnp.asarray(int(arg_h[j]), jnp.int32)

        text = self.tokenizer.decode(out) if self.tokenizer else out
        if return_stats:
            return text, stats
        return text
