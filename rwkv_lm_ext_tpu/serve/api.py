"""Serving endpoints.

Covers the reference's two demo services with one service object:
- demo/states_runner.py: POST /process_text {"text", "action"} -> named
  state-tuned generation with per-action instruction templates.
- demo/fill_mask_api.py: POST /fill_mask {"text"} ([MASK] -> predictions
  with cumulative-probability cutoff), POST /similarity {"texts_a",
  "texts_b"}, plus /embed, /rerank, /generate.

/generate with "stream": true answers as text/event-stream: one
data: {"token": piece} event per UTF-8-safe decoded piece as tokens are
produced (all three generate backends), then a final
data: {"done": true, "output": ..., "backend": ...} event.

Transport: stdlib ThreadingHTTPServer JSON endpoints (zero deps; the TPU
runtime handles requests sequentially per service object), or a FastAPI
app via make_fastapi_app when fastapi is installed.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from collections import deque
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.config import MASK_ID, PAD_ID
from rwkv_lm_ext_tpu.infer.sampling import SamplingParams

MASK_TOKEN = "[MASK]"


class _ClientDisconnected(Exception):
    """Raised inside a streaming callback to abort generation after the
    client went away (engine/speculative paths; the batcher cancels by
    request id instead)."""


class ServingService:
    def __init__(
        self,
        *,
        engine=None,                 # GenerationEngine (chat / states)
        states_registry=None,        # StatesRegistry
        bi_encoder=None,             # BiEncoder
        cross_encoder=None,          # CrossEncoder
        encoder_params=None,         # bidirectional encoder params (fill-mask)
        encoder_cfg=None,
        tokenizer=None,
        mask_id: int = MASK_ID,
        batcher=None,                # ContinuousBatcher: concurrent /generate
        spec_engine=None,            # SpeculativeEngine: single-stream latency
        driver_factory=None,         # batcher -> driver (default
                                     # BatcherDriver; multi-host serving
                                     # passes LockstepBatcherDriver, and
                                     # worker processes an inert factory)
    ):
        self.engine = engine
        self.spec = spec_engine
        self.states = states_registry
        self.bi = bi_encoder
        self.cross = cross_encoder
        self.encoder_params = encoder_params
        self.encoder_cfg = encoder_cfg
        self.tokenizer = tokenizer or (engine.tokenizer if engine else None)
        self.mask_id = mask_id
        self.batcher = batcher
        self.driver_factory = driver_factory
        self._driver = None
        self._driver_started = False
        self._lock = threading.Lock()
        self._fill_mask_jit = {}
        # stats have their own lock: handler threads mutate them while
        # another request may hold _lock for a long generate
        self._stats_lock = threading.Lock()
        self._counts: Dict[str, int] = {}
        self._spec_totals = {"rounds": 0, "proposed": 0, "accepted": 0}
        # rolling /generate latencies per backend (seconds, last 512)
        self._latencies: Dict[str, deque] = {}

    def warmup(self, *, max_tokens: int = 2) -> None:
        """Pre-compile the hot paths from the calling thread.

        Serving compiles lazily per bucket shape; without warmup the first
        request eats the compile (and some TPU runtimes only allow initial
        compilation from the main thread). serve_http calls this by
        default."""
        if self.bi is not None:
            self.bi.encode_texts(["warmup"])
        if self.cross is not None:
            self.cross.score_pairs([("warm", "up")])
        if self.engine is not None:
            self.engine.generate(
                "warmup", max_tokens=max_tokens,
            )
        if self.encoder_params is not None:
            try:
                self.fill_mask(f"warm {MASK_TOKEN} up")
            except Exception:
                pass
        if self.spec is not None:
            self.spec.generate([1], max_tokens=max_tokens, token_stop=())
        if self.batcher is not None and not self._driver_started:
            from rwkv_lm_ext_tpu.infer.continuous import BatcherDriver

            self.batcher.warmup()  # compile from this (main) thread
            factory = self.driver_factory or BatcherDriver
            self._driver = factory(self.batcher)
            self._driver_started = True

    # ---- endpoints -------------------------------------------------
    def process_text(self, text: str, action: str, **gen_kw) -> Dict:
        """Named-states generation (demo/states_runner.py /process_text)."""
        assert self.states is not None and self.engine is not None
        with self._lock:
            out = self.states.generate(self.engine, action, text, **gen_kw)
        return {"action": action, "output": out}

    # sampling knobs /generate accepts per request; the batcher carries
    # them in per-slot device rows (infer.sampling.slot_params) and the
    # locked engine path takes them via SamplingParams — same semantics
    # on both paths
    _PER_REQUEST_KNOBS = (
        "temperature", "top_p", "alpha_presence", "alpha_frequency",
        "alpha_decay", "repetition_penalty", "token_stop",
    )

    def _validate_gen_opts(self, gen_kw: Dict):
        """Reject unknown options; pop max_tokens and adapter (shared by
        the blocking and streaming paths — one validation point).
        Returns (max_tokens, adapter)."""
        unknown = set(gen_kw) - {"max_tokens", "adapter",
                                 *self._PER_REQUEST_KNOBS}
        if unknown:
            raise BadRequest(f"unsupported generate options: {sorted(unknown)}")
        if "token_stop" in gen_kw:
            gen_kw["token_stop"] = tuple(gen_kw["token_stop"])
        adapter = gen_kw.pop("adapter", None)
        if adapter is not None and adapter != "base":
            ids = getattr(self.engine, "adapter_ids", None) or {}
            if adapter not in ids:
                raise BadRequest(
                    f"unknown adapter {adapter!r}; serving "
                    f"{sorted(ids) or ['base']}"
                )
        return int(gen_kw.pop("max_tokens", 128)), adapter

    def _token_stream_cb(self, tokenizer, stream_cb):
        """Wrap a text callback into a token-id callback with UTF-8-safe
        incremental decoding; returns (cb, finish)."""
        decoder = tokenizer.streaming_decoder()

        def cb(tid: int) -> None:
            piece = decoder.push(tid)
            if piece:
                stream_cb(piece)

        def finish() -> None:
            tail = decoder.flush()
            if tail:
                stream_cb(tail)

        return cb, finish

    def generate(self, prompt: str, *, stream_cb=None, cancel_event=None,
                 **gen_kw) -> Dict:
        """stream_cb: optional callable(text_piece) invoked as tokens are
        produced (UTF-8-safe incremental decode on every backend); the
        full result dict is still returned at the end.
        cancel_event: optional threading.Event another thread sets (e.g.
        on client disconnect) — generation aborts instead of decoding to
        max_tokens for a departed caller; the partial result comes back
        with "cancelled": true."""
        assert self.engine is not None
        import dataclasses
        import time as _time

        t0 = _time.perf_counter()

        def _done(result: Dict) -> Dict:
            with self._stats_lock:
                self._latencies.setdefault(
                    result.get("backend", "?"), deque(maxlen=512)
                ).append(_time.perf_counter() - t0)
            return result

        max_tokens, adapter = self._validate_gen_opts(gen_kw)
        if self._driver is not None:
            # continuous batching: concurrent requests share the batched
            # decode step instead of serializing on the engine lock —
            # including across ADAPTERS (slot-lora: each row decodes
            # under its request's adapter in the same compiled step)
            sp = (
                dataclasses.replace(self.batcher.sampling, **gen_kw)
                if gen_kw else None
            )
            tok = self.batcher.engine.tokenizer
            cb = finish = None
            if stream_cb is not None and tok is not None:
                cb, finish = self._token_stream_cb(tok, stream_cb)
            ids = self._driver.submit_and_wait(
                prompt, max_tokens=max_tokens, sampling=sp, callback=cb,
                adapter=adapter, cancel=cancel_event,
            )
            if finish is not None:
                finish()
            out = {"output": tok.decode(ids) if tok else ids,
                   "backend": "batcher"}
            if cancel_event is not None and cancel_event.is_set():
                out["cancelled"] = True
            return _done(out)
        if cancel_event is not None and stream_cb is not None:
            # abort the engine/speculative decode loops from inside the
            # streaming callback; these loops run in THIS thread (the
            # batcher path above cancels by rid instead — its callbacks
            # run inside the shared decode loop and must never raise)
            inner_cb = stream_cb

            def stream_cb(piece):  # noqa: F811
                if cancel_event.is_set():
                    raise _ClientDisconnected()
                inner_cb(piece)

        eff = SamplingParams(**gen_kw) if gen_kw else SamplingParams()
        if (self.spec is not None
                and adapter is None
                and eff.alpha_presence == 0.0
                and eff.alpha_frequency == 0.0
                and eff.repetition_penalty == 1.0):
            # speculative decoding honors penalty-free sampling exactly;
            # penalized requests fall through to the plain engine
            cb = finish = None
            if stream_cb is not None and self.spec.tokenizer is not None:
                cb, finish = self._token_stream_cb(
                    self.spec.tokenizer, stream_cb
                )
            try:
                with self._lock:
                    out, st = self.spec.generate(
                        prompt, max_tokens=max_tokens,
                        token_stop=eff.token_stop,
                        sampling=eff if eff.temperature > 0.0 else None,
                        return_stats=True,
                        callback=cb,
                    )
            except _ClientDisconnected:
                return _done({"output": None, "cancelled": True,
                              "backend": "speculative"})
            if finish is not None:
                finish()
            with self._stats_lock:
                self._spec_totals["rounds"] += st.rounds
                self._spec_totals["proposed"] += st.proposed
                self._spec_totals["accepted"] += st.accepted
            return _done({"output": out, "backend": "speculative"})
        try:
            with self._lock:
                out = self.engine.generate(
                    prompt, max_tokens=max_tokens,
                    callback=stream_cb, adapter=adapter,
                    **({"sampling": eff} if gen_kw else {}),
                )
        except _ClientDisconnected:
            return _done({"output": None, "cancelled": True,
                          "backend": "engine"})
        return _done({"output": out, "backend": "engine"})

    def generate_sse(self, payload: Dict):
        """Server-sent-events iterator for a streaming /generate request
        (payload with "stream": true). Validates eagerly — a bad request
        raises BadRequest BEFORE the first byte so the transport can
        still answer 400; failures mid-stream are emitted as a final
        {"error": ...} event. Yields SSE-encoded bytes:
        data: {"token": piece} per decoded text piece, then
        data: {"done": true, "output": ..., "backend": ...}."""
        import queue

        opts = {
            k: v for k, v in payload.items()
            if k not in ("prompt", "stream")
        }
        if "max_tokens" in opts:
            opts["max_tokens"] = int(opts["max_tokens"])
        if "prompt" not in payload:
            raise BadRequest("missing field 'prompt'")
        prompt = payload["prompt"]
        self._validate_gen_opts(dict(opts))  # eager 400 on unknown knobs
        with self._stats_lock:
            self._counts["/generate"] = self._counts.get("/generate", 0) + 1

        q: "queue.SimpleQueue" = queue.SimpleQueue()
        client_gone = threading.Event()

        def worker():
            try:
                result = self.generate(
                    prompt, stream_cb=lambda piece: q.put(("token", piece)),
                    cancel_event=client_gone,
                    **opts,
                )
                q.put(("done", result))
            except BaseException as e:  # noqa: BLE001 — streamed to client
                q.put(("error", str(e)))

        def events():
            threading.Thread(target=worker, daemon=True).start()
            try:
                while True:
                    kind, val = q.get()
                    if kind == "token":
                        yield _sse({"token": val})
                    elif kind == "done":
                        yield _sse({"done": True, **val})
                        return
                    else:
                        yield _sse({"error": val})
            finally:
                # transport closed the iterator (client disconnect):
                # abort generation instead of decoding to max_tokens
                client_gone.set()

        return events()

    def fill_mask(
        self, text: str, *, top_k: int = 10, cumulative_prob: float = 0.95
    ) -> Dict:
        """[MASK] slots -> candidate tokens until the cumulative
        probability cutoff (demo/fill_mask_api.py semantics)."""
        assert self.encoder_params is not None and self.tokenizer is not None
        from rwkv_lm_ext_tpu.models.bidirectional import encoder_forward
        from rwkv_lm_ext_tpu.models.heads import mlm_logits

        import bisect

        import jax

        parts = text.split(MASK_TOKEN)
        ids: List[int] = []
        mask_positions: List[int] = []
        for i, part in enumerate(parts):
            ids.extend(self.tokenizer.encode(part) if part else [])
            if i < len(parts) - 1:
                mask_positions.append(len(ids))
                ids.append(self.mask_id)
        ids.append(1)  # emb terminator

        # bucket + jit per length (compiled once per bucket)
        buckets = (32, 64, 128, 256, 512, 1024, 2048)
        L = buckets[min(bisect.bisect_left(buckets, len(ids)), len(buckets) - 1)]
        if L not in self._fill_mask_jit:
            cfg = self.encoder_cfg

            @jax.jit
            def fn(params, tokens):
                hidden = encoder_forward(params, cfg, tokens)
                return jax.nn.softmax(
                    mlm_logits(params, cfg, hidden), axis=-1
                )

            self._fill_mask_jit[L] = fn
        padded = np.full((1, L), PAD_ID, np.int32)
        padded[0, : min(len(ids), L)] = ids[:L]
        with self._lock:
            probs_dev = self._fill_mask_jit[L](
                self.encoder_params, jnp.asarray(padded)
            )
        probs = np.asarray(probs_dev[0], np.float64)
        results = []
        for pos in mask_positions:
            p = probs[pos]
            order = np.argsort(-p)[:top_k]
            cands, acc = [], 0.0
            for tok in order:
                cands.append(
                    {
                        "token": self.tokenizer.decode([int(tok)]),
                        "token_id": int(tok),
                        "prob": float(p[tok]),
                    }
                )
                acc += float(p[tok])
                if acc >= cumulative_prob:
                    break
            results.append(cands)
        return {"masks": results}

    def similarity(self, texts_a: List[str], texts_b: List[str]) -> Dict:
        assert self.bi is not None
        with self._lock:
            ea = self.bi.encode_texts(texts_a)
            eb = self.bi.encode_texts(texts_b)
        sims = (ea @ eb.T).tolist()
        return {"similarity": sims}

    def embed(self, texts: List[str]) -> Dict:
        assert self.bi is not None
        with self._lock:
            e = self.bi.encode_texts(texts)
        return {"embeddings": e.tolist()}

    def rerank(self, query: str, documents: List[str]) -> Dict:
        assert self.cross is not None
        with self._lock:
            scores = self.cross.score_pairs([(query, d) for d in documents])
        order = np.argsort(-scores)
        return {
            "scores": scores.tolist(),
            "ranking": order.tolist(),
        }

    def stats(self) -> Dict:
        """Serving observability: which generate backends ran, batcher
        occupancy, aggregate speculative acceptance."""
        with self._stats_lock:
            out: Dict = {"requests": dict(self._counts)}
            t = dict(self._spec_totals)
            lat = {k: list(v) for k, v in self._latencies.items()}
        if lat:
            out["generate_latency_ms"] = {
                backend: {
                    "count": len(xs),
                    "p50": round(float(np.percentile(xs, 50)) * 1e3, 1),
                    "p95": round(float(np.percentile(xs, 95)) * 1e3, 1),
                    "p99": round(float(np.percentile(xs, 99)) * 1e3, 1),
                }
                for backend, xs in lat.items()
            }
        if self.batcher is not None:
            out["batcher"] = {
                "n_slots": self.batcher.n_slots,
                "active": sum(
                    s is not None for s in self.batcher._slots
                ),
                "queued": len(self.batcher._queue),
            }
        if self.spec is not None:
            out["speculative"] = dict(
                t, acceptance=(
                    t["accepted"] / t["proposed"] if t["proposed"] else 0.0
                ),
            )
        if self.engine is not None and self.engine.state_cache is not None:
            out["prefix_cache"] = self.engine.state_cache.stats()
        if self.engine is not None and getattr(
            self.engine, "adapter_ids", None
        ):
            out["adapters"] = sorted(self.engine.adapter_ids)
        return out

    # ---- dispatch --------------------------------------------------
    def handle(self, route: str, payload: Dict) -> Dict:
        with self._stats_lock:
            self._counts[route] = self._counts.get(route, 0) + 1
        try:
            if route == "/stats":
                return self.stats()
            if route == "/process_text":
                return self.process_text(
                    payload["text"], payload.get("action", "default")
                )
            if route == "/generate":
                # generate() is the single validation point: it rejects
                # unknown options with BadRequest. ("stream" is a
                # transport option, handled by the HTTP layer — a truthy
                # value only works there, so reject it here.)
                opts = {
                    k: v for k, v in payload.items()
                    if k not in ("prompt", "stream")
                }
                if payload.get("stream"):
                    raise BadRequest(
                        "stream=true requires the SSE transport "
                        "(serve_http / FastAPI)"
                    )
                if "max_tokens" in opts:
                    opts["max_tokens"] = int(opts["max_tokens"])
                return self.generate(payload["prompt"], **opts)
            if route == "/fill_mask":
                return self.fill_mask(
                    payload["text"],
                    top_k=int(payload.get("top_k", 10)),
                    cumulative_prob=float(payload.get("cumulative_prob", 0.95)),
                )
            if route == "/similarity":
                return self.similarity(payload["texts_a"], payload["texts_b"])
            if route == "/embed":
                return self.embed(payload["texts"])
            if route == "/rerank":
                return self.rerank(payload["query"], payload["documents"])
        except KeyError as e:
            raise BadRequest(f"missing field {e}") from e
        raise UnknownRoute(route)


def _sse(obj: Dict) -> bytes:
    return b"data: " + json.dumps(obj).encode() + b"\n\n"


class UnknownRoute(Exception):
    pass


class BadRequest(Exception):
    pass


def serve_http(
    service: ServingService,
    host: str = "0.0.0.0",
    port: int = 8000,
    *,
    warmup: bool = True,
):
    """Run a blocking stdlib JSON HTTP server. Returns the server object
    (call .shutdown() from another thread to stop)."""
    if warmup:
        service.warmup()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/generate" and payload.get("stream"):
                    # SSE: tokens stream as they are produced
                    events = service.generate_sse(payload)
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.send_header("Connection", "close")
                    self.end_headers()
                    try:
                        for chunk in events:
                            self.wfile.write(chunk)
                            self.wfile.flush()
                    finally:
                        # a failed write = client disconnect; closing the
                        # iterator aborts the generation behind it
                        events.close()
                    return
                result = service.handle(self.path, payload)
                body = json.dumps(result).encode()
                self.send_response(200)
            except UnknownRoute:
                body = b'{"error": "unknown route"}'
                self.send_response(404)
            except (BadRequest, json.JSONDecodeError, TypeError, ValueError) as e:
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
            except Exception as e:  # noqa: BLE001
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            # built-in browser chat UI (serve.webui) — the reference's
            # desktop GUI (gui/main.py) re-imagined as a zero-dependency
            # page over the same endpoints. GET /stats mirrors the POST
            # route for curl/monitoring convenience.
            if self.path in ("/", "/index.html"):
                from rwkv_lm_ext_tpu.serve.webui import INDEX_HTML

                body = INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
            elif self.path == "/stats":
                body = json.dumps(service.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
            else:
                body = b'{"error": "unknown route"}'
                self.send_response(404)
                self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    return server


def make_fastapi_app(service: ServingService):
    """Optional FastAPI wrapper (same routes) when fastapi is installed."""
    from fastapi import FastAPI, Request

    app = FastAPI(title="rwkv_lm_ext_tpu")

    @app.post("/{route:path}")
    async def dispatch(route: str, request: Request):
        payload = await request.json()
        if route == "generate" and payload.get("stream"):
            from fastapi.responses import StreamingResponse

            return StreamingResponse(
                service.generate_sse(payload),
                media_type="text/event-stream",
            )
        return service.handle("/" + route, payload)

    return app
