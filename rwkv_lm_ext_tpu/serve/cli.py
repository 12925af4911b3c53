"""Serving CLI: one command from checkpoints to HTTP endpoints.

The runnable equivalent of the reference's demo servers —
demo/states_runner.py (named states + instruction templates from a
config file) and demo/fill_mask_api.py (fill-mask / similarity /
generate, CPU-capable) — as a single entry point:

  python -m rwkv_lm_ext_tpu.serve.cli \\
      --model RWKV-x060-World-1B6.pth \\
      --chat-adapter out/chat/lora-step1000.pth --lora-r 8 --lora-alpha 32 \\
      --states-config states.json \\
      --bi-adapter out/bi/lora-step500.pth \\
      --cross-adapter out/cross/lora-step500.pth \\
      --encoder out/mlm/encoder.pth \\
      --batcher-slots 16 --port 8000

states.json maps action names to state-tuned checkpoints + templates
(the states_config of demo/states_runner.py):
  {"summarize": {"path": "states/sum.pth", "template": "sum: {input}"}}

Every adapter merges over the SAME pristine base (pure merged-weight
hot-swap — no module state), so chat/embedding/reranking serve
concurrently from one process.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Optional


def _parse(argv=None):
    p = argparse.ArgumentParser(
        prog="rwkv_lm_ext_tpu.serve.cli", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--model", default=None,
                   help="base .pth for generation / states / encoders")
    p.add_argument("--vocab", default=None, help="world-vocab path")
    p.add_argument("--tokenizer-json", default=None,
                   help="HF tokenizer.json instead of the world vocab "
                        "(e.g. 20B_tokenizer.json for RWKV-4 Pile)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) before backend init")
    p.add_argument("--dtype", default=None,
                   help="compute dtype override (e.g. float32)")
    p.add_argument("--quant", default=None,
                   choices=("int8", "int8c", "nf4", "fp4"),
                   help="quantize the generation base's block linears")
    p.add_argument("--chat-adapter", default=None,
                   help="LoRA .pth merged into the generation base")
    p.add_argument("--slot-adapter", action="append", default=None,
                   metavar="NAME=PATH",
                   help="repeatable: named LoRA served PER REQUEST on the "
                        "same base (adapters.slot_lora — /generate "
                        '{"adapter": NAME}; omit for base weights). Unlike '
                        "--chat-adapter nothing is merged: under "
                        "--batcher-slots requests with different adapters "
                        "decode in ONE batched step. Uses --lora-r/alpha.")
    p.add_argument("--pissa-init", default=None,
                   help="init_pissa.pth for a PiSSA chat adapter")
    p.add_argument("--lora-r", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--states-config", default=None,
                   help="JSON: name -> {path, template} state-tuned tasks")
    p.add_argument("--bi-adapter", default=None,
                   help="LoRA .pth for the bi-encoder (/embed /similarity)")
    p.add_argument("--bi-pooling", default="weightedmean")
    p.add_argument("--cross-adapter", default=None,
                   help="LoRA .pth for the cross-encoder (/rerank); its "
                        "score.weight (or a sibling score-*.pth via "
                        "--cross-head) is the scoring head")
    p.add_argument("--cross-head", default=None,
                   help=".pth holding score.weight if not in the adapter")
    p.add_argument("--encoder", default=None,
                   help="bidirectional encoder .pth for /fill_mask")
    p.add_argument("--batcher-slots", type=int, default=0,
                   help="enable continuous batching for /generate")
    p.add_argument("--batcher-block", type=int, default=16,
                   help="decode tokens per dispatch in the batcher "
                        "(K-step fused blocks; amortizes host dispatch "
                        "latency K-fold; streaming callbacks fire per "
                        "block). 1 = per-token ticks")
    p.add_argument("--batcher-adaptive", action="store_true",
                   help="adapt the block length down (pow2s >= 8) when "
                        "a slot nears its token budget — measured "
                        "net-negative on mixed loads; opt-in")
    p.add_argument("--prefix-cache", type=int, default=0, metavar="N",
                   help="LRU prompt-prefix state cache with N entries: "
                        "prompts sharing a cached prefix (system prompts, "
                        "chat history) skip re-prefilling it (~13 MB HBM "
                        "per entry at 1B6)")
    p.add_argument("--draft", default=None,
                   help="smaller RWKV .pth: speculative decoding for "
                        "penalty-free /generate (single-stream latency; "
                        "ignored when --batcher-slots is set)")
    p.add_argument("--draft-layers", type=int, default=0,
                   help="early-exit self-draft from the target's first "
                        "K layers instead of a separate --draft ckpt")
    p.add_argument("--gamma", type=int, default=8,
                   help="speculative lookahead length")
    p.add_argument("--wkv-backend", default="auto",
                   help="WKV kernel path for the engine/encoders "
                        "(auto|pallas|chunked|chunked_exact|reference)")
    p.add_argument("--tp", type=int, default=1,
                   help="head-parallel tensor parallelism: shard the "
                        "model across a (dp=1, tp=N) device mesh for "
                        "checkpoints beyond one chip's HBM")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache: server "
                        "restarts reuse compiled programs instead of "
                        "paying the ~30s+ first-compile per shape")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    # multi-host serving (model sharded across hosts/slices): run the
    # same command on every host; only process 0 binds the HTTP port.
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multi-host runs)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args(argv)


def _load_head(sd) -> Optional[dict]:
    import numpy as np

    if "score.weight" not in sd:
        return None
    # saved in the reference's (num_labels, C) layout; kernel is (C, n)
    return {"kernel": np.asarray(sd["score.weight"], np.float32).T}


def build_service(args):
    """Assemble a ServingService from CLI args (separated from main so
    tests can drive it without binding a port)."""
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        # cache every compile, however small the program
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from rwkv_lm_ext_tpu.adapters import LoraConfig
    from rwkv_lm_ext_tpu.adapters.lora import (
        lora_state_dict_to_tree,
        merge_lora,
        merge_pissa,
    )
    from rwkv_lm_ext_tpu.adapters.quant import quantize_tree
    from rwkv_lm_ext_tpu.checkpoint import load_rwkv_checkpoint
    from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.infer.encoders import BiEncoder, CrossEncoder
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.states_registry import StatesRegistry
    from rwkv_lm_ext_tpu.serve.api import ServingService

    overrides = {}
    if args.dtype:
        overrides["dtype"] = args.dtype
        overrides["param_dtype"] = args.dtype
    if args.tokenizer_json:
        from rwkv_lm_ext_tpu.data.tokenizer_json import JsonTokenizer

        tok = JsonTokenizer(args.tokenizer_json)
    else:
        tok = WorldTokenizer(args.vocab)
    lc = LoraConfig(r=args.lora_r, alpha=args.lora_alpha)

    mesh = None
    enc_backend = args.wkv_backend
    if args.tp > 1:
        from rwkv_lm_ext_tpu.parallel import make_mesh, param_shardings

        mesh = make_mesh(dp=1, tp=args.tp)
        if enc_backend in ("auto", "pallas"):
            enc_backend = "chunked"  # the XLA path GSPMD can partition

    def place(p):
        if mesh is None:
            return p
        return jax.device_put(p, param_shardings(p, mesh))

    engine = states = bi = cross = batcher = spec = None
    encoder_params = encoder_cfg = None
    if args.model:
        base, cfg = load_rwkv_checkpoint(args.model, **overrides)

        def merged(adapter_path, pissa_init=None):
            sd = load_torch_pth(adapter_path)
            tree = lora_state_dict_to_tree(sd)
            if pissa_init:
                init = lora_state_dict_to_tree(load_torch_pth(pissa_init))
                return merge_pissa(base, tree, init, lc), sd
            return merge_lora(base, tree, lc), sd

        gen_params = base
        if args.chat_adapter:
            gen_params, _ = merged(args.chat_adapter, args.pissa_init)
        if args.quant:
            gen_params = quantize_tree(gen_params, mode=args.quant)
        adapter_ids = None
        if args.slot_adapter:
            from rwkv_lm_ext_tpu.adapters.slot_lora import build_slot_lora

            named = {}
            for spec_str in args.slot_adapter:
                name, _, path = spec_str.partition("=")
                if not name or not path:
                    raise SystemExit(
                        f"--slot-adapter expects NAME=PATH, got {spec_str!r}"
                    )
                named[name] = lora_state_dict_to_tree(load_torch_pth(path))
            gen_params, adapter_ids = build_slot_lora(gen_params, named, lc)
        cache = None
        if args.prefix_cache:
            from rwkv_lm_ext_tpu.infer.state_cache import PrefixStateCache

            cache = PrefixStateCache(capacity=args.prefix_cache)
        engine = GenerationEngine(
            gen_params, cfg, tok, mesh=mesh, wkv_backend=enc_backend,
            state_cache=cache, adapter_ids=adapter_ids,
        )

        if args.states_config:
            states = StatesRegistry(cfg)
            with open(args.states_config) as f:
                for name, spec in json.load(f).items():
                    states.register_pth(
                        name, spec["path"], spec.get("template", "{input}")
                    )
        if args.batcher_slots:
            from rwkv_lm_ext_tpu.infer.continuous import ContinuousBatcher

            batcher = ContinuousBatcher(
                engine, n_slots=args.batcher_slots,
                block_size=args.batcher_block,
                adaptive_block=args.batcher_adaptive,
            )
        elif args.draft or args.draft_layers:
            from rwkv_lm_ext_tpu.infer.speculative import (
                SpeculativeEngine,
                truncated_draft,
            )

            # build from engine.params — the engine holds the
            # mesh-PLACED copy under --tp; the local gen_params is the
            # unsharded original (a truncated self-draft then shares the
            # placed buffers too)
            if args.draft:
                d_params, d_cfg = load_rwkv_checkpoint(
                    args.draft, **overrides
                )
                d_params = place(d_params)
            else:
                d_params, d_cfg = truncated_draft(
                    engine.params, cfg, args.draft_layers
                )
            spec = SpeculativeEngine(
                engine.params, cfg, d_params, d_cfg, tok,
                gamma=args.gamma, wkv_backend=enc_backend,
                draft_wkv_backend=enc_backend,
            )
        if args.bi_adapter:
            bi_params, _ = merged(args.bi_adapter)
            bi = BiEncoder(place(bi_params), cfg, tok,
                           pooling_type=args.bi_pooling,
                           wkv_backend=enc_backend)
        if args.cross_adapter:
            cross_params, sd = merged(args.cross_adapter)
            head = _load_head(sd)
            if head is None and args.cross_head:
                head = _load_head(load_torch_pth(args.cross_head))
            if head is None:
                raise SystemExit(
                    "--cross-adapter needs score.weight (in the adapter "
                    "or via --cross-head)"
                )
            cross = CrossEncoder(cross_params, cfg, tok, head,
                                 wkv_backend=enc_backend)

    if args.encoder:
        encoder_params, encoder_cfg = load_rwkv_checkpoint(
            args.encoder, **overrides
        )
        encoder_params = place(encoder_params)

    return ServingService(
        engine=engine,
        states_registry=states,
        bi_encoder=bi,
        cross_encoder=cross,
        encoder_params=encoder_params,
        encoder_cfg=encoder_cfg,
        tokenizer=tok,
        batcher=batcher,
        spec_engine=spec,
    )


def main(argv=None):
    args = _parse(argv)
    if not (args.model or args.encoder):
        raise SystemExit("need --model and/or --encoder")
    if args.coordinator or args.num_processes or os.environ.get("RWKV_DIST") == "1":
        from rwkv_lm_ext_tpu.parallel.distributed import init_distributed

        init_distributed(
            args.coordinator, args.num_processes, args.process_id
        )
    from rwkv_lm_ext_tpu.parallel.distributed import process_count
    from rwkv_lm_ext_tpu.serve.api import serve_http

    if process_count() > 1:
        _serve_multihost(args)
        return
    svc = build_service(args)
    server = serve_http(svc, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]}",
          flush=True)
    server.serve_forever()


def _serve_multihost(args):
    """Serve a model sharded across hosts: every process builds the same
    service and issues the identical jitted-call sequence (SPMD
    lockstep). Two modes:

    - plain engine (no --batcher-slots): process 0 broadcasts each HTTP
      request before executing it; workers replay the copy. No SSE.
    - continuous batching (--batcher-slots): process 0 serializes the
      batcher's DECISIONS (admissions/blocks/cancels + the non-generate
      endpoint calls) into one broadcast op stream via
      infer.continuous.LockstepBatcherDriver; workers replay the stream.
      /generate — including SSE streaming — batches across concurrent
      clients exactly as in single-process serving.

    Speculative decoding stays single-process (--draft/--draft-layers
    rejected): its accept/rollback control flow branches on sampled
    values fetched mid-round, so the broadcast would sit INSIDE the
    latency-critical loop it exists to shorten."""
    import threading

    from rwkv_lm_ext_tpu.parallel.distributed import (
        broadcast_obj, is_main_process,
    )
    from rwkv_lm_ext_tpu.serve.api import BadRequest, serve_http

    if args.draft or args.draft_layers:
        raise SystemExit(
            "multi-host serving does not support speculative decoding "
            "(drop --draft/--draft-layers)"
        )
    if args.batcher_slots:
        _serve_multihost_batcher(args)
        return
    svc = build_service(args)
    if is_main_process():
        inner_handle = svc.handle
        lock = threading.Lock()

        def handle(route, payload):
            with lock:
                broadcast_obj({"route": route, "payload": payload})
                return inner_handle(route, payload)

        def generate_sse(payload):
            raise BadRequest("streaming is not supported in multi-host serving")

        svc.handle = handle
        svc.generate_sse = generate_sse
        server = serve_http(svc, host=args.host, port=args.port)
        print(f"serving on http://{args.host}:{server.server_address[1]}",
              flush=True)
        try:
            server.serve_forever()
        finally:
            broadcast_obj({"route": "__shutdown__", "payload": {}})
    else:
        svc.warmup()
        while True:
            msg = broadcast_obj()
            if msg.get("route") == "__shutdown__":
                return
            try:
                svc.handle(msg["route"], msg["payload"])
            except Exception:  # noqa: BLE001 — worker mirrors proc 0's errors
                pass


def _serve_multihost_batcher(args):
    """Multi-host continuous batching (see _serve_multihost): the
    LockstepBatcherDriver op stream is the single broadcast channel for
    admissions, decode blocks AND the non-generate endpoints."""
    from rwkv_lm_ext_tpu.infer.continuous import LockstepBatcherDriver
    from rwkv_lm_ext_tpu.parallel.distributed import is_main_process
    from rwkv_lm_ext_tpu.serve.api import serve_http

    svc = build_service(args)
    inner_handle = svc.handle
    if is_main_process():
        svc.driver_factory = lambda b: LockstepBatcherDriver(
            b, svc_handle=inner_handle
        )
        # warmup (incl. batcher compile) runs BEFORE the loop starts
        # broadcasting; workers execute the identical warmup programs
        server = serve_http(svc, host=args.host, port=args.port)
        driver = svc._driver

        def handle(route, payload):
            # /generate rides the driver's submit stream (incl. SSE);
            # everything else executes inside the op stream so its
            # jitted programs run on every process in order
            if route == "/generate":
                return inner_handle(route, payload)
            return driver.call(route, payload)

        svc.handle = handle
        print(f"serving on http://{args.host}:{server.server_address[1]}",
              flush=True)
        try:
            server.serve_forever()
        finally:
            driver.close()
    else:
        svc.driver_factory = lambda b: None  # no stepping thread here
        svc.warmup()
        worker = LockstepBatcherDriver(svc.batcher, svc_handle=inner_handle)
        worker.worker_loop()


if __name__ == "__main__":
    main()
