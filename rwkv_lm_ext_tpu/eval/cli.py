"""Evaluation runners.

Runnable equivalents of the reference's eval entry points:
- sts:       train_scripts/evaluators.py EmbeddingSimilarityEvaluator
             (STS-b style tsv/jsonl: sentence1, sentence2, score)
- retrieval: tests/test_cmteb.py / TestBiEncoder.py protocol without the
             mteb dependency (queries + corpus + qrels)
- rerank:    train_scripts/eval_askubuntu_simcse.py MAP / P@1

Usage:
  python -m rwkv_lm_ext_tpu.eval.cli sts --model m.pth --data stsb.jsonl
  python -m rwkv_lm_ext_tpu.eval.cli retrieval --model m.pth \
      --queries q.jsonl --corpus docs.jsonl --qrels qrels.tsv
"""
from __future__ import annotations

import argparse
import json
import sys


def _load_model(args):
    from rwkv_lm_ext_tpu.checkpoint import load_rwkv_checkpoint
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.infer.encoders import BiEncoder

    params, cfg = load_rwkv_checkpoint(args.model)
    if args.lora:
        from rwkv_lm_ext_tpu.adapters import (
            LoraConfig,
            lora_state_dict_to_tree,
            merge_lora,
        )
        from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth

        adapter = lora_state_dict_to_tree(load_torch_pth(args.lora))
        params = merge_lora(
            params, adapter, LoraConfig(r=args.lora_r, alpha=args.lora_alpha)
        )
    tok = WorldTokenizer(args.vocab)
    return BiEncoder(
        params, cfg, tok, pooling_type=args.pooling
    ), params, cfg, tok


def _rows(path):
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("{"):
                yield json.loads(line)
            else:
                yield line.split("\t")


def cmd_sts(args):
    from rwkv_lm_ext_tpu.eval.sts import SimilarityEvaluator

    s1, s2, gold = [], [], []
    for row in _rows(args.data):
        if isinstance(row, dict):
            s1.append(row["sentence1"])
            s2.append(row["sentence2"])
            gold.append(float(row["score"]))
        else:
            s1.append(row[0]); s2.append(row[1]); gold.append(float(row[2]))
    be, *_ = _load_model(args)
    ev = SimilarityEvaluator(s1, s2, gold, csv_dir=args.output_dir)
    out = ev(lambda texts: be.encode_texts(texts, batch_size=args.batch_size))
    print(json.dumps(out, indent=2))


def cmd_retrieval(args):
    import numpy as np

    from rwkv_lm_ext_tpu.eval.retrieval import retrieval_metrics

    queries = [r["text"] if isinstance(r, dict) else r[0]
               for r in _rows(args.queries)]
    corpus = [r["text"] if isinstance(r, dict) else r[0]
              for r in _rows(args.corpus)]
    qrels = [[] for _ in queries]
    for row in _rows(args.qrels):  # qid \t docid
        if isinstance(row, dict):
            qrels[int(row["qid"])].append(int(row["docid"]))
        else:
            qrels[int(row[0])].append(int(row[1]))
    be, *_ = _load_model(args)
    q_emb = be.encode_texts(queries, batch_size=args.batch_size)
    c_emb = be.encode_texts(corpus, batch_size=args.batch_size)
    print(json.dumps(retrieval_metrics(q_emb, c_emb, qrels), indent=2))


def cmd_rerank(args):
    from rwkv_lm_ext_tpu.eval.retrieval import rerank_metrics

    # jsonl rows: {"scores": [...], "labels": [...]} OR compute scores
    # with the cross-encoder from {"query", "documents", "labels"}
    scores, labels = [], []
    need_model = False
    rows = list(_rows(args.data))
    for row in rows:
        if "scores" in row:
            scores.append(row["scores"]); labels.append(row["labels"])
        else:
            need_model = True
    if need_model:
        from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth
        from rwkv_lm_ext_tpu.infer.encoders import CrossEncoder

        be, params, cfg, tok = _load_model(args)
        import numpy as np

        score_sd = load_torch_pth(args.score_head) if args.score_head else None
        score = (
            {"kernel": np.asarray(score_sd["score.weight"], np.float32).T}
            if score_sd
            else None
        )
        assert score is not None, "--score-head required to score pairs"
        ce = CrossEncoder(params, cfg, tok, score)
        for row in rows:
            s = ce.score_pairs([(row["query"], d) for d in row["documents"]])
            scores.append(list(map(float, s)))
            labels.append(row["labels"])
    print(json.dumps(rerank_metrics(scores, labels), indent=2))


def cmd_retrieval_task(args):
    """Run an MTEB/BEIR-format task dump (corpus.jsonl + queries.jsonl +
    qrels) through the bi-encoder, optionally reranking the dense top-k
    with the cross-encoder (tests/test_cmteb.py:92-94 protocol)."""
    from rwkv_lm_ext_tpu.eval.tasks import RetrievalTask, run_retrieval_task

    task = RetrievalTask.load(args.task_dir, split=args.split)
    be, params, cfg, tok = _load_model(args)
    rerank_fn = None
    if args.score_head:
        import numpy as np

        from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth
        from rwkv_lm_ext_tpu.infer.encoders import CrossEncoder

        score_sd = load_torch_pth(args.score_head)
        ce = CrossEncoder(
            params, cfg, tok,
            {"kernel": np.asarray(score_sd["score.weight"], np.float32).T},
        )
        rerank_fn = lambda pairs: ce.score_pairs(pairs)  # noqa: E731
    out = run_retrieval_task(
        task,
        lambda texts: be.encode_texts(texts, batch_size=args.batch_size),
        rerank_fn=rerank_fn,
        rerank_top_k=args.rerank_top_k,
    )
    print(json.dumps(out, indent=2))


def cmd_parity(args):
    """Real-checkpoint acceptance runbook (VERDICT r3 #7): one command
    that takes a .pth (+ optional LoRA + optional retrieval task dump)
    and reports, on REAL weights:

    1. embedding cosine drift — production path (compute dtype + fused
       Pallas kernels) vs the fp32 sequential-reference backend, per
       text; acceptance target <= 1e-3 (BASELINE.md).
    2. WKV op cross-check vs the REFERENCE REPO's own torch CPU kernel
       (src/model_encoder_run.py run_rwkv6_forward under NO_CUDA=1) on
       the checkpoint's real first-layer activations — ties our golden
       to the reference's math (skipped if /root/reference or torch is
       unavailable).
    3. retrieval score delta (--task-dir): the C-MTEB-style metrics
       (tests/test_cmteb.py:92-94 protocol) computed from BOTH
       embedding sets, with per-metric deltas.
    """
    import numpy as np

    from rwkv_lm_ext_tpu.checkpoint import load_rwkv_checkpoint
    from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer
    from rwkv_lm_ext_tpu.infer.encoders import BiEncoder

    def build(dtype_overrides, backend):
        params, cfg = load_rwkv_checkpoint(args.model, **dtype_overrides)
        if args.lora:
            from rwkv_lm_ext_tpu.adapters import (
                LoraConfig, lora_state_dict_to_tree, merge_lora,
            )
            from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth

            adapter = lora_state_dict_to_tree(load_torch_pth(args.lora))
            params = merge_lora(
                params, adapter,
                LoraConfig(r=args.lora_r, alpha=args.lora_alpha),
            )
        tok = WorldTokenizer(args.vocab)
        return BiEncoder(
            params, cfg, tok, pooling_type=args.pooling,
            wkv_backend=backend,
        ), params, cfg

    be_fast, params_fast, cfg = build({}, "auto")
    be_gold, params_gold, cfg32 = build(
        {"dtype": "float32", "param_dtype": "float32"}, "reference"
    )

    if args.task_dir:
        from rwkv_lm_ext_tpu.eval.tasks import RetrievalTask

        task = RetrievalTask.load(args.task_dir, split=args.split)
        texts = (
            list(task.queries.values()) + list(task.corpus.values())
        )[: args.max_texts]
    elif args.data:
        texts = [
            r["text"] if isinstance(r, dict) else r[0]
            for r in _rows(args.data)
        ][: args.max_texts]
    else:
        raise SystemExit("parity needs --data or --task-dir")

    e_fast = np.asarray(
        be_fast.encode_texts(texts, batch_size=args.batch_size), np.float32
    )
    e_gold = np.asarray(
        be_gold.encode_texts(texts, batch_size=args.batch_size), np.float32
    )
    cos = np.sum(e_fast * e_gold, axis=-1) / np.maximum(
        np.linalg.norm(e_fast, axis=-1) * np.linalg.norm(e_gold, axis=-1),
        1e-12,
    )
    drift = 1.0 - cos
    out = {
        "n_texts": len(texts),
        "cosine_drift_mean": float(drift.mean()),
        "cosine_drift_max": float(drift.max()),
        "target": 1e-3,
        "pass": bool(drift.max() <= 1e-3),
    }

    out["reference_wkv_op"] = _reference_wkv_crosscheck(
        params_gold, cfg32, be_gold.tokenizer, texts[0]
    )

    if args.task_dir:
        from rwkv_lm_ext_tpu.eval.tasks import run_retrieval_task

        m_fast = run_retrieval_task(
            task, lambda t: be_fast.encode_texts(t, batch_size=args.batch_size)
        )
        m_gold = run_retrieval_task(
            task, lambda t: be_gold.encode_texts(t, batch_size=args.batch_size)
        )
        out["scores_fast"] = m_fast
        out["scores_gold"] = m_gold
        out["score_delta"] = {
            k: round(float(m_fast[k]) - float(m_gold[k]), 6)
            for k in m_fast
            if isinstance(m_fast.get(k), (int, float))
        }
    print(json.dumps(out, indent=2))


def _reference_wkv_crosscheck(params, cfg, tok, text):
    """Feed the checkpoint's REAL first-layer activations through the
    reference repo's torch CPU WKV (model_encoder_run.run_rwkv6_forward)
    and our sequential reference; return the max abs error."""
    import os
    import sys

    ref = os.environ.get("RWKV_REFERENCE_DIR", "/root/reference")
    if not os.path.isdir(ref):
        return {"skipped": "reference repo not mounted"}
    try:
        import torch
    except ImportError:
        return {"skipped": "torch unavailable"}
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_lm_ext_tpu.models.rwkv import (
        layer_norm, tmix_v6_projections,
    )
    from rwkv_lm_ext_tpu.ops import wkv_reference

    if cfg.version < 6:
        return {"skipped": f"v{cfg.version} checkpoint (op is v6)"}
    ids = tok.encode(text)[:64]
    toks = jnp.asarray([ids], jnp.int32)
    x = jnp.take(params["emb"], toks, axis=0).astype(jnp.float32)
    b0 = params["blocks"][0]
    if "ln0" in b0:
        x = layer_norm(x, b0["ln0"])
    xln = layer_norm(x, b0["ln1"])
    B, T, C = xln.shape
    H, N = cfg.n_head, cfg.head_size
    shift0 = jnp.zeros((B, C), jnp.float32)
    r, k, v, g, w = tmix_v6_projections(b0["att"], cfg, xln, shift0)
    u = b0["att"]["time_faaaa"].astype(jnp.float32)

    y_ours, _ = wkv_reference(
        r.reshape(B, T, H, N), k.reshape(B, T, H, N),
        v.reshape(B, T, H, N), w.reshape(B, T, H, N), u,
    )
    y_ours = np.asarray(y_ours).reshape(B, T, C)

    os.environ["NO_CUDA"] = "1"
    os.environ.setdefault("RWKV_MY_TESTING", "x060")
    os.environ.setdefault("RWKV_TRAIN_TYPE", "")
    os.environ["RWKV_HEAD_SIZE_A"] = str(N)
    os.environ.setdefault("RWKV_JIT_ON", "0")
    os.environ.setdefault("RWKV_FLOAT_MODE", "fp32")
    sys.path.insert(0, ref)
    try:
        import importlib

        mer = importlib.import_module("src.model_encoder_run")
        tt = lambda a: torch.from_numpy(  # noqa: E731
            np.ascontiguousarray(np.asarray(a, np.float32))
        )
        y_ref = mer.run_rwkv6_forward(
            tt(r).view(B, T, C), tt(k).view(B, T, C), tt(v).view(B, T, C),
            tt(w).view(B, T, C), tt(u).view(H, N),
        ).numpy()
    finally:
        sys.path.remove(ref)
    err = float(np.abs(y_ours - y_ref).max())
    scale = float(np.abs(y_ref).max())
    return {
        "max_abs_err": err, "y_scale": scale,
        "rel_err": err / max(scale, 1e-12), "tokens": T,
    }


def cmd_ppl(args):
    """Token perplexity over a corpus (jsonl {"text"} or plain lines)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_lm_ext_tpu.models.rwkv import rwkv_forward

    be, params, cfg, tok = _load_model(args)
    total_nll, total_tokens = 0.0, 0

    @jax.jit
    def nll(params, tokens, n_valid):
        logits, _ = rwkv_forward(params, cfg, tokens[None, :-1])
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        gold = jnp.take_along_axis(logp, tokens[1:, None], axis=-1)[:, 0]
        mask = jnp.arange(gold.shape[0]) < n_valid
        return -jnp.sum(jnp.where(mask, gold, 0.0))

    L = args.ctx_len
    for row in _rows(args.data):
        text = row["text"] if isinstance(row, dict) else row[0]
        ids = tok.encode(text)
        for s in range(0, max(len(ids) - 1, 1), L):
            piece = ids[s : s + L + 1]
            if len(piece) < 2:
                continue
            n_valid = len(piece) - 1
            piece = piece + [0] * (L + 1 - len(piece))
            total_nll += float(
                nll(params, jnp.asarray(piece, jnp.int32), n_valid)
            )
            total_tokens += n_valid
    import math

    ppl = math.exp(total_nll / max(total_tokens, 1))
    print(json.dumps({"tokens": total_tokens, "nll_per_token":
                      total_nll / max(total_tokens, 1), "perplexity": ppl}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="rwkv_lm_ext_tpu.eval")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--model", required=True)
        sp.add_argument("--vocab", default=None)
        sp.add_argument("--lora", default=None)
        sp.add_argument("--lora-r", type=int, default=8)
        sp.add_argument("--lora-alpha", type=float, default=32.0)
        sp.add_argument("--pooling", default="weightedmean")
        sp.add_argument("--batch-size", type=int, default=32)
        sp.add_argument("--output-dir", default=None)

    s = sub.add_parser("sts"); common(s)
    s.add_argument("--data", required=True)
    s.set_defaults(fn=cmd_sts)
    s = sub.add_parser("retrieval"); common(s)
    s.add_argument("--queries", required=True)
    s.add_argument("--corpus", required=True)
    s.add_argument("--qrels", required=True)
    s.set_defaults(fn=cmd_retrieval)
    s = sub.add_parser("rerank"); common(s)
    s.add_argument("--data", required=True)
    s.add_argument("--score-head", default=None)
    s.set_defaults(fn=cmd_rerank)
    s = sub.add_parser("retrieval-task"); common(s)
    s.add_argument("--task-dir", required=True)
    s.add_argument("--split", default="test")
    s.add_argument("--score-head", default=None)
    s.add_argument("--rerank-top-k", type=int, default=10)
    s.set_defaults(fn=cmd_retrieval_task)
    s = sub.add_parser("ppl"); common(s)
    s.add_argument("--data", required=True)
    s.add_argument("--ctx-len", type=int, default=512)
    s.set_defaults(fn=cmd_ppl)

    s = sub.add_parser("parity"); common(s)
    s.add_argument("--data", default=None,
                   help="jsonl of {'text': ...} rows to embed both ways")
    s.add_argument("--task-dir", default=None,
                   help="MTEB/BEIR-format dump: also reports retrieval "
                        "score deltas between the two paths")
    s.add_argument("--split", default="test")
    s.add_argument("--max-texts", type=int, default=256)
    s.set_defaults(fn=cmd_parity)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
