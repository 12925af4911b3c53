"""Eval harness metrics + serving endpoints + orbax round-trip."""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.eval import rerank_metrics, retrieval_metrics
from rwkv_lm_ext_tpu.eval.sts import SimilarityEvaluator, _spearman
from rwkv_lm_ext_tpu.models import init_rwkv_params

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=65530, head_size=16,
    dtype="float32", param_dtype="float32",
)


def test_spearman_matches_scipy():
    from scipy import stats

    rng = np.random.default_rng(0)
    a, b = rng.normal(size=50), rng.normal(size=50)
    b[10:20] = b[10]  # ties
    ours = _spearman(a, b)
    ref = stats.spearmanr(a, b).statistic
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_similarity_evaluator_csv(tmp_path):
    def fake_encode(texts):
        rng = np.random.default_rng(1)
        return np.stack([
            rng.normal(size=8) + len(t) * 0.1 * np.ones(8) for t in texts
        ])

    ev = SimilarityEvaluator(
        ["aa", "bbbb", "cc"], ["aa", "bbbb", "ccddee"], [1.0, 0.9, 0.2],
        csv_dir=str(tmp_path),
    )
    out = ev(fake_encode, epoch=0, steps=10)
    assert set(k.split("_")[0] for k in out) == {
        "cosine", "euclidean", "manhattan", "dot"
    }
    rows = open(tmp_path / "similarity_evaluation_sts_results.csv").readlines()
    assert len(rows) == 2 and rows[0].startswith("epoch,steps,cosine_pearson")


def test_rerank_metrics():
    scores = [[0.9, 0.1, 0.5], [0.2, 0.8]]
    labels = [[1, 0, 0], [1, 0]]
    m = rerank_metrics(scores, labels)
    assert m["P@1"] == 0.5
    np.testing.assert_allclose(m["MAP"], (1.0 + 0.5) / 2)


def test_retrieval_metrics_perfect():
    q = np.eye(4, 8)
    c = np.eye(6, 8)
    qrels = [[0], [1], [2], [3]]
    m = retrieval_metrics(q, c, qrels)
    assert m["recall@1"] == 1.0 and m["MRR@10"] == 1.0 and m["nDCG@10"] == 1.0


def test_orbax_roundtrip(tmp_path):
    from rwkv_lm_ext_tpu.checkpoint.orbax_io import (
        load_checkpoint,
        save_checkpoint,
    )

    tree = {"a": jnp.arange(8.0), "b": {"c": jnp.ones((4, 4))}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    back = load_checkpoint(path, target=tree)
    np.testing.assert_allclose(back["a"], tree["a"])
    np.testing.assert_allclose(back["b"]["c"], tree["b"]["c"])


@pytest.fixture(scope="module")
def service():
    from rwkv_lm_ext_tpu.infer.encoders import BiEncoder, CrossEncoder
    from rwkv_lm_ext_tpu.infer.engine import GenerationEngine
    from rwkv_lm_ext_tpu.infer.states_registry import StatesRegistry
    from rwkv_lm_ext_tpu.models.heads import init_classification_head
    from rwkv_lm_ext_tpu.serve import ServingService

    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    for i, b in enumerate(params["blocks"]):
        b["att"]["output"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(10 + i), b["att"]["output"].shape
        )

    class CharTok:
        def encode(self, s):
            return [ord(c) % 60000 + 10 for c in s]

        def decode(self, ids):
            return "".join(chr((i - 10) % 60000) for i in ids)

        def streaming_decoder(self):
            class _D:
                def push(self, t):
                    return chr((t - 10) % 60000)

                def flush(self):
                    return ""

            return _D()

    tok = CharTok()
    engine = GenerationEngine(params, CFG, tok, chunk_len=8)
    reg = StatesRegistry(CFG)
    reg.register(
        "summarize", 0.05 * np.ones((2, 4, 16, 16), np.float32),
        template="sum: {input}",
    )
    return ServingService(
        engine=engine,
        states_registry=reg,
        bi_encoder=BiEncoder(params, CFG, tok),
        cross_encoder=CrossEncoder(
            params, CFG, tok,
            init_classification_head(jax.random.PRNGKey(3), CFG, 1),
        ),
        encoder_params=params,
        encoder_cfg=CFG,
        tokenizer=tok,
    )


def test_service_routes(service):
    out = service.handle("/similarity", {"texts_a": ["abc"], "texts_b": ["abc", "zzz"]})
    sims = np.asarray(out["similarity"])
    assert sims.shape == (1, 2) and sims[0, 0] > sims[0, 1]

    out = service.handle("/rerank", {"query": "q", "documents": ["a", "b"]})
    assert len(out["scores"]) == 2 and sorted(out["ranking"]) == [0, 1]

    out = service.handle(
        "/fill_mask", {"text": "hello [MASK] world", "top_k": 5}
    )
    assert len(out["masks"]) == 1 and len(out["masks"][0]) >= 1
    assert all("prob" in c for c in out["masks"][0])

    out = service.handle(
        "/process_text", {"text": "abc", "action": "summarize"}
    )
    assert isinstance(out["output"], str)


def test_generate_route_sampling_knobs(service):
    """/generate forwards per-request sampling knobs (engine path here;
    the batcher path carries the same knobs in per-slot device rows)."""
    from rwkv_lm_ext_tpu.serve.api import BadRequest

    out = service.handle(
        "/generate",
        {"prompt": "ab", "max_tokens": 3, "temperature": 0.0,
         "top_p": 0.5, "token_stop": []},
    )
    assert isinstance(out["output"], str)
    with pytest.raises(BadRequest, match="unsupported"):
        service.generate("ab", max_tokens=2, beam_width=4)


def test_http_server_roundtrip(service):
    from rwkv_lm_ext_tpu.serve import serve_http

    server = serve_http(service, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/similarity",
            data=json.dumps(
                {"texts_a": ["xy"], "texts_b": ["xy"]}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = json.loads(resp.read())
        np.testing.assert_allclose(body["similarity"][0][0], 1.0, atol=1e-4)
        # unknown route -> 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/nope", data=b"{}"
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req, timeout=60)
    finally:
        server.shutdown()


def test_generate_sse_stream(service):
    """Streaming /generate: SSE events carry every decoded piece; the
    concatenation equals the final output; errors 400 before streaming."""
    from rwkv_lm_ext_tpu.serve import serve_http
    from rwkv_lm_ext_tpu.serve.api import BadRequest

    server = serve_http(service, host="127.0.0.1", port=0, warmup=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(
                {"prompt": "ab", "max_tokens": 4, "stream": True,
                 "temperature": 0.0, "token_stop": []}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.headers["Content-Type"] == "text/event-stream"
            events = []
            for line in resp:
                line = line.strip()
                if line.startswith(b"data: "):
                    events.append(json.loads(line[6:]))
        assert events and events[-1].get("done") is True
        pieces = "".join(e["token"] for e in events[:-1])
        assert events[-1]["output"] == pieces
        assert events[-1]["backend"] == "engine"

        # unknown option -> 400 BEFORE any bytes stream
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(
                {"prompt": "ab", "stream": True, "beam_width": 3}
            ).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
    finally:
        server.shutdown()

    # non-SSE transports reject stream=true explicitly
    with pytest.raises(BadRequest, match="stream"):
        service.handle("/generate", {"prompt": "ab", "stream": True})


def test_eval_cli_sts(tmp_path):
    """Eval CLI end-to-end on a tiny checkpoint + tiny STS file."""
    import jax

    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth
    from rwkv_lm_ext_tpu.eval.cli import main as eval_main
    from rwkv_lm_ext_tpu.models import init_rwkv_params

    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=65530, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "m.pth")
    save_torch_pth(ckpt, params_to_state_dict(params, cfg))
    data = str(tmp_path / "sts.jsonl")
    with open(data, "w") as f:
        for a, b, s in [("cat", "cat", 1.0), ("cat", "finance", 0.1),
                        ("rain", "weather", 0.8), ("x", "y", 0.5)]:
            f.write(json.dumps({"sentence1": a, "sentence2": b, "score": s}) + "\n")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_main(["sts", "--model", ckpt, "--data", data])
    out = json.loads(buf.getvalue())
    assert "cosine_spearman" in out and -1 <= out["cosine_spearman"] <= 1


def test_eval_cli_ppl(tmp_path):
    import jax

    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth
    from rwkv_lm_ext_tpu.eval.cli import main as eval_main
    from rwkv_lm_ext_tpu.models import init_rwkv_params

    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=65530, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "m.pth")
    save_torch_pth(ckpt, params_to_state_dict(params, cfg))
    data = str(tmp_path / "corpus.jsonl")
    with open(data, "w") as f:
        f.write(json.dumps({"text": "a small perplexity test document"}) + "\n")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_main(["ppl", "--model", ckpt, "--data", data, "--ctx-len", "16"])
    out = json.loads(buf.getvalue())
    assert out["tokens"] > 0 and out["perplexity"] > 1
    # a fresh random-ish model must be near chance (ln V ~ 11.1 nats)
    assert 3 < out["nll_per_token"] < 13


def test_eval_cli_parity(tmp_path, capsys):
    """The real-checkpoint acceptance runbook (eval.cli parity): fast
    path vs fp32 reference backend drift + the reference repo's torch
    CPU WKV cross-check + retrieval score deltas, one command."""
    import os

    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth
    from rwkv_lm_ext_tpu.eval import cli as eval_cli

    cfg = ModelConfig(
        n_layer=2, n_embd=64, vocab_size=65530, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    params = init_rwkv_params(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "m.pth")
    save_torch_pth(ckpt, params_to_state_dict(params, cfg))
    task_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "mini_task"
    )
    eval_cli.main([
        "parity", "--model", ckpt, "--task-dir", task_dir,
        "--max-texts", "24",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["pass"] and out["cosine_drift_max"] <= 1e-3
    ref = out["reference_wkv_op"]
    if "skipped" not in ref:
        assert ref["rel_err"] < 1e-5
    assert out["score_delta"]


def test_http_get_serves_web_ui_and_stats():
    """GET / serves the built-in chat page (serve.webui — the
    reference's desktop GUI re-imagined as a browser page over the same
    endpoints); GET /stats mirrors the POST stats route."""
    import json as _json
    import threading
    import urllib.request

    from rwkv_lm_ext_tpu.serve.api import ServingService, serve_http

    svc = ServingService()  # endpoint-less service is enough for GET
    server = serve_http(svc, port=0, warmup=False)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ) as r:
            body = r.read().decode()
            assert r.headers["Content-Type"].startswith("text/html")
            assert "/generate" in body and "EventSource" not in body
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            stats = _json.loads(r.read())
            assert "counts" in stats or isinstance(stats, dict)
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=30
            )
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
