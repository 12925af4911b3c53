"""End-to-end trainer CLI runs on a tiny model + tiny data (CPU)."""
import json
import os

import jax
import numpy as np
import pytest

from rwkv_lm_ext_tpu import ModelConfig
from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict
from rwkv_lm_ext_tpu.checkpoint.pth import load_torch_pth, save_torch_pth
from rwkv_lm_ext_tpu.models import init_rwkv_params
from rwkv_lm_ext_tpu.train.cli import main

# compile-heavy: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    n_layer=2, n_embd=64, vocab_size=65530, head_size=16,
    dtype="float32", param_dtype="float32",
)


@pytest.fixture(scope="module")
def base_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "base.pth")
    params = init_rwkv_params(jax.random.PRNGKey(0), CFG)
    save_torch_pth(path, params_to_state_dict(params, CFG))
    return path


@pytest.fixture(scope="module")
def sft_jsonl(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "sft.jsonl")
    rows = [
        {"instruction": "translate", "input": f"hello {i}", "output": f"bonjour {i}"}
        for i in range(8)
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return path


def test_sft_lora(base_ckpt, sft_jsonl, tmp_path):
    out = str(tmp_path / "out")
    main([
        "sft", "--model", base_ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "lora",
        "--max-steps", "2", "--micro-bsz", "2", "--log-every", "1",
        "--save-every-steps", "2", "--warmup-steps", "1", "--dp", "1",
    ])
    files = os.listdir(out)
    assert any(f.startswith("lora-step") for f in files)
    lora = load_torch_pth(os.path.join(
        out, sorted(f for f in files if f.startswith("lora-step"))[-1]
    ))
    assert any(k.endswith(".lora_A") for k in lora)
    # B matrices actually moved off zero
    bs = [v for k, v in lora.items() if k.endswith(".lora_B")]
    assert any(np.abs(b).max() > 0 for b in bs)


def test_sft_states(base_ckpt, sft_jsonl, tmp_path):
    out = str(tmp_path / "out_states")
    main([
        "sft", "--model", base_ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "states",
        "--max-steps", "2", "--micro-bsz", "2", "--warmup-steps", "1", "--dp", "1",
    ])
    f = [x for x in os.listdir(out) if x.startswith("states-step")][-1]
    sd = load_torch_pth(os.path.join(out, f))
    assert set(sd) == {f"blocks.{i}.att.time_state" for i in range(2)}


def test_bi_encoder(base_ckpt, tmp_path):
    data = str(tmp_path / "pairs.jsonl")
    with open(data, "w") as f:
        for i in range(8):
            f.write(json.dumps({
                "query": f"question {i}",
                "positive": f"answer {i}",
                "negative": f"junk {i}",
            }) + "\n")
    out = str(tmp_path / "out_bi")
    main([
        "bi-encoder", "--model", base_ckpt, "--train-data", data,
        "--output-dir", out, "--max-steps", "2", "--micro-bsz", "2",
        "--warmup-steps", "1", "--dp", "1",
    ])
    assert any(f.startswith("bi-encoder-step") for f in os.listdir(out))


def test_mae(base_ckpt, tmp_path):
    data = str(tmp_path / "texts.jsonl")
    with open(data, "w") as f:
        for i in range(6):
            f.write(json.dumps({"text": f"some document text number {i} with words"}) + "\n")
    out = str(tmp_path / "out_mae")
    main([
        "mae", "--model", base_ckpt, "--train-data", data,
        "--output-dir", out, "--dup-mae", "--max-steps", "2",
        "--micro-bsz", "2", "--warmup-steps", "1", "--dp", "1", "--dp", "1",
    ])
    assert any(f.startswith("encoder-step") for f in os.listdir(out))


def test_simcse_dropout_noise(base_ckpt, tmp_path):
    data = str(tmp_path / "texts.jsonl")
    with open(data, "w") as f:
        for i in range(8):
            f.write(json.dumps({"text": f"sentence number {i} for simcse"}) + "\n")
    out = str(tmp_path / "out_simcse")
    main([
        "simcse", "--model", base_ckpt, "--train-data", data,
        "--output-dir", out, "--dropout-noise", "--max-steps", "2",
        "--micro-bsz", "4", "--warmup-steps", "1", "--dp", "1",
    ])
    assert any(f.startswith("simcse-step") for f in os.listdir(out))


def test_instructor(base_ckpt, tmp_path):
    data = str(tmp_path / "medi.jsonl")
    with open(data, "w") as f:
        for i in range(8):
            f.write(json.dumps({
                "instruction": "Represent the question: ",
                "query": f"what is {i}",
                "positive": f"{i} is a number",
                "negative": f"unrelated {i}",
            }) + "\n")
    out = str(tmp_path / "out_inst")
    main([
        "instructor", "--model", base_ckpt, "--train-data", data,
        "--output-dir", out, "--output-dim", "32", "--max-steps", "2",
        "--micro-bsz", "4", "--warmup-steps", "1", "--dp", "1",
    ])
    files = [f for f in os.listdir(out) if f.startswith("instructor-step")]
    assert files
    sd = load_torch_pth(os.path.join(out, files[-1]))
    assert sd["dense.weight"].shape == (32, 64)
    assert "ln_dense.weight" in sd


def test_sft_full_with_lisa(base_ckpt, sft_jsonl, tmp_path):
    out = str(tmp_path / "out_lisa")
    main([
        "sft", "--model", base_ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "full",
        "--lisa-k", "1", "--lisa-interval", "1",
        "--max-steps", "2", "--micro-bsz", "2", "--warmup-steps", "1",
        "--dp", "1",
    ])
    assert any(f.startswith("model-step") for f in os.listdir(out))


def test_train_state_resume(base_ckpt, sft_jsonl, tmp_path):
    """--save-train-state + --resume-train-state: exact optimizer resume."""
    out = str(tmp_path / "out_resume")
    common = [
        "sft", "--model", base_ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "lora",
        "--micro-bsz", "2", "--warmup-steps", "1", "--dp", "1",
        "--save-train-state", "--save-every-steps", "2",
    ]
    main(common + ["--max-steps", "2"])
    assert os.path.isdir(os.path.join(out, "train_state"))
    # resume and run further without error
    main(common + ["--max-steps", "4", "--skip-steps", "2",
                   "--resume-train-state", os.path.join(out, "train_state")])


def test_sft_full_stacked(base_ckpt, sft_jsonl, tmp_path):
    out = str(tmp_path / "out_stacked")
    main([
        "sft", "--model", base_ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "full", "--stack-layers",
        "--max-steps", "2", "--micro-bsz", "2", "--warmup-steps", "1",
        "--dp", "1", "--save-every-steps", "2",
    ])
    f = [x for x in os.listdir(out) if x.startswith("model-step")][-1]
    sd = load_torch_pth(os.path.join(out, f))
    assert "blocks.1.att.key.weight" in sd  # unstacked on save


def test_encoder_biencoder(base_ckpt, tmp_path):
    data = str(tmp_path / "trip.jsonl")
    with open(data, "w") as f:
        for i in range(8):
            f.write(json.dumps({"query": f"q {i}", "positive": f"p {i}",
                                "negative": f"n {i}"}) + "\n")
    out = str(tmp_path / "out_encbi")
    main([
        "encoder-biencoder", "--model", base_ckpt, "--train-data", data,
        "--output-dir", out, "--max-steps", "2", "--micro-bsz", "4",
        "--warmup-steps", "1", "--dp", "1",
    ])
    assert any(f.startswith("encoder-bi-step") for f in os.listdir(out))


def test_encoder_crossencoder(base_ckpt, tmp_path):
    data = str(tmp_path / "grp.jsonl")
    with open(data, "w") as f:
        for i in range(6):
            f.write(json.dumps({
                "query": f"question {i}",
                "documents": [f"relevant {i}", f"junk a{i}", f"junk b{i}",
                              f"junk c{i}"],
            }) + "\n")
    out = str(tmp_path / "out_encce")
    main([
        "encoder-crossencoder", "--model", base_ckpt, "--train-data", data,
        "--output-dir", out, "--group-size", "4", "--max-steps", "2",
        "--micro-bsz", "2", "--warmup-steps", "1", "--dp", "1",
    ])
    files = [f for f in os.listdir(out) if f.startswith("encoder-cross-step")]
    assert files
    sd = load_torch_pth(os.path.join(out, files[-1]))
    assert "score.weight" in sd


def test_sft_lora_stacked(base_ckpt, sft_jsonl, tmp_path):
    """--stack-layers with LoRA: trains on stacked trees, saves the flat
    reference adapter layout."""
    out = str(tmp_path / "out_lora_stacked")
    main([
        "sft", "--model", base_ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "lora", "--stack-layers",
        "--max-steps", "2", "--micro-bsz", "2", "--warmup-steps", "1",
        "--dp", "1", "--save-every-steps", "2",
    ])
    files = os.listdir(out)
    f = sorted(x for x in files if x.startswith("lora-step"))[-1]
    lora = load_torch_pth(os.path.join(out, f))
    assert any(k.startswith("blocks.1.") and k.endswith(".lora_A")
               for k in lora)
    bs = [v for k, v in lora.items() if k.endswith(".lora_B")]
    assert any(np.abs(b).max() > 0 for b in bs)


def test_sft_qlora_int8_base(base_ckpt, sft_jsonl, tmp_path):
    """--quant int8: LoRA trains over a quantized frozen base
    (LoraDeltaLeaf path) and still writes a movable adapter."""
    out = str(tmp_path / "out_qlora")
    main([
        "sft", "--model", base_ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "lora", "--quant", "int8",
        "--max-steps", "2", "--micro-bsz", "2", "--log-every", "1",
        "--save-every-steps", "2", "--warmup-steps", "1", "--dp", "1",
    ])
    files = os.listdir(out)
    lora = load_torch_pth(os.path.join(
        out, sorted(f for f in files if f.startswith("lora-step"))[-1]
    ))
    bs = [v for k, v in lora.items() if k.endswith(".lora_B")]
    assert any(np.abs(b).max() > 0 for b in bs)


def test_sft_pipeline_parallel(sft_jsonl, tmp_path, tmp_path_factory):
    """--pp 4: full fine-tune with layers staged over the pp axis on the
    8-device virtual mesh (dp=2 x pp=4), GPipe microbatches; saves a
    full checkpoint and logs finite losses."""
    cfg4 = ModelConfig(
        n_layer=4, n_embd=64, vocab_size=65530, head_size=16,
        dtype="float32", param_dtype="float32",
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt4") / "base4.pth")
    params = init_rwkv_params(jax.random.PRNGKey(2), cfg4)
    save_torch_pth(ckpt, params_to_state_dict(params, cfg4))

    out = str(tmp_path / "out_pp")
    main([
        "sft", "--model", ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "full",
        "--max-steps", "2", "--micro-bsz", "4", "--log-every", "1",
        "--pp", "4", "--n-micro", "2", "--dp", "2",
    ])
    files = os.listdir(out)
    assert any(f.startswith("model-step") for f in files), files
    log = open(os.path.join(out, "train_log.txt")).read()
    assert "nan" not in log.lower()


def test_nli(base_ckpt, tmp_path):
    """AllNLI contrastive trainer + per-eval STS-b validation CSV
    (train_scripts/train_nli.py:1-379): label->triplet conversion, CoSENT
    loss, SimilarityEvaluator CSV in the sentence-transformers format."""
    allnli = str(tmp_path / "allnli.tsv")
    with open(allnli, "w") as f:
        f.write("split\tsentence1\tsentence2\tlabel\n")
        for i in range(6):
            f.write(f"train\tthe cat sat {i}\ta cat was sitting {i}\tentailment\n")
            f.write(f"train\tthe cat sat {i}\tthe dog ran {i}\tcontradiction\n")
            f.write(f"train\tthe cat sat {i}\tit is a day {i}\tneutral\n")
    stsb = str(tmp_path / "stsb.tsv")
    with open(stsb, "w") as f:
        f.write("split\tscore\tsentence1\tsentence2\n")
        for i in range(4):
            f.write(f"dev\t{i + 1}.0\ta man is walking {i}\ta person walks {i}\n")
    out = str(tmp_path / "out_nli")
    main([
        "nli", "--model", base_ckpt, "--train-data", allnli,
        "--output-dir", out, "--sts-file", stsb, "--max-seq-len", "16",
        "--max-steps", "2", "--micro-bsz", "2", "--log-every", "1",
        "--warmup-steps", "1", "--dp", "1",
    ])
    files = os.listdir(out)
    assert any(f.startswith("nli-step") for f in files), files
    csvs = [f for f in files if f.endswith(".csv")]
    assert csvs, files
    rows = open(os.path.join(out, csvs[0])).read().strip().splitlines()
    assert rows[0].startswith("epoch,steps,cosine_pearson,cosine_spearman")
    assert len(rows) >= 2  # at least one eval row

    # in-batch InfoNCE variant (the reference's --is_in_batch_negative)
    out2 = str(tmp_path / "out_nli_ibn")
    main([
        "nli", "--model", base_ckpt, "--train-data", allnli,
        "--output-dir", out2, "--in-batch-negative", "--max-seq-len", "16",
        "--max-steps", "2", "--micro-bsz", "2", "--warmup-steps", "1",
        "--dp", "1",
    ])
    assert any(f.startswith("nli-step") for f in os.listdir(out2))


def test_sft_lora_v4_checkpoint(sft_jsonl, tmp_path, tmp_path_factory):
    """LoRA SFT on an RWKV-4 checkpoint: the trainer works for the v4
    family out of the box (autodiff through the wkv4 scan; loss finite,
    adapters move). Fine-tuning v4 is beyond the reference, whose v4
    path is inference-only via the rwkv pip package."""
    import dataclasses

    from tests.test_rwkv4 import CFG as V4CFG, _v4_params

    cfg = dataclasses.replace(V4CFG, vocab_size=65530)
    params = _v4_params(jax.random.PRNGKey(4), cfg)
    ckpt = str(tmp_path_factory.mktemp("v4ckpt") / "base.pth")
    save_torch_pth(ckpt, params_to_state_dict(params, cfg))

    out = str(tmp_path / "out")
    main([
        "sft", "--model", ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "lora",
        "--max-steps", "2", "--micro-bsz", "2", "--log-every", "1",
        "--save-every-steps", "2", "--warmup-steps", "1", "--dp", "1",
    ])
    files = os.listdir(out)
    assert any(f.startswith("lora-step") for f in files)
    log = open(os.path.join(out, "train_log.txt")).read()
    assert "nan" not in log.lower()


def test_sft_lora_grad_accumulation(base_ckpt, sft_jsonl, tmp_path):
    """--accumulate-grad-batches: same-shape micro-batches group into
    the (accum, micro, T) layout the step scans over (was broken —
    the loop fed ungrouped (B, T) batches straight into the scan)."""
    out = str(tmp_path / "out_accum")
    main([
        "sft", "--model", base_ckpt, "--train-data", sft_jsonl,
        "--output-dir", out, "--train-type", "lora",
        "--max-steps", "2", "--micro-bsz", "1",
        "--accumulate-grad-batches", "2",
        "--log-every", "1", "--warmup-steps", "1", "--dp", "1",
    ])
    log = open(os.path.join(out, "train_log.txt")).read().splitlines()
    assert len(log) >= 1
    loss = float(log[0].split()[1])
    assert np.isfinite(loss)
