"""Secondary perf suite: regenerate the training / decode numbers the
README quotes into one driver-visible artifact (PERF.json at the repo
root). Each stage is the existing standalone bench script run in its own
process (remote compiles don't share a cache across model configs, and a
crashed stage must not take down the rest). One JSON object per stage,
keyed by stage name, plus the platform.

Usage:  python scripts/bench_suite.py [--out PERF.json] [--stages a,b,c]
Stages: train_lora, train_qlora, decode_bf16, decode_int8,
        decode_int8c, decode_slot_lora, encoder_train, speculative
(~25-45 min total on the tunneled v5e — compiles dominate.)
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = {
    # name -> (script, argv, env overrides)
    "train_lora": ("scripts/bench_train.py", [], {"TRAIN_TYPE": "lora"}),
    "train_lora_noremat": (
        "scripts/bench_train.py", [],
        {"TRAIN_TYPE": "lora", "REMAT": "0"},
    ),
    "train_qlora": ("scripts/bench_train.py", [], {"TRAIN_TYPE": "qlora"}),
    "decode_bf16": ("scripts/bench_batched_decode.py", [], {}),
    "decode_int8": ("scripts/bench_batched_decode.py", [], {"INT8": "1"}),
    "decode_int8c": ("scripts/bench_batched_decode.py", [], {"INT8": "int8c"}),
    # multi-adapter serving tax: 4 stacked r=8 LoRAs, every row under a
    # random adapter (adapters.slot_lora) vs the decode_bf16 stage
    "decode_slot_lora": (
        "scripts/bench_batched_decode.py", [], {"SLOT_LORA": "4"},
    ),
    "encoder_train": ("scripts/bench_encoder_train.py", ["pallas"], {}),
    "speculative": ("scripts/bench_speculative.py", [], {"E2E": "1"}),
    "serving_load": (
        "scripts/bench_serving_load.py", [],
        # 12 slots / block 16 measured best at the 16-client point
        {"SLOTS": "12", "BLOCK": "16", "LOADS": "1,4,8,16,32",
         "DURATION": "20"},
    ),
    # rerank + raw scan decode + engine E2E single-stream (3 lines)
    "serving": ("scripts/bench_serving.py", [], {}),
    # beam search E2E (VERDICT r4 weak #6: no measured number existed)
    "beam_search": ("scripts/bench_beam.py", [], {}),
    # the headline embed metric on the int8c native-compute path (int8
    # MXU GEMMs); meets the <=1e-3 embedding-cosine acceptance vs its
    # fp32 base (test_quant_kg int8c drift test)
    "embed_int8c": ("bench.py", [], {"BENCH_QUANT": "int8c"}),
}


def run_stage(name, timeout):
    script, argv, env_over = STAGES[name]
    env = dict(os.environ, **env_over)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, script), *argv],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        return {"error": "timeout", "timeout_s": timeout}
    lines = [
        ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")
    ]
    if proc.returncode != 0 or not lines:
        return {
            "error": "stage_failed",
            "rc": proc.returncode,
            "tail": (proc.stderr or proc.stdout)[-500:],
        }
    # decode benches print one line per sampler impl; keep them all
    parsed = [json.loads(ln) for ln in lines]
    return parsed[0] if len(parsed) == 1 else parsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "PERF.json"))
    ap.add_argument("--stages", default=",".join(STAGES))
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-stage wall clock (remote compiles are slow)")
    args = ap.parse_args()

    # partial reruns merge into the existing artifact instead of
    # clobbering stages they didn't run
    results = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f)
        except (json.JSONDecodeError, OSError):
            results = {}
    for name in args.stages.split(","):
        name = name.strip()
        if name not in STAGES:
            print(f"unknown stage {name!r}; have {sorted(STAGES)}",
                  file=sys.stderr)
            continue
        print(f"[bench_suite] {name} ...", flush=True)
        results[name] = run_stage(name, args.timeout)
        print(f"[bench_suite] {name}: {json.dumps(results[name])}",
              flush=True)
        # checkpoint after every stage so a dead relay keeps partials
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"written": args.out, "stages": list(results)}))


if __name__ == "__main__":
    main()
