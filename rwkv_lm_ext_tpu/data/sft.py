"""SFT preprocessing: instruction jsonl -> length-bucketed token examples.

Follows the reference's SftUtilities (data/SftUtilities.py:59-89): prompt
template '🐱:{instruction}\\n{input}\\n🤖:', labels -100 over the prompt,
output + eos supervised, examples bisected into fixed-length buckets.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

from rwkv_lm_ext_tpu.config import EOS_ID
from rwkv_lm_ext_tpu.data.buckets import DEFAULT_BUCKETS, LengthBucketedDataset

PROMPT_TEMPLATE = "🐱:{instruction}\n{input}\n🤖:"


def encode_sft_example(
    tokenizer,
    instruction: str,
    input_text: str,
    output: str,
    *,
    eos_id: int = EOS_ID,
) -> Dict[str, List[int]]:
    prompt = PROMPT_TEMPLATE.format(instruction=instruction, input=input_text)
    prompt_ids = tokenizer.encode(prompt)
    output_ids = tokenizer.encode(output) + [eos_id]
    input_ids = prompt_ids + output_ids
    labels = [-100] * len(prompt_ids) + list(output_ids)
    return {"input_ids": input_ids, "labels": labels}


def load_sft_jsonl(
    path: str,
    tokenizer,
    *,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    max_examples: Optional[int] = None,
) -> LengthBucketedDataset:
    """jsonl rows {"instruction","input","output"} -> bucketed dataset."""
    ds = LengthBucketedDataset(buckets)
    with open(path, "r", encoding="utf-8") as f:
        for n, line in enumerate(f):
            if max_examples is not None and n >= max_examples:
                break
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            ex = encode_sft_example(
                tokenizer,
                row.get("instruction", ""),
                row.get("input", ""),
                row.get("output", ""),
            )
            if "task" in row:
                # multi-task SFT (slot-lora): the row's task name routes
                # its example to that adapter's stack row
                ex["task"] = str(row["task"])
            ds.add(ex, len(ex["input_ids"]))
    return ds
