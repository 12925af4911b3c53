"""Training callbacks: logging, throughput, checkpoint policies, LISA.

Functional port of the reference's callback behavior (src/trainer.py
train_callback + peft_train/Callbacks.py TrainerCallback):
- throughput metrics `REAL it/s` and `Kt/s = ctx_len*real_bsz/step_time/1e3`
  (src/trainer.py:121-129)
- train_log.txt append lines (epoch loss, exp(loss), lr, timestamp,
  src/trainer.py:253)
- wandb logging (gated import)
- trainable-only checkpoint filters: 'states' (keys containing time_state),
  'lora' (lora_A/B + time_* + ln + optional emb/head) — src/trainer.py:219-241
- LISA: randomly unfreeze lisa_k block layers every lisa_interval steps
  (src/trainer.py:158-173)
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


class MetricsLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        *,
        wandb_project: Optional[str] = None,
        wandb_run_name: Optional[str] = None,
        ctx_len: int = 0,
        real_bsz: int = 0,
    ):
        self.log_dir = log_dir
        self.ctx_len = ctx_len
        self.real_bsz = real_bsz
        self._t_last = None
        self._wandb = None
        if wandb_project:
            try:
                import wandb

                wandb.init(
                    project=wandb_project, name=wandb_run_name, resume=True
                )
                self._wandb = wandb
            except Exception:
                self._wandb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)

    def on_step(self, step: int, metrics: Dict[str, Any], lr: float) -> Dict:
        now = time.time()
        out = {k: float(v) for k, v in metrics.items()}
        out["lr"] = float(lr)
        if self._t_last is not None:
            dt = now - self._t_last
            out["it/s"] = 1.0 / dt if dt > 0 else float("inf")
            if self.ctx_len and self.real_bsz:
                out["Kt/s"] = self.ctx_len * self.real_bsz / dt / 1000.0
        self._t_last = now
        if self._wandb is not None:
            self._wandb.log(out, step=step)
        return out

    def on_epoch_end(self, epoch: int, epoch_loss: float, lr: float) -> None:
        if not self.log_dir:
            return
        with open(os.path.join(self.log_dir, "train_log.txt"), "a") as f:
            f.write(
                f"{epoch} {epoch_loss:.6f} {math.exp(epoch_loss):.4f} "
                f"{lr:.8f} {time.strftime('%Y-%m-%d %H:%M:%S')}\n"
            )


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def filter_trainable(params, train_type: str) -> Dict[str, np.ndarray]:
    """Flat {torch-style key: array} of only-what-trained, mirroring the
    reference's save filters so sub-checkpoints interoperate:
      'states': keys containing time_state (src/trainer.py:219-224)
      'lora':   time_*/ln keys (LoRA A/B live in the adapter tree and are
                saved by save_lora_checkpoint) (src/trainer.py:227-241)
      'full':   everything
    """
    from rwkv_lm_ext_tpu.checkpoint.convert import params_to_state_dict

    out = {}

    def visit(path, leaf):
        name = _path_str(path)
        if train_type in ("state", "states"):
            keep = "time_state" in name
        elif train_type in ("lora", "pissa"):
            keep = any(s in name for s in ("time_", "ln", "lora"))
        else:
            keep = True
        if keep:
            out[name] = np.asarray(leaf, np.float32)

    jax.tree_util.tree_map_with_path(visit, params)
    return out


def save_states_checkpoint(params, cfg, path: str) -> None:
    """Write a reference-compatible state-tuning .pth
    (blocks.{i}.att.time_state only)."""
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    sd = {}
    for i, b in enumerate(params["blocks"]):
        if "time_state" in b["att"]:
            sd[f"blocks.{i}.att.time_state"] = np.asarray(
                b["att"]["time_state"], np.float32
            )
    save_torch_pth(path, sd)


def save_lora_checkpoint(adapter, lc, path: str) -> None:
    from rwkv_lm_ext_tpu.adapters.lora import lora_tree_to_state_dict
    from rwkv_lm_ext_tpu.checkpoint.pth import save_torch_pth

    save_torch_pth(path, lora_tree_to_state_dict(adapter, lc))


@dataclasses.dataclass
class LisaSchedule:
    """LISA layerwise-sampling: every `interval` steps pick `k` random
    block indices to train; embeddings/head follow `train_head`
    (src/trainer.py:158-173)."""

    n_layer: int
    k: int = 2
    interval: int = 20
    train_head: bool = True
    seed: int = 0

    def active_layers(self, step: int) -> List[int]:
        rng = np.random.default_rng(self.seed + step // self.interval)
        return sorted(
            rng.choice(self.n_layer, size=min(self.k, self.n_layer), replace=False).tolist()
        )

    def trainable_mask(self, params, step: int):
        active = set(self.active_layers(step))

        def label(path, leaf):
            name = _path_str(path)
            if name.startswith("blocks/"):
                return int(name.split("/")[1]) in active
            return self.train_head  # emb / ln_out / head

        return jax.tree_util.tree_map_with_path(label, params)


def kv_match_metrics(
    tokenizer, targets: np.ndarray, pred_ids: np.ndarray, *, eos_id: int = 1
) -> Dict[str, float]:
    """Key/value-match monitoring for JSON-output SFT tasks
    (peft_train_sft.py:258-314 custom training_step). NOTE: in the
    reference this quantity is *added to the loss*, but it is built from
    argmax comparisons and python ints — it carries no gradient; its only
    effect is monitoring. Reproduced here as an explicit metric:
    per sample, parse the gold JSON target and count how many keys/values
    appear as subsequences of the greedy prediction.

    targets: (B, T) with -100 on unsupervised positions; pred_ids: (B, T)
    greedy token ids. Returns the reference's key/value "loss" values.
    """
    import json as _json

    def is_subseq(seq, sub):
        n, m = len(seq), len(sub)
        if m == 0 or m > n:
            return False
        for s in range(n - m + 1):
            if list(seq[s : s + m]) == list(sub):
                return True
        return False

    key_loss, value_loss = 0.0, 0.0
    for i in range(targets.shape[0]):
        t = targets[i]
        valid = np.nonzero(t != -100)[0]
        if len(valid) == 0:
            continue
        first = int(valid[0])
        eos_pos = np.nonzero(t == eos_id)[0]
        last = int(eos_pos[0]) if len(eos_pos) else len(t)
        gold_ids = [int(x) for x in t[first:last]]
        try:
            decoded = _json.loads(tokenizer.decode(gold_ids))
        except (ValueError, KeyError):
            continue
        gen = [int(x) for x in pred_ids[i][first:last]]
        n_keys = len(decoded)
        n_vals, m_keys, m_vals = 0, 0, 0
        for key, values in decoded.items():
            if is_subseq(gen, tokenizer.encode(key)):
                m_keys += 1
            vals = values if isinstance(values, list) else [values]
            for v in vals:
                n_vals += 1
                if is_subseq(gen, tokenizer.encode(str(v))):
                    m_vals += 1
        key_loss += (n_keys - m_keys) * 3 / n_keys if n_keys else 0.0
        value_loss += (n_vals - m_vals) * 5 / n_vals if n_vals else 0.0
    return {"key_match_loss": key_loss, "value_match_loss": value_loss}
