"""ChatGLM4 tokenizer wrapper (MLM/MAE encoder models).

The reference's bidirectional encoders train on the glm4 vocabulary
(tokenizer/tokenization_chatglm.py; special ids per tests/test_mlm.py:27-29:
emb=151329, mask=151330, pad=151334). This wraps any sentencepiece/HF
tokenizer file behind the same minimal encode/decode interface the rest of
the framework uses; gated import (sentencepiece or transformers optional).
"""
from __future__ import annotations

from typing import Iterable, List

GLM_EMB_ID = 151329   # <|endoftext|> doubles as the sequence-embedding slot
GLM_MASK_ID = 151330
GLM_SOP_ID = 151333
GLM_PAD_ID = 151334


class GlmTokenizer:
    def __init__(self, model_path: str):
        try:
            import sentencepiece as spm

            self._sp = spm.SentencePieceProcessor(model_file=model_path)
            self._hf = None
        except ImportError:
            from transformers import AutoTokenizer

            self._hf = AutoTokenizer.from_pretrained(
                model_path, trust_remote_code=True
            )
            self._sp = None
        self.emb_id = GLM_EMB_ID
        self.mask_id = GLM_MASK_ID
        self.pad_id = GLM_PAD_ID

    @property
    def vocab_size(self) -> int:
        if self._sp is not None:
            return max(self._sp.vocab_size(), GLM_PAD_ID + 1)
        return max(len(self._hf), GLM_PAD_ID + 1)

    def encode(self, text: str) -> List[int]:
        if self._sp is not None:
            return list(self._sp.encode(text))
        return self._hf.encode(text, add_special_tokens=False)

    def decode(self, ids: Iterable[int]) -> str:
        ids = [i for i in ids if i < GLM_EMB_ID]  # strip specials
        if self._sp is not None:
            return self._sp.decode(list(ids))
        return self._hf.decode(list(ids))
