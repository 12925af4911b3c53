"""HF `tokenizers`-format tokenizer (tokenizer.json) wrapper.

RWKV-4 Pile/Raven checkpoints pair with the GPT-NeoX `20B_tokenizer.json`
(the reference's v4 serving path via the `rwkv` pip package loads it);
any HF tokenizer.json works. Same duck-typed surface as WorldTokenizer
(encode / decode / streaming_decoder), so every engine and the serving
CLI accept it interchangeably.

Import of `tokenizers` is deferred to construction so the module is
importable without the dependency.
"""
from __future__ import annotations

from typing import List


class JsonTokenizer:
    def __init__(self, path: str):
        from tokenizers import Tokenizer

        self._tk = Tokenizer.from_file(path)

    @property
    def vocab_size(self) -> int:
        return self._tk.get_vocab_size()

    def encode(self, text: str) -> List[int]:
        return self._tk.encode(text).ids

    def decode(self, ids: List[int]) -> str:
        return self._tk.decode(list(ids))

    def streaming_decoder(self):
        return _StreamingDecoder(self._tk)


class _StreamingDecoder:
    """Incremental decode for byte-level BPEs: emit the stable prefix of
    decode(all_ids) — a token can complete a multi-byte character (or a
    byte-level merge), so the tail is held back until it stops changing
    and contains no replacement character."""

    def __init__(self, tk):
        self._tk = tk
        self._ids: List[int] = []
        self._emitted = 0

    def push(self, token_id: int) -> str:
        self._ids.append(int(token_id))
        text = self._tk.decode(self._ids)
        # hold back only the TRAILING run of U+FFFD — those may still be
        # completed by the next token's bytes. An interior U+FFFD is
        # permanent (later bytes cannot repair an earlier invalid
        # sequence), so it must be emitted, not held forever.
        stable_end = len(text)
        while stable_end > 0 and text[stable_end - 1] == "�":
            stable_end -= 1
        stable_end = max(stable_end, self._emitted)  # never rewind
        piece = text[self._emitted:stable_end]
        self._emitted = stable_end
        return piece

    def flush(self) -> str:
        text = self._tk.decode(self._ids)
        piece = text[self._emitted:]
        self._ids, self._emitted = [], 0
        return piece
