"""RWKV "world" tokenizer: greedy longest-match over a byte trie.

Behavioral contract matches the reference's TRIE_TOKENIZER
(tokenizer/rwkv_tokenizer.py:5-103): vocab file lines are
``<id> <python-literal str|bytes> <byte-length>``, encoding is greedy
longest match from each position, invalid UTF-8 decodes to U+FFFD.
Token id 0 is reserved (pad); id 1 doubles as eos/emb/cls, 2 = sep,
3 = mask (see SURVEY §2.3).

Implementation is a nested-dict byte trie (not a port of the reference's
linked TRIE class) plus an incremental UTF-8-safe streaming decoder for
generation callbacks.
"""
from __future__ import annotations

import ast
import os
from typing import Dict, Iterable, List, Optional

_DEFAULT_VOCAB = os.path.join(
    os.path.dirname(__file__), "assets", "rwkv_vocab_v20230424.txt"
)


class _NativeTrie:
    """ctypes wrapper over native/trie_tokenizer.cpp (the data-loader hot
    path in C++; Python remains the fallback)."""

    def __init__(self, lib, idx_to_token):
        import ctypes
        import struct

        self._lib = lib
        lib.tok_create.restype = ctypes.c_void_p
        lib.tok_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tok_encode.restype = ctypes.c_int64
        lib.tok_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tok_destroy.argtypes = [ctypes.c_void_p]
        blob = bytearray()
        for idx, tok in idx_to_token.items():
            blob += struct.pack("<ii", idx, len(tok)) + tok
        blob = bytes(blob)
        self._handle = lib.tok_create(blob, len(blob))
        self._ctypes = ctypes

    def encode(self, data: bytes):
        import numpy as np

        ct = self._ctypes
        out = (ct.c_int32 * max(len(data), 1))()
        n = self._lib.tok_encode(self._handle, data, len(data), out)
        if n < 0:
            pos = -int(n) - 1
            raise ValueError(f"byte {data[pos]:#x} at {pos} not in vocabulary")
        return np.frombuffer(out, dtype=np.int32, count=int(n)).tolist()

    def __del__(self):
        try:
            self._lib.tok_destroy(self._handle)
        except Exception:
            pass


def _load_native(idx_to_token):
    try:
        from rwkv_lm_ext_tpu.native import load_library

        lib = load_library("trie_tokenizer")
        if lib is None:
            return None
        return _NativeTrie(lib, idx_to_token)
    except Exception:
        return None


class WorldTokenizer:
    def __init__(self, vocab_path: Optional[str] = None, *, native: bool = True):
        vocab_path = vocab_path or _DEFAULT_VOCAB
        self.idx_to_token: Dict[int, bytes] = {}
        trie: Dict = {}
        with open(vocab_path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                idx = int(line[: line.index(" ")])
                rest = line[line.index(" ") : line.rindex(" ")].strip()
                expected_len = int(line[line.rindex(" ") :])
                tok = ast.literal_eval(rest)
                if isinstance(tok, str):
                    tok = tok.encode("utf-8")
                assert isinstance(tok, bytes) and len(tok) == expected_len, line
                self.idx_to_token[idx] = tok
                node = trie
                for b in tok:
                    node = node.setdefault(b, {})
                node[-1] = idx  # terminal marker
        self._trie = trie
        self.vocab_size = max(self.idx_to_token) + 1
        self._native = None
        if native:
            self._native = _load_native(self.idx_to_token)

    def encode_bytes(self, data: bytes) -> List[int]:
        if self._native is not None:
            return self._native.encode(data)
        return self._encode_bytes_py(data)

    def _encode_bytes_py(self, data: bytes) -> List[int]:
        trie = self._trie
        out: List[int] = []
        i, n = 0, len(data)
        while i < n:
            node = trie.get(data[i])
            if node is None:
                raise ValueError(
                    f"byte {data[i]:#x} at {i} not in vocabulary"
                )
            best_id, best_end = node.get(-1), i + 1
            j = i + 1
            while j < n:
                node = node.get(data[j])
                if node is None:
                    break
                j += 1
                if -1 in node:
                    best_id, best_end = node[-1], j
            if best_id is None:
                raise ValueError(f"no token match at byte {i}")
            out.append(best_id)
            i = best_end
        return out

    def encode(self, text: str) -> List[int]:
        return self.encode_bytes(text.encode("utf-8"))

    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        return b"".join(self.idx_to_token[i] for i in ids if i in self.idx_to_token)

    def decode(self, ids: Iterable[int]) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")

    def streaming_decoder(self) -> "StreamingDecoder":
        return StreamingDecoder(self)


class StreamingDecoder:
    """Incremental decoder that only emits complete UTF-8 sequences —
    the generation-callback behavior of the reference's generate loop
    (src/model_run.py:1308-1313)."""

    def __init__(self, tok: WorldTokenizer):
        self._tok = tok
        self._pending = b""

    def push(self, token_id: int) -> str:
        self._pending += self._tok.idx_to_token.get(token_id, b"")
        # find the longest prefix that is valid UTF-8
        for cut in range(len(self._pending), max(len(self._pending) - 4, -1), -1):
            try:
                text = self._pending[:cut].decode("utf-8")
            except UnicodeDecodeError:
                continue
            self._pending = self._pending[cut:]
            return text
        return ""

    def flush(self) -> str:
        text = self._pending.decode("utf-8", errors="replace")
        self._pending = b""
        return text
