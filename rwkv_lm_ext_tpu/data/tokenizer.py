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


class WorldTokenizer:
    def __init__(self, vocab_path: Optional[str] = None):
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

    def encode_bytes(self, data: bytes) -> List[int]:
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
