"""Corpus preprocessing + GLM wrapper shape + RWKV-4 op."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_lm_ext_tpu.data.preprocess import (
    build_binidx,
    split_sentences,
    tokenize_with_segments,
    word_segments,
)
from rwkv_lm_ext_tpu.ops.wkv4 import wkv4


def test_sentence_split():
    s = split_sentences("Hello world. 你好。这是测试！Done?")
    assert s == ["Hello world.", "你好。", "这是测试！", "Done?"]


def test_word_segments():
    segs = word_segments("cat 猫猫 dog")
    words = [w for w, _ in segs]
    assert words == ["cat", "猫", "猫", "dog"]
    assert [i for _, i in segs] == [0, 1, 2, 3]


def test_tokenize_with_segments():
    class Tok:
        def encode(self, s):
            return [ord(c) for c in s]  # 1 token per char

    ids, segs = tokenize_with_segments(Tok(), "ab 猫")
    assert len(ids) == len(segs)
    assert segs[0] == segs[1]          # 'ab' same word
    assert segs[-1] != segs[0]


def test_build_binidx(tmp_path):
    class Tok:
        def encode(self, s):
            return [ord(c) % 1000 for c in s]

    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"text": "hello"}) + "\n")
        f.write("raw line doc\n")
    n = build_binidx(str(src), str(tmp_path / "c"), Tok(), append_eos=True)
    from rwkv_lm_ext_tpu.data.binidx import IndexedDataset

    ds = IndexedDataset(str(tmp_path / "c"))
    assert len(ds) == 2
    assert ds.total_tokens == n == 5 + 1 + 12 + 1
    assert ds[0][-1] == 0  # eos


def _numpy_wkv4(k, v, w, u):
    B, T, C = k.shape
    y = np.zeros((B, T, C))
    aa = np.zeros((B, C)); bb = np.zeros((B, C)); pp = np.full((B, C), -1e38)
    for t in range(T):
        ww = u + k[:, t]
        p = np.maximum(pp, ww)
        e1, e2 = np.exp(pp - p), np.exp(ww - p)
        y[:, t] = (e1 * aa + e2 * v[:, t]) / (e1 * bb + e2)
        ww = pp + w
        p = np.maximum(ww, k[:, t])
        e1, e2 = np.exp(ww - p), np.exp(k[:, t] - p)
        aa = e1 * aa + e2 * v[:, t]
        bb = e1 * bb + e2
        pp = p
    return y


def test_wkv4_matches_numpy():
    B, T, C = 2, 17, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    k = jax.random.normal(ks[0], (B, T, C))
    v = jax.random.normal(ks[1], (B, T, C))
    w = -jnp.exp(jax.random.normal(ks[2], (C,)))   # negative decay
    u = jax.random.normal(ks[3], (C,))
    y, state = wkv4(k, v, w, u)
    y_np = _numpy_wkv4(np.asarray(k), np.asarray(v), np.asarray(w), np.asarray(u))
    np.testing.assert_allclose(y, y_np, rtol=1e-5, atol=1e-5)
    # chaining
    y1, s1 = wkv4(k[:, :9], v[:, :9], w, u)
    y2, s2 = wkv4(k[:, 9:], v[:, 9:], w, u, s1)
    np.testing.assert_allclose(jnp.concatenate([y1, y2], 1), y, rtol=1e-5, atol=1e-5)


def test_wkv4_parallel_matches_sequential():
    """The associative-scan formulation (O(log T) depth) matches the
    sequential scan exactly in math (tree-order fp diffs only), with and
    without a chained initial state."""
    import jax

    from rwkv_lm_ext_tpu.ops.wkv4 import wkv4, wkv4_parallel

    B, T, C = 2, 33, 8
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    k = jax.random.normal(ks[0], (B, T, C)) * 2.0
    v = jax.random.normal(ks[1], (B, T, C))
    w = -jnp.exp(jax.random.normal(ks[2], (C,)))
    u = jax.random.normal(ks[3], (C,))

    y_s, (aa_s, bb_s, pp_s) = wkv4(k, v, w, u)
    y_p, (aa_p, bb_p, pp_p) = wkv4_parallel(k, v, w, u)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                               rtol=1e-4, atol=1e-5)
    # normalized states must agree (the (aa, bb, pp) representation is
    # only unique up to the max-exponent shift): compare aa*e^pp style
    # ratios via the states' effect on one more step
    y2_s, _ = wkv4(k[:, :1], v[:, :1], w, u, (aa_s, bb_s, pp_s))
    y2_p, _ = wkv4(k[:, :1], v[:, :1], w, u, (aa_p, bb_p, pp_p))
    np.testing.assert_allclose(np.asarray(y2_p), np.asarray(y2_s),
                               rtol=1e-4, atol=1e-5)

    # chained: parallel over two halves == sequential over the whole
    y1, s1 = wkv4_parallel(k[:, :17], v[:, :17], w, u)
    y2, s2 = wkv4_parallel(k[:, 17:], v[:, 17:], w, u, s1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_s),
        rtol=1e-4, atol=1e-5,
    )
    y3_s, _ = wkv4(k[:, :1], v[:, :1], w, u, s2)
    np.testing.assert_allclose(np.asarray(y3_s), np.asarray(y2_s),
                               rtol=1e-4, atol=1e-5)
