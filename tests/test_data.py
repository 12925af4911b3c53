"""Data pipeline: binidx round-trip, bucket sampler sharding, collators,
pretrain sampler coverage."""
import numpy as np
import pytest

from rwkv_lm_ext_tpu.data.binidx import IndexedDataset, IndexedDatasetWriter
from rwkv_lm_ext_tpu.data.buckets import (
    BucketBatchSampler,
    LengthBucketedDataset,
)
from rwkv_lm_ext_tpu.data.collators import (
    cross_encoder_collate,
    mae_collate,
    mlm_collate,
    sft_collate,
    triplet_collate,
)
from rwkv_lm_ext_tpu.data.pretrain import (
    PretrainSampler,
    maybe_is_prime,
    pick_magic_prime,
)
from rwkv_lm_ext_tpu.data.sft import encode_sft_example


def test_binidx_roundtrip(tmp_path):
    prefix = str(tmp_path / "corpus")
    docs = [list(range(10)), [7, 8, 9], list(range(100, 160))]
    with IndexedDatasetWriter(prefix, dtype=np.uint16) as w:
        for d in docs:
            w.add_document(d)
    ds = IndexedDataset(prefix)
    assert len(ds) == 3
    for i, d in enumerate(docs):
        np.testing.assert_array_equal(ds[i], d)
    np.testing.assert_array_equal(ds.get(2, offset=5, length=3), [105, 106, 107])
    assert ds.total_tokens == sum(len(d) for d in docs)


def test_binidx_torch_reference_compat(tmp_path):
    """Our files must parse with the same header the reference writes."""
    prefix = str(tmp_path / "c2")
    with IndexedDatasetWriter(prefix, dtype=np.int32) as w:
        w.add_document([1, 2, 3])
    raw = open(prefix + ".idx", "rb").read()
    assert raw[:9] == b"MMIDIDX\x00\x00"
    assert raw[9:17] == (1).to_bytes(8, "little")
    assert raw[17] == 4  # int32 code


def test_bucket_sampler_rank_sharding():
    ds = LengthBucketedDataset(buckets=(8, 16))
    for i in range(40):
        ds.add({"id": i}, 5)       # 40 into bucket 8
    for i in range(40, 60):
        ds.add({"id": i}, 12)      # 20 into bucket 16
    bs = {8: 4, 16: 2}
    seen = {0: [], 1: []}
    for rank in (0, 1):
        sampler = BucketBatchSampler(
            ds, bs, world_size=2, rank=rank
        )
        for bi, idxs in sampler:
            assert len(idxs) == bs[ds.buckets[bi].fixed_len]
            seen[rank].extend((bi, i) for i in idxs)
    # ranks see disjoint examples covering everything (up to drop_last)
    assert not (set(seen[0]) & set(seen[1]))
    assert len(seen[0]) == len(seen[1])
    # resume: skipping k batches drops exactly k batches
    s_full = list(BucketBatchSampler(ds, bs, world_size=2, rank=0))
    s_skip = list(
        BucketBatchSampler(ds, bs, world_size=2, rank=0, skipped_batches=3)
    )
    assert s_full[3:] == s_skip


def test_sft_collate_shift():
    ex = {"input_ids": [10, 11, 12, 13], "labels": [-100, -100, 12, 13]}
    out = sft_collate([ex], 8)
    assert out["input_ids"].shape == (1, 8)
    # labels shifted: target at position t is labels_raw[t+1]
    np.testing.assert_array_equal(
        out["labels"][0], [-100, 12, 13, -100, -100, -100, -100, -100]
    )


def test_triplet_collate():
    ex = {
        "query": [5, 6],
        "positive": [[7, 8, 9], [1, 2]],
        "negative": [3, 4],
    }
    out = triplet_collate([ex], 6)
    assert set(out) == {"query", "positive", "negative"}
    assert out["query"][0, 2] == 1  # emb_id terminator
    assert out["query"].shape == (1, 6)


def test_cross_encoder_collate_truncation():
    ex = {"query": list(range(10, 20)), "document": list(range(30, 60)), "label": 0}
    out = cross_encoder_collate([ex], 16)
    row = out["input_ids"][0]
    assert row[-1] == 1 or 1 in row  # cls terminator present
    assert (row == 2).sum() == 1     # exactly one sep
    assert out["labels"][0] == 0


def test_mlm_collate_masks_and_labels():
    ex = {"input_ids": list(range(10, 40))}
    out = mlm_collate([ex], 32, mask_prob=0.3, seed=1)
    ids, labels = out["input_ids"][0], out["labels"][0]
    masked = ids == 3
    assert masked.any()
    # labels exactly at masked positions hold the original token
    assert (labels[masked] >= 10).all()
    assert (labels[~masked] == -100).all()


def test_mae_collate_dupmae():
    ex = {"input_ids": list(range(10, 30))}
    out = mae_collate([ex], 24, bag_of_words=True, vocab_size=100, seed=2)
    assert out["encoder_input_ids"].shape == (1, 24)
    assert out["decoder_labels"].shape == (1, 24)
    w = out["bag_word_weight"][0]
    assert abs(w.sum() - 1.0) < 1e-5


def test_pretrain_sampler_full_coverage():
    class FakeData:
        total_tokens = 4 * 19 + 1

        def slice_tokens(self, start, length):
            return np.arange(start, start + length)

    p = pick_magic_prime(FakeData.total_tokens, 4)
    assert p == 17 and maybe_is_prime(p) and p % 3 == 2
    s = PretrainSampler(
        FakeData(), 4, magic_prime=17, world_size=1, epoch_steps=17
    )
    offsets = {s.sample_offset(0, i) for i in range(17)}
    assert len(offsets) == 17  # x -> x^3 permutes Z_p when p ≡ 2 (mod 3)


def test_sft_encoding_labels():
    class Tok:
        def encode(self, s):
            return [ord(c) % 97 + 5 for c in s]

    ex = encode_sft_example(Tok(), "do", "x", "yz")
    n_prompt = len(Tok().encode("🐱:do\nx\n🤖:"))
    assert ex["labels"][:n_prompt] == [-100] * n_prompt
    assert ex["input_ids"][-1] == 1  # eos supervised
    assert ex["labels"][-1] == 1


def test_qa_masked_sampler(tmp_path):
    from rwkv_lm_ext_tpu.data.binidx import IndexedDatasetWriter, IndexedDataset
    from rwkv_lm_ext_tpu.data.pretrain import PretrainSampler, QAMaskedSampler

    class FakePile:
        total_tokens = 4 * 17 + 1

        def slice_tokens(self, start, length):
            return np.arange(start, start + length) % 1000

    prefix = str(tmp_path / "qa")
    with IndexedDatasetWriter(prefix, dtype=np.uint16) as w:
        w.add_document([10, 11, 12, 1, 50, 51, 52])  # prompt [1] answer
    pile = PretrainSampler(FakePile(), 4, magic_prime=17)
    s = QAMaskedSampler(pile, IndexedDataset(prefix), 4)
    even = s(0, 0)   # pile sample: fully supervised
    assert (even["labels"] != -100).all()
    odd = s(0, 1)    # QA: prompt masked
    x, y = odd["input_ids"], odd["labels"]
    marker = np.nonzero(x == 1)[0]
    if len(marker):
        assert (y[: marker[0] + 1] == -100).all()


def test_group_softmax_loss():
    from rwkv_lm_ext_tpu.train.losses import group_softmax_loss
    import jax.numpy as jnp

    perfect = jnp.array([[10.0, -5.0, -5.0], [8.0, -2.0, -9.0]])
    bad = jnp.array([[-5.0, 10.0, -5.0]])
    assert float(group_softmax_loss(perfect)) < 1e-3
    assert float(group_softmax_loss(bad)) > 5.0


def test_parquet_corpus(tmp_path):
    pyarrow = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from rwkv_lm_ext_tpu.data.preprocess import iter_corpus

    t = pyarrow.table({"text": ["doc one", "doc two"]})
    path = str(tmp_path / "c.parquet")
    pq.write_table(t, path)
    assert list(iter_corpus(path)) == ["doc one", "doc two"]


def test_corpus_converters(tmp_path):
    """COIG/DRCD/IEPile converters produce the sft instruction-jsonl
    format (reference data/convert_coig.py, convert_drcd.py,
    convert_iepile.py)."""
    from rwkv_lm_ext_tpu.data.converters import (
        IE_DEFAULT_INSTRUCTION,
        convert_coig_records,
        convert_drcd,
        convert_iepile_records,
    )

    coig = [
        {"input": "a", "instruction": "b", "output": "c",
         "task_type": {"major": ["阅读理解"], "minor": ["其他"]}},
        {"input": "x", "instruction": "y", "output": "z",
         "task_type": {"major": ["代码"], "minor": []}},
    ]
    out = list(convert_coig_records(coig))
    assert out == [{"input": "a", "instruction": "b", "output": "c"}]

    drcd = {"data": [{"paragraphs": [{"context": "ctx", "qas": [
        {"question": "q1", "answers": [{"text": "a1"}, {"text": "a2"}]}
    ]}]}]}
    recs = list(convert_drcd(drcd))
    assert len(recs) == 2
    assert recs[0]["input"] == "ctx" and "q1" in recs[0]["instruction"]
    assert {r["output"] for r in recs} == {"a1", "a2"}

    import json

    iepile = [
        {"task": "NER", "output": "[]", "instruction": json.dumps(
            {"instruction": "ner please", "input": "text", "schema": ["PER"]}
        )},
        {"task": "RE", "output": "[]", "instruction": json.dumps(
            {"instruction": "re", "input": "t", "schema": []}
        )},
        {"input": "plain", "output": "out"},
    ]
    recs = list(convert_iepile_records(iepile, task="NER"))
    assert len(recs) == 2
    assert recs[0]["instruction"] == "ner please"
    assert json.loads(recs[0]["input"])["schema"] == ["PER"]
    assert recs[1]["instruction"] == IE_DEFAULT_INSTRUCTION


def test_wiki_dump_converter(tmp_path):
    """MediaWiki XML dump -> clean article jsonl (the thin replacement
    for the reference's data/wikipedia.py HF builder)."""
    import bz2

    from rwkv_lm_ext_tpu.data.converters import convert_wiki_dump

    dump = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
<page><title>Alpha</title><ns>0</ns><revision><text>
{{Infobox|thing=1}}'''Alpha''' is a [[letter|Greek letter]] used in [[math]].
== History ==
It has &lt;ref&gt;cite&lt;/ref&gt; a long history.{{cn}}
{| class="wikitable"
| a || b
|}
* item one
[https://example.com ext link] end.
</text></revision></page>
<page><title>Redir</title><ns>0</ns><redirect title="Alpha"/>
<revision><text>#REDIRECT [[Alpha]]</text></revision></page>
<page><title>Talk:Alpha</title><ns>1</ns><revision><text>talk page content that is long enough to pass the filter easily</text></revision></page>
<page><title>Short</title><ns>0</ns><revision><text>too short</text></revision></page>
</mediawiki>"""
    raw = tmp_path / "dump.xml"
    raw.write_text(dump, encoding="utf-8")
    bz = tmp_path / "dump.xml.bz2"
    bz.write_bytes(bz2.compress(dump.encode()))

    for path in (str(raw), str(bz)):
        rows = list(convert_wiki_dump(path, min_chars=32))
        assert [r["title"] for r in rows] == ["Alpha"]
        body = rows[0]["text"]
        assert "Greek letter" in body and "math" in body
        assert "{{" not in body and "[[" not in body and "<ref" not in body
        assert "wikitable" not in body and "'''" not in body
        assert "ext link" in body and "https://" not in body
