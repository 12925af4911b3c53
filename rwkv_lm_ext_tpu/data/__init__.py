"""Host-side data pipeline: tokenizer, mmap datasets, bucketed sampling,
collators. Everything here runs on CPU and feeds fixed-shape batches to the
TPU (static shapes = no XLA recompiles; the reference's length-bucket design
maps perfectly, data/custom_datasets.py)."""
from rwkv_lm_ext_tpu.data.tokenizer import WorldTokenizer  # noqa: F401
