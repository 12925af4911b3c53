"""Evaluation harnesses: STS correlation, retrieval, reranking.

Equivalents of the reference's eval tooling: train_scripts/evaluators.py
(EmbeddingSimilarityEvaluator: Spearman/Pearson over cos/euclidean/
manhattan/dot + CSV), train_scripts/eval_askubuntu_simcse.py (MAP / P@1),
tests/test_cmteb.py-style retrieval metrics (recall@k, MRR@10, nDCG@10).
Dependency-free (numpy only).
"""
from rwkv_lm_ext_tpu.eval.sts import SimilarityEvaluator  # noqa: F401
from rwkv_lm_ext_tpu.eval.retrieval import (  # noqa: F401
    rerank_metrics,
    retrieval_metrics,
)
