"""WKV linear-attention scan family (TPU-native).

One parameterized op replaces the reference's six CUDA kernels
(cuda/wkv6_cuda.cu, wkv6state_cuda.cu, wkv6infctx_cuda.cu, wkv6_bi_cuda.cu,
rwkv6.cu, wkv5_cuda.cu) and the vendored Triton fla/ops/rwkv6 package:

    wkv(r, k, v, w, u, initial_state=None, output_final_state=False,
        backend="auto")

Semantics (per batch b, head h; N = head_size; fp32 state):

    y[t, j] = sum_i r[t, i] * (u[i] * k[t, i] * v[t, j] + S[i, j])
    S[i, j] = exp(-exp(w[t, i])) * S[i, j] + k[t, i] * v[t, j]

with S read *before* the update (matches cuda/wkv6_cuda.cu:23-60 and the
CPU golden model tests/test_cpu.py:42-73 of the reference). State layout is
(K, V) = (key-channel, value-channel).

Variants:
- RWKV-5 ("Eagle"): w is a per-channel constant (H, N)  -> `wkv5`
- state-tuning:      initial_state is a learnable (H, N, N) parameter
                     broadcast over batch (grad flows via autodiff)
- infctx/TBPTT:      per-batch initial_state in, final state out
- bidirectional:     forward pass + mirror reverse pass without the u bonus,
                     outputs summed (cuda/wkv6_bi_cuda.cu:23-111)  -> `wkv6_bi`
"""

from rwkv_lm_ext_tpu.ops.wkv import wkv, wkv5, wkv6, wkv6_bi  # noqa: F401
from rwkv_lm_ext_tpu.ops.wkv_reference import wkv_reference  # noqa: F401
from rwkv_lm_ext_tpu.ops.wkv_chunked import wkv_chunked  # noqa: F401
