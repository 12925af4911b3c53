from rwkv_lm_ext_tpu.serve.api import ServingService, serve_http  # noqa: F401
