from rwkv_lm_ext_tpu.apps.kg import (  # noqa: F401
    KGExtractor,
    build_graph,
    cluster_graph,
    normalize_units,
)
