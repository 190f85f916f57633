from probunet_tpu.eda.climex_eda import ClimexEDA, spearman_corr  # noqa: F401
