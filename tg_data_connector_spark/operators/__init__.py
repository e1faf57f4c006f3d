from .transformers import dx_substr, dx_pad, dx_replace, dx_filter, apply_transformer_chain  # noqa: F401
