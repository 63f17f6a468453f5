from .quantize import (  # noqa: F401
    cdf_from_freq_np,
    quantize_logits_np,
    rescale_cdf,
)
