from .attention import attention, causal_mask_bias, mha_reference, segment_mask_bias

__all__ = ["attention", "causal_mask_bias", "mha_reference", "segment_mask_bias"]
