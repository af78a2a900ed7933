from .attention import NEG_INF, mha_reference
from .flash_attention import flash_attention

__all__ = ["NEG_INF", "mha_reference", "flash_attention"]
