from . import qwen25vl

__all__ = ["qwen25vl"]
