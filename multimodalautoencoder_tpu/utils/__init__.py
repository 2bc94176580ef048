from multimodalautoencoder_tpu.utils import helpers, cache

__all__ = ["helpers", "cache"]
