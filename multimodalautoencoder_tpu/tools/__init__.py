from multimodalautoencoder_tpu.tools import files

__all__ = ["files"]
