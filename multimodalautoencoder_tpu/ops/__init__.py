from multimodalautoencoder_tpu.ops import optim, metrics, masking

__all__ = ["optim", "metrics", "masking"]
