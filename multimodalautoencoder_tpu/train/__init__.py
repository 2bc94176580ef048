from multimodalautoencoder_tpu.train import trainer, checkpoint

__all__ = ["trainer", "checkpoint"]
